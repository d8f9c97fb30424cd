"""End-to-end LiDAR slice: fixture scenario tree (with .pcd files) ->
cooperative pillar dataset -> PointPillarFuseBEVT train step ->
postprocess decode + AP."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import yaml

cv2 = pytest.importorskip("cv2")

from cobevt_tpu.data.objects import generate_object_center
from cobevt_tpu.data.opv2v import OPV2VScenarioDatabase
from cobevt_tpu.data.opv2v_lidar import OPV2VLidarDataset
from cobevt_tpu.losses.detection_loss import PointPillarLoss
from cobevt_tpu.models.lidar import PointPillarConfig, PointPillarFuseBEVT
from cobevt_tpu.postprocess.voxel_postprocessor import (
    AnchorArgs,
    VoxelPostprocessor,
)

PC_RANGE = (-16.0, -16.0, -3.0, 16.0, 16.0, 1.0)
VOXEL = (0.8, 0.8, 4.0)


def write_lidar_fixture(root, n_cavs=2, n_stamps=2):
    rng = np.random.RandomState(0)
    for c in range(n_cavs):
        cav_dir = os.path.join(root, "scenario_0", str(200 + c))
        os.makedirs(cav_dir, exist_ok=True)
        for t in range(n_stamps):
            ts = f"{t:06d}"
            pose = [4.0 * c, 2.0 * c, 0.0, 0.0, 10.0 * c, 0.0]
            vehicles = {
                7: {"location": [8.0, 3.0, -0.5],
                    "center": [0.0, 0.0, 0.0],
                    "angle": [0.0, 30.0, 0.0],
                    "extent": [2.0, 1.0, 0.5]},
            }
            params = {"lidar_pose": pose, "true_ego_pos": pose,
                      "vehicles": vehicles}
            for m in range(4):
                params[f"camera{m}"] = {
                    "cords": pose, "intrinsic": np.eye(3).tolist(),
                    "extrinsic": np.eye(4).tolist()}
            with open(os.path.join(cav_dir, f"{ts}.yaml"), "w") as f:
                yaml.safe_dump(params, f)
            pts = np.column_stack([
                rng.uniform(-14, 14, (400, 2)),
                rng.uniform(-2.5, 0.5, 400),
                rng.rand(400)]).astype(np.float32)
            with open(os.path.join(cav_dir, f"{ts}.pcd"), "wb") as f:
                f.write(b"VERSION .7\nFIELDS x y z intensity\n"
                        b"SIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
                        b"WIDTH 400\nHEIGHT 1\nPOINTS 400\nDATA binary\n")
                f.write(pts.tobytes())


def make_post():
    args = AnchorArgs(cav_lidar_range=PC_RANGE, l=3.9, w=1.6, h=1.56,
                      r=(0, 90), vw=VOXEL[0], vh=VOXEL[1], W=40, H=40,
                      feature_stride=2)
    return VoxelPostprocessor(args, "hwl", 0.3, 0.2, 0.2, 0.15, 50)


def test_object_center_projection():
    params = {"lidar_pose": [0, 0, 0, 0, 0, 0], "vehicles": {
        1: {"location": [5.0, 2.0, -0.5], "center": [0, 0, 0],
            "angle": [0, 0, 0], "extent": [2.0, 1.0, 0.5]}}}
    boxes, mask, ids = generate_object_center(
        [params], [0, 0, 0, 0, 0, 0], 10, "hwl",
        lidar_range=PC_RANGE)
    assert mask.sum() == 1 and ids == [1]
    np.testing.assert_allclose(boxes[0, :3], [5.0, 2.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(boxes[0, 3:6], [1.0, 2.0, 4.0], atol=1e-6)


@pytest.mark.slow
def test_lidar_dataset_and_train_step(tmp_path):
    root = str(tmp_path / "train")
    write_lidar_fixture(root)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    post = make_post()
    ds = OPV2VLidarDataset(db, post, voxel_size=VOXEL,
                           lidar_range=PC_RANGE, max_voxels=256,
                           max_points_per_voxel=8, max_objects=10)
    assert len(ds) == 2
    s = ds[0]
    assert s["voxel_features"].shape == (2, 256, 8, 4)
    assert s["agent_mask"].sum() == 2
    assert s["object_bbx_mask"].sum() >= 1
    assert s["pos_equal_one"].shape == (20, 20, 2)

    batch = ds.collate([s])
    cfg = PointPillarConfig(
        max_cav=2, voxel_size=VOXEL, point_cloud_range=PC_RANGE,
        max_voxels=256, max_points_per_voxel=8, pillar_filters=(16,),
        layer_nums=(1, 1), layer_strides=(2, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filter=(16, 16),
        shrink_dim=32, fusion="swap", fusion_window_size=2,
        fusion_dim_head=8, fusion_mlp_dim=32, fusion_depth=1,
        sttf_downsample_rate=2, anchor_num=2)
    model = PointPillarFuseBEVT(cfg)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), batch_j, False)

    loss_fn = PointPillarLoss()

    def objective(params):
        out = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            batch_j, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})[0]
        total, parts = loss_fn(out, batch_j)
        return total

    loss, grads = jax.value_and_grad(objective)(variables["params"])
    assert np.isfinite(float(loss))
    assert max(float(jnp.abs(g).max())
               for g in jax.tree.leaves(grads)) > 0

    # decode path runs
    out = model.apply(variables, batch_j, False)
    corners, scores = post.decode(
        np.asarray(out["cls_preds"])[0], np.asarray(out["reg_preds"])[0])
    assert corners.shape[1:] == (8, 3)
