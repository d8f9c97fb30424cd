"""LiDAR track: pillar VFE / scatter / BEV backbone parity vs the torch
reference, voxelizer correctness, anchor-target parity, model smoke."""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from cobevt_tpu.data.voxelize import voxelize_points
from cobevt_tpu.models.lidar import (
    BaseBEVBackbone,
    PillarVFE,
    PointPillarConfig,
    PointPillarFuseBEVT,
    pillar_scatter,
)
from cobevt_tpu.postprocess import (
    VoxelPostprocessor,
    delta_to_boxes3d,
    generate_anchor_box,
)
from cobevt_tpu.postprocess.voxel_postprocessor import AnchorArgs
from cobevt_tpu.utils import native_ops
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    install_torchvision_shim()
    # the reference postprocessor imports the (unbuilt) Cython module;
    # serve it our native kernels instead
    shim = types.ModuleType("opencood.utils.box_overlaps")
    shim.bbox_overlaps = lambda a, b: native_ops.bbox_overlaps(a, b)
    shim.bbox_intersections = \
        lambda a, b: native_ops.bbox_intersections(a, b)
    sys.modules["opencood.utils.box_overlaps"] = shim
    try:
        from opencood.models.sub_modules import pillar_vfe as ref_pv
        from opencood.models.backbones import base_bev_backbone as ref_bb
        from opencood.data_utils.post_processor import (
            voxel_postprocessor as ref_vp,
        )
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

VOXEL_SIZE = (0.4, 0.4, 4.0)
PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 1.0)


def make_voxels(n_vox=40, P=16, seed=0):
    rng = np.random.RandomState(seed)
    feats = np.zeros((n_vox, P, 4), np.float32)
    nums = rng.randint(1, P + 1, n_vox)
    coords = np.zeros((n_vox, 4), np.int32)
    coords[:, 2] = rng.randint(0, 40, n_vox)
    coords[:, 3] = rng.randint(0, 40, n_vox)
    for i in range(n_vox):
        feats[i, :nums[i]] = rng.randn(nums[i], 4)
    return feats, nums, coords


@needs_ref
def test_pillar_vfe_parity():
    torch.manual_seed(0)
    cfg = {"use_norm": True, "with_distance": False,
           "use_absolute_xyz": True, "num_filters": [32]}
    ref = ref_pv.PillarVFE(cfg, 4, VOXEL_SIZE, PC_RANGE).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=1)

    feats, nums, coords = make_voxels()
    with torch.no_grad():
        ref_out = ref({"voxel_features": torch.from_numpy(feats.copy()),
                       "voxel_num_points": torch.from_numpy(nums.copy()),
                       "voxel_coords": torch.from_numpy(
                           coords.astype(np.float32))})[
            "pillar_features"].numpy()

    model = PillarVFE((32,), True, False, True, VOXEL_SIZE, PC_RANGE)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                      jnp.asarray(nums), jnp.asarray(coords), False)
    conv = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(conv["params"], init["params"]),
        "batch_stats": fit_to_template(conv["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, jnp.asarray(feats), jnp.asarray(nums),
                       jnp.asarray(coords), False)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-4,
                               rtol=1e-3)


def test_pillar_scatter_matches_loop():
    rng = np.random.RandomState(1)
    N, C = 30, 8
    nx, ny = 12, 10
    feats = rng.randn(N, C).astype(np.float32)
    coords = np.zeros((N, 4), np.int32)
    coords[:, 0] = rng.randint(0, 2, N)
    # unique (batch, y, x)
    cells = rng.choice(ny * nx, N, replace=False)
    coords[:, 2] = cells // nx
    coords[:, 3] = cells % nx
    mask = rng.rand(N) > 0.2

    out = np.asarray(pillar_scatter(jnp.asarray(feats),
                                    jnp.asarray(coords), 2, (nx, ny, 1),
                                    jnp.asarray(mask)))
    ref = np.zeros((2, ny, nx, C), np.float32)
    for i in range(N):
        if mask[i]:
            ref[coords[i, 0], coords[i, 2], coords[i, 3]] += feats[i]
    np.testing.assert_allclose(out, ref, atol=1e-6)


@needs_ref
def test_base_bev_backbone_parity():
    torch.manual_seed(2)
    cfg = {"layer_nums": [2, 2], "layer_strides": [2, 2],
           "num_filters": [16, 32], "upsample_strides": [1, 2],
           "num_upsample_filter": [16, 16]}
    ref = ref_bb.BaseBEVBackbone(cfg, 8).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=3)

    rng = np.random.RandomState(4)
    x = rng.randn(2, 8, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"spatial_features": torch.from_numpy(x.copy())})[
            "spatial_features_2d"].numpy()

    model = BaseBEVBackbone((2, 2), (2, 2), (16, 32), (1, 2), (16, 16))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init = model.init(jax.random.PRNGKey(0), xj, False)
    conv = torch_to_flax(state_dict_to_numpy(ref.state_dict()),
                         convtranspose_markers=("deblocks",))
    variables = {
        "params": fit_to_template(conv["params"], init["params"]),
        "batch_stats": fit_to_template(conv["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, xj, False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out, atol=5e-4, rtol=1e-3)


def test_voxelizer():
    rng = np.random.RandomState(5)
    pts = rng.uniform(-8, 8, (500, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 1, 500)
    out = voxelize_points(pts, VOXEL_SIZE, PC_RANGE, max_voxels=600,
                          max_points_per_voxel=8)
    assert out["grid_size"] == (40, 40, 1)
    n = out["voxel_mask"].sum()
    assert n > 0
    assert out["voxel_num_points"][:n].min() >= 1
    # every stored point falls in its voxel cell
    for vi in range(min(n, 20)):
        c = out["voxel_coords"][vi]
        for pi in range(out["voxel_num_points"][vi]):
            p = out["voxel_features"][vi, pi]
            assert int((p[0] - PC_RANGE[0]) / VOXEL_SIZE[0]) == c[3]
            assert int((p[1] - PC_RANGE[1]) / VOXEL_SIZE[1]) == c[2]


@needs_ref
def test_anchor_and_targets_parity():
    params = {
        "anchor_args": {"cav_lidar_range": list(PC_RANGE), "l": 3.9,
                        "w": 1.6, "h": 1.56, "r": [0, 90], "vw": 0.4,
                        "vh": 0.4, "W": 40, "H": 40,
                        "feature_stride": 2, "num": 2},
        "order": "hwl", "max_num": 10,
        "target_args": {"pos_threshold": 0.6, "neg_threshold": 0.45,
                        "score_threshold": 0.2},
        "nms_thresh": 0.15,
    }
    ref = ref_vp.VoxelPostprocessor(params, train=True)
    ref_anchors = ref.generate_anchor_box()

    args = AnchorArgs(cav_lidar_range=PC_RANGE, l=3.9, w=1.6, h=1.56,
                      r=(0, 90), vw=0.4, vh=0.4, W=40, H=40,
                      feature_stride=2)
    ours = VoxelPostprocessor(args, "hwl", 0.6, 0.45, 0.2, 0.15, 10)
    np.testing.assert_allclose(ours.anchors, ref_anchors, atol=1e-9)

    rng = np.random.RandomState(6)
    gt = np.zeros((10, 7))
    gt[:3, :2] = rng.uniform(-5, 5, (3, 2))
    gt[:3, 2] = -1.0
    gt[:3, 3:6] = [1.56, 1.6, 3.9]
    gt[:3, 6] = rng.uniform(-np.pi / 2, np.pi / 2, 3)
    mask = np.zeros(10)
    mask[:3] = 1

    ref_label = ref.generate_label(gt_box_center=gt.copy(),
                                   anchors=ref_anchors, mask=mask)
    our_label = ours.generate_label(gt, mask)
    for k in ("pos_equal_one", "neg_equal_one", "targets"):
        np.testing.assert_allclose(our_label[k], ref_label[k], atol=1e-6)


@needs_ref
def test_delta_decoding_parity():
    args = AnchorArgs(cav_lidar_range=PC_RANGE, W=40, H=40)
    anchors = generate_anchor_box(args)
    rng = np.random.RandomState(7)
    H, W = anchors.shape[:2]
    deltas = rng.randn(2, H, W, 14).astype(np.float32) * 0.1

    # reference expects (N, C, H, W)
    ref_out = ref_vp.VoxelPostprocessor.delta_to_boxes3d(
        torch.from_numpy(deltas.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(anchors.copy())).numpy()
    ours = delta_to_boxes3d(deltas, anchors)
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


def test_point_pillar_fusebevt_forward():
    cfg = PointPillarConfig(
        max_cav=2, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        max_voxels=64, max_points_per_voxel=8, pillar_filters=(16,),
        layer_nums=(1, 1), layer_strides=(2, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filter=(16, 16),
        shrink_dim=32, fusion="swap", fusion_window_size=2,
        fusion_dim_head=8, fusion_mlp_dim=32, fusion_depth=1,
        sttf_downsample_rate=2, anchor_num=2)
    B, L, N, P = 1, 2, 64, 8
    rng = np.random.RandomState(8)
    vox = [voxelize_points(
        rng.uniform(-7, 7, (200, 4)).astype(np.float32), VOXEL_SIZE,
        PC_RANGE, N, P) for _ in range(B * L)]
    batch = {
        "voxel_features": jnp.asarray(np.stack(
            [v["voxel_features"] for v in vox]).reshape(B, L, N, P, 4)),
        "voxel_num_points": jnp.asarray(np.stack(
            [v["voxel_num_points"] for v in vox]).reshape(B, L, N)),
        "voxel_coords": jnp.asarray(np.stack(
            [v["voxel_coords"] for v in vox]).reshape(B, L, N, 4)),
        "voxel_mask": jnp.asarray(np.stack(
            [v["voxel_mask"] for v in vox]).reshape(B, L, N)),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }
    model = PointPillarFuseBEVT(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    # grid 40x40, stride 2 -> 20x20 head map
    assert out["cls_preds"].shape == (B, 20, 20, 2)
    assert out["reg_preds"].shape == (B, 20, 20, 14)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_point_pillar_train_criterion_one_step():
    """The benchmark's LiDAR train criterion drives a full optimizer
    step: finite decreasing-able loss, gradient flow to the pillar
    encoder (tools/benchmark.py:make_criterion)."""
    import optax

    from cobevt_tpu.tools.benchmark import make_criterion
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train.step import make_train_step

    cfg = PointPillarConfig(
        max_cav=2, voxel_size=VOXEL_SIZE, point_cloud_range=PC_RANGE,
        max_voxels=64, max_points_per_voxel=8, pillar_filters=(16,),
        layer_nums=(1, 1), layer_strides=(2, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filter=(16, 16),
        shrink_dim=32, fusion="swap", fusion_window_size=2,
        fusion_dim_head=8, fusion_mlp_dim=32, fusion_depth=1,
        sttf_downsample_rate=2, anchor_num=2)
    B, L, N, P = 1, 2, 64, 8
    rng = np.random.RandomState(5)
    pts = rng.rand(B, L, N, P, 4).astype(np.float32)
    pr = cfg.point_cloud_range
    pts[..., 0] = pts[..., 0] * (pr[3] - pr[0]) + pr[0]
    pts[..., 1] = pts[..., 1] * (pr[4] - pr[1]) + pr[1]
    pts[..., 2] = pts[..., 2] * (pr[5] - pr[2]) + pr[2]
    nx, ny, _ = cfg.grid_size
    coords = np.zeros((B, L, N, 4), np.int32)
    coords[..., 2] = rng.randint(0, ny, (B, L, N))
    coords[..., 3] = rng.randint(0, nx, (B, L, N))
    batch = {
        "voxel_features": jnp.asarray(pts),
        "voxel_num_points": jnp.asarray(
            rng.randint(1, P + 1, (B, L, N)).astype(np.int32)),
        "voxel_coords": jnp.asarray(coords),
        "voxel_mask": jnp.asarray(
            (rng.rand(B, L, N) < 0.8).astype(np.float32)),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }
    model = PointPillarFuseBEVT(cfg)
    criterion, train_batch = make_criterion("pointpillar", model, batch)
    state = create_train_state(
        model, make_optimizer(optax.constant_schedule(1e-3)),
        train_batch)
    step = make_train_step(model, criterion, donate=False)
    state2, logs = step(state, train_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["cls_loss"]))
    assert np.isfinite(float(logs["reg_loss"]))
    # parameters actually moved
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
