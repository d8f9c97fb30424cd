"""LiDAR preprocessing: pcd IO, BEV occupancy parity, augmentations,
PIXOR label maps (round-trip through the decoder)."""

import numpy as np
import pytest

from cobevt_tpu.data.lidar_preprocess import (
    DataAugmentor,
    downsample_points,
    global_rotation,
    load_pcd,
    mask_ego_points,
    mask_points_by_range,
    points_to_bev,
)
from cobevt_tpu.postprocess.lidar_bev_postprocessor import (
    BevGeometry,
    LidarBevPostprocessor,
)


def test_pcd_roundtrip_ascii(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 4).astype(np.float32)
    path = tmp_path / "test.pcd"
    with open(path, "w") as f:
        f.write("VERSION .7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 50\nHEIGHT 1\n"
                "POINTS 50\nDATA ascii\n")
        for p in pts:
            f.write(" ".join(f"{v:.6f}" for v in p) + "\n")
    loaded = load_pcd(str(path))
    np.testing.assert_allclose(loaded, pts, atol=1e-5)


def test_pcd_roundtrip_binary(tmp_path):
    rng = np.random.RandomState(1)
    pts = rng.randn(30, 4).astype(np.float32)
    path = tmp_path / "test.pcd"
    with open(path, "wb") as f:
        f.write(b"VERSION .7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                b"TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 30\nHEIGHT 1\n"
                b"POINTS 30\nDATA binary\n")
        f.write(pts.tobytes())
    loaded = load_pcd(str(path))
    np.testing.assert_allclose(loaded, pts, atol=1e-6)


def test_masks_and_downsample():
    rng = np.random.RandomState(2)
    pts = rng.uniform(-50, 50, (1000, 4)).astype(np.float32)
    kept = mask_points_by_range(pts, [-10, -10, -10, 10, 10, 10])
    assert np.all(np.abs(kept[:, :3]) <= 10)
    no_ego = mask_ego_points(kept)
    assert len(no_ego) <= len(kept)
    ds = downsample_points(pts, 128, rng)
    assert ds.shape == (128, 4)
    ds2 = downsample_points(pts[:10], 128, rng)
    assert ds2.shape == (128, 4)


def test_bev_occupancy_matches_reference_loop():
    rng = np.random.RandomState(3)
    geometry = {"L1": -8.0, "W1": -8.0, "H1": -3.0, "res": 0.5,
                "input_shape": (32, 32, 9)}
    pts = np.column_stack([
        rng.uniform(-7.9, 7.9, (300, 2)),
        rng.uniform(-2.9, 0.9, 300),
        rng.rand(300)]).astype(np.float32)
    ours = points_to_bev(pts, geometry)

    ref = np.zeros(geometry["input_shape"], np.float32)
    counts = np.zeros((32, 32), np.int64)
    origin = np.array([-8.0, -8.0, -3.0])
    idx = ((pts[:, :3] - origin) / 0.5).astype(int)
    for i in range(len(pts)):
        ref[idx[i, 0], idx[i, 1], idx[i, 2]] = 1
        ref[idx[i, 0], idx[i, 1], -1] += pts[i, 3]
        counts[idx[i, 0], idx[i, 1]] += 1
    nz = counts > 0
    ref[nz, -1] /= counts[nz]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_augmentations_keep_points_in_boxes():
    rng = np.random.RandomState(4)
    boxes = np.array([[2.0, 3.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    # points at box center stay at (transformed) box center
    pts = np.array([[2.0, 3.0, 0.0, 0.5]])
    aug = DataAugmentor(seed=5)
    b2, p2 = aug(boxes, pts)
    np.testing.assert_allclose(b2[0, :3], p2[0, :3], atol=1e-9)

    b3, p3 = global_rotation(boxes, pts, [0.5, 0.5],
                             np.random.RandomState(0))
    c, s = np.cos(0.5), np.sin(0.5)
    np.testing.assert_allclose(b3[0, 0], 2 * c - 3 * s, atol=1e-9)
    np.testing.assert_allclose(b3[0, 6], 0.8, atol=1e-9)


def test_pixor_label_roundtrip():
    geo = BevGeometry(L1=-20.0, W1=-20.0, res=0.4, downsample_rate=2,
                      label_shape=(50, 50, 7))
    post = LidarBevPostprocessor(geo, score_threshold=0.5,
                                 nms_threshold=0.15)
    gt = np.zeros((5, 7))
    gt[0] = [1.0, 2.0, 0, 4.0, 2.0, 1.5, 0.4]
    gt[1] = [-8.0, -5.0, 0, 4.5, 1.8, 1.5, -1.0]
    mask = np.zeros(5)
    mask[:2] = 1

    label = post.generate_label(gt, mask)["label_map"]
    assert label.shape == (50, 50, 7)
    denorm = post.denormalize_reg_map(label[..., 1:])
    cls = label[..., 0]
    assert cls.sum() > 0

    # decode from a perfect label map: boxes should come back
    logits = np.where(cls > 0, 10.0, -10.0)
    corners, scores = post.decode(logits, label[..., 1:])
    assert len(corners) == 2
    centers = corners.mean(axis=1)
    got = set()
    for c in centers:
        d0 = np.linalg.norm(c - gt[0, :2])
        d1 = np.linalg.norm(c - gt[1, :2])
        got.add(0 if d0 < d1 else 1)
        assert min(d0, d1) < 1.0
    assert got == {0, 1}


def test_debug_roundtrip_helpers():
    from cobevt_tpu.postprocess.voxel_postprocessor import (
        AnchorArgs,
        VoxelPostprocessor,
    )
    from cobevt_tpu.tools.debug_utils import (
        check_anchor_roundtrip,
        check_pixor_roundtrip,
    )

    args = AnchorArgs(cav_lidar_range=(-20, -20, -3, 20, 20, 1),
                      vw=0.4, vh=0.4, W=100, H=100, feature_stride=2)
    vp = VoxelPostprocessor(args, "hwl", 0.6, 0.45, 0.2, 0.15, 10)
    gt = np.zeros((10, 7))
    gt[0] = [2.0, 3.0, -1.0, 1.56, 1.6, 3.9, 0.0]
    mask = np.zeros(10)
    mask[0] = 1
    assert check_anchor_roundtrip(vp, gt, mask, tol=1.0)

    geo = BevGeometry(L1=-20.0, W1=-20.0, res=0.4, downsample_rate=2,
                      label_shape=(50, 50, 7))
    lp = LidarBevPostprocessor(geo, score_threshold=0.5)
    gt2 = np.zeros((5, 7))
    gt2[0] = [1.0, 2.0, 0, 4.0, 2.0, 1.5, 0.4]
    m2 = np.zeros(5)
    m2[0] = 1
    assert check_pixor_roundtrip(lp, gt2, m2, tol=1.0)
