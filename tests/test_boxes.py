"""Box utilities: corner math round trips, IoU oracles, NMS, native C++
parity with the numpy implementations."""

import numpy as np
import pytest

from cobevt_tpu.geometry import boxes as B
from cobevt_tpu.utils import native_ops


def rand_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    out = np.zeros((n, 7))
    out[:, :2] = rng.uniform(-20, 20, (n, 2))
    out[:, 2] = rng.uniform(-1, 1, n)
    out[:, 3:6] = rng.uniform(1, 5, (n, 3))
    out[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return out


@pytest.mark.parametrize("order", ["lwh", "hwl"])
def test_corner_center_roundtrip(order):
    boxes = rand_boxes(32)
    corners = B.boxes_to_corners_3d(boxes, order)
    rec = B.corner_to_center(corners, order)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=1e-9)
    # yaw equal modulo pi wrap
    dyaw = np.angle(np.exp(1j * (rec[:, 6] - boxes[:, 6])))
    np.testing.assert_allclose(dyaw, 0, atol=1e-9)


def test_corner_parity_with_reference():
    torch = pytest.importorskip("torch")
    import sys
    from tests.conftest import add_reference_to_path
    from tests.ref_shims import install_torchvision_shim
    if not add_reference_to_path():
        pytest.skip("no reference")
    install_torchvision_shim()
    from opencood.utils import box_utils as ref_bu

    boxes = rand_boxes(16, seed=3)
    for order in ("lwh", "hwl"):
        ref = ref_bu.boxes_to_corners_3d(
            torch.from_numpy(boxes.copy()), order).numpy()
        ours = B.boxes_to_corners_3d(boxes, order)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

        rec_ref = ref_bu.corner_to_center(ref, order)
        rec_ours = B.corner_to_center(ours, order)
        np.testing.assert_allclose(rec_ours, rec_ref, atol=1e-6)


def test_projection_roundtrip():
    boxes = rand_boxes(8, 1)
    corners = B.boxes_to_corners_3d(boxes)
    T = np.eye(4)
    a = np.pi / 5
    T[:3, :3] = [[np.cos(a), -np.sin(a), 0],
                 [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    T[:3, 3] = [3, -2, 0.5]
    fwd = B.project_box3d(corners, T)
    back = B.project_box3d(fwd, np.linalg.inv(T))
    np.testing.assert_allclose(back, corners, atol=1e-9)


def test_bbox_overlaps_identity_and_disjoint():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    iou = B.bbox_overlaps(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), 1.0)
    assert iou[0, 1] == 0.0


def test_rotated_iou_analytic():
    # identical unit squares
    sq = B.boxes2d_to_corners2d(np.array([[0, 0, 2, 2, 0.0]]))
    np.testing.assert_allclose(B.rotated_iou(sq, sq), [[1.0]], atol=1e-9)
    # 45-degree rotated square inside the same square:
    # intersection is a regular octagon, area 8(sqrt(2)-1)
    rot = B.boxes2d_to_corners2d(np.array([[0, 0, 2, 2, np.pi / 4]]))
    inter = 8 * (np.sqrt(2) - 1)
    expect = inter / (4 + 4 - inter)
    np.testing.assert_allclose(B.rotated_iou(sq, rot), [[expect]],
                               atol=1e-9)
    # half-overlapping translated squares
    sh = B.boxes2d_to_corners2d(np.array([[1, 0, 2, 2, 0.0]]))
    np.testing.assert_allclose(B.rotated_iou(sq, sh), [[2 / 6]], atol=1e-9)


def test_rotated_iou_monte_carlo():
    rng = np.random.RandomState(4)
    boxes = np.zeros((6, 5))
    boxes[:, :2] = rng.uniform(-1, 1, (6, 2))
    boxes[:, 2:4] = rng.uniform(1, 3, (6, 2))
    boxes[:, 4] = rng.uniform(-np.pi, np.pi, 6)
    corners = B.boxes2d_to_corners2d(boxes)
    iou = B.rotated_iou(corners, corners)

    # Monte-Carlo oracle
    pts = rng.uniform(-4, 4, (200000, 2))

    def inside(c):
        res = np.ones(len(pts), bool)
        for e in range(4):
            a, b2 = c[e], c[(e + 1) % 4]
            cross = ((b2[0] - a[0]) * (pts[:, 1] - a[1]) -
                     (b2[1] - a[1]) * (pts[:, 0] - a[0]))
            sign = ((b2[0] - a[0]) * (c[(e + 2) % 4][1] - a[1]) -
                    (b2[1] - a[1]) * (c[(e + 2) % 4][0] - a[0]))
            res &= cross * np.sign(sign) >= 0
        return res

    ins = np.stack([inside(c) for c in corners])
    for i in range(6):
        for j in range(6):
            inter = (ins[i] & ins[j]).sum()
            union = (ins[i] | ins[j]).sum()
            if union > 500:
                np.testing.assert_allclose(iou[i, j], inter / union,
                                           atol=0.03)


def test_nms_rotated_suppresses():
    boxes = np.array([[0, 0, 2, 2, 0.0],
                      [0.1, 0, 2, 2, 0.05],     # overlaps box 0
                      [5, 5, 2, 2, 0.3]])       # far away
    corners = B.boxes2d_to_corners2d(boxes)
    scores = np.array([0.9, 0.8, 0.7])
    keep = B.nms_rotated(corners, scores, threshold=0.15)
    assert keep.tolist() == [0, 2]


def test_native_matches_numpy():
    if native_ops.get_lib() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(5)
    a = rng.uniform(0, 50, (20, 2))
    boxes = np.concatenate([a, a + rng.uniform(1, 20, (20, 2))], 1)
    q = np.concatenate([a[:7], a[:7] + rng.uniform(1, 20, (7, 2))], 1)
    np.testing.assert_allclose(native_ops.bbox_overlaps(boxes, q),
                               B.bbox_overlaps(boxes, q), atol=1e-6)
    np.testing.assert_allclose(native_ops.bbox_intersections(boxes, q),
                               B.bbox_intersections(boxes, q), atol=1e-6)

    b5 = np.zeros((12, 5))
    b5[:, :2] = rng.uniform(-5, 5, (12, 2))
    b5[:, 2:4] = rng.uniform(1, 4, (12, 2))
    b5[:, 4] = rng.uniform(-np.pi, np.pi, 12)
    corners = B.boxes2d_to_corners2d(b5)
    np.testing.assert_allclose(
        native_ops.rotated_iou(corners, corners),
        B.rotated_iou(corners, corners), atol=1e-9)

    scores = rng.rand(12)
    np.testing.assert_array_equal(
        native_ops.nms_rotated(corners, scores, 0.2),
        B.nms_rotated(corners, scores, 0.2))
