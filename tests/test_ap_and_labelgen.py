"""Detection AP and nuScenes label-generation core tests."""

import numpy as np
import pytest

from cobevt_tpu.geometry.boxes import boxes2d_to_corners2d
from cobevt_tpu.geometry.transforms import get_view_matrix
from cobevt_tpu.metrics.detection_ap import (
    accumulate_tp_fp,
    calculate_ap,
    new_result_stat,
    voc_ap,
)

cv2 = pytest.importorskip("cv2")

from cobevt_tpu.data.nuscenes_labelgen import (
    project_box_footprints,
    rasterize_polygons,
    render_center_offset,
    render_dynamic_layers,
    render_visibility,
    save_scene_labels,
)


def test_voc_ap_perfect_detector():
    stat = new_result_stat((0.5,))
    gt = boxes2d_to_corners2d(np.array([[0, 0, 4, 2, 0.1],
                                        [10, 10, 4, 2, -0.3]]))
    det = gt.copy()
    accumulate_tp_fp(det, np.array([0.9, 0.8]), gt, stat, 0.5)
    ap, _, _ = calculate_ap(stat, 0.5)
    np.testing.assert_allclose(ap, 1.0, atol=1e-9)


def test_voc_ap_with_false_positives():
    stat = new_result_stat((0.5,))
    gt = boxes2d_to_corners2d(np.array([[0, 0, 4, 2, 0.0]]))
    det = boxes2d_to_corners2d(np.array([[0, 0, 4, 2, 0.0],
                                         [50, 50, 4, 2, 0.0]]))
    accumulate_tp_fp(det, np.array([0.9, 0.95]), gt, stat, 0.5)
    ap, _, _ = calculate_ap(stat, 0.5)
    # highest-scored detection is a miss: precision at recall 1 is 0.5
    np.testing.assert_allclose(ap, 0.5, atol=1e-9)


def test_matching_consumes_gt():
    """Two detections on one GT: only the best-scored one is a TP."""
    stat = new_result_stat((0.5,))
    gt = boxes2d_to_corners2d(np.array([[0, 0, 4, 2, 0.0]]))
    det = boxes2d_to_corners2d(np.array([[0, 0, 4, 2, 0.0],
                                         [0.2, 0, 4, 2, 0.0]]))
    accumulate_tp_fp(det, np.array([0.9, 0.8]), gt, stat, 0.5)
    assert stat[0.5]["tp"] == [1, 0]
    assert stat[0.5]["fp"] == [0, 1]


def test_rasterize_polygons_and_boxes():
    view = get_view_matrix(100, 100, 50.0, 50.0, 0.0)
    # a 10x10m square centered at the ego
    square = np.array([[-5, -5], [5, -5], [5, 5], [-5, 5]], np.float64)
    mask = rasterize_polygons([square], view, (100, 100))
    area = (mask > 0).sum()
    assert 350 < area < 500          # ~20x20 px footprint

    # box footprint projection: identity world->ego
    corners_world = np.array([[[-2, -1, 0], [2, -1, 0], [2, 1, 0],
                               [-2, 1, 0]]], np.float64)
    pix = project_box_footprints(corners_world, view, np.eye(4))
    dyn = render_dynamic_layers(pix, (100, 100))
    assert (dyn > 0).sum() > 10
    # center of mass near grid center
    ys, xs = np.nonzero(dyn)
    np.testing.assert_allclose([ys.mean(), xs.mean()], [49.5, 49.5],
                               atol=2.0)

    aux = render_center_offset(pix, (100, 100))
    assert aux.shape == (100, 100, 2)
    assert aux[..., 1].max() > 0.9

    vis = render_visibility(pix, [3], (100, 100))
    assert (vis == 3).sum() > 10 and (vis == 255).sum() > 9000


def test_save_and_reload_scene(tmp_path):
    from cobevt_tpu.data.nuscenes_gen import (
        ImageConfig,
        NuScenesGeneratedDataset,
    )
    from PIL import Image

    rng = np.random.RandomState(0)
    ddir = tmp_path / "data"
    ddir.mkdir()
    img_path = "cam0.jpg"
    Image.fromarray(rng.randint(0, 255, (60, 120, 3),
                                np.uint8)).save(ddir / img_path)
    samples = [{
        "token": "t0", "images": [img_path],
        "intrinsics": [np.eye(3).tolist()],
        "extrinsics": [np.eye(4).tolist()],
        "view": get_view_matrix().tolist(),
        "bev": (rng.rand(32, 32, 12) > 0.8).astype(np.uint8) * 255,
        "aux": rng.rand(32, 32, 2),
        "visibility": rng.randint(0, 5, (32, 32)).astype(np.uint8),
    }]
    save_scene_labels("scene-x", samples, str(tmp_path / "labels"))
    ds = NuScenesGeneratedDataset("scene-x", str(ddir),
                                  str(tmp_path / "labels"),
                                  ImageConfig(h=32, w=64, top_crop=4))
    s = ds[0]
    np.testing.assert_array_equal(
        s["bev"], (samples[0]["bev"] > 0).astype(np.float32))
    assert s["center"].shape == (32, 32, 1)
