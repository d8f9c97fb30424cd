"""Late-fusion dataset, merge tool, camera viz tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tests.test_data_pipeline import write_opv2v_fixture, IMG, BEV
from cobevt_tpu.data.opv2v import OPV2VScenarioDatabase
from cobevt_tpu.data.opv2v_late import OPV2VLateFusionDataset
from cobevt_tpu.geometry.boxes import boxes_to_corners_3d
from cobevt_tpu.tools.merge_dynamic_static import merge_maps
from cobevt_tpu.utils.camera_viz import (
    draw_2d_boxes,
    draw_3d_boxes,
    project_to_camera,
)


def test_late_fusion_train_and_test(tmp_path):
    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=3, n_stamps=2)
    db = OPV2VScenarioDatabase(root, max_cav=3)
    ds = OPV2VLateFusionDataset(db, image_hw=(IMG, IMG),
                                bev_hw=(BEV, BEV), train=True)
    s = ds[0]
    assert s["inputs"].shape == (1, 4, IMG, IMG, 3)
    assert s["gt_dynamic"].shape == (1, BEV, BEV)
    np.testing.assert_allclose(s["transformation_matrix"][0], np.eye(4))

    test_ds = OPV2VLateFusionDataset(db, image_hw=(IMG, IMG),
                                     bev_hw=(BEV, BEV), train=False)
    per_cav = test_ds.test_samples(0)
    assert len(per_cav) == 3
    ego_id = list(per_cav.keys())[0]
    np.testing.assert_allclose(
        per_cav[ego_id]["transformation_matrix"][0], np.eye(4),
        atol=1e-5)
    other = list(per_cav.values())[1]
    assert not np.allclose(other["transformation_matrix"][0], np.eye(4))


def test_merge_maps():
    dyn = np.zeros((8, 8), np.int64)
    sta = np.zeros((8, 8), np.int64)
    sta[2, 2] = 1
    dyn[3, 3] = 1
    img = merge_maps(dyn, sta)
    assert img.shape == (8, 8, 3)
    assert (img[3, 3] == [0, 200, 0]).all()      # vehicle on top
    assert (img[2, 2] == [110, 110, 110]).all()  # road


def test_camera_projection_and_drawing():
    boxes = np.array([[8.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]])
    corners = boxes_to_corners_3d(boxes)
    cam_pose = np.eye(4)           # camera at origin facing +x
    K = np.array([[100.0, 0, 200], [0, 100.0, 150], [0, 0, 1]])
    pix, in_front = project_to_camera(corners, cam_pose, K)
    assert in_front.all()
    # box straight ahead: projected center near the principal point
    np.testing.assert_allclose(pix.mean(axis=(0, 1)), [200, 150],
                               atol=15)

    img = np.zeros((300, 400, 3), np.uint8)
    img3 = draw_3d_boxes(img, pix, in_front)
    img2 = draw_2d_boxes(img, pix, in_front)
    assert img3.sum() > 0 and img2.sum() > 0
