"""Grain-backed loader over the OPV2V fixture dataset."""

import numpy as np
import pytest

pytest.importorskip("grain")
cv2 = pytest.importorskip("cv2")

from tests.test_data_pipeline import write_opv2v_fixture, IMG, BEV
from cobevt_tpu.data.grain_loader import make_grain_loader
from cobevt_tpu.data.opv2v import OPV2VCameraDataset, OPV2VScenarioDatabase


def test_grain_loader_batches(tmp_path):
    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_scenarios=2, n_cavs=2, n_stamps=3)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    ds = OPV2VCameraDataset(db, image_hw=(IMG, IMG), bev_hw=(BEV, BEV))

    loader = make_grain_loader(ds, batch_size=2, shuffle=True, seed=0,
                               num_epochs=1)
    batches = list(loader)
    assert len(batches) == 3          # 6 samples / batch 2
    assert batches[0]["inputs"].shape == (2, 2, 4, IMG, IMG, 3)

    # sharding splits the index space
    shard0 = list(make_grain_loader(ds, 1, shuffle=False, num_epochs=1,
                                    shard_index=0, num_shards=2,
                                    drop_remainder=False))
    shard1 = list(make_grain_loader(ds, 1, shuffle=False, num_epochs=1,
                                    shard_index=1, num_shards=2,
                                    drop_remainder=False))
    assert len(shard0) + len(shard1) == 6

    # deterministic under a fixed seed
    a = list(make_grain_loader(ds, 2, shuffle=True, seed=5, num_epochs=1))
    b = list(make_grain_loader(ds, 2, shuffle=True, seed=5, num_epochs=1))
    np.testing.assert_array_equal(a[0]["gt_dynamic"], b[0]["gt_dynamic"])
