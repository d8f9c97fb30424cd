"""Late-fusion inference dispatch: per-CAV model runs merged in ego
space."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

cv2 = pytest.importorskip("cv2")

from tests.test_data_pipeline import write_opv2v_fixture, IMG, BEV
from tests.test_train_e2e import TINY_HYPES
from cobevt_tpu.configs.hypes import corpbevt_config_from_hypes
from cobevt_tpu.data.opv2v import OPV2VScenarioDatabase
from cobevt_tpu.data.opv2v_late import OPV2VLateFusionDataset
from cobevt_tpu.models.corpbevt import SinBEVT
from cobevt_tpu.tools.inference_utils import inference_late_fusion
from cobevt_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
)


def test_late_fusion_inference(tmp_path):
    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=2, n_stamps=1)
    db = OPV2VScenarioDatabase(root, max_cav=2)
    ds = OPV2VLateFusionDataset(db, image_hw=(IMG, IMG),
                                bev_hw=(BEV, BEV), train=False)
    per_cav = ds.test_samples(0)
    assert len(per_cav) == 2

    cfg = corpbevt_config_from_hypes(TINY_HYPES)
    model = SinBEVT(cfg)
    sample_batch = {k: np.stack([v]) for k, v in
                    list(per_cav.values())[0].items()}
    state = create_train_state(
        model, make_optimizer(optax.constant_schedule(0.0)), sample_batch)
    eval_step = make_eval_step(model)

    fused = inference_late_fusion(eval_step, state, per_cav,
                                  cfg.sttf_resolution,
                                  cfg.sttf_downsample_rate)
    assert fused["dynamic_seg"].shape == (1, 1, BEV, BEV, 2)
    probs = np.asarray(fused["dynamic_seg"])
    assert np.isfinite(probs).all()
    assert probs.max() <= 1.0 + 1e-5 and probs.min() >= 0.0
