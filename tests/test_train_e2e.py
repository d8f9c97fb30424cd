"""End-to-end minimum slice: synthetic OPV2V fixture -> hypes yaml ->
model/loss/optimizer from config -> Trainer.fit -> checkpoint -> resume ->
evaluate.  This is the integration test the reference never had."""

import os

import numpy as np
import pytest
import yaml

cv2 = pytest.importorskip("cv2")

from tests.test_data_pipeline import write_opv2v_fixture, IMG, BEV

TINY_HYPES = {
    "name": "tiny_corpbevt",
    "train_params": {"batch_size": 2, "epoches": 1, "eval_freq": 1,
                     "save_freq": 1, "max_cav": 3, "visible": True},
    # reference-required dataset dispatch block (corpbevt.yaml:17-19)
    "fusion": {"core_method": "CamIntermediateFusionDataset", "args": []},
    "preprocess": {
        "core_method": "RgbPreprocessor",
        "args": {"bgr2rgb": True, "resize_x": IMG, "resize_y": IMG,
                 "mean": [0.485, 0.456, 0.406],
                 "std": [0.229, 0.224, 0.225]},
        "cav_lidar_range": [-50, -50, -3, 50, 50, 1],
    },
    "model": {"core_method": "corpbevt", "args": {
        "target": "dynamic", "max_cav": 3,
        "encoder": {"num_layers": 18, "pretrained": False,
                    "image_width": IMG, "image_height": IMG,
                    "id_pick": [1, 2, 3]},
        "compression": 0,
        "decoder": {"input_dim": 32, "num_layer": 3,
                    "num_ch_dec": [16, 24, 32]},
        "fax": {
            "dim": [32, 32, 32], "middle": [1, 1, 1],
            "bev_embedding": {"sigma": 1.0, "bev_height": BEV,
                              "bev_width": BEV, "h_meters": 100,
                              "w_meters": 100, "offset": 0.0,
                              "upsample_scales": [2, 4, 8]},
            "cross_view": {"image_height": IMG, "image_width": IMG,
                           "no_image_features": False, "skip": True,
                           "heads": [2, 2, 2], "dim_head": [16, 16, 16],
                           "qkv_bias": True},
            "cross_view_swap": {"rel_pos_emb": False,
                                "q_win_size": [[4, 4], [4, 4], [4, 4]],
                                "feat_win_size": [[2, 2], [2, 2], [2, 2]],
                                "bev_embedding_flag": [True, False,
                                                       False]},
            "self_attn": {"dim_head": 16, "dropout": 0.0,
                          "window_size": 4},
        },
        "sttf": {"resolution": 0.8, "downsample_rate": 4,
                 "use_roi_mask": True},
        "fax_fusion": {"input_dim": 32, "mlp_dim": 32, "agent_size": 3,
                       "window_size": 2, "dim_head": 8, "drop_out": 0.0,
                       "depth": 1, "mask": True},
        "seg_head_dim": 16, "output_class": 2,
    }},
    "loss": {"core_method": "vanilla_seg_loss",
             "args": {"target": "dynamic", "d_weights": 75.0,
                      "s_weights": 15.0, "d_coe": 2.0, "s_coe": 0.0}},
    "optimizer": {"core_method": "AdamW", "lr": 2e-4,
                  "args": {"eps": 1e-10, "weight_decay": 1e-2}},
    "lr_scheduler": {"core_method": "cosineannealwarm", "epoches": 1,
                     "warmup_lr": 2e-5, "warmup_epoches": 0,
                     "lr_min": 5e-6},
}


@pytest.mark.slow
def test_train_eval_resume_cycle(tmp_path, monkeypatch):
    import sys

    root = str(tmp_path / "train")
    write_opv2v_fixture(root, n_scenarios=1, n_cavs=3, n_stamps=4)
    hypes = dict(TINY_HYPES)
    hypes["root_dir"] = root
    hypes["validate_dir"] = root
    hypes_path = str(tmp_path / "tiny.yaml")
    with open(hypes_path, "w") as f:
        yaml.safe_dump(hypes, f)

    save_dir = str(tmp_path / "run")
    monkeypatch.setattr(
        sys, "argv",
        ["train_camera", "--hypes_yaml", hypes_path,
         "--save_dir", save_dir])
    from cobevt_tpu.tools import train_camera
    train_camera.main()

    # checkpoint + config snapshot exist
    assert os.path.exists(os.path.join(save_dir, "config.yaml"))
    ckpt_dir = os.path.join(save_dir, "ckpt")
    from cobevt_tpu.train.checkpoint import latest_step
    assert latest_step(ckpt_dir) is not None

    # inference CLI over the checkpoint
    monkeypatch.setattr(sys, "argv",
                        ["inference_camera", "--model_dir", save_dir])
    from cobevt_tpu.tools import inference_camera
    inference_camera.main()


def test_bev_label_geometry_consistency():
    """gt label maps feed the loss at decoder output resolution."""
    from cobevt_tpu.configs.hypes import corpbevt_config_from_hypes

    cfg = corpbevt_config_from_hypes(TINY_HYPES)
    final_bev = cfg.fax.bev_height // cfg.fax.upsample_scales[-1]
    out = final_bev * (2 ** cfg.decoder_num_layer)
    assert out == BEV


@pytest.mark.slow
def test_overfit_single_batch():
    """Learning sanity: 25 optimizer steps on one tiny batch should cut
    the loss substantially (catches dead gradients / wrong label
    wiring)."""
    import jax
    import jax.numpy as jnp

    from cobevt_tpu.configs.hypes import corpbevt_config_from_hypes
    from cobevt_tpu.losses import VanillaSegLoss
    from cobevt_tpu.models.corpbevt import SinBEVT
    from cobevt_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    import optax

    cfg = corpbevt_config_from_hypes(TINY_HYPES)
    model = SinBEVT(cfg)
    rng = np.random.RandomState(0)
    intr = np.zeros((1, 1, 2, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = intr[..., 1, 2] = IMG / 2
    intr[..., 2, 2] = 1.0
    batch = {
        "inputs": jnp.asarray(
            rng.rand(1, 1, 2, IMG, IMG, 3).astype(np.float32)),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (1, 1, 2, 1, 1))),
        "gt_dynamic": jnp.asarray(rng.randint(0, 2, (1, 1, BEV, BEV))),
        "gt_static": jnp.asarray(rng.randint(0, 2, (1, 1, BEV, BEV))),
    }
    seg = VanillaSegLoss(target="dynamic", d_weights=2.0, d_coe=1.0)

    def crit(out, b):
        return seg(out, {"gt_dynamic": b["gt_dynamic"],
                         "gt_static": b["gt_static"]})

    tx = make_optimizer(optax.constant_schedule(2e-3), weight_decay=0.0,
                        eps=1e-8)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, crit, donate=False)
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(25):
        state, logs = step(state, batch, jax.random.fold_in(key, i))
        if first is None:
            first = float(logs["loss"])
    last = float(logs["loss"])
    assert last < 0.6 * first, (first, last)
