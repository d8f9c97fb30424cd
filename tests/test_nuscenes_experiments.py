"""nuScenes experiment presets: every composed experiment (the Hydra
config/experiment equivalent) builds its model + criterion from config
and runs one train step; the YAML export round-trips.

Reference: nuscenes/config/experiment/*.yaml composition via
scripts/train.py:37 + common.py:16-31.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.configs.nuscenes_experiments import (
    all_nuscenes_experiments,
    build_criterion,
    build_model,
    experiment_to_dict,
    nuscenes_experiment,
)
from cobevt_tpu.models.cvt_nuscenes import CVTNuScenesConfig
from cobevt_tpu.models.sinbevt_nuscenes import PyramidAxialConfig


def _tiny_encoder(enc):
    """Shrink an experiment's encoder config to CPU-test scale while
    keeping the window-count invariant (#query windows == #feature
    windows per stage)."""
    if isinstance(enc, PyramidAxialConfig):
        return dataclasses.replace(
            enc, dim=(16, 32, 64), middle=(1, 1, 1),
            image_height=64, image_width=128,
            backbone_model="efficientnet-b0",
            heads=(1, 2, 4), dim_head=(16, 16, 16),
            q_win_size=((5, 5), (5, 5), (5, 5)),
            feat_win_size=((4, 8), (4, 8), (4, 8)),
            bev_height=40, bev_width=40, remat_backbone=False)
    assert isinstance(enc, CVTNuScenesConfig)
    return dataclasses.replace(
        enc, dim=32, middle=(1, 1), image_height=64, image_width=128,
        backbone_model="efficientnet-b0", heads=2, dim_head=16,
        bev_height=40, bev_width=40, remat_backbone=False)


def _tiny_batch(B=1, n=2, h=64, w=128, bev=40, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.zeros((B, n, 3, 3), np.float32)
    intr[..., 0, 0] = 60.0
    intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = w / 2
    intr[..., 1, 2] = h / 2
    intr[..., 2, 2] = 1.0
    return {
        "image": rng.rand(B, n, h, w, 3).astype(np.float32),
        "intrinsics": intr,
        "extrinsics": np.tile(np.eye(4, dtype=np.float32),
                              (B, n, 1, 1)),
        "bev": (rng.rand(B, bev, bev, 12) > 0.8).astype(np.float32),
        "center": rng.rand(B, bev, bev, 1).astype(np.float32),
        "visibility": rng.randint(0, 4, (B, bev, bev)).astype(np.uint8),
    }


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(all_nuscenes_experiments()))
def test_experiment_builds_and_trains_one_step(name):
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train import make_train_step

    exp = nuscenes_experiment(name)
    exp = dataclasses.replace(exp, encoder=_tiny_encoder(exp.encoder),
                              decoder_blocks=(32, 32, 16), dim_last=16)
    model = build_model(exp)
    criterion = build_criterion(exp)
    batch = _tiny_batch()

    tx = make_optimizer(1e-4, weight_decay=exp.weight_decay,
                        grad_clip=exp.grad_clip)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, criterion, donate=False)
    state, logs = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))
    # every configured loss term shows up in the logs
    for loss_name, _ in exp.losses:
        assert loss_name in logs
    # output channel slices follow the experiment spec
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}
        if state.batch_stats else {"params": state.params},
        batch, False)
    for k, (start, stop) in exp.outputs:
        assert out[k].shape == (1, 40, 40, stop - start)


def test_experiment_registry_and_export():
    names = sorted(all_nuscenes_experiments())
    assert "cvt_pyramid_axial_nuscenes_vehicle" in names
    assert "cvt_nuscenes_vehicle" in names
    with pytest.raises(KeyError):
        nuscenes_experiment("nope")

    flagship = nuscenes_experiment("cvt_pyramid_axial_nuscenes_vehicle")
    d = experiment_to_dict(flagship)
    # flagship matches the reference experiment composition
    assert d["model"]["_target_"] == "cvt_pyramid_axial"
    assert d["model"]["outputs"] == {"bev": [0, 1], "center": [1, 2]}
    assert d["data"]["label_indices"] == [[4, 5, 6, 7, 8, 10, 11]]
    assert d["loss"]["visible"]["min_visibility"] == 2
    assert d["loss"]["center"]["weight"] == 0.1
    assert d["optimizer"] == {"lr": 5e-3, "weight_decay": 1e-7}
    assert d["trainer"]["gradient_clip_val"] == 5.0

    cvt = nuscenes_experiment("cvt_nuscenes_vehicle")
    d2 = experiment_to_dict(cvt)
    assert d2["model"]["_target_"] == "cvt"
    assert d2["model"]["outputs"] == {"bev": [0, 1]}
    # dense CVT baseline uses the 2-scale b4 backbone (config/model/cvt.yaml)
    assert d2["model"]["backbone"]["layer_names"] == [
        "reduction_2", "reduction_4"]

    # YAML round-trip through the exporter CLI path
    import yaml
    assert yaml.safe_load(yaml.safe_dump(d)) == d


def test_cli_override_precedence():
    """--lr style CLI overrides replace experiment fields, mirroring
    Hydra dotted overrides."""
    exp = nuscenes_experiment("cvt_nuscenes_vehicle")
    exp2 = dataclasses.replace(exp, lr=1e-4, steps=10)
    assert exp2.lr == 1e-4 and exp2.steps == 10
    assert exp.lr == 5e-3  # frozen original untouched
