"""Smoke + shape tests for every registered top-level model graph."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.models.camera_bev_models import (
    CameraBEVConfig,
    CameraBEVModel,
    create_model,
    MODEL_REGISTRY,
)
from cobevt_tpu.models.cvt_dense import CVTModuleConfig

B, L, M, IMG = 1, 2, 2, 64


def tiny_cfg(fusion):
    cvm = CVTModuleConfig(
        dim=16, middle=(1, 1), image_height=IMG, image_width=IMG,
        heads=2, dim_head=8, bev_height=32, bev_width=32,
        decoder_blocks=3)
    return CameraBEVConfig(
        max_cav=L, encoder_num_layers=18, encoder_id_pick=(1, 3),
        image_height=IMG, image_width=IMG, cvm=cvm, fusion=fusion,
        sttf_resolution=0.8, sttf_downsample_rate=4,
        att_depth=1, att_heads=2, att_dim_head=8, att_mlp_dim=16,
        swap_mlp_dim=16, swap_window_size=2, swap_dim_head=8,
        swap_depth=1, graph_num_iteration=1,
        decoder_num_layer=3, decoder_num_ch=(8, 12, 16),
        seg_head_dim=8, output_class=2)


def tiny_batch(seed=0):
    rng = np.random.RandomState(seed)
    intr = np.zeros((B, L, M, 3, 3), np.float32)
    intr[..., 0, 0] = 60.0
    intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = IMG / 2
    intr[..., 1, 2] = IMG / 2
    intr[..., 2, 2] = 1.0
    return {
        "inputs": jnp.asarray(
            rng.rand(B, L, M, IMG, IMG, 3).astype(np.float32)),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "pairwise_t_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, L, 1, 1))),
        "agent_mask": jnp.asarray(np.array([[1.0, 1.0]], np.float32)),
    }


@pytest.mark.parametrize("fusion", ["none", "att", "swap", "max",
                                    "v2vnet", "disconet"])
def test_cvt_variant_forward(fusion):
    model = CameraBEVModel(tiny_cfg(fusion))
    batch = tiny_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    expected_l = L if fusion == "none" else 1
    # BEV grid 32/2^3=4, decoder x8 -> 32
    assert out["dynamic_seg"].shape == (B, expected_l, 32, 32, 2)
    assert np.isfinite(np.asarray(out["dynamic_seg"])).all()


def test_registry_dispatch():
    assert set(MODEL_REGISTRY) == {
        "corpbevt", "fax", "cvt", "cvt_att_fuse", "cvt_swap_fuse",
        "cvt_fcooper", "cvt_v2vnet", "cvt_disconet"}
    with pytest.raises(KeyError):
        create_model("nope")


def test_corpbevt_with_compression():
    """V2V bandwidth-compression path (NaiveCompressor) runs and alters
    features."""
    import dataclasses

    from tests.test_train_multichip import tiny_batch, tiny_config
    from cobevt_tpu.models.corpbevt import CorpBEVT

    cfg = dataclasses.replace(tiny_config(max_cav=2), compression=2)
    model = CorpBEVT(cfg)
    batch = tiny_batch(B=1, L=2)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    assert "naive_compressor" in variables["params"]
    out = model.apply(variables, batch, False)
    assert np.isfinite(np.asarray(out["dynamic_seg"])).all()
