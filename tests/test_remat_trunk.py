"""Gradient-checkpointed ResNet trunk: numerics identical to stock.

`encoder_remat` (CorpBEVTConfig) rematerializes the trunk blocks in the
backward — a training-only memory/batch-scaling lever (docs/DESIGN.md
round 4). Remat must not change the math: loss and per-leaf gradients
match the stock backward to float tolerance, and eval is untouched.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cobevt_tpu.losses import VanillaSegLoss
from cobevt_tpu.models.corpbevt import CorpBEVT
from cobevt_tpu.train import create_train_state, make_optimizer, make_train_step

from tests.test_train_multichip import tiny_batch, tiny_config


def _loss_and_grads(remat, batch):
    cfg = dataclasses.replace(tiny_config(max_cav=2), encoder_remat=remat)
    model = CorpBEVT(cfg)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch, True)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        leaves = jax.tree.leaves(out)
        return sum(jnp.mean(l.astype(jnp.float32) ** 2) for l in leaves)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    return float(loss), grads


@pytest.mark.slow
def test_remat_grad_parity():
    batch = tiny_batch(B=2, L=2, M=1)
    l0, g0 = _loss_and_grads(False, batch)
    l1, g1 = _loss_and_grads(True, batch)
    assert np.isclose(l0, l1, rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    for path, v0 in flat0:
        v1 = flat1[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))


def test_encoder_remat_reachable_from_hypes():
    from cobevt_tpu.configs.hypes import model_config_from_hypes
    from cobevt_tpu.tools.export_config import export_preset
    hypes = export_preset("corpbevt")
    _, cfg0 = model_config_from_hypes(hypes)
    assert cfg0.encoder_remat is False
    hypes["model"]["args"]["encoder"]["remat"] = True
    _, cfg1 = model_config_from_hypes(hypes)
    assert cfg1.encoder_remat is True


@pytest.mark.slow
def test_fused_xattn_train_parity(monkeypatch):
    """COBEVT_FUSED_XATTN_TRAIN=1 (train step through the fused
    cross-view stages, composite-recompute backward) must match the
    stock-module train path: same param tree, close loss and grads
    (the fused VJP recomputes the same composite chain)."""
    batch = tiny_batch(B=2, L=2, M=1)
    l0, g0 = _loss_and_grads(False, batch)
    monkeypatch.setenv("COBEVT_FUSED_XATTN_TRAIN", "1")
    l1, g1 = _loss_and_grads(False, batch)
    assert np.isclose(l0, l1, rtol=1e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g1)}
    assert len(flat0) == len(flat1)
    gnorm = float(np.sqrt(sum(
        float(np.vdot(np.asarray(v), np.asarray(v))) for _, v in flat0)))
    for path, v0 in flat0:
        v1 = flat1[jax.tree_util.keystr(path)]
        a0, a1 = np.asarray(v0, np.float64), np.asarray(v1, np.float64)
        # per-leaf: tight when the leaf is material, bounded-noise when
        # its norm is tiny relative to the global gradient
        if np.linalg.norm(a0) > 1e-3 * gnorm:
            np.testing.assert_allclose(
                a1, a0, rtol=5e-3, atol=1e-5,
                err_msg=jax.tree_util.keystr(path))
        else:
            assert np.linalg.norm(a1 - a0) < 1e-2 * gnorm + 1e-5, \
                jax.tree_util.keystr(path)


def test_grad_norm_logging_optional():
    batch = tiny_batch(B=2, L=2, M=1)
    model = CorpBEVT(tiny_config(max_cav=2))
    criterion = VanillaSegLoss(d_weights=10.0, s_weights=1.0,
                               target="dynamic")

    def crit(out, b):
        return criterion(out, b)

    import optax
    tx = make_optimizer(optax.constant_schedule(1e-4))
    state = create_train_state(model, tx, batch)
    step_on = make_train_step(model, crit, donate=False)
    step_off = make_train_step(model, crit, donate=False,
                               log_grad_norm=False)
    _, logs_on = step_on(state, batch, jax.random.PRNGKey(0))
    _, logs_off = step_off(state, batch, jax.random.PRNGKey(0))
    assert "grad_norm" in logs_on and "grad_norm" not in logs_off
    assert np.isclose(float(logs_on["loss"]), float(logs_off["loss"]))
