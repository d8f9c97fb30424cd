"""Monolithic fused SwapFusionEncoder kernel vs the stock module path.

Runs the Pallas program in interpreter mode on CPU
(COBEVT_FUSED_FUSION=force) against the stock sublayer path on the same
variables — masked and unmasked variants, both pooling semantics.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder


def _setup(masked, mean_over_valid, B=1, L=3, H=16, W=16, D=64, seed=0):
    rng = np.random.RandomState(seed)
    enc = SwapFusionEncoder(
        input_dim=D, mlp_dim=2 * D, agent_size=L, window_size=4,
        dim_head=32, dropout=0.0, depth=2, mask=masked,
        mean_over_valid=mean_over_valid)
    x = jnp.asarray(rng.randn(B, L, H, W, D), jnp.float32)
    mask = jnp.asarray(
        (rng.rand(B, L, H, W) > 0.3).astype(np.float32))
    # every window keeps at least one live key (all-masked windows are
    # NaN in both paths and unreachable in the model: agent 0 is ego)
    mask = mask.at[:, 0].set(1.0)
    agent_mask = jnp.asarray([[1.0, 1.0, 0.0]])
    return enc, x, mask, agent_mask


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("mean_over_valid", [False, True])
def test_fused_matches_stock(masked, mean_over_valid, monkeypatch):
    enc, x, mask, agent_mask = _setup(masked, mean_over_valid)
    variables = enc.init(jax.random.PRNGKey(0), x, mask, True,
                         agent_mask=agent_mask)

    monkeypatch.setenv("COBEVT_FUSED_FUSION", "0")
    want = enc.apply(variables, x, mask, False, agent_mask=agent_mask)

    monkeypatch.setenv("COBEVT_FUSED_FUSION", "force")
    got = enc.apply(variables, x, mask, False, agent_mask=agent_mask)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_param_tree_identical(monkeypatch):
    enc, x, mask, agent_mask = _setup(True, False)
    v_train = enc.init(jax.random.PRNGKey(0), x, mask, True,
                       agent_mask=agent_mask)
    monkeypatch.setenv("COBEVT_FUSED_FUSION", "force")
    v_eval = enc.init(jax.random.PRNGKey(0), x, mask, False,
                      agent_mask=agent_mask)
    assert jax.tree_util.tree_structure(v_train) == \
        jax.tree_util.tree_structure(v_eval)
    for a, b in zip(jax.tree_util.tree_leaves(v_train),
                    jax.tree_util.tree_leaves(v_eval)):
        assert a.shape == b.shape


@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("dim,dim_head", [(128, 32), (256, 32)])
def test_streaming_matches_stock(masked, dim, dim_head, monkeypatch):
    """The streaming (window-at-a-time) kernel vs the stock module path,
    kernel body in interpreter mode on CPU.  dim=256/dim_head=32 takes
    the grouped block-diagonal branch (2x 128-channel groups); 128/32
    the ungrouped one."""
    rng = np.random.RandomState(1)
    B, L, H, W = 1, 3, 16, 16
    enc = SwapFusionEncoder(
        input_dim=dim, mlp_dim=2 * dim, agent_size=L, window_size=8,
        dim_head=dim_head, dropout=0.0, depth=2, mask=masked)
    x = jnp.asarray(rng.randn(B, L, H, W, dim), jnp.float32)
    mask = jnp.asarray((rng.rand(B, L, H, W) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    variables = enc.init(jax.random.PRNGKey(0), x, mask, True)

    monkeypatch.setenv("COBEVT_FUSED_FUSION", "0")
    want = enc.apply(variables, x, mask, False)

    import cobevt_tpu.models.fusion.swap_fusion as sf

    calls = []
    orig = sf.fused_swap_fusion_streaming

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sf, "fused_swap_fusion_streaming", spy)
    monkeypatch.setenv("COBEVT_FUSED_FUSION", "force-stream")
    got = enc.apply(variables, x, mask, False)
    assert calls, "streaming kernel path was not taken"

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("B", [1, 2])
def test_streaming_mean_over_valid(B, monkeypatch):
    """Streaming kernel with the valid-agent pooling semantics, incl.
    batch > 1 (the mask block index map multiplies grid coords)."""
    rng = np.random.RandomState(2)
    L, H, W, dim = 3, 16, 16, 128
    enc = SwapFusionEncoder(
        input_dim=dim, mlp_dim=2 * dim, agent_size=L, window_size=8,
        dim_head=32, dropout=0.0, depth=1, mask=True,
        mean_over_valid=True)
    x = jnp.asarray(rng.randn(B, L, H, W, dim), jnp.float32)
    mask = jnp.asarray((rng.rand(B, L, H, W) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)
    agent_mask = jnp.asarray([[1.0, 1.0, 0.0]] * B)
    variables = enc.init(jax.random.PRNGKey(0), x, mask, True,
                         agent_mask=agent_mask)

    monkeypatch.setenv("COBEVT_FUSED_FUSION", "0")
    want = enc.apply(variables, x, mask, False, agent_mask=agent_mask)

    monkeypatch.setenv("COBEVT_FUSED_FUSION", "force-stream")
    got = enc.apply(variables, x, mask, False, agent_mask=agent_mask)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=3e-4)
