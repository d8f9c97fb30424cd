"""Pallas fused window attention: interpret-mode kernel vs XLA reference
(this exercises the real kernel body on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from cobevt_tpu.ops.window_attention import (
    _xla_reference,
    fused_window_attention,
)


def data(G=4, H=2, Tq=32, Tk=48, D=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(G, H, Tq, D).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(G, H, Tk, D).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(G, H, Tk, D).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.randn(H, Tq, Tk).astype(np.float32) * 0.5)
    mask = jnp.asarray((rng.rand(G, Tk) > 0.3).astype(np.float32))
    # guarantee at least one valid key per group
    mask = mask.at[:, 0].set(1.0)
    return q, k, v, bias, mask


@pytest.mark.parametrize("use_bias,use_mask", [(False, False),
                                               (True, False),
                                               (False, True),
                                               (True, True)])
def test_kernel_interpret_matches_xla(use_bias, use_mask):
    q, k, v, bias, mask = data()
    b = bias if use_bias else None
    m = mask if use_mask else None
    ref = _xla_reference(q, k, v, b, m)
    out = fused_window_attention(q, k, v, b, m, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_kernel_query_blocking():
    # Tq large enough to trigger the query-axis blocking path
    q, k, v, bias, mask = data(G=2, H=1, Tq=4096, Tk=512)
    ref = _xla_reference(q, k, v, None, None)
    out = fused_window_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("use_bias,use_mask", [(False, False),
                                               (True, True)])
def test_kernel_gradients_match_xla(use_bias, use_mask):
    import jax

    q, k, v, bias, mask = data(G=2, H=2, Tq=16, Tk=24)
    b = bias if use_bias else None
    m = mask if use_mask else None

    def loss_fused(q, k, v, b):
        out = fused_window_attention(q, k, v, b, m, interpret=True)
        return (out ** 2).sum()

    def loss_ref(q, k, v, b):
        out = _xla_reference(q, k, v, b, m)
        return (out ** 2).sum()

    args = (q, k, v, b) if use_bias else (q, k, v, None)
    argnums = (0, 1, 2, 3) if use_bias else (0, 1, 2)
    gf = jax.grad(loss_fused, argnums)(q, k, v, b)
    gr = jax.grad(loss_ref, argnums)(q, k, v, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-4, rtol=1e-3)
