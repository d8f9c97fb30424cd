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
