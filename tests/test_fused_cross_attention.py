"""Fused cross-view attention kernel vs the stock composite.

Interpret-mode Pallas (CPU) against the XLA composite, and the
composite against the live CrossViewSwapAttention module path — so the
TPU kernel, the CPU fallback, and the stock module are pinned to the
same numbers (reference fax_modules.py:179-259 semantics).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.ops.fused_cross_attention import (
    _xla_composite,
    fused_cross_view_attention,
)


def _setup(B=2, n=4, H=32, W=32, D=128, C=128, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    f32 = jnp.float32
    x = jnp.asarray(rng.randn(B, H, W, D), f32)
    wemb = jnp.asarray(rng.randn(H, W, D), f32)
    cemb = jnp.asarray(rng.randn(B, n, D), f32)
    key = jnp.asarray(rng.randn(B, n, h, w, D), f32)
    val = jnp.asarray(rng.randn(B, n, h, w, D), f32)

    def ln():
        return (jnp.asarray(rng.rand(D) + 0.5, f32),
                jnp.asarray(rng.randn(D) * 0.1, f32))

    params = dict(
        ln_q=ln(), ln_k=ln(), ln_v=ln(),
        wq=jnp.asarray(rng.randn(D, C) * 0.05, f32),
        bq=jnp.asarray(rng.randn(C) * 0.1, f32),
        wk=jnp.asarray(rng.randn(D, C) * 0.05, f32),
        bk=jnp.asarray(rng.randn(C) * 0.1, f32),
        wv=jnp.asarray(rng.randn(D, C) * 0.05, f32),
        bv=jnp.asarray(rng.randn(C) * 0.1, f32),
        wo=jnp.asarray(rng.randn(C, D) * 0.05, f32),
        bo=jnp.asarray(rng.randn(D) * 0.1, f32),
    )
    return x, wemb, cemb, key, val, params


@pytest.mark.parametrize("embed", [True, False])
@pytest.mark.parametrize("add_skip", [True, False])
@pytest.mark.parametrize("tail", [False, True])
def test_kernel_matches_composite(embed, add_skip, tail):
    x, wemb, cemb, key, val, params = _setup()
    rng = np.random.RandomState(7)
    D, hidden = 128, 256
    mlp = post_ln = None
    if tail:
        mlp = {"ln": (jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                      jnp.asarray(rng.randn(D) * 0.1, jnp.float32)),
               "w1": jnp.asarray(rng.randn(D, hidden) * 0.05,
                                 jnp.float32),
               "b1": jnp.asarray(rng.randn(hidden) * 0.1, jnp.float32),
               "w2": jnp.asarray(rng.randn(hidden, D) * 0.05,
                                 jnp.float32),
               "b2": jnp.asarray(rng.randn(D) * 0.1, jnp.float32)}
        post_ln = (jnp.asarray(rng.rand(D) + 0.5, jnp.float32),
                   jnp.asarray(rng.randn(D) * 0.1, jnp.float32))
    args = (x, wemb if embed else None, cemb if embed else None,
            key, val, params, (8, 8), (4, 4), 4, 32.0 ** -0.5, add_skip)
    got = fused_cross_view_attention(*args, mlp=mlp, post_ln=post_ln,
                                     interpret=True)
    want = _xla_composite(*args[:-1], add_skip, jnp.float32, mlp,
                          post_ln)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_composite_matches_module_path(monkeypatch):
    """The stage forward with the fused branch (CPU fallback = the
    composite) must equal the stock CrossWinAttention branch on the
    same variables."""
    from cobevt_tpu.models.fax import CrossViewSwapAttention

    rng = np.random.RandomState(3)
    b, n, h, w = 2, 4, 16, 16
    H = Wd = 32
    stage = CrossViewSwapAttention(
        feat_height=h, feat_width=w, feat_dim=64, dim=128,
        image_height=128, image_width=128, qkv_bias=True, heads=4,
        dim_head=32, q_win_size=(8, 8), feat_win_size=(4, 4),
        bev_embed_flag=True)
    x = jnp.asarray(rng.randn(b, H, Wd, 128), jnp.float32)
    world = jnp.asarray(rng.randn(H, Wd, 2), jnp.float32)
    feat = jnp.asarray(rng.randn(b, n, h, w, 64), jnp.float32)
    I_inv = jnp.tile(jnp.eye(3), (b, n, 1, 1)).astype(jnp.float32)
    E_inv = jnp.tile(jnp.eye(4), (b, n, 1, 1)).astype(jnp.float32)

    variables = stage.init(jax.random.PRNGKey(0), x, world, feat, I_inv,
                           E_inv, False)
    out_fused = stage.apply(variables, x, world, feat, I_inv, E_inv,
                            False)
    monkeypatch.setenv("COBEVT_FUSED_XATTN", "0")
    out_stock = stage.apply(variables, x, world, feat, I_inv, E_inv,
                            False)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_stock), atol=1e-4,
                               rtol=1e-4)
    # both paths declare the same tree (checkpoint-port invariant)
    monkeypatch.delenv("COBEVT_FUSED_XATTN")
    v2 = stage.init(jax.random.PRNGKey(0), x, world, feat, I_inv, E_inv,
                    True)
    assert jax.tree_util.tree_structure(v2) == \
        jax.tree_util.tree_structure(variables)


def test_gradients_flow_through_fused_path():
    """Training uses the fused path (custom VJP: pallas forward,
    composite backward).  Gradients must match differentiating the
    composite directly and be finite."""
    x, wemb, cemb, key, val, params = _setup()

    def loss_fused(p, xx):
        out = fused_cross_view_attention(
            xx, wemb, cemb, key, val, p, (8, 8), (4, 4), 4,
            32.0 ** -0.5, True, interpret=True)
        return (out.astype(jnp.float32) ** 2).mean()

    def loss_comp(p, xx):
        out = _xla_composite(xx, wemb, cemb, key, val, p, (8, 8),
                             (4, 4), 4, 32.0 ** -0.5, True, jnp.float32)
        return (out.astype(jnp.float32) ** 2).mean()

    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    gp_c, gx_c = jax.grad(loss_comp, argnums=(0, 1))(params, x)
    # the VJP recomputes the composite, so grads agree up to the tiny
    # forward-output difference feeding the loss cotangent
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_c),
                               atol=1e-4, rtol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(gp_f),
                    jax.tree_util.tree_leaves(gp_c)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
