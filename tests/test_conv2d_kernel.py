"""Fused conv3x3 Pallas kernel vs the XLA reference formulation.

Runs the kernel body in interpreter mode on CPU (same pattern as
tests/test_window_attention_kernel.py) across the ResNet stage shapes it
serves in the model, plus BN folding algebra vs flax BatchNorm.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.ops.conv2d import (
    _act_scale,
    _quantize_weight,
    _xla_reference,
    _xla_reference_int8,
    fold_bn,
    fused_conv3x3,
    fused_conv3x3_int8,
)


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 128, 128),    # layer2-like
    (2, 8, 8, 256, 256),      # layer3-like
    (1, 8, 16, 128, 64),      # non-square, O != C
])
@pytest.mark.parametrize("residual,relu", [(False, True), (True, True),
                                           (True, False)])
def test_kernel_matches_xla(shape, residual, relu):
    N, H, W, C, O = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O), jnp.float32)
    r = (jnp.asarray(rng.randn(N, H, W, O), jnp.float32)
         if residual else None)

    got = fused_conv3x3(x, w, b, r, relu=relu, interpret=True)
    want = _xla_reference(x, w, b, r, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 256, 256),    # layer3-like (the int8 gate's domain)
    (1, 8, 16, 384, 256),     # non-square, O != C
])
@pytest.mark.parametrize("residual,relu", [(False, True), (True, True),
                                           (True, False)])
def test_int8_kernel_matches_xla_twin(shape, residual, relu):
    """The interpret-mode int8 kernel must produce the SAME quantized
    integers (hence bit-equal f32 outputs) as its XLA composite twin —
    the off-TPU fallback is thereby the kernel's oracle."""
    N, H, W, C, O = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    r = (jnp.asarray(rng.randn(N, H, W, O), jnp.float32)
         if residual else None)

    got = fused_conv3x3_int8(x, w, b, r, relu=relu, interpret=True)
    w_q, s_w = _quantize_weight(w)
    want = _xla_reference_int8(x, w_q, s_w, _act_scale(x), b, r, relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_int8_drift_vs_f32_bounded():
    """Symmetric per-channel-weight / per-tensor-act PTQ error against
    the exact f32 path stays in the ~1-2%-relative band the serving
    flag advertises."""
    N, H, W, C, O = 2, 16, 16, 256, 256
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.abs(rng.randn(N, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    b = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)

    y_q = np.asarray(fused_conv3x3_int8(x, w, b, use_pallas=False))
    y_f = np.asarray(fused_conv3x3(x, w, b, use_pallas=False))
    rel = np.abs(y_q - y_f).max() / (np.abs(y_f).max() + 1e-9)
    assert rel < 0.03, rel


def test_int8_env_gate(monkeypatch):
    """COBEVT_INT8=1 routes C>=256 BasicBlocks through the quantized
    path (small, bounded drift) and leaves C=128 blocks untouched."""
    from cobevt_tpu.nn.layers import BasicBlock

    rng = np.random.RandomState(4)
    x256 = jnp.asarray(np.abs(rng.randn(2, 8, 8, 256)), jnp.float32)
    x128 = jnp.asarray(np.abs(rng.randn(2, 8, 8, 128)), jnp.float32)
    blk256 = BasicBlock(planes=256)
    blk128 = BasicBlock(planes=128)
    v256 = blk256.init(jax.random.PRNGKey(0), x256, False)
    v128 = blk128.init(jax.random.PRNGKey(0), x128, False)

    base256 = np.asarray(blk256.apply(v256, x256, False))
    base128 = np.asarray(blk128.apply(v128, x128, False))
    monkeypatch.setenv("COBEVT_INT8", "1")
    q256 = np.asarray(blk256.apply(v256, x256, False))
    q128 = np.asarray(blk128.apply(v128, x128, False))

    # C=128: gate keeps the bf16 path -> identical
    np.testing.assert_array_equal(q128, base128)
    # C=256: quantized -> small but nonzero drift
    rel = np.abs(q256 - base256).max() / (np.abs(base256).max() + 1e-9)
    assert 0 < rel < 0.03, rel


def test_fold_bn_matches_batchnorm():
    import flax.linen as nn

    rng = np.random.RandomState(1)
    C, O = 8, 16
    x = jnp.asarray(rng.randn(2, 4, 4, C), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, C, O) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(O) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(O), jnp.float32)
    mean = jnp.asarray(rng.randn(O) * 0.1, jnp.float32)
    var = jnp.asarray(rng.rand(O) + 0.2, jnp.float32)

    wf, tf_ = fold_bn(k, scale, bias, mean, var)
    got = fused_conv3x3(x, wf, tf_, relu=False, use_pallas=False)

    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                      epsilon=1e-5)
    want = bn.apply({"params": {"scale": scale, "bias": bias},
                     "batch_stats": {"mean": mean, "var": var}}, conv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_train_eval_param_tree_identical(monkeypatch):
    """BasicBlock's fused eval path must declare exactly the stock
    module tree (checkpoint-port invariant) and match it numerically."""
    from cobevt_tpu.nn.layers import BasicBlock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 128), jnp.float32)
    block = BasicBlock(planes=128)
    v_train = block.init(jax.random.PRNGKey(0), x, True)
    v_eval = block.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(v_train) == \
        jax.tree_util.tree_structure(v_eval)
    for a, b in zip(jax.tree_util.tree_leaves(v_train),
                    jax.tree_util.tree_leaves(v_eval)):
        assert a.shape == b.shape and a.dtype == b.dtype

    # same variables through both eval paths (kill-switch toggles)
    out_fused = block.apply(v_train, x, False)
    monkeypatch.setenv("COBEVT_FUSED_CONV", "0")
    out_stock = block.apply(v_train, x, False)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_stock), atol=1e-4,
                               rtol=1e-4)
