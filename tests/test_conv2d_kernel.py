"""Fused conv3x3 Pallas kernel vs the XLA reference formulation.

Runs the kernel body in interpreter mode on CPU (same pattern as
tests/test_window_attention_kernel.py) across the ResNet stage shapes it
serves in the model, plus BN folding algebra vs flax BatchNorm.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.ops.conv2d import fold_bn, fused_conv3x3, _xla_reference


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
