"""int8-resident layer1 serving path (ops/int8_chain.py).

Under COBEVT_INT8=1 the ResNet trunk's layer1 (the bandwidth-bound
narrow stage) runs int8-RESIDENT: quantize once at region entry,
s8 x s8 -> s32 convs with fused requantize, dequantize in the last
conv's epilogue.  These tests pin (a) the region's accuracy against
the stock bf16 trunk, (b) the flag-off path staying bitwise untouched,
(c) the parameter-tree contract (same checkpoint serves both paths),
and (d) the conv3x3_s8 primitive against its f32 reference.
Reference parity target: torchvision resnet layer1 as used by
opv2v/opencood/models/backbones/resnet_ms.py:8.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cobevt_tpu.nn.resnet import ResNetTrunk
from cobevt_tpu.ops.int8_chain import (
    conv3x3_s8,
    quantize_dynamic,
    quantize_kernel_per_out,
)


def _trunk_and_input(num_layers=34, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, 64, 64, 3) * 0.5, jnp.bfloat16)
    m = ResNetTrunk(num_layers, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(seed), x, False)
    return m, v, x


def test_conv3x3_s8_matches_f32_reference():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    t = jnp.asarray(rng.randn(64) * 0.05, jnp.float32)

    xq, sx = quantize_dynamic(x)
    wq, sw = quantize_kernel_per_out(w)
    got = np.asarray(conv3x3_s8(xq, sx, wq, sw, t, relu=True,
                                out_dtype=jnp.float32))

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + t
    ref = np.asarray(jax.nn.relu(ref))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.03, rel


def test_conv3x3_s8_residual_and_requant_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    res = jnp.asarray(np.abs(rng.randn(2, 8, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    t = jnp.asarray(rng.randn(64) * 0.05, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + t + res
    ref = np.asarray(jax.nn.relu(ref))

    xq, sx = quantize_dynamic(x)
    rq, sr = quantize_dynamic(res)
    wq, sw = quantize_kernel_per_out(w)
    s_out = float(np.abs(ref).max()) / 127.0  # calibration-style scale
    yq = conv3x3_s8(xq, sx, wq, sw, t, relu=True, out_scale=s_out,
                    residual_q=rq, residual_scale=sr)
    assert yq.dtype == jnp.int8
    got = np.asarray(yq, np.float32) * s_out
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_trunk_int8_region_accuracy(monkeypatch):
    """Whole-trunk drift with the int8-resident layer1 stays within the
    lossy-serving budget at every pyramid stage (random-init worst
    case; the HW gate in validate_kernels adds the argmax-IoU check)."""
    m, v, x = _trunk_and_input()
    ref = m.apply(v, x, False)
    monkeypatch.setenv("COBEVT_INT8", "1")
    got = m.apply(v, x, False)
    for i, (a, b) in enumerate(zip(ref, got)):
        assert b.dtype == a.dtype and b.shape == a.shape
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.06, (i, rel)


def test_trunk_flag_off_is_bitwise_stock(monkeypatch):
    m, v, x = _trunk_and_input(seed=3)
    ref = m.apply(v, x, False)
    monkeypatch.setenv("COBEVT_INT8", "1")
    monkeypatch.setenv("COBEVT_INT8_RESIDENT", "0")
    # resident lever off -> layer1 must be bitwise the stock path
    got = m.apply(v, x, False)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    monkeypatch.delenv("COBEVT_INT8")
    monkeypatch.delenv("COBEVT_INT8_RESIDENT")
    got2 = m.apply(v, x, False)
    for a, b in zip(ref, got2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_tree_identical_across_paths(monkeypatch):
    """Init under the flag must produce the same tree as stock init —
    one checkpoint serves both paths."""
    m, v, x = _trunk_and_input(seed=4)
    monkeypatch.setenv("COBEVT_INT8", "1")
    v_q = ResNetTrunk(34, dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(4), x, False)
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(v_q))


def test_bottleneck_trunk_unaffected(monkeypatch):
    """ResNet-50 layer1 carries a downsample projection — the resident
    region must not activate there (the C>=256 int8 kernel is a
    separate lever, so compare RESIDENT on vs off under the flag)."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 32, 32, 3) * 0.5, jnp.bfloat16)
    m = ResNetTrunk(50, dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(5), x, False)
    monkeypatch.setenv("COBEVT_INT8", "1")
    monkeypatch.setenv("COBEVT_INT8_RESIDENT", "0")
    ref = m.apply(v, x, False)
    monkeypatch.setenv("COBEVT_INT8_RESIDENT", "1")
    got = m.apply(v, x, False)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
