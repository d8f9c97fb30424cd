"""int8-resident conv chains for bandwidth-bound narrow stages (serving).

The fused int8 conv kernel (`ops/conv2d.py`, gated C>=256) wins on MXU
rate but still reads bf16 activations from HBM — it cannot help the
bandwidth-bound narrow stages (CorpBEVT layer1: C=64, measured int8
0.91x there, docs/DESIGN.md round 3).  This path attacks the bytes
instead: activations stay RESIDENT in HBM as int8 across a whole
stage — quantize once at region entry (dynamic per-tensor scale), run
every conv as s8 x s8 -> s32 on the MXU with rescale + ReLU +
requantize fused into the epilogue by XLA, and dequantize once at
region exit (folded into the last conv's epilogue, not a separate
pass).  At the CorpBEVT layer1 shape (20 x 128 x 128 x 64, three
BasicBlocks) this measures 1.54 ms vs 3.32 ms for the shipped bf16
chain — 2.2x (docs/DESIGN.md round 4).

Scale scheme: one dynamic per-tensor scale `s0` from the region input;
intermediate tensors reuse `s0 * INTERMEDIATE_HEADROOM` (post-BN+ReLU
feature ranges are stable across a stage, and the headroom absorbs the
residual doubling); values outside the range saturate.  This is the
lossy COBEVT_INT8=1 serving mode — accuracy is gated on hardware by
`tools/validate_kernels.py` (per-output rel budgets + argmax-IoU
proxy), the same gates that police the C>=256 kernel.

Eval-only; pure XLA (no Pallas) — the int8 convolution emitter and the
epilogue fusion are already speed-of-light here, the win is the byte
diet.  Reference parity target: torchvision resnet layer1 as used by
opv2v/opencood/models/backbones/resnet_ms.py:8 (bf16/f32 there; int8
residency is a TPU-serving addition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Static scale schedule inside a region (all multiples of the dynamic
# entry scale s0, so nothing recompiles): conv1 intermediates get 2x
# their block's input scale (post-BN+ReLU ranges stay near the input's),
# and each block's OUTPUT scale grows 1.5x over its input — residual
# chains accumulate, measured ~1.25x per block on random-init trunks
# (docs/DESIGN.md round 4), and clipping costs far more accuracy than
# the fraction of a bit the growth spends.
INTERMEDIATE_HEADROOM = 2.0
BLOCK_GROWTH = 1.5


def quantize_dynamic(x):
    """Symmetric per-tensor int8 quantization with a dynamic scale.

    Returns (x_q int8, s f32 scalar) with x ~= x_q * s."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return xq, s


def quantize_kernel_per_out(w):
    """Per-out-channel symmetric int8 quantization of a folded (kh, kw,
    I, O) f32 kernel -> (w_q int8, s_w f32 (O,))."""
    sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(w / sw), -127.0, 127.0).astype(jnp.int8)
    return wq, sw


def conv3x3_s8(xq, sx, wq, sw, t, *, relu=True, out_scale=None,
               residual_q=None, residual_scale=None,
               out_dtype=jnp.bfloat16, with_sat=False):
    """One 3x3 stride-1 SAME conv on int8-resident activations.

    acc = conv_s8xs8(x_q, w_q) in int32 on the MXU; the f32 epilogue
    applies the folded-BN shift `t`, the optional residual (int8 at its
    own scale), ReLU, and either requantizes to int8 at `out_scale`
    (region interior) or casts to `out_dtype` (region exit) — all fused
    by XLA into the conv's consumer, so exactly one int8 read and one
    int8/bf16 write of activation traffic per conv."""
    acc = lax.conv_general_dilated(xq, wq, (1, 1), "SAME",
                                   dimension_numbers=_DIMNUMS,
                                   preferred_element_type=jnp.int32)
    f = acc.astype(jnp.float32) * (sx * sw) + t
    if residual_q is not None:
        f = f + residual_q.astype(jnp.float32) * residual_scale
    if relu:
        f = jax.nn.relu(f)
    if out_scale is None:
        out = f.astype(out_dtype)
        if with_sat:
            return out, jnp.zeros((), jnp.float32)  # exit: no requantize
        return out
    ticks = jnp.round(f / out_scale)
    out = jnp.clip(ticks, -127.0, 127.0).astype(jnp.int8)
    if with_sat:
        # Fraction of values the static schedule clips — the silent
        # failure mode for checkpoints whose post-BN ranges exceed the
        # calibrated INTERMEDIATE_HEADROOM/BLOCK_GROWTH.  Consumers sow
        # it; unconsumed (plain serving) XLA dead-code-eliminates it.
        sat = jnp.mean((jnp.abs(ticks) > 127.0).astype(jnp.float32))
        return out, sat
    return out
