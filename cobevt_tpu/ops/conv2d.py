"""Fused 3x3 convolution Pallas kernel (inference path).

XLA's TPU conv emitter runs the ResNet trunk's 3x3 stages far below
MXU speed-of-light at these shapes (measured on the 5-agent CorpBEVT
forward: layer1 ~43 TF/s, layer2-4 115-160 TF/s on a 394 TF/s chip —
see docs/DESIGN.md).  This kernel recasts the stride-1 SAME 3x3 conv as
nine shifted (M, C) @ (C, O) matmuls accumulated in a VMEM f32 register
tile — the natural TPU formulation: the (y, x) output block is M, taps
shift the input slice by sublane/outer offsets (free), and nothing but
the input and output ever touches HBM.  The folded-BatchNorm affine,
the residual skip-add, and the ReLU run in the same kernel on the f32
accumulator, removing three elementwise HBM round-trips per block.

Used by `cobevt_tpu/nn/layers.py:BasicBlock` in eval mode (Bottleneck
stays fully on XLA — its 1x1-3x3-1x1 chain didn't pay off when split
across backends); training keeps the XLA path (live batch-stats +
autodiff).
Off-TPU the wrapper falls back to an exact `lax.conv_general_dilated`
formulation, so CPU tests and the virtual-mesh dryrun are unchanged.

Capability parity note: the computation equals torchvision's
``relu(bn(conv3x3(x)) [+ identity])`` with BN folded to an affine
(inference semantics of reference resnet_ms.py blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, b_ref, *rest, H, W, h_tile, k_split, relu,
                 has_residual):
    if has_residual:
        r_ref, o_ref, pk_ref = rest
    else:
        (o_ref, pk_ref) = rest

    C = x_ref.shape[-1]
    O = o_ref.shape[-1]
    S = k_split * h_tile          # pk rows per split
    pid = pl.program_id(1)

    # Rebuild the dy-packed zero-padded slice every k_split-th block: row
    # r of the packed buffer holds the three vertically shifted taps side
    # by side in the channel axis, pk[r, w, dy*C:(dy+1)*C] =
    # x_pad[start+r+dy-1, w] (zero-padded at the image edges).  Each
    # output block then needs ONE row-aligned slice per dx and the
    # matmul contracts K = 3C at full lane packing (per-tap K=C dots ran
    # the MXU at C/128 utilization for C=64).
    @pl.when(pid % k_split == 0)
    def _build():
        split = pid // k_split
        start = split * S
        pk_ref[...] = jnp.zeros_like(pk_ref)
        # dy=1 slot: x rows start .. start+S-1, always in range
        pk_ref[:, 1:W + 1, C:2 * C] = x_ref[0, pl.ds(start, S)]
        first = split == 0
        last = split == (H // S) - 1

        @pl.when(first)
        def _():
            pk_ref[1:S, 1:W + 1, 0:C] = x_ref[0, pl.ds(0, S - 1)]

        @pl.when(jnp.logical_not(first))
        def _():
            pk_ref[0:S, 1:W + 1, 0:C] = x_ref[0, pl.ds(start - 1, S)]

        @pl.when(last)
        def _():
            pk_ref[0:S - 1, 1:W + 1, 2 * C:3 * C] = \
                x_ref[0, pl.ds(start + 1, S - 1)]

        @pl.when(jnp.logical_not(last))
        def _():
            pk_ref[0:S, 1:W + 1, 2 * C:3 * C] = \
                x_ref[0, pl.ds(start + 1, S)]

    h0 = (pid % k_split) * h_tile
    acc = jnp.zeros((h_tile * W, O), jnp.float32)
    for dx in range(3):
        xs = pk_ref[pl.ds(h0, h_tile), dx:dx + W, :]
        acc += lax.dot_general(
            xs.reshape(h_tile * W, 3 * C), w_ref[dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + b_ref[0][None, :]
    if has_residual:
        acc = acc + r_ref[0].reshape(h_tile * W, O).astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.reshape(h_tile, W, O).astype(o_ref.dtype)


def _pick_tiles(H, W, C, O):
    """(h_tile, k_split): row tile targeting M ~= 2048 and a packed
    scratch slice (k_split * h_tile rows) around ~2.5MB of VMEM after
    sublane/lane padding."""
    o_pad = -(-O // 128) * 128
    lanes = -(-3 * C // 128) * 128
    h = 1
    while h < H and (2 * h) * W * (o_pad * 4 + lanes * 2) <= 6 * 2 ** 20 \
            and h * W < 2048:
        h *= 2
    while H % h:
        h //= 2
    h = max(h, 1)

    subl = -(-(W + 2) // 8) * 8
    row_bytes = subl * lanes * 2
    k = 1
    while k * h < H and (2 * k) * h * row_bytes <= 1200 * 2 ** 10:
        k *= 2
    while (H // h) % k:
        k //= 2
    return h, max(k, 1)


def _xla_reference(x, w, shift, residual, relu):
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + shift.astype(jnp.float32)[None, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu", "use_pallas", "interpret"))
def fused_conv3x3(x, w, shift, residual=None, relu: bool = True,
                  use_pallas: bool = True, interpret: bool = False):
    """Stride-1 SAME 3x3 conv + affine (+ residual) (+ ReLU), fused.

    x: (N, H, W, C); w: (3, 3, C, O) — fold any BatchNorm scale into w
    beforehand; shift: (O,) f32 (the folded BN bias); residual:
    (N, H, W, O) or None, added before the ReLU.  Returns (N, H, W, O)
    in x's dtype.  Inference-only (no custom VJP); off-TPU falls back to
    the exact XLA formulation."""
    if not use_pallas or (jax.default_backend() != "tpu"
                          and not interpret):
        return _xla_reference(x, w, shift, residual, relu)

    N, H, W, C = x.shape
    O = w.shape[-1]
    h_tile, k_split = _pick_tiles(H, W, C, O)
    n_h = H // h_tile

    # (3, 3, C, O) -> (dx, dy*C+c, O) matching the dy-packed scratch
    w = w.astype(x.dtype).transpose(1, 0, 2, 3).reshape(3, 3 * C, O)
    b8 = jnp.broadcast_to(shift.astype(jnp.float32)[None, :], (8, O))

    in_specs = [
        pl.BlockSpec((1, H, W, C), lambda n, h: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * C, O), lambda n, h: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, O), lambda n, h: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w, b8]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, h_tile, W, O), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(residual)

    kernel = functools.partial(
        _conv_kernel, H=H, W=W, h_tile=h_tile, k_split=k_split,
        relu=relu, has_residual=residual is not None)

    return pl.pallas_call(
        kernel,
        grid=(N, n_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_tile, W, O),
                               lambda n, h: (n, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((k_split * h_tile, W + 2, 3 * C),
                                   x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * O,
            bytes_accessed=(x.size + (0 if residual is None
                                      else residual.size)) * 2
            + N * H * W * O * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def _conv_kernel_int8(x_ref, w_ref, b_ref, sc_ref, inv_ref, *rest, H, W,
                      h_tile, k_split, relu, has_residual):
    """int8 variant: activations are quantized to int8 IN the scratch
    build (per-tensor scale, computed in XLA as one max-reduce), weights
    arrive pre-quantized per-out-channel, and the nine shifted matmuls
    run the MXU's double-rate int8 path with an int32 accumulator.
    Quantizing inside the build step is the whole trick — the input is
    already in VMEM registers there, so the round/clip is free VPU work,
    where an XLA-side quantize pass would re-stream the entire input
    through HBM and cost more than the MXU gain (measured,
    docs/DESIGN.md round 3)."""
    if has_residual:
        r_ref, o_ref, pk_ref = rest
    else:
        (o_ref, pk_ref) = rest

    C = x_ref.shape[-1]
    O = o_ref.shape[-1]
    S = k_split * h_tile
    pid = pl.program_id(1)

    def q(v):
        f = v.astype(jnp.float32) * inv_ref[0, 0]
        return jnp.clip(jnp.round(f), -127.0, 127.0).astype(jnp.int8)

    @pl.when(pid % k_split == 0)
    def _build():
        split = pid // k_split
        start = split * S
        pk_ref[...] = jnp.zeros_like(pk_ref)
        pk_ref[:, 1:W + 1, C:2 * C] = q(x_ref[0, pl.ds(start, S)])
        first = split == 0
        last = split == (H // S) - 1

        @pl.when(first)
        def _():
            pk_ref[1:S, 1:W + 1, 0:C] = q(x_ref[0, pl.ds(0, S - 1)])

        @pl.when(jnp.logical_not(first))
        def _():
            pk_ref[0:S, 1:W + 1, 0:C] = q(x_ref[0, pl.ds(start - 1, S)])

        @pl.when(last)
        def _():
            pk_ref[0:S - 1, 1:W + 1, 2 * C:3 * C] = \
                q(x_ref[0, pl.ds(start + 1, S - 1)])

        @pl.when(jnp.logical_not(last))
        def _():
            pk_ref[0:S, 1:W + 1, 2 * C:3 * C] = \
                q(x_ref[0, pl.ds(start + 1, S)])

    h0 = (pid % k_split) * h_tile
    acc = jnp.zeros((h_tile * W, O), jnp.int32)
    for dx in range(3):
        xs = pk_ref[pl.ds(h0, h_tile), dx:dx + W, :]
        acc += lax.dot_general(
            xs.reshape(h_tile * W, 3 * C), w_ref[dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sc_ref[0][None, :] + b_ref[0][None, :]
    if has_residual:
        out = out + r_ref[0].reshape(h_tile * W, O).astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    o_ref[0] = out.reshape(h_tile, W, O).astype(o_ref.dtype)


def _quantize_weight(w):
    """Per-out-channel symmetric int8 quantization of a folded (3, 3, C,
    O) f32 kernel -> (w_q int8, s_w f32 (O,))."""
    s_w = jnp.max(jnp.abs(w).astype(jnp.float32), axis=(0, 1, 2)) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w[None, None, None]),
                   -127, 127).astype(jnp.int8)
    return w_q, s_w


def _act_scale(x):
    """Dynamic per-tensor activation scale (one VPU max-reduce)."""
    s_a = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127.0
    s_a = jnp.maximum(s_a, 1e-12)
    return s_a


def _xla_reference_int8(x, w_q, s_w, s_a, shift, residual, relu):
    """Exact XLA twin of the int8 kernel (same quantized integers, same
    f32 rescale) — the off-TPU fallback and the interpret-mode oracle."""
    inv = 1.0 / s_a
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                   -127.0, 127.0).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        x_q, w_q, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s_a * s_w)[None, None, None, :] \
        + shift.astype(jnp.float32)[None, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("relu", "use_pallas", "interpret"))
def fused_conv3x3_int8(x, w, shift, residual=None, relu: bool = True,
                       use_pallas: bool = True, interpret: bool = False):
    """int8 post-training-quantized twin of `fused_conv3x3`.

    Same contract (folded-BN f32 `w`/`shift`); weights are quantized
    per-out-channel at trace time, activations per-tensor dynamically.
    The MXU runs int8 x int8 -> int32 at ~1.4-1.6x the bf16 matmul rate
    at these shapes (measured); output drift vs the bf16 path is bounded
    by the usual symmetric-PTQ error (~1% relative, pinned by tests).
    Enable end-to-end with COBEVT_INT8=1 (serving only)."""
    w_q, s_w = _quantize_weight(w)
    s_a = _act_scale(x)
    if not use_pallas or (jax.default_backend() != "tpu"
                          and not interpret):
        return _xla_reference_int8(x, w_q, s_w, s_a, shift, residual,
                                   relu)

    N, H, W, C = x.shape
    O = w.shape[-1]
    h_tile, k_split = _pick_tiles(H, W, C, O)
    n_h = H // h_tile

    # (3, 3, C, O) -> (dx, dy*C+c, O) matching the dy-packed scratch
    w_qt = w_q.transpose(1, 0, 2, 3).reshape(3, 3 * C, O)
    b8 = jnp.broadcast_to(shift.astype(jnp.float32)[None, :], (8, O))
    sc8 = jnp.broadcast_to((s_a * s_w)[None, :], (8, O))
    inv = jnp.full((1, 1), 1.0, jnp.float32) / s_a

    in_specs = [
        pl.BlockSpec((1, H, W, C), lambda n, h: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * C, O), lambda n, h: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, O), lambda n, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, O), lambda n, h: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda n, h: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, w_qt, b8, sc8, inv]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((1, h_tile, W, O), lambda n, h: (n, h, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(residual)

    kernel = functools.partial(
        _conv_kernel_int8, H=H, W=W, h_tile=h_tile, k_split=k_split,
        relu=relu, has_residual=residual is not None)

    return pl.pallas_call(
        kernel,
        grid=(N, n_h),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_tile, W, O),
                               lambda n, h: (n, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((k_split * h_tile, W + 2, 3 * C),
                                   jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * O,
            bytes_accessed=(x.size + (0 if residual is None
                                      else residual.size)) * 2
            + N * H * W * O * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold inference BatchNorm into (scaled kernel, shift).

    bn(conv(x)) = conv(x) * s + t with s = scale/sqrt(var+eps) and
    t = bias - mean*s; returns (kernel * s, t) in f32."""
    s = scale.astype(jnp.float32) * lax.rsqrt(
        var.astype(jnp.float32) + eps)
    t = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return kernel.astype(jnp.float32) * s[None, None, None, :], t
