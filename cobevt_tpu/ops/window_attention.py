"""Fused windowed attention Pallas kernel.

FAX's factorized attention bounds every softmax to one (window x window)
tile (SURVEY.md section 5: the window/grid partitions ARE the block
structure), so the whole attention for one (window, head) — QK^T, bias,
mask, softmax, AV — fits in VMEM.  XLA's unfused path materializes the
similarity tensor in HBM (e.g. CorpBEVT stage 0: 5 x 64 windows x 4 heads
x 256 x 1024 fp32 = hundreds of MB per cross-attention); this kernel
keeps it on-chip and writes only the (Tq, D) outputs.

One kernel serves all three attention flavors in the framework:
  * CrossWinAttention  (no bias, no mask)    — models/fax.py
  * SelfAttention      (2D rel-pos bias)     — models/fax.py
  * FusionAttention    (3D bias + key mask)  — models/fusion/swap_fusion.py

Interface: q (G, H, Tq, D), k/v (G, H, Tk, D), optional bias (H, Tq, Tk)
(shared across G, per head), optional key mask (G, Tk).  Scale must be
pre-applied to q.  Falls back to a pure-XLA einsum path off-TPU or for
awkward shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Per-kernel VMEM ceiling for the packed path's whole-resident operands
# (v5e VMEM is 128MB; leave room for Mosaic's own pipeline buffers).
VMEM_CEILING = 110 * 1024 * 1024
_VMEM_SLACK = 24 * 1024 * 1024


def _attn_body(q, k, v, bias, mask):
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias
    if mask is not None:
        # mask arrives as an (8, Tk) broadcast block; row 0 is the mask
        sim = sim + jnp.where(mask[0][None, :] > 0, 0.0, NEG_INF)
    m = jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out / s


def _kernel_plain(q_ref, k_ref, v_ref, o_ref):
    o_ref[0, 0] = _attn_body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                             None, None).astype(o_ref.dtype)


def _kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref):
    o_ref[0, 0] = _attn_body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                             b_ref[0], None).astype(o_ref.dtype)


def _kernel_mask(q_ref, k_ref, v_ref, m_ref, o_ref):
    o_ref[0, 0] = _attn_body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                             None, m_ref[0]).astype(o_ref.dtype)


def _kernel_bias_mask(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref):
    o_ref[0, 0] = _attn_body(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                             b_ref[0], m_ref[0]).astype(o_ref.dtype)


def _xla_reference(q, k, v, bias, mask):
    sim = jnp.einsum("ghqd,ghkd->ghqk", q, k,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None]
    if mask is not None:
        sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("ghqk,ghkd->ghqd", attn,
                      v.astype(sim.dtype)).astype(q.dtype)


def _forward_core(q, k, v, bias, mask, use_pallas: bool,
                  interpret: bool):
    if not use_pallas or (jax.default_backend() != "tpu"
                          and not interpret):
        return _xla_reference(q, k, v, bias, mask)

    G, H, Tq, D = q.shape
    Tk = k.shape[2]

    # Block the query axis so the (tq_blk, Tk) similarity tile stays
    # well under the ~16MB VMEM budget (softmax is over Tk, so query
    # blocks are independent).  Mosaic wants the sublane dim to be a
    # multiple of 8, so pick a power-of-two block and zero-pad Tq up to
    # a multiple of it (padded rows are discarded after the call).
    budget = 4 * 1024 * 1024  # bytes for the fp32 sim tile
    tq_blk = 8
    while tq_blk < 2048 and 2 * tq_blk * Tk * 4 <= budget and \
            tq_blk < Tq:
        tq_blk *= 2
    Tq_pad = -(-Tq // tq_blk) * tq_blk
    if Tq_pad != Tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tq_pad - Tq), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, Tq_pad - Tq), (0, 0)))
    orig_tq = Tq
    Tq = Tq_pad
    n_q_blocks = Tq // tq_blk

    in_specs = [
        pl.BlockSpec((1, 1, tq_blk, D), lambda g, h, t: (g, h, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tk, D), lambda g, h, t: (g, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Tk, D), lambda g, h, t: (g, h, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    # masks get a broadcast 8-sublane axis: Mosaic requires the
    # second-to-last block dim to be a multiple of 8 (or full)
    def mask8(m):
        return jnp.broadcast_to(m.astype(jnp.float32)[:, None, :],
                                (G, 8, Tk))

    if bias is not None and mask is not None:
        kernel = _kernel_bias_mask
        in_specs += [
            pl.BlockSpec((1, tq_blk, Tk), lambda g, h, t: (h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Tk), lambda g, h, t: (g, 0, 0),
                         memory_space=pltpu.VMEM)]
        args += [bias.astype(jnp.float32), mask8(mask)]
    elif bias is not None:
        kernel = _kernel_bias
        in_specs += [pl.BlockSpec((1, tq_blk, Tk),
                                  lambda g, h, t: (h, t, 0),
                                  memory_space=pltpu.VMEM)]
        args += [bias.astype(jnp.float32)]
    elif mask is not None:
        kernel = _kernel_mask
        in_specs += [pl.BlockSpec((1, 8, Tk), lambda g, h, t: (g, 0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [mask8(mask)]
    else:
        kernel = _kernel_plain

    flops = 2 * G * H * Tq * Tk * D * 2
    out = pl.pallas_call(
        kernel,
        grid=(G, H, n_q_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tq_blk, D),
                               lambda g, h, t: (g, h, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, H, Tq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * 2 + q.size * 2,
            transcendentals=G * H * Tq * Tk),
        interpret=interpret,
    )(*args)
    return out[:, :, :orig_tq] if orig_tq != Tq else out


# ---------------------------------------------------------------------------
# autodiff: fused forward, XLA-recompute backward (flash-style: the
# similarity tensor is rebuilt in the backward pass instead of saved)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(q, k, v, bias, mask, use_pallas, interpret, bwd_f32):
    return _forward_core(q, k, v, bias, mask, use_pallas, interpret)


def _fused_fwd(q, k, v, bias, mask, use_pallas, interpret, bwd_f32):
    out = _forward_core(q, k, v, bias, mask, use_pallas, interpret)
    return out, (q, k, v, bias, mask, out)


def _bwd_f32_enabled() -> bool:
    """COBEVT_FLASH_BWD_F32=1 keeps the flash backward's (Tq,Tk)-sized
    epilogue tensors (da/p/dsim) in f32 instead of the input dtype — the
    control used by tools/validate_kernels.py --train to pin the shipped
    bf16-cast grad drift as a measured bound rather than an assumption.
    Read per call and threaded as a nondiff/static arg (a read inside
    the custom_vjp bwd rule would be frozen by its global trace cache,
    which keys on avals only)."""
    import os

    return os.environ.get("COBEVT_FLASH_BWD_F32", "0") == "1"


def _bwd_dtype(input_dtype, bwd_f32):
    """Epilogue dtype for the flash backward's (Tq,Tk)-sized tensors.

    Default: the input dtype (bf16 in shipped training) — halves the HBM
    bytes of the da/p/dsim tensors, at the cost of rounding da before
    the cancellation-prone softmax correction (ds - s)."""
    return jnp.float32 if bwd_f32 else input_dtype


def _fused_bwd(use_pallas, interpret, bwd_f32, res, g):
    # Flash-style recompute backward.  Two deliberate choices keep it
    # HBM-cheap at training's bf16 dtype (profiled: the earlier all-f32
    # formulation materialized three f32 (G,H,Tq,Tk) tensors — 1.3GB
    # each at CorpBEVT stage-0 shapes — costing ~16ms/step):
    #   * the softmax-correction rowsum uses the identity
    #     sum_k dp*p = sum_d dO*O (O saved from forward), so dp never
    #     feeds a separate reduction;
    #   * every (Tq,Tk)-sized tensor is cast to the INPUT dtype before
    #     touching HBM or the MXU; accumulation stays f32
    #     (preferred_element_type).  With f32 inputs (CPU tests) this
    #     is a no-op.
    q, k, v, bias, mask, out = res
    dt = _bwd_dtype(q.dtype, bwd_f32)
    sim = jnp.einsum("ghqd,ghkd->ghqk", q, k,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None].astype(sim.dtype)
    if mask is not None:
        sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0,
                              NEG_INF).astype(sim.dtype)
    p = jax.nn.softmax(sim, axis=-1).astype(dt)
    g = g.astype(dt)
    s = jnp.einsum("ghqd,ghqd->ghq", g, out.astype(dt),
                   preferred_element_type=jnp.float32)
    dv = jnp.einsum("ghqk,ghqd->ghkd", p, g,
                    preferred_element_type=jnp.float32)
    # cast at the einsum epilogue: dp is (G,H,Tq,Tk)-sized, and an f32
    # einsum output materializes in HBM before the ds fusion consumes
    # it (profiled round 4: 1.3GB f32 tensor, the top train-step
    # program) — in dt the convert fuses into the einsum and only the
    # half-width tensor is ever written
    dp = jnp.einsum("ghqd,ghkd->ghqk", g, v,
                    preferred_element_type=jnp.float32).astype(dt)
    ds = (p.astype(jnp.float32) *
          (dp.astype(jnp.float32) - s[..., None])).astype(dt)
    dq = jnp.einsum("ghqk,ghkd->ghqd", ds, k,
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("ghqk,ghqd->ghkd", ds, q,
                    preferred_element_type=jnp.float32)
    dbias = ds.astype(jnp.float32).sum(axis=0).astype(bias.dtype) \
        if bias is not None else None
    dmask = jnp.zeros_like(mask) if mask is not None else None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, dmask)


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# packed variant: heads stay interleaved in the channel axis
# ---------------------------------------------------------------------------
#
# The (G, H, T, D) interface forces every caller to transpose the natural
# Dense output (..., T, H*D) into head-major layout, and pallas_call
# operands must be materialized in their logical layout — so XLA emits
# real HBM copies (~84MB per operand at CorpBEVT stage 0; profiled at
# ~2.2ms/step).  The packed kernel takes (G, T, H*D) directly (a free
# bitcast of the projection output) and writes (G, T, H*D) back — zero
# layout traffic end to end.
#
# Inside the body, per-head D=32 dots would run the MXU at D/128
# utilization, and slicing head lanes out of the packed block costs
# relayouts.  Instead the kernel builds a BLOCK-DIAGONAL key/value
# (H*Tk, C) in VMEM (tile + iota mask — pure VPU, no relayout) and runs
# two full-width matmuls:
#     sim  = q  (tq, C)      @ k_bd^T (C, H*Tk)     # col block h = head h
#     out  = attn (tq, H*Tk) @ v_bd   (H*Tk, C)     # packed output
# H x the nominal attention FLOPs at ~H x the MXU utilization — same
# compute time as the ideal, with zero transposes anywhere.  Per-head
# softmax normalization is done with tiny indicator matmuls instead of
# VMEM reshapes (which would relayout).


def _head_blockmask(n_heads, Tk, C, dtype):
    """(H*Tk, C) 0/1: row r (head r//Tk) keeps channels of its head."""
    D = C // n_heads
    row_head = jax.lax.broadcasted_iota(jnp.int32, (n_heads * Tk, C),
                                        0) // Tk
    col_head = jax.lax.broadcasted_iota(jnp.int32, (n_heads * Tk, C),
                                        1) // D
    return (row_head == col_head).astype(dtype)


def _head_indicator(n_heads, Tk, dtype):
    """(H*Tk, 128) 0/1 column-block -> head indicator (lane-padded)."""
    h_pad = 128
    col = jax.lax.broadcasted_iota(jnp.int32, (n_heads * Tk, h_pad), 1)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (n_heads * Tk, h_pad),
                                        0) // Tk
    return (col == row_head).astype(dtype)


def _head_expander(n_heads, C):
    """(128, C) f32 0/1: row h -> channels of head h (s_h broadcast)."""
    D = C // n_heads
    row = jax.lax.broadcasted_iota(jnp.int32, (128, C), 0)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (128, C), 1) // D
    return (row == col_head).astype(jnp.float32)


def _packed_kernel(q_ref, k_ref, v_ref, *rest, n_heads, tq_blk,
                   has_bias, has_mask, has_weight):
    """One query block of one (window) group.  The block-diagonal K/V
    are staged in scratch once per group (program_id(1) == 0) — the
    tile+mask build costs ~2x the K/V bytes in VMEM traffic, and
    rebuilding it per query block dominated large-Tq cases (measured
    ~40% of the cooperative-LiDAR fusion kernel).  The bias rides as a
    full resident block sliced per query block, not a per-step DMA."""
    it = iter(rest)
    b_ref = next(it) if has_bias else None
    m_ref = next(it) if has_mask else None
    w_ref = next(it) if has_weight else None
    o_ref = next(it)
    kbd_ref = next(it)
    vbd_ref = next(it)
    bm_ref = next(it)

    Tk, C = k_ref.shape[1], k_ref.shape[2]

    # the 0/1 head block-structure is grid-invariant: build it once at
    # the first grid step (iota compares are pure VPU but measurable at
    # hundreds of windows/frame), reuse from scratch for every window
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        bm_ref[...] = _head_blockmask(n_heads, Tk, C, k_ref.dtype)

    @pl.when(pl.program_id(1) == 0)
    def _():
        bm = bm_ref[...]
        kbd_ref[...] = jnp.concatenate([k_ref[0]] * n_heads, axis=0) * bm
        vbd_ref[...] = jnp.concatenate([v_ref[0]] * n_heads, axis=0) * bm

    t = pl.program_id(1)
    bias = (b_ref[pl.ds(t * tq_blk, tq_blk), :] if has_bias else None)
    mask = m_ref[0] if has_mask else None
    weight = w_ref[0] if has_weight else None
    _packed_body(q_ref[0], kbd_ref[...], vbd_ref[...], bias, mask,
                 weight, n_heads, Tk, o_ref)


def _packed_body(q, k_bd, v_bd, bias, mask, weight, n_heads, Tk, o_ref):
    C = k_bd.shape[-1]
    sim = jax.lax.dot_general(
        q, k_bd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                # (tq, H*Tk)
    if bias is not None:
        sim = sim + bias
    if mask is not None:
        # mask arrives as an (8, H*Tk) broadcast block; row 0 is live
        sim = sim + jnp.where(mask[0][None, :] > 0, 0.0, NEG_INF)
    m = jnp.max(sim, axis=-1, keepdims=True)               # global row max
    # exp in f32, then round once to the value dtype: the SAME rounded
    # weights feed both the AV numerator and the softmax denominator, so
    # normalization is exactly consistent.  f32 matmuls here would run
    # the MXU at 1/8 rate and dominate the kernel.
    e = jnp.exp(sim - m).astype(v_bd.dtype)                # (tq, H*Tk)
    if Tk % 128 == 0:
        # lane-aligned per-head column blocks: VPU slice-sums
        s_h = jnp.concatenate(
            [jnp.sum(e[:, h * Tk:(h + 1) * Tk].astype(jnp.float32),
                     axis=-1, keepdims=True) for h in range(n_heads)],
            axis=-1)                                       # (tq, H)
        s_h = jnp.pad(s_h, ((0, 0), (0, 128 - n_heads)),
                      constant_values=1.0)
    else:
        ind = _head_indicator(n_heads, Tk, e.dtype)        # (H*Tk, 128)
        s_h = jnp.dot(e, ind, preferred_element_type=jnp.float32)
    if weight is not None:
        # post-softmax multiplicative weights (attention dropout):
        # applied to the numerator only — torch drops AFTER the softmax
        # normalization (fax_modules.py:109-112), so the denominator
        # stays the undropped sum
        e = e * weight.astype(e.dtype)
    out_un = jnp.dot(e, v_bd,
                     preferred_element_type=jnp.float32)   # (tq, C)
    norm = jnp.dot(s_h, _head_expander(n_heads, C),
                   preferred_element_type=jnp.float32)     # (tq, C)
    o_ref[0] = (out_un / norm).astype(o_ref.dtype)


def _packed_to_4d(t, n_heads):
    G, T, C = t.shape
    return t.reshape(G, T, n_heads, C // n_heads).transpose(0, 2, 1, 3)


def _packed_from_4d(t):
    G, H, T, D = t.shape
    return t.transpose(0, 2, 1, 3).reshape(G, T, H * D)


def _flat_to_heads(bias_flat, n_heads):
    """(Tq, H*Tk) flat bias -> (H, Tq, Tk)."""
    Tq, HTk = bias_flat.shape
    return bias_flat.reshape(Tq, n_heads, HTk // n_heads).transpose(1, 0, 2)


def _weight_to_4d(weight, n_heads):
    """(G, Tq, H*Tk) flat post-softmax weights -> (G, H, Tq, Tk)."""
    G, Tq, HTk = weight.shape
    return weight.reshape(G, Tq, n_heads,
                          HTk // n_heads).transpose(0, 2, 1, 3)


def _xla_packed_reference(q4, k4, v4, bias, mask, w4):
    sim = jnp.einsum("ghqd,ghkd->ghqk", q4, k4,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None]
    if mask is not None:
        sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    if w4 is not None:
        attn = attn * w4.astype(attn.dtype)
    return jnp.einsum("ghqk,ghkd->ghqd", attn,
                      v4.astype(sim.dtype)).astype(q4.dtype)


def _packed_forward_core(q, k, v, bias_flat, mask, weight, n_heads,
                         use_pallas, interpret):
    if not use_pallas or (jax.default_backend() != "tpu"
                          and not interpret):
        bias = (_flat_to_heads(bias_flat, n_heads)
                if bias_flat is not None else None)
        w4 = (_weight_to_4d(weight, n_heads)
              if weight is not None else None)
        out = _xla_packed_reference(_packed_to_4d(q, n_heads),
                                    _packed_to_4d(k, n_heads),
                                    _packed_to_4d(v, n_heads), bias,
                                    mask, w4)
        return _packed_from_4d(out)

    G, Tq, C = q.shape
    Tk = k.shape[1]
    HTk = n_heads * Tk

    # Mosaic's DEFAULT scoped-vmem limit is 16MB, but the whole-resident
    # f32 bias alone is Tq*H*Tk*4 bytes (16MB at CorpBEVT's 32^2-token /
    # 4-head self-attention) — a legitimate working set on a 128MB-VMEM
    # chip.  Raise the limit explicitly to what this call actually needs
    # (resident operands + double-buffered blocks + softmax scratch) and
    # fall back to XLA only when even that exceeds the hardware.
    resident = (Tq * HTk * 4 if bias_flat is not None else 0) \
        + 2 * 2 * (Tk * C * 2) + 2 * 2 * (HTk * C * 2) \
        + (2 * 8 * HTk * 4 if mask is not None else 0)
    vmem_limit = min(resident + _VMEM_SLACK, VMEM_CEILING)
    if resident + 8 * 1024 * 1024 > VMEM_CEILING:
        bias = (_flat_to_heads(bias_flat, n_heads)
                if bias_flat is not None else None)
        w4 = (_weight_to_4d(weight, n_heads)
              if weight is not None else None)
        out = _xla_packed_reference(_packed_to_4d(q, n_heads),
                                    _packed_to_4d(k, n_heads),
                                    _packed_to_4d(v, n_heads), bias,
                                    mask, w4)
        return _packed_from_4d(out)

    # VMEM budget per query block: sim f32 + e + the bias-slice temp (+
    # double-buffered weight blocks when present).  The resident bias /
    # block-diag scratch are charged separately in `resident`.  Prefer
    # ONE block covering all of Tq: at the cooperative-LiDAR fusion
    # shape (G=264, Tq=320, HTk=1280) the 3-block/384-pad split ran
    # 1584 grid steps per call at ~1.4us/step against 0.43us of MXU
    # work — measured 3.01 -> 1.4ms/call from this sizing alone.
    budget = 16 * 1024 * 1024
    per_row = HTk * (4 + 2
                     + (4 if bias_flat is not None else 0)
                     + (2 * 2 if weight is not None else 0))
    tq_blk = 8
    while tq_blk < 2048 and 2 * tq_blk * per_row <= budget and \
            tq_blk < Tq:
        tq_blk *= 2
    if tq_blk >= Tq:
        tq_blk = -(-Tq // 8) * 8          # single block, minimal pad
    Tq_pad = -(-Tq // tq_blk) * tq_blk
    if Tq_pad != Tq:
        q = jnp.pad(q, ((0, 0), (0, Tq_pad - Tq), (0, 0)))
        if bias_flat is not None:
            bias_flat = jnp.pad(bias_flat, ((0, Tq_pad - Tq), (0, 0)))
        if weight is not None:
            weight = jnp.pad(weight, ((0, 0), (0, Tq_pad - Tq), (0, 0)))
    orig_tq, Tq = Tq, Tq_pad
    n_q_blocks = Tq // tq_blk

    in_specs = [
        pl.BlockSpec((1, tq_blk, C), lambda g, t: (g, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, C), lambda g, t: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, C), lambda g, t: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]

    def mask8(m):
        # (G, Tk) -> (G, 8, H*Tk): head-tiled columns, broadcast sublanes
        mf = jnp.tile(m.astype(jnp.float32), (1, n_heads))
        return jnp.broadcast_to(mf[:, None, :], (G, 8, HTk))

    assert weight is None or mask is None, \
        "weight+mask combination not implemented"
    if bias_flat is not None:
        # whole bias resident (constant block index), sliced per query
        # block in-kernel — a per-(g, t) block spec re-DMAs it every
        # grid step since t cycles fastest
        in_specs.append(pl.BlockSpec((Tq, HTk), lambda g, t: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_flat.astype(jnp.float32))
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 8, HTk), lambda g, t: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask8(mask))
    if weight is not None:
        in_specs.append(pl.BlockSpec((1, tq_blk, HTk),
                                     lambda g, t: (g, t, 0),
                                     memory_space=pltpu.VMEM))
        args.append(weight)

    kernel = functools.partial(
        _packed_kernel, n_heads=n_heads, tq_blk=tq_blk,
        has_bias=bias_flat is not None, has_mask=mask is not None,
        has_weight=weight is not None)

    flops = 2 * G * Tq * HTk * C * 2
    out = pl.pallas_call(
        kernel,
        grid=(G, n_q_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tq_blk, C), lambda g, t: (g, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, Tq, C), q.dtype),
        scratch_shapes=[pltpu.VMEM((HTk, C), k.dtype),
                        pltpu.VMEM((HTk, C), v.dtype),
                        pltpu.VMEM((HTk, C), k.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * 2 + q.size * 2,
            transcendentals=G * Tq * HTk),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    return out[:, :orig_tq] if orig_tq != Tq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused_packed(q, k, v, bias_flat, mask, weight, n_heads, use_pallas,
                  interpret, bwd_f32):
    return _packed_forward_core(q, k, v, bias_flat, mask, weight, n_heads,
                                use_pallas, interpret)


def _fused_packed_fwd(q, k, v, bias_flat, mask, weight, n_heads,
                      use_pallas, interpret, bwd_f32):
    out = _packed_forward_core(q, k, v, bias_flat, mask, weight, n_heads,
                               use_pallas, interpret)
    return out, (q, k, v, bias_flat, mask, weight, out)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, *rest,
                       n_heads, has_bias, has_mask):
    """Flash backward for one (window) group, everything VMEM-resident.

    Reuses the forward's block-diagonal formulation so every matmul
    contracts over C (full MXU lanes at D=32 heads): the XLA composite
    backward materialized three (G,H,Tq,Tk) tensors in HBM per
    attention — measured 61.5 ms of the 138.6 ms PointPillar train step
    at the cooperative-LiDAR fusion shape.  Here sim/p/da/ds live and
    die in VMEM; per window the only HBM traffic is q/k/v/g/out in and
    dq/dk/dv out.  dbias accumulates across windows into a revisited
    output block (constant index map keeps it resident)."""
    it = iter(rest)
    b_ref = next(it) if has_bias else None
    m_ref = next(it) if has_mask else None
    dq_ref = next(it)
    dk_ref = next(it)
    dv_ref = next(it)
    dbias_ref = next(it) if has_bias else None
    kbd_ref = next(it)
    vbd_ref = next(it)
    bm_ref = next(it)

    Tk, C = k_ref.shape[1], k_ref.shape[2]
    HTk = n_heads * Tk

    @pl.when(pl.program_id(0) == 0)
    def _():
        bm_ref[...] = _head_blockmask(n_heads, Tk, C, k_ref.dtype)

    bm = bm_ref[...]
    kbd_ref[...] = jnp.concatenate([k_ref[0]] * n_heads, axis=0) * bm
    vbd_ref[...] = jnp.concatenate([v_ref[0]] * n_heads, axis=0) * bm
    q, g, out = q_ref[0], g_ref[0], o_ref[0]
    kbd, vbd = kbd_ref[...], vbd_ref[...]

    # recompute the forward's effective softmax weights exactly: bf16 e
    # feeds both numerator and denominator (see _packed_body)
    sim = jax.lax.dot_general(q, kbd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if has_bias:
        sim = sim + b_ref[...]
    if has_mask:
        sim = sim + jnp.where(m_ref[0][0][None, :] > 0, 0.0, NEG_INF)
    m = jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim - m).astype(vbd.dtype)                # (tq, H*Tk)
    if Tk % 128 == 0:
        s_h = jnp.concatenate(
            [jnp.sum(e[:, h * Tk:(h + 1) * Tk].astype(jnp.float32),
                     axis=-1, keepdims=True) for h in range(n_heads)],
            axis=-1)
        s_h = jnp.pad(s_h, ((0, 0), (0, 128 - n_heads)),
                      constant_values=1.0)
    else:
        ind = _head_indicator(n_heads, Tk, e.dtype)       # (H*Tk, 128)
        s_h = jnp.dot(e, ind, preferred_element_type=jnp.float32)
        s_h = s_h + (jax.lax.broadcasted_iota(
            jnp.int32, s_h.shape, 1) >= n_heads).astype(s_h.dtype)
    exp_cols = _head_expander_cols(n_heads, Tk)           # (128, H*Tk)
    inv_htk = jnp.dot(1.0 / s_h, exp_cols,
                      preferred_element_type=jnp.float32)
    p32 = e.astype(jnp.float32) * inv_htk                 # exact fwd p

    # flash rowsum identity per head: s_gh = sum_d g*out over head d
    go = (g * out).astype(jnp.float32)
    s_small = jnp.dot(go, _head_expander(n_heads, C).T,
                      preferred_element_type=jnp.float32)  # (tq, 128)
    s_htk = jnp.dot(s_small, exp_cols,
                    preferred_element_type=jnp.float32)    # (tq, H*Tk)

    da = jax.lax.dot_general(g, vbd, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds32 = p32 * (da - s_htk)
    ds = ds32.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, kbd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    bm32 = bm.astype(jnp.float32)
    dkbd = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dk_ref[0] = (dkbd * bm32).reshape(
        n_heads, Tk, C).sum(axis=0).astype(dk_ref.dtype)
    dvbd = jax.lax.dot_general(p32.astype(e.dtype), g,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dv_ref[0] = (dvbd * bm32).reshape(
        n_heads, Tk, C).sum(axis=0).astype(dv_ref.dtype)
    if has_bias:
        @pl.when(pl.program_id(0) == 0)
        def _():
            dbias_ref[...] = ds32

        @pl.when(pl.program_id(0) != 0)
        def _():
            dbias_ref[...] += ds32


def _head_expander_cols(n_heads, Tk):
    """(128, H*Tk) f32 0/1: row h -> the Tk columns of head h."""
    row = jax.lax.broadcasted_iota(jnp.int32, (128, n_heads * Tk), 0)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (128, n_heads * Tk),
                                        1) // Tk
    return (row == col_head).astype(jnp.float32)


def _packed_bwd_pallas(q, k, v, bias_flat, mask, g, out, n_heads,
                       interpret):
    """Whole-window Pallas backward; returns (dq, dk, dv, dbias_flat)."""
    G, Tq, C = q.shape
    Tk = k.shape[1]
    HTk = n_heads * Tk

    in_specs = [
        pl.BlockSpec((1, Tq, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tq, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tq, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, g, out]
    if bias_flat is not None:
        in_specs.append(pl.BlockSpec((Tq, HTk), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias_flat.astype(jnp.float32))
    if mask is not None:
        mf = jnp.tile(mask.astype(jnp.float32), (1, n_heads))
        in_specs.append(pl.BlockSpec((1, 8, HTk), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(mf[:, None, :], (G, 8, HTk)))

    out_shapes = [jax.ShapeDtypeStruct((G, Tq, C), q.dtype),
                  jax.ShapeDtypeStruct((G, Tk, C), k.dtype),
                  jax.ShapeDtypeStruct((G, Tk, C), v.dtype)]
    out_specs = [pl.BlockSpec((1, Tq, C), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, Tk, C), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, Tk, C), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if bias_flat is not None:
        out_shapes.append(jax.ShapeDtypeStruct((Tq, HTk), jnp.float32))
        out_specs.append(pl.BlockSpec((Tq, HTk), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _packed_bwd_kernel, n_heads=n_heads,
        has_bias=bias_flat is not None, has_mask=mask is not None)

    resident = (Tq * HTk * 4 if bias_flat is not None else 0) * 2 \
        + 3 * HTk * C * 2 + 5 * Tq * HTk * 4
    vmem_limit = min(resident + _VMEM_SLACK, VMEM_CEILING)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((HTk, C), k.dtype),
                        pltpu.VMEM((HTk, C), v.dtype),
                        pltpu.VMEM((HTk, C), k.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Tq * HTk * C * 5,
            bytes_accessed=(q.size * 3 + k.size * 4) * 2,
            transcendentals=G * Tq * HTk),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(*args)
    dq, dk, dv = outs[0], outs[1], outs[2]
    dbias = outs[3].astype(bias_flat.dtype) \
        if bias_flat is not None else None
    return dq, dk, dv, dbias


def _packed_bwd_pallas_ok(q, k, bias_flat, weight, n_heads):
    """Kernel path preconditions: no post-softmax weight (XLA fallback
    computes dweight only when a consumer exists — inside a monolithic
    custom call it could never be DCE'd), whole-window residency, and
    sublane-aligned token counts."""
    G, Tq, C = q.shape
    Tk = k.shape[1]
    HTk = n_heads * Tk
    resident = 5 * Tq * HTk * 4 + 3 * HTk * C * 2 \
        + (2 * Tq * HTk * 4 if bias_flat is not None else 0)
    return (weight is None and Tq % 8 == 0 and Tk % 8 == 0
            and C % 128 == 0
            and resident + 16 * 1024 * 1024 <= VMEM_CEILING)


def _fused_packed_bwd(n_heads, use_pallas, interpret, bwd_f32, res, g):
    # Flash-style recompute backward in the INPUT dtype (see _fused_bwd:
    # the all-f32 formulation materialized f32 (G,H,Tq,Tk) tensors in
    # HBM — ~16ms of the 94ms CorpBEVT train step).  Accumulation stays
    # f32; the softmax-correction rowsum is the flash identity
    # sum_k ds*p = sum_d dO*O, valid with and without the multiplicative
    # post-softmax weight (O = (p*w)@v implies sum_d g*O = sum_k da*w*p).
    q, k, v, bias_flat, mask, weight, out = res
    if (use_pallas and (jax.default_backend() == "tpu" or interpret)
            and not bwd_f32
            and _packed_bwd_pallas_ok(q, k, bias_flat, weight, n_heads)):
        dq, dk, dv, dbias_flat = _packed_bwd_pallas(
            q, k, v, bias_flat, mask, g, out, n_heads, interpret)
        dmask = jnp.zeros_like(mask) if mask is not None else None
        return dq, dk, dv, dbias_flat, dmask, None
    dt = _bwd_dtype(q.dtype, bwd_f32)
    bias = (_flat_to_heads(bias_flat, n_heads)
            if bias_flat is not None else None)
    w4 = _weight_to_4d(weight, n_heads) if weight is not None else None
    q4, k4, v4 = (_packed_to_4d(t, n_heads) for t in (q, k, v))
    g4 = _packed_to_4d(g, n_heads).astype(dt)
    out4 = _packed_to_4d(out, n_heads).astype(dt)

    sim = jnp.einsum("ghqd,ghkd->ghqk", q4, k4,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None].astype(sim.dtype)
    if mask is not None:
        sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0,
                              NEG_INF).astype(sim.dtype)
    p = jax.nn.softmax(sim, axis=-1).astype(dt)
    a = p * w4.astype(dt) if w4 is not None else p
    s = jnp.einsum("ghqd,ghqd->ghq", g4, out4,
                   preferred_element_type=jnp.float32)
    dv4 = jnp.einsum("ghqk,ghqd->ghkd", a, g4,
                     preferred_element_type=jnp.float32)
    # cast at the einsum epilogue — an f32 (G,H,Tq,Tk) einsum output
    # materializes in HBM before its consumer fusion (profiled round 4:
    # the 1.3GB f32 `da` was the top train-step program, fusion.10187);
    # in dt only the half-width tensor is written
    da = jnp.einsum("ghqd,ghkd->ghqk", g4, v4,
                    preferred_element_type=jnp.float32).astype(dt)
    dweight = None
    if w4 is not None:
        dw4 = (p.astype(jnp.float32) *
               da.astype(jnp.float32)).astype(weight.dtype)
        dweight = dw4.transpose(0, 2, 1, 3).reshape(weight.shape)
        ds = da * w4.astype(da.dtype)
    else:
        ds = da
    dsim = (p.astype(jnp.float32) *
            (ds.astype(jnp.float32) - s[..., None])).astype(dt)
    dq4 = jnp.einsum("ghqk,ghkd->ghqd", dsim, k4,
                     preferred_element_type=jnp.float32)
    dk4 = jnp.einsum("ghqk,ghqd->ghkd", dsim, q4,
                     preferred_element_type=jnp.float32)
    dbias_flat = None
    if bias_flat is not None:
        db = dsim.astype(jnp.float32).sum(axis=0)
        H, Tq, Tk = db.shape
        dbias_flat = db.transpose(1, 0, 2).reshape(
            Tq, H * Tk).astype(bias_flat.dtype)
    dmask = jnp.zeros_like(mask) if mask is not None else None
    return (_packed_from_4d(dq4).astype(q.dtype),
            _packed_from_4d(dk4).astype(k.dtype),
            _packed_from_4d(dv4).astype(v.dtype),
            dbias_flat, dmask, dweight)


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_window_attention_packed(q, k, v, n_heads: int, bias_flat=None,
                                  mask=None, weight=None,
                                  use_pallas: bool = True,
                                  interpret: bool = False):
    """Packed-layout fused attention: q (G, Tq, H*D) pre-scaled,
    k/v (G, Tk, H*D) with heads interleaved in the channel axis (the
    natural Dense-projection layout — no transposes are materialized);
    bias_flat (Tq, H*Tk) with column block h holding head h's bias, or
    None; mask (G, Tk) or None; weight (G, Tq, H*Tk) post-softmax
    multiplicative weights (attention dropout: pass keep_mask/(1-p); the
    softmax denominator stays undropped, matching torch
    Dropout-after-Softmax semantics) or None.
    Returns (G, Tq, H*D) in q's dtype.  Differentiable (backward
    recomputes attention in XLA; the saved weight is reused so dropout
    is consistent across fwd/bwd).

    Heads are grouped into 128-channel chunks: the block-diagonal
    trick's cost scales with (heads x group_channels), so running
    H=8/D=32 as one group does 2x the MXU work of two H=4 groups at
    identical utilization (measured 2.9 -> 1.5 ms per attention on the
    cooperative-LiDAR fusion).  Groups are independent heads — the
    same math."""
    return _fwa_packed_jit(q, k, v, bias_flat, mask, weight, n_heads,
                           use_pallas, interpret, _flash_bwd_enabled(),
                           _bwd_f32_enabled())


def _flash_bwd_enabled() -> bool:
    """COBEVT_FLASH_BWD=0 routes attention through the plain XLA
    composite (stock autodiff backward, f32 intermediates) instead of
    the custom flash-identity VJP — the A/B lever for validating the
    shipped bf16 training backward on hardware
    (tools/validate_kernels.py --train).  Read per call and threaded as
    a static jit arg so the trace cache keys on it."""
    import os

    return os.environ.get("COBEVT_FLASH_BWD", "1") != "0"


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "use_pallas", "interpret",
                                    "flash", "bwd_f32"))
def _fwa_packed_jit(q, k, v, bias_flat, mask, weight, n_heads,
                    use_pallas, interpret, flash, bwd_f32):
    if not flash:
        return _packed_forward_core(q, k, v, bias_flat, mask, weight,
                                    n_heads, False, False)
    C = q.shape[-1]
    D = C // n_heads
    g = max(1, 128 // D)
    if D < 128 and n_heads > g and n_heads % g == 0:
        Tk = k.shape[1]
        outs = []
        for i in range(n_heads // g):
            ch = slice(i * g * D, (i + 1) * g * D)
            bf = (None if bias_flat is None
                  else bias_flat[:, i * g * Tk:(i + 1) * g * Tk])
            wt = (None if weight is None
                  else weight[:, :, i * g * Tk:(i + 1) * g * Tk])
            outs.append(_fused_packed(q[..., ch], k[..., ch], v[..., ch],
                                      bf, mask, wt, g, use_pallas,
                                      interpret, bwd_f32))
        return jnp.concatenate(outs, axis=-1)
    return _fused_packed(q, k, v, bias_flat, mask, weight, n_heads,
                         use_pallas, interpret, bwd_f32)


def fused_window_attention(q, k, v, bias=None, mask=None,
                           use_pallas: bool = True,
                           interpret: bool = False):
    """q: (G, H, Tq, D) pre-scaled; k, v: (G, H, Tk, D);
    bias: (H, Tq, Tk) or None; mask: (G, Tk) or None.
    Returns (G, H, Tq, D) in q's dtype.  Differentiable: forward runs
    the fused Pallas kernel on TPU, backward recomputes the attention
    matrix in XLA (nothing large is saved).  `interpret=True` runs the
    kernel body in interpreter mode (CPU testing)."""
    return _fwa_jit(q, k, v, bias, mask, use_pallas, interpret,
                    _flash_bwd_enabled(), _bwd_f32_enabled())


@functools.partial(jax.jit,
                   static_argnames=("use_pallas", "interpret", "flash",
                                    "bwd_f32"))
def _fwa_jit(q, k, v, bias, mask, use_pallas, interpret, flash, bwd_f32):
    if not flash:
        return _forward_core(q, k, v, bias, mask, False, False)
    return _fused(q, k, v, bias, mask, use_pallas, interpret, bwd_f32)
