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

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused(q, k, v, bias, mask, use_pallas, interpret):
    return _forward_core(q, k, v, bias, mask, use_pallas, interpret)


def _fused_fwd(q, k, v, bias, mask, use_pallas, interpret):
    out = _forward_core(q, k, v, bias, mask, use_pallas, interpret)
    return out, (q, k, v, bias, mask)


def _fused_bwd(use_pallas, interpret, res, g):
    q, k, v, bias, mask = res
    sim = jnp.einsum("ghqd,ghkd->ghqk", q, k,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        sim = sim + bias[None].astype(sim.dtype)
    if mask is not None:
        sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0,
                              NEG_INF).astype(sim.dtype)
    p = jax.nn.softmax(sim, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("ghqk,ghqd->ghkd", p, g32)
    dp = jnp.einsum("ghqd,ghkd->ghqk", g32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("ghqk,ghkd->ghqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("ghqk,ghqd->ghkd", ds, q.astype(jnp.float32))
    dbias = ds.sum(axis=0).astype(bias.dtype) if bias is not None \
        else None
    dmask = jnp.zeros_like(mask) if mask is not None else None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias, dmask)


_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def fused_window_attention(q, k, v, bias=None, mask=None,
                           use_pallas: bool = True,
                           interpret: bool = False):
    """q: (G, H, Tq, D) pre-scaled; k, v: (G, H, Tk, D);
    bias: (H, Tq, Tk) or None; mask: (G, Tk) or None.
    Returns (G, H, Tq, D) in q's dtype.  Differentiable: forward runs
    the fused Pallas kernel on TPU, backward recomputes the attention
    matrix in XLA (nothing large is saved).  `interpret=True` runs the
    kernel body in interpreter mode (CPU testing)."""
    return _fused(q, k, v, bias, mask, use_pallas, interpret)
