"""Monolithic fused FuseBEVT (SwapFusionEncoder) Pallas kernel.

The cooperative fusion stack (reference swap_fusion_modules.py:233) is
depth x [window attention -> FFN -> grid attention -> FFN] + agent-mean
head over a (B, L, 32, 32, 128) BEV stack — ~1.3 MB of state paying ~12
HBM round trips plus dozens of small-op dispatches per frame (measured
~1.05 ms device time on the 5-agent CorpBEVT forward).  This kernel
keeps the whole stack resident in VMEM: the grid walks (batch, block,
half); each step runs LayerNorm -> QKV -> per-window packed
block-diagonal attention with the 3D relative-position bias and the
additive key mask -> output projection -> residual -> LayerNorm -> FFN
(erf-GELU) -> residual, updating the state scratch in place.  The final
step appends the agent-mean + LayerNorm + Linear head and writes the
fused (B, H, W, D) map.

Window/grid ("swap") partitions are value-level reshapes+transposes of
the resident state — sublane permutes, never HBM traffic.  Everything
but the per-window attention runs as one batched matmul over all
windows' tokens.

Inference-path only; the model falls back to the stock composite for
training / off-TPU (the module path itself — see
models/fusion/swap_fusion.py).  The 3D bias is expanded from the
Toeplitz table in XLA (tiny einsums, as the stock path does) and
streamed per (block, half).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cobevt_tpu.ops.fused_cross_attention import _gelu_exact, _ln_f32
from cobevt_tpu.ops.window_attention import (
    VMEM_CEILING,
    _head_blockmask,
    _head_expander,
    _head_indicator,
)

NEG_INF = -1e9


def _attn_bias_mask(q, k, v, n_heads, bias, mask_row, q_chunk=160):
    """q (T, C) pre-scaled, k/v (T, C), bias (T, H*T), mask_row
    (1, H*T) additive -> (T, C) f32.  Query rows processed in chunks to
    bound the f32 similarity tile."""
    Tk, C = k.shape
    bm = _head_blockmask(n_heads, Tk, C, k.dtype)
    k_bd = jnp.concatenate([k] * n_heads, axis=0) * bm
    v_bd = jnp.concatenate([v] * n_heads, axis=0) * bm
    if Tk % 128 == 0:
        ind = None
    else:
        ind = _head_indicator(n_heads, Tk, jnp.bfloat16)
    expander = _head_expander(n_heads, C)
    Tq = q.shape[0]
    n_chunks = max(1, -(-Tq // q_chunk))
    step = -(-Tq // n_chunks)
    outs = []
    for c in range(n_chunks):
        qs = q[c * step:(c + 1) * step]
        sim = lax.dot_general(qs, k_bd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        sim = sim + bias[c * step:(c + 1) * step].astype(jnp.float32) \
            + mask_row.astype(jnp.float32)
        m = jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim - m).astype(v_bd.dtype)
        if ind is None:
            s_h = jnp.concatenate(
                [jnp.sum(e[:, h * Tk:(h + 1) * Tk].astype(jnp.float32),
                         axis=-1, keepdims=True)
                 for h in range(n_heads)], axis=-1)
            s_h = jnp.pad(s_h, ((0, 0), (0, 128 - n_heads)),
                          constant_values=1.0)
        else:
            s_h = jnp.dot(e, ind.astype(e.dtype),
                          preferred_element_type=jnp.float32)
        out_un = jnp.dot(e, v_bd, preferred_element_type=jnp.float32)
        norm = jnp.dot(s_h, expander, preferred_element_type=jnp.float32)
        outs.append(out_un / norm)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _kernel(x_ref, ma_ref, am_ref, b_ref, p_ref, h_ref, o_ref, xs_ref,
            ys_ref, *, L, H, W, D, w, heads, depth, mlp, mean_over_valid,
            p_slices, compute_dtype):
    blk = pl.program_id(1)
    half = pl.program_id(2)
    X, Y = H // w, W // w
    T = L * w * w
    n_win = X * Y
    scale = (D // heads) ** -0.5

    @pl.when(jnp.logical_and(blk == 0, half == 0))
    def _():
        xs_ref[...] = x_ref[0].astype(xs_ref.dtype)

    def pget(name):
        lo, hi = p_slices[name]
        return p_ref[0, 0, lo:hi, :]

    g_a, b_a = pget("ln_a")[0, :D], pget("ln_a")[1, :D]
    wqkv = pget("wqkv")[:, :3 * D]
    wout = pget("wout")[:, :D]
    g_f, b_f = pget("ln_f")[0, :D], pget("ln_f")[1, :D]
    w1 = pget("w1")[:, :mlp]
    w2 = pget("w2")[:, :D]
    fb = pget("fbias")
    b1, b2 = fb[0, :mlp], fb[1, :D]

    def sublayer_window(src_ref, wi, xi, yi):
        """One window's attention + FFN, read/written in place on
        `src_ref` (liveness stays one window wide)."""
        tok = src_ref[:, xi * w:(xi + 1) * w, yi * w:(yi + 1) * w, :] \
            .reshape(T, D)
        t = _ln_f32(tok, g_a, b_a).astype(compute_dtype)
        qkv = lax.dot_general(t, wqkv, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        qkv = qkv.astype(compute_dtype)
        q = qkv[:, :D] * scale
        att = _attn_bias_mask(q, qkv[:, D:2 * D], qkv[:, 2 * D:], heads,
                              b_ref[0, 0], ma_ref[0, 0, wi, :][None, :])
        att = lax.dot_general(att.astype(compute_dtype), wout,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        x1 = tok.astype(jnp.float32) + att
        x1c = x1.astype(compute_dtype)
        f = _ln_f32(x1c, g_f, b_f).astype(compute_dtype)
        f = lax.dot_general(f, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
            + b1[None, :]
        f = _gelu_exact(f).astype(compute_dtype)
        f = lax.dot_general(f, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
            + b2[None, :]
        out = (x1 + f).astype(src_ref.dtype).reshape(L, w, w, D)
        src_ref[:, xi * w:(xi + 1) * w, yi * w:(yi + 1) * w, :] = out

    @pl.when(half == 0)
    def _win():
        for wi in range(n_win):
            sublayer_window(xs_ref, wi, wi // Y, wi % Y)

    @pl.when(half == 1)
    def _grid():
        # factor-swap into the staging scratch: grid cells of the
        # swapped layout are contiguous windows
        v = xs_ref[...]
        ys_ref[...] = v.reshape(L, w, X, w, Y, D) \
            .transpose(0, 2, 1, 4, 3, 5).reshape(L, H, W, D)
        for wi in range(n_win):
            sublayer_window(ys_ref, wi, wi // Y, wi % Y)
        u = ys_ref[...]
        xs_ref[...] = u.reshape(L, X, w, Y, w, D) \
            .transpose(0, 2, 1, 4, 3, 5).reshape(L, H, W, D)

    @pl.when(jnp.logical_and(blk == depth - 1, half == 1))
    def _head():
        g_h, b_h = h_ref[0, :D], h_ref[1, :D]
        wh = h_ref[2:2 + D, :D]
        bh = h_ref[2 + D, :D]
        state = xs_ref[...].astype(jnp.float32)       # (L, H, W, D)
        if mean_over_valid:
            am = am_ref[0]                            # (8, L), row 0 live
            wsum = jnp.zeros((H, W, D), jnp.float32)
            tot = jnp.zeros((), jnp.float32)
            for li in range(L):
                wsum = wsum + state[li] * am[0, li]
                tot = tot + am[0, li]
            pooled = wsum / jnp.maximum(tot, 1.0)
        else:
            pooled = state.mean(axis=0)
        ptok = pooled.reshape(H * W, D).astype(compute_dtype)
        t = _ln_f32(ptok, g_h, b_h).astype(compute_dtype)
        y = lax.dot_general(t, wh, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
            + bh[None, :]
        o_ref[0] = y.reshape(H, W, D).astype(o_ref.dtype)


def _pack_layer_params(layers, D, mlp, dtype):
    """layers: list over depth of (win_params, grid_params), each a dict
    with ln_a, wqkv, wout, ln_f, w1, b1, w2, b2.  Returns
    (depth, 2, R, width) plus the row-slice map."""
    width = max(3 * D, mlp, D)

    def row(vec, n):
        return jnp.pad(vec.astype(dtype).reshape(1, -1),
                       ((0, 0), (0, width - n)))

    def mat(m):
        return jnp.pad(m.astype(dtype), ((0, 0), (0, width - m.shape[1])))

    slices = {}

    def pack_one(p):
        rows = []
        at = 0

        def add(name, block):
            nonlocal at
            rows.append(block)
            slices[name] = (at, at + block.shape[0])
            at += block.shape[0]

        add("ln_a", jnp.concatenate([row(p["ln_a"][0], D),
                                     row(p["ln_a"][1], D)], 0))
        add("wqkv", mat(p["wqkv"]))
        add("wout", mat(p["wout"]))
        add("ln_f", jnp.concatenate([row(p["ln_f"][0], D),
                                     row(p["ln_f"][1], D)], 0))
        add("w1", mat(p["w1"]))
        add("w2", mat(p["w2"]))
        add("fbias", jnp.concatenate([row(p["b1"], mlp),
                                      row(p["b2"], D)], 0))
        return jnp.concatenate(rows, 0)

    stacked = jnp.stack([jnp.stack([pack_one(wp), pack_one(gp)], 0)
                         for wp, gp in layers], 0)
    return stacked, tuple(sorted(slices.items()))


@functools.partial(
    jax.jit, static_argnames=("window", "heads", "mlp", "p_slices",
                              "mean_over_valid", "interpret"))
def fused_swap_fusion(x, mask_add, agent_mask, bias_stack, layer_params,
                      head_params, window: int, heads: int, mlp: int,
                      p_slices, mean_over_valid: bool = False,
                      interpret: bool = False):
    """x (B, L, H, W, D); mask_add (B, 2, XY, heads*T) additive key-mask
    rows (0 / NEG_INF per half, shared across blocks); bias_stack
    (depth, 2, T, heads*T) f32; layer_params + p_slices from
    `_pack_layer_params` (p_slices as a hashable tuple of
    (name, lo, hi)); head_params (3+D, D) rows [ln_scale, ln_bias,
    W rows..., bias]; agent_mask (B, 8, L) f32 (row 0 live).  Returns
    (B, H, W, D) in x's dtype.  TPU-only — callers fall back to the
    stock module path off-TPU."""
    B, L, H, W, D = x.shape
    depth = bias_stack.shape[0]
    T = L * window * window
    n_win = (H // window) * (W // window)

    kernel = functools.partial(
        _kernel, L=L, H=H, W=W, D=D, w=window, heads=heads, depth=depth,
        mlp=mlp, mean_over_valid=mean_over_valid,
        p_slices=dict(p_slices), compute_dtype=x.dtype)

    # bias/mask ride in the compute dtype (upcast to f32 inside the
    # kernel's similarity accumulation) to halve their VMEM footprint
    bias_stack = bias_stack.astype(x.dtype)
    mask_add = mask_add.astype(x.dtype)

    grid = (B, depth, 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, H, W, D), lambda b, k, h: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_win, heads * T),
                         lambda b, k, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, L), lambda b, k, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, heads * T),
                         lambda b, k, h: (k, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1) + tuple(layer_params.shape[2:]),
                         lambda b, k, h: (k, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(head_params.shape, lambda b, k, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, D),
                               lambda b, k, h: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        scratch_shapes=[pltpu.VMEM((L, H, W, D), x.dtype),
                        pltpu.VMEM((L, H, W, D), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * depth * 2 * n_win * T * heads * T * (D // heads)
            * 2,
            bytes_accessed=x.size * 2 + B * H * W * D * 2,
            transcendentals=B * depth * 2 * n_win * T * heads * T),
        interpret=interpret,
    )(x, mask_add, agent_mask, bias_stack, layer_params, head_params)


# ---------------------------------------------------------------------------
# streaming variant: window-at-a-time, for states too large to keep
# resident (the cooperative-LiDAR fusion is (5, 96, 176, 256) = 43 MB)
# ---------------------------------------------------------------------------
#
# Same packed parameter/bias/mask format as the monolithic kernel, but
# the grid walks (batch, x-tile, y-tile) and each step applies ONE
# sublayer (LN -> QKV -> grouped block-diagonal attention -> out-proj ->
# residual -> LN -> FFN -> residual) to one window block; weights and
# the (T, heads*T) bias stay resident across steps.  The four sublayers
# of each SwapFusionBlock run as four pallas_calls with an XLA
# factor-swap transpose between the window and grid halves (the same
# data movement the stock module path pays in its rearranges).  Heads
# are split into 128-channel groups inside the kernel so the
# block-diagonal FLOP inflation is 128/dim_head, not heads (measured on
# the per-attention kernel: the H=8/D=32 ungrouped form doubles MXU
# work for nothing).


def _grouped_attn(q, k, v, heads, bias, mask_row):
    """_attn_bias_mask with heads split into 128-channel groups; bias /
    mask columns per head are contiguous so groups slice cleanly."""
    Tk, C = k.shape
    D = C // heads
    g_heads = max(1, 128 // D)
    if D >= 128 or heads <= g_heads or heads % g_heads:
        return _attn_bias_mask(q, k, v, heads, bias, mask_row)
    outs = []
    gC = g_heads * D
    for gi in range(heads // g_heads):
        ch = slice(gi * gC, (gi + 1) * gC)
        cols = slice(gi * g_heads * Tk, (gi + 1) * g_heads * Tk)
        outs.append(_attn_bias_mask(
            q[:, ch], k[:, ch], v[:, ch], g_heads,
            bias[:, cols], mask_row[:, cols]))
    return jnp.concatenate(outs, axis=-1)


def _stream_kernel(x_ref, ma_ref, b_ref, p_ref, o_ref, *, L, w, D, heads,
                   mlp, p_slices, compute_dtype, Y, nblk):
    T = L * w * w
    scale = (D // heads) ** -0.5
    # this window's additive mask row out of the 8-window mask block
    # (sublane-divisibility: a (1, hT) block on the n_win axis is not a
    # legal TPU block shape).  Selected with a one-hot matmul: a
    # dynamic sublane slice leaves an unknown-offset layout Mosaic
    # cannot re-broadcast.
    wi = pl.program_id(1) * Y + pl.program_id(2)
    rowsel = (jax.lax.broadcasted_iota(jnp.int32, (1, nblk), 1)
              == wi % nblk).astype(jnp.float32)
    mask_row = jax.lax.dot_general(
        rowsel, ma_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # (1, heads*T)

    def pget(name):
        lo, hi = p_slices[name]
        return p_ref[0, 0, lo:hi, :]

    g_a, b_a = pget("ln_a")[0, :D], pget("ln_a")[1, :D]
    wqkv = pget("wqkv")[:, :3 * D]
    wout = pget("wout")[:, :D]
    g_f, b_f = pget("ln_f")[0, :D], pget("ln_f")[1, :D]
    w1 = pget("w1")[:, :mlp]
    w2 = pget("w2")[:, :D]
    fb = pget("fbias")
    b1, b2 = fb[0, :mlp], fb[1, :D]

    tok = x_ref[0].reshape(T, D)
    t = _ln_f32(tok, g_a, b_a).astype(compute_dtype)
    qkv = lax.dot_general(t, wqkv, (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    qkv = qkv.astype(compute_dtype)
    q = qkv[:, :D] * scale
    att = _grouped_attn(q, qkv[:, D:2 * D], qkv[:, 2 * D:], heads,
                        b_ref[0, 0], mask_row)
    att = lax.dot_general(att.astype(compute_dtype), wout,
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    x1 = tok.astype(jnp.float32) + att
    x1c = x1.astype(compute_dtype)
    f = _ln_f32(x1c, g_f, b_f).astype(compute_dtype)
    f = lax.dot_general(f, w1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b1[None, :]
    f = _gelu_exact(f).astype(compute_dtype)
    f = lax.dot_general(f, w2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) + b2[None, :]
    o_ref[0] = (x1 + f).astype(o_ref.dtype).reshape(L, w, w, D)


@functools.partial(
    jax.jit, static_argnames=("window", "heads", "mlp", "p_slices",
                              "mean_over_valid", "interpret"))
def fused_swap_fusion_streaming(x, mask_add, agent_mask, bias_stack,
                                layer_params, head_params, window: int,
                                heads: int, mlp: int, p_slices,
                                mean_over_valid: bool = False,
                                interpret: bool = False):
    """Same contract as `fused_swap_fusion` for states that exceed the
    whole-resident VMEM budget."""
    B, L, H, W, D = x.shape
    depth = bias_stack.shape[0]
    w = window
    X, Y = H // w, W // w
    T = L * w * w
    n_win = X * Y
    bias_stack = bias_stack.astype(jnp.float32)
    mask_add = mask_add.astype(jnp.float32)

    nblk = 8 if n_win % 8 == 0 else n_win
    kernel = functools.partial(
        _stream_kernel, L=L, w=w, D=D, heads=heads, mlp=mlp,
        p_slices=dict(p_slices), compute_dtype=x.dtype, Y=Y, nblk=nblk)

    def sublayer(xw, d, half):
        return pl.pallas_call(
            kernel,
            grid=(B, X, Y),
            in_specs=[
                pl.BlockSpec((1, L, w, w, D),
                             lambda b, xi, yi: (b, 0, xi, yi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, nblk, heads * T),
                             lambda b, xi, yi:
                             (b, half, (xi * Y + yi) // nblk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T, heads * T),
                             lambda b, xi, yi: (d, half, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1) + tuple(layer_params.shape[2:]),
                             lambda b, xi, yi: (d, half, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, L, w, w, D),
                                   lambda b, xi, yi: (b, 0, xi, yi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, H, W, D), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=B * n_win * (
                    # qkv + out projections + FFN per token
                    T * 2 * (3 * D * D + D * D + 2 * D * mlp)
                    # grouped block-diagonal attention (two matmuls,
                    # contraction width 128 per group)
                    + 4 * T * T * 128 * max(
                        1, heads // max(1, 128 // (D // heads)))),
                bytes_accessed=x.size * 2 * 2,
                transcendentals=B * n_win * T * heads * T),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(
                    T * heads * T * 4 + 24 * 1024 * 1024, VMEM_CEILING)),
            interpret=interpret,
        )(xw, mask_add, bias_stack, layer_params)

    def to_grid(z):
        # window layout rows (x, w1) -> grid layout rows (w1, x) tiled
        return z.reshape(B, L, w, X, w, Y, D) \
            .transpose(0, 1, 3, 2, 5, 4, 6).reshape(B, L, H, W, D)

    def from_grid(z):
        return z.reshape(B, L, X, w, Y, w, D) \
            .transpose(0, 1, 3, 2, 5, 4, 6).reshape(B, L, H, W, D)

    for d in range(depth):
        x = sublayer(x, d, 0)
        x = from_grid(sublayer(to_grid(x), d, 1))

    g_h, b_h = head_params[0, :D], head_params[1, :D]
    w_h = head_params[2:2 + D, :D]
    bias_h = head_params[2 + D, :D]
    state = x.astype(jnp.float32)
    if mean_over_valid:
        am = agent_mask[:, 0, :].astype(jnp.float32)   # (B, L)
        wsum = (state * am[:, :, None, None, None]).sum(axis=1)
        pooled = wsum / jnp.maximum(am.sum(axis=1), 1.0)[
            :, None, None, None]
    else:
        pooled = state.mean(axis=1)
    t = _ln_f32(pooled.astype(x.dtype), g_h, b_h).astype(x.dtype)
    y = jnp.einsum("bhwc,cd->bhwd", t, w_h.astype(x.dtype),
                   preferred_element_type=jnp.float32) \
        + bias_h.astype(jnp.float32)[None, None, None, :]
    return y.astype(x.dtype)
