"""Fully fused cross-view window attention (FAX local branch).

The reference pipeline for one FAX stage's local branch
(fax_modules.py:179,251) is: build the per-camera BEV query
(normalize(w_embed - c_embed) + x), window-partition query and camera
features, LayerNorm + project Q/K/V, windowed softmax attention, output
projection, mean over cameras, skip add.  Run as separate XLA ops this
costs ~5 HBM round trips over (B, n, H, W, D)-sized tensors — measured
2.75 ms of the 5-agent CorpBEVT forward at stage 0, of which only 1.08
ms is attention math (docs/DESIGN.md).

This kernel does the whole chain in one Pallas program:

  * Windowing is BLOCK INDEXING, not data movement: the grid walks
    (batch, window-row); each step slices its windows out of resident
    VMEM blocks.  The window_partition / window_reverse transposes
    vanish (they were XLA "data formatting" time).
  * The camera-tiled query is never materialized in HBM: the kernel
    reads x (B,H,W,D) + w_embed (H,W,D) + c_embed (B,n,D) and builds
    normalize(w_embed - c_embed_i) + x per token in VMEM.
  * LayerNorms run in f32 on VMEM tiles; Q/K/V/O projections are MXU
    matmuls on resident weights.
  * Attention reuses the packed block-diagonal head trick from
    ops/window_attention.py (full-width MXU matmuls, per-head softmax
    normalization via lane-aligned slice sums).
  * The mean over cameras commutes with the output projection (both
    linear), so it runs BEFORE the O-projection — n x less proj work —
    and the skip add lands on the f32 accumulator.

Inference-path only (models fall back to the stock composite for
training / off-TPU); numerics equal the stock path at bf16 tolerance.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cobevt_tpu.ops.window_attention import (
    _head_blockmask,
    _head_expander,
    _head_indicator,
    fused_window_attention_packed,
)

NEG_INF = -1e9


def _ln_f32(t, gamma, beta, eps=1e-5):
    t = t.astype(jnp.float32)
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    return (t - mu) * lax.rsqrt(var + eps) * gamma[None, :] + beta[None, :]


def _packed_attn(q, k, v, n_heads, q_chunk=256):
    """q (Tq, C) pre-scaled, k/v (Tk, C) packed heads -> (Tq, C) f32.
    Query rows processed in chunks so the f32 similarity tile stays
    bounded for large-Tq stages (softmax is per-row)."""
    Tk, C = k.shape
    bm = _head_blockmask(n_heads, Tk, C, k.dtype)
    k_bd = jnp.concatenate([k] * n_heads, axis=0) * bm
    v_bd = jnp.concatenate([v] * n_heads, axis=0) * bm
    ind = (None if Tk % 128 == 0
           else _head_indicator(n_heads, Tk, jnp.bfloat16))
    expander = _head_expander(n_heads, C)
    Tq = q.shape[0]
    outs = []
    for c0 in range(0, Tq, q_chunk):
        qs = q[c0:min(c0 + q_chunk, Tq)]
        sim = lax.dot_general(qs, k_bd, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
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
        norm = jnp.dot(s_h, expander,
                       preferred_element_type=jnp.float32)
        outs.append(out_un / norm)
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _erf_f32(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — far below
    bf16 resolution); Mosaic has no erf primitive, but exp lowers."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(t):
    """erf-form GELU on f32, matching torch nn.GELU default (not the
    tanh approximation)."""
    return 0.5 * t * (1.0 + _erf_f32(t * (2.0 ** -0.5)))


def _kernel(x_ref, w_ref, c_ref, k_ref, v_ref, p_ref, o_ref, *,
            n_cam, wh, ww, kh, kw, n_heads, scale, add_skip, has_embed,
            has_mlp, has_post_ln, hidden, p_slices, C, compute_dtype):
    D = x_ref.shape[-1]
    X = x_ref.shape[2] // ww
    T_win = wh * ww
    Tk_cam = kh * kw

    def pget(name):
        lo, hi = p_slices[name]
        return p_ref[lo:hi, :]

    gq, bq = pget("ln_q")[0, :D], pget("ln_q")[1, :D]
    gk, bk = pget("ln_k")[0, :D], pget("ln_k")[1, :D]
    gv, bv = pget("ln_v")[0, :D], pget("ln_v")[1, :D]
    wq, wk, wv = (pget("wq")[:, :C], pget("wk")[:, :C],
                  pget("wv")[:, :C])
    wo = pget("wo")[:, :D]
    pb = pget("pbias")
    bqv, bkv, bvv, bo = pb[0, :C], pb[1, :C], pb[2, :C], pb[3, :D]
    if has_mlp:
        gm, bm = pget("ln_m")[0, :D], pget("ln_m")[1, :D]
        w1 = pget("w1")[:, :hidden]
        w2 = pget("w2")[:, :D]
        mb = pget("mbias")
        b1, b2 = mb[0, :hidden], mb[1, :D]
    if has_post_ln:
        gp, bp = pget("ln_p")[0, :D], pget("ln_p")[1, :D]

    for wx in range(X):
        xw = x_ref[0, :, wx * ww:(wx + 1) * ww, :]
        xt = xw.reshape(T_win, D)

        # --- query: LN(normalize(w_embed - c_embed_i) + x) @ Wq ---
        if has_embed:
            wemb = w_ref[:, wx * ww:(wx + 1) * ww, :] \
                .reshape(T_win, D).astype(jnp.float32)
            qs = []
            for i in range(n_cam):
                ci = c_ref[0, i, :].astype(jnp.float32)   # (D,)
                emb = wemb - ci[None, :]
                # reference normalizes with ||.|| + 1e-7 (fax.py:321)
                nrm = jnp.sqrt(jnp.sum(emb * emb, axis=-1,
                                       keepdims=True)) + 1e-7
                emb = emb / nrm
                qs.append(_ln_f32(emb.astype(compute_dtype)
                                  + xt.astype(compute_dtype), gq, bq))
            qn = jnp.concatenate(qs, axis=0)              # (n*T_win, D)
        else:
            qn = _ln_f32(xt, gq, bq)
        q = (lax.dot_general(qn.astype(compute_dtype), wq,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
             + bqv[None, :]) * scale
        q = q.astype(compute_dtype)

        # --- keys / values ---
        kt = k_ref[0, :, :, wx * kw:(wx + 1) * kw, :] \
            .reshape(n_cam * Tk_cam, D)
        vt = v_ref[0, :, :, wx * kw:(wx + 1) * kw, :] \
            .reshape(n_cam * Tk_cam, D)
        kn = _ln_f32(kt, gk, bk).astype(compute_dtype)
        vn = _ln_f32(vt, gv, bv).astype(compute_dtype)
        k = (lax.dot_general(kn, wk, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
             + bkv[None, :]).astype(compute_dtype)
        v = (lax.dot_general(vn, wv, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
             + bvv[None, :]).astype(compute_dtype)

        out = _packed_attn(q, k, v, n_heads)              # (Tq, C) f32

        # mean over cameras (commutes with the O projection)
        if has_embed and n_cam > 1:
            acc = out[0:T_win]
            for i in range(1, n_cam):
                acc = acc + out[i * T_win:(i + 1) * T_win]
            out = acc / n_cam

        y = lax.dot_general(out.astype(compute_dtype), wo,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) \
            + bo[None, :]
        if add_skip:
            y = y + xt.astype(jnp.float32)

        if has_mlp:
            # token MLP: y + Dense2(gelu(Dense1(LN(y)))), matching
            # mlp_seq + prenorm in models/fax.py
            yc = y.astype(compute_dtype)
            t = _ln_f32(yc, gm, bm).astype(compute_dtype)
            hdn = lax.dot_general(t, w1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) \
                + b1[None, :]
            hdn = _gelu_exact(hdn).astype(compute_dtype)
            m = lax.dot_general(hdn, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32) \
                + b2[None, :]
            y = yc.astype(jnp.float32) + m
        if has_post_ln:
            y = _ln_f32(y.astype(compute_dtype), gp, bp)

        o_ref[0, :, wx * ww:(wx + 1) * ww, :] = \
            y.reshape(wh, ww, D).astype(o_ref.dtype)


def _pack_params(params, D, C, dtype, mlp=None, post_ln=None):
    """Stack every weight/bias row-wise into one (R, width) operand so
    the kernel takes a single resident VMEM ref."""
    hidden = mlp["w1"].shape[1] if mlp is not None else 0
    width = max(C, D, hidden)

    def row(vec, w):
        return jnp.pad(vec.astype(dtype).reshape(1, -1),
                       ((0, 0), (0, width - w)))

    def mat(m):
        return jnp.pad(m.astype(dtype), ((0, 0), (0, width - m.shape[1])))

    rows = []
    slices = {}

    def add(name, block):
        lo = sum(r.shape[0] for r in rows)
        rows.append(block)
        slices[name] = (lo, lo + block.shape[0])

    add("ln_q", jnp.concatenate([row(params["ln_q"][0], D),
                                 row(params["ln_q"][1], D)], 0))
    add("ln_k", jnp.concatenate([row(params["ln_k"][0], D),
                                 row(params["ln_k"][1], D)], 0))
    add("ln_v", jnp.concatenate([row(params["ln_v"][0], D),
                                 row(params["ln_v"][1], D)], 0))
    add("wq", mat(params["wq"]))
    add("wk", mat(params["wk"]))
    add("wv", mat(params["wv"]))
    add("wo", mat(params["wo"]))
    add("pbias", jnp.concatenate(
        [row(params["bq"], C), row(params["bk"], C), row(params["bv"], C),
         row(params["bo"], D)], 0))
    if mlp is not None:
        add("ln_m", jnp.concatenate([row(mlp["ln"][0], D),
                                     row(mlp["ln"][1], D)], 0))
        add("w1", mat(mlp["w1"]))
        add("w2", mat(mlp["w2"]))
        add("mbias", jnp.concatenate([row(mlp["b1"], hidden),
                                      row(mlp["b2"], D)], 0))
    if post_ln is not None:
        add("ln_p", jnp.concatenate([row(post_ln[0], D),
                                     row(post_ln[1], D)], 0))
    packed = jnp.concatenate(rows, axis=0)
    return packed, slices


def _xla_composite(x, w_embed, c_embed, key, val, params, q_win, k_win,
                   n_heads, scale, add_skip, compute_dtype,
                   mlp=None, post_ln=None, use_pallas=False,
                   interpret=False):
    """Stock-math fallback, mirroring models/fax.py CrossWinAttention.

    The attention core routes through `fused_window_attention_packed`
    — the same flash-identity custom-VJP op the non-fused module path
    uses (models/fax.py:262) — so differentiating this composite (the
    fused stage's backward, `_cva_bwd`) saves/streams only bf16
    (Tq,Tk)-sized tensors instead of the f32 softmax residuals stock
    autodiff keeps (trace: 1.3 GB per stage-0 tensor, docs/DESIGN.md
    round 4), and the backward's recompute runs the Pallas kernel when
    `use_pallas` on TPU.  With f32 inputs (the CPU parity suite) the
    packed reference is the identical f32 einsum chain."""
    B, H, W, D = x.shape
    n = key.shape[1]
    wh, ww = q_win
    kh, kw = k_win
    C = params["wq"].shape[1]

    if w_embed is not None:
        emb = w_embed[None, None].astype(jnp.float32) - \
            c_embed[:, :, None, None].astype(jnp.float32)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-7)
        query = emb.astype(compute_dtype) + \
            x[:, None].astype(compute_dtype)
    else:
        query = x[:, None].astype(compute_dtype)

    def windows(t, a, b):
        # (B, n, H, W, D) -> (B, X*Y, n*a*b, D)
        Bn, nn, Hh, Ww, Dd = t.shape
        t = t.reshape(Bn, nn, Hh // a, a, Ww // b, b, Dd)
        t = t.transpose(0, 2, 4, 1, 3, 5, 6)
        return t.reshape(Bn, (Hh // a) * (Ww // b), nn * a * b, Dd)

    def ln(t, g, b_):
        t32 = t.astype(jnp.float32)
        mu = t32.mean(-1, keepdims=True)
        var = ((t32 - mu) ** 2).mean(-1, keepdims=True)
        return ((t32 - mu) * lax.rsqrt(var + 1e-5) * g + b_) \
            .astype(compute_dtype)

    qw = windows(query, wh, ww)
    kw_ = windows(key, kh, kw)
    vw = windows(val, kh, kw)

    q = (ln(qw, params["ln_q"][0], params["ln_q"][1]) @
         params["wq"].astype(compute_dtype) +
         params["bq"].astype(compute_dtype)) * scale
    k = ln(kw_, params["ln_k"][0], params["ln_k"][1]) @ \
        params["wk"].astype(compute_dtype) + \
        params["bk"].astype(compute_dtype)
    v = ln(vw, params["ln_v"][0], params["ln_v"][1]) @ \
        params["wv"].astype(compute_dtype) + \
        params["bv"].astype(compute_dtype)

    Bq, nwin, Tq, _ = q.shape
    Tk = k.shape[2]
    out = fused_window_attention_packed(
        q.reshape(Bq * nwin, Tq, C), k.reshape(Bq * nwin, Tk, C),
        v.reshape(Bq * nwin, Tk, C), n_heads,
        use_pallas=use_pallas, interpret=interpret)
    out = out.reshape(Bq, nwin, Tq, C)
    out = out.astype(compute_dtype) @ params["wo"].astype(compute_dtype) \
        + params["bo"].astype(jnp.float32)
    # mean over cameras, un-window, skip
    nq = n if w_embed is not None else 1
    X, Y = H // wh, W // ww
    out = out.reshape(B, X, Y, nq, wh, ww, D).mean(axis=3)
    # (B, X, Y, wh, ww, D) -> (B, X, wh, Y, ww, D) -> (B, H, W, D)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, D)
    if add_skip:
        out = out + x.astype(jnp.float32)
    out = out.astype(x.dtype)

    if mlp is not None:
        t = ln(out, mlp["ln"][0], mlp["ln"][1])
        h_ = t @ mlp["w1"].astype(compute_dtype) + \
            mlp["b1"].astype(jnp.float32)
        h_ = (0.5 * h_ * (1.0 + lax.erf(h_ * (2.0 ** -0.5)))) \
            .astype(compute_dtype)
        m = h_ @ mlp["w2"].astype(compute_dtype) + \
            mlp["b2"].astype(jnp.float32)
        out = (out.astype(jnp.float32) + m).astype(x.dtype)
    if post_ln is not None:
        out = ln(out, post_ln[0], post_ln[1])
    return out.astype(x.dtype)


def _forward_impl(x, w_embed, c_embed, key, val, params, mlp, post_ln,
                  q_win, k_win, n_heads, scale, add_skip, use_pallas,
                  interpret):
    B, H, W, D = x.shape
    n_cam = key.shape[1]
    wh, ww = q_win
    kh, kw = k_win
    compute_dtype = x.dtype

    if not use_pallas or (jax.default_backend() != "tpu"
                          and not interpret):
        return _xla_composite(x, w_embed, c_embed, key, val, params,
                              q_win, k_win, n_heads, scale, add_skip,
                              compute_dtype, mlp, post_ln,
                              use_pallas=use_pallas,
                              interpret=interpret)

    C = params["wq"].shape[1]
    packed, slices = _pack_params(params, D, C, compute_dtype, mlp,
                                  post_ln)

    has_embed = w_embed is not None
    if not has_embed:
        w_embed = jnp.zeros((1, 1, D), compute_dtype)
        c_embed = jnp.zeros((B, n_cam, D), compute_dtype)
        w_blk = (1, 1, D)
        w_idx = lambda b, h: (0, 0, 0)
    else:
        w_embed = w_embed.astype(compute_dtype)
        w_blk = (wh, W, D)
        w_idx = lambda b, h: (h, 0, 0)

    kernel = functools.partial(
        _kernel, n_cam=n_cam, wh=wh, ww=ww, kh=kh, kw=kw,
        n_heads=n_heads, scale=scale, add_skip=add_skip,
        has_embed=has_embed, has_mlp=mlp is not None,
        has_post_ln=post_ln is not None,
        hidden=mlp["w1"].shape[1] if mlp is not None else 0,
        p_slices=slices, C=C, compute_dtype=compute_dtype)

    grid = (B, H // wh)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, wh, W, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_blk, w_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cam, D), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cam, kh, key.shape[3], D),
                         lambda b, h: (b, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_cam, kh, key.shape[3], D),
                         lambda b, h: (b, 0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(packed.shape, lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wh, W, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (H // wh) * (W // ww)
            * ((n_cam if has_embed else 1) * wh * ww)
            * (n_heads * n_cam * kh * kw) * C * 2,
            bytes_accessed=(x.size + key.size + val.size + x.size) * 2,
            transcendentals=B * H * W * n_cam * n_heads * kh * kw),
        interpret=interpret,
    )(x, w_embed, c_embed.astype(compute_dtype),
      key.astype(compute_dtype), val.astype(compute_dtype), packed)


# Differentiable wrapper: fused Pallas forward, backward by
# differentiating the exact XLA composite (flash-attention style —
# nothing large is saved, the chain is recomputed).  The fused region
# contains no dropout or batch statistics, so the same program serves
# training and inference.
_fused_cva = jax.custom_vjp(_forward_impl,
                            nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))


def _cva_fwd(x, w_embed, c_embed, key, val, params, mlp, post_ln,
             *statics):
    out = _forward_impl(x, w_embed, c_embed, key, val, params, mlp,
                        post_ln, *statics)
    return out, (x, w_embed, c_embed, key, val, params, mlp, post_ln)


def _cva_bwd(q_win, k_win, n_heads, scale, add_skip, use_pallas,
             interpret, res, g):
    def composite(x, w_embed, c_embed, key, val, params, mlp, post_ln):
        return _xla_composite(x, w_embed, c_embed, key, val, params,
                              q_win, k_win, n_heads, scale, add_skip,
                              x.dtype, mlp, post_ln,
                              use_pallas=use_pallas, interpret=interpret)

    _, vjp = jax.vjp(composite, *res)
    return vjp(g)


_fused_cva.defvjp(_cva_fwd, _cva_bwd)


@functools.partial(
    jax.jit, static_argnames=("q_win", "k_win", "n_heads", "scale",
                              "add_skip", "use_pallas", "interpret"))
def fused_cross_view_attention(x, w_embed, c_embed, key, val, params,
                               q_win, k_win, n_heads: int, scale: float,
                               add_skip: bool = True,
                               mlp=None, post_ln=None,
                               use_pallas: bool = True,
                               interpret: bool = False):
    """One FAX local-branch stage, fully fused.

    x: (B, H, W, D) BEV state; w_embed: (H, W, D) world embedding or
    None; c_embed: (B, n, D) camera-center embedding or None (both or
    neither — None means the query is x alone, the stage-1/2 case);
    key/val: (B, n, h, w, D) raw per-camera tensors (pre-LayerNorm);
    params: dict with ln_q/ln_k/ln_v = (gamma, beta), wq/wk/wv (D, C),
    bq/bk/bv (C,), wo (C, D), bo (D,).  scale is the q multiplier
    (dim_head**-0.5), applied after the biased projection exactly like
    the stock path.  Returns (B, H, W, D) in x's dtype.

    Optional tail fusions: `mlp` = {ln: (g, b), w1, b1, w2, b2} applies
    the stage's token MLP (prenorm -> Dense -> exact GELU -> Dense ->
    residual) in the same program; `post_ln` = (g, b) applies a final
    LayerNorm (the stage postnorm).

    Differentiable: forward runs the Pallas program on TPU, backward
    recomputes the composite in XLA (the region is dropout- and
    BN-free, so training uses the fused path too).  Matches
    models/fax.py CrossWinAttention + query build + camera mean + skip
    (reference fax_modules.py:179-259) at bf16 tolerance."""
    return _fused_cva(x, w_embed, c_embed, key, val, params, mlp,
                      post_ln, q_win, k_win, n_heads, scale, add_skip,
                      use_pallas, interpret)
