"""FuseBEVT: masked window<->grid attention over (agent, H, W) BEV stacks.

Capability parity with `SwapFusionEncoder`
(reference opv2v/opencood/models/fusion_modules/swap_fusion_modules.py:233):
MaxViT-style alternating local-window and strided-grid attention where each
token attends across *all agents* within its window, with a 3D
relative-position bias and key-side masking of padded/out-of-FOV agents.

TPU-first: the (agent, w1, w2) token axes are flattened into a single
attention token dimension per window so every window is one MXU-friendly
einsum; masks ride along as an additive bias.  Layout is channels-last;
the canonical mask is (B, L, H, W) (reference uses (B, H, W, 1, L)).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from cobevt_tpu.nn.layers import DenseParams, LNParams, gelu, layer_norm
from cobevt_tpu.ops.fused_swap_fusion import (
    _pack_layer_params,
    fused_swap_fusion,
    fused_swap_fusion_streaming,
)
from cobevt_tpu.ops.window_attention import fused_window_attention_packed

NEG_INF = -1e9


def expand_bias_flat(table, agent_size, window_size, l, w1, w2):
    """Expand the (table_size, heads) Toeplitz table to the flat
    (T, heads*T) bias the packed kernels take (see FusionAttention)."""
    heads = table.shape[-1]
    T = l * w1 * w2
    t4 = table.reshape(2 * agent_size - 1, 2 * window_size - 1,
                       2 * window_size - 1, heads).astype(jnp.float32)
    ohl = jnp.asarray(_rel_onehot_1d(l, agent_size))
    ohy = jnp.asarray(_rel_onehot_1d(w1, window_size))
    ohx = jnp.asarray(_rel_onehot_1d(w2, window_size))
    tmp = jnp.einsum("defh,uvf->dehuv", t4, ohx)
    tmp = jnp.einsum("dehuv,rse->dhrsuv", tmp, ohy)
    # emit the packed-kernel flat layout (row token (p,r,u); column block
    # h holding tokens (q,s,v)) directly — reshaping this einsum output
    # is free, where the (T, T, heads) order needed a real transpose
    bias = jnp.einsum("dhrsuv,pqd->pruhqsv", tmp, ohl)
    return bias.reshape(T, heads * T)


@functools.lru_cache(maxsize=None)
def rel_pos_indices_3d(table_agents: int, wh: int, ww: int,
                       agents: int = None) -> np.ndarray:
    """(T, T) index table into a (2*table_agents-1)(2wh-1)(2ww-1)
    embedding for T = agents*wh*ww tokens (reference
    swap_fusion_modules.py:62-83).  ``agents`` may be smaller than
    ``table_agents`` (agent-count bucketing at inference): the offsets
    and strides stay those of the full table."""
    agents = table_agents if agents is None else agents
    coords = np.stack(np.meshgrid(np.arange(agents), np.arange(wh),
                                  np.arange(ww), indexing="ij"))
    flat = coords.reshape(3, -1)                       # (3, T)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += table_agents - 1
    rel[..., 1] += wh - 1
    rel[..., 2] += ww - 1
    rel[..., 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[..., 1] *= (2 * ww - 1)
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _rel_onehot_1d(n: int, table_n: int) -> np.ndarray:
    """(n, n, 2*table_n - 1) 0/1 factor: [a, b, d] = 1 iff
    a - b + table_n - 1 == d.  ``n`` may be smaller than ``table_n``
    (agent-count bucketing) — offsets stay those of the full table."""
    a = np.arange(n)
    d = np.arange(2 * table_n - 1)
    return ((a[:, None, None] - a[None, :, None] + table_n - 1)
            == d[None, None, :]).astype(np.float32)


class FusionAttention(nn.Module):
    """Attention across (agent, window) tokens with 3D rel-pos bias
    (reference swap_fusion_modules.py:13)."""

    dim: int
    dim_head: int = 32
    dropout: float = 0.0
    agent_size: int = 6
    window_size: int = 7
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        """x: (b, l, X, Y, w1, w2, d); mask: (b, X, Y, w1, w2, l) or None.
        Returns same shape as x."""
        b, l, X, Y, w1, w2, d = x.shape
        heads = self.dim // self.dim_head
        T = l * w1 * w2

        t = rearrange(x, "b l x y w1 w2 d -> b (x y) (l w1 w2) d")
        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q * (self.dim_head ** -0.5)

        table_size = ((2 * self.agent_size - 1) *
                      (2 * self.window_size - 1) *
                      (2 * self.window_size - 1))
        table = nn.Embed(table_size, heads,
                         name="relative_position_bias_table")(
            jnp.arange(table_size))
        # The (T, T) bias is 3D block-Toeplitz: entry ((l1,y1,x1),
        # (l2,y2,x2)) depends only on (Δl, Δy, Δx).  Expand the 2025-row
        # table with three tiny einsums against constant one-hot factors
        # instead of a T^2-row gather (profiled at ~0.2 ms per block —
        # 1.2 ms/frame across the 3-block fusion stack).  The agent
        # factor keeps the full-table offsets so agent-count bucketing
        # (l < agent_size) stays exact.
        bias_flat = expand_bias_flat(table, self.agent_size,
                                     self.window_size, l, w1, w2)

        key_mask = None
        if mask is not None:
            key_mask = rearrange(
                mask, "b x y w1 w2 l -> b (x y) (l w1 w2)")

        G = b * X * Y
        fused = fused_window_attention_packed(
            q.reshape(G, T, heads * self.dim_head),
            k.reshape(G, T, heads * self.dim_head),
            v.reshape(G, T, heads * self.dim_head),
            n_heads=heads, bias_flat=bias_flat,
            mask=None if key_mask is None else key_mask.reshape(G, T))
        out = fused.reshape(b, X * Y, T, heads * self.dim_head)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out_0")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return rearrange(out, "b (x y) (l w1 w2) d -> b l x y w1 w2 d",
                         x=X, y=Y, l=l, w1=w1, w2=w2)


class FeedForward(nn.Module):
    """Linear -> GELU -> Dropout -> Linear -> Dropout (torch Sequential
    names net.0 / net.3, reference base_transformer.py:112)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="net_0")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="net_3")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class _PreNormAttn(nn.Module):
    """x + Attn(LN(x)) (reference base_transformer.py:102)."""

    dim: int
    dim_head: int
    dropout: float
    agent_size: int
    window_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        y = layer_norm(dtype=self.dtype, name="norm")(x)
        y = FusionAttention(self.dim, self.dim_head, self.dropout,
                            self.agent_size, self.window_size,
                            dtype=self.dtype, name="fn")(y, mask, train)
        return y + x


class _PreNormFFD(nn.Module):
    dim: int
    mlp_dim: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = layer_norm(dtype=self.dtype, name="norm")(x)
        y = FeedForward(self.dim, self.mlp_dim, self.dropout,
                        dtype=self.dtype, name="fn")(y, train)
        return y + x


class SwapFusionBlock(nn.Module):
    """window attention -> FFD -> grid attention -> FFD
    (reference SwapFusionBlockMask :131 / SwapFusionBlock :195; the
    unmasked variant is just ``mask=None``)."""

    input_dim: int
    mlp_dim: int
    dim_head: int
    window_size: int
    agent_size: int
    dropout: float
    masked: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        """x: (B, L, H, W, d); mask: (B, L, H, W) or None."""
        w = self.window_size
        # torch names: masked variant has named attributes, unmasked wraps
        # everything in a Sequential called `block` (indices 1/2/5/6)
        if self.masked:
            names = ("window_attention", "window_ffd",
                     "grid_attention", "grid_ffd")
        else:
            names = ("block_1", "block_2", "block_5", "block_6")

        def win(z):
            return rearrange(z, "b l (x w1) (y w2) d -> b l x y w1 w2 d",
                             w1=w, w2=w)

        def win_mask(m):
            return rearrange(m, "b l (x w1) (y w2) -> b x y w1 w2 l",
                             w1=w, w2=w)

        def grid(z):
            return rearrange(z, "b l (w1 x) (w2 y) d -> b l x y w1 w2 d",
                             w1=w, w2=w)

        def grid_mask(m):
            return rearrange(m, "b l (w1 x) (w2 y) -> b x y w1 w2 l",
                             w1=w, w2=w)

        xw = win(x)
        xw = _PreNormAttn(self.input_dim, self.dim_head, self.dropout,
                          self.agent_size, self.window_size,
                          dtype=self.dtype, name=names[0])(
            xw, None if mask is None else win_mask(mask), train)
        xw = _PreNormFFD(self.input_dim, self.mlp_dim, self.dropout,
                         dtype=self.dtype, name=names[1])(xw, train)
        x = rearrange(xw, "b l x y w1 w2 d -> b l (x w1) (y w2) d")

        xg = grid(x)
        xg = _PreNormAttn(self.input_dim, self.dim_head, self.dropout,
                          self.agent_size, self.window_size,
                          dtype=self.dtype, name=names[2])(
            xg, None if mask is None else grid_mask(mask), train)
        xg = _PreNormFFD(self.input_dim, self.mlp_dim, self.dropout,
                         dtype=self.dtype, name=names[3])(xg, train)
        return rearrange(xg, "b l x y w1 w2 d -> b l (w1 x) (w2 y) d")


class _FusionAttnFnParams(nn.Module):
    """Parameter mirror of FusionAttention (to_qkv / bias table /
    to_out_0) for the monolithic fused kernel."""

    dim: int
    heads: int
    table_size: int

    @nn.compact
    def __call__(self):
        wqkv, _ = DenseParams(self.dim, 3 * self.dim, False,
                              name="to_qkv")()
        table = nn.Embed(self.table_size, self.heads,
                         name="relative_position_bias_table")(
            jnp.arange(self.table_size))
        wout, _ = DenseParams(self.dim, self.dim, False,
                              name="to_out_0")()
        return wqkv, table, wout


class _FFDFnParams(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = DenseParams(self.dim, self.mlp_dim, True, name="net_0")()
        w2, b2 = DenseParams(self.mlp_dim, self.dim, True,
                             name="net_3")()
        return w1, b1, w2, b2


class _PreNormAttnParams(nn.Module):
    dim: int
    heads: int
    table_size: int

    @nn.compact
    def __call__(self):
        g, b = LNParams(self.dim, name="norm")()
        wqkv, table, wout = _FusionAttnFnParams(
            self.dim, self.heads, self.table_size, name="fn")()
        return (g, b), wqkv, table, wout


class _PreNormFFDParams(nn.Module):
    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        g, b = LNParams(self.dim, name="norm")()
        w1, b1, w2, b2 = _FFDFnParams(self.dim, self.mlp_dim,
                                      name="fn")()
        return (g, b), w1, b1, w2, b2


class _SwapBlockParams(nn.Module):
    """Mirror of one SwapFusionBlock's parameter tree; returns the
    (win_params, grid_params) dicts `_pack_layer_params` expects plus
    the two bias tables."""

    input_dim: int
    mlp_dim: int
    heads: int
    table_size: int
    masked: bool

    @nn.compact
    def __call__(self):
        if self.masked:
            names = ("window_attention", "window_ffd",
                     "grid_attention", "grid_ffd")
        else:
            names = ("block_1", "block_2", "block_5", "block_6")
        out = []
        tables = []
        for attn_name, ffd_name in ((names[0], names[1]),
                                    (names[2], names[3])):
            ln_a, wqkv, table, wout = _PreNormAttnParams(
                self.input_dim, self.heads, self.table_size,
                name=attn_name)()
            ln_f, w1, b1, w2, b2 = _PreNormFFDParams(
                self.input_dim, self.mlp_dim, name=ffd_name)()
            out.append({"ln_a": ln_a, "wqkv": wqkv, "wout": wout,
                        "ln_f": ln_f, "w1": w1, "b1": b1, "w2": w2,
                        "b2": b2})
            tables.append(table)
        return out[0], out[1], tables


def _fused_fusion_mode() -> str:
    import os
    return os.environ.get("COBEVT_FUSED_FUSION", "1")


class SwapFusionEncoder(nn.Module):
    """depth x SwapFusionBlock, then mean-pool over agents + LN + Linear
    head (reference swap_fusion_modules.py:233).

    Inference on TPU runs the whole stack as ONE Pallas program with the
    BEV state resident in VMEM (`ops/fused_swap_fusion.py`); training and
    off-TPU keep the stock modules (identical parameter tree)."""

    input_dim: int = 128
    mlp_dim: int = 256
    agent_size: int = 5
    window_size: int = 8
    dim_head: int = 32
    dropout: float = 0.1
    depth: int = 3
    mask: bool = True
    # reference semantics divide the agent mean by max_cav even for
    # padded rows (swap_fusion_modules.py:275-281); `mean_over_valid`
    # instead averages only live agents, which makes the output invariant
    # to padding and enables exact agent-count bucketing at serving time
    mean_over_valid: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False,
                 agent_mask=None):
        """x: (B, L, H, W, d); mask: (B, L, H, W); agent_mask: (B, L)
        (only used when mean_over_valid).  Returns fused (B, H, W, d)."""
        if not self.mask:
            mask = None

        mode = _fused_fusion_mode()
        B, L, H, W, d = x.shape
        w = self.window_size
        T = L * w * w
        heads = self.input_dim // self.dim_head
        fits = (H % w == 0 and W % w == 0
                and T * heads * T * 4 <= int(2.5 * 2 ** 20)
                and L * H * W * d * 2 <= int(2.5 * 2 ** 20))
        # streaming variant for states too large to keep whole-resident
        # (cooperative-LiDAR fusion: (5, 96, 176, 256) = 43 MB): one
        # window per grid step, weights/bias resident, factor-swap
        # transposes between the window/grid halves in XLA
        n_win = (H // w) * (W // w) if H % w == 0 and W % w == 0 else 0
        streams = (H % w == 0 and W % w == 0 and d % 128 == 0
                   and T % 8 == 0
                   and (w % 8 == 0 or w == W)     # legal TPU block shape
                   and (n_win % 8 == 0 or n_win <= 8)
                   and T * heads * T * 4 <= 8 * 2 ** 20)
        interpret = mode in ("force", "force-stream")
        if (not train) and (fits or streams) and mode != "0" and \
                (jax.default_backend() == "tpu" or interpret):
            return self._fused_eval(
                x, mask, agent_mask,
                streaming=(streams and
                           (not fits or mode == "force-stream")),
                interpret=interpret)

        for i in range(self.depth):
            x = SwapFusionBlock(self.input_dim, self.mlp_dim, self.dim_head,
                                self.window_size, self.agent_size,
                                self.dropout, masked=self.mask,
                                dtype=self.dtype,
                                name=f"layers_{i}")(x, mask, train)
        if self.mean_over_valid and agent_mask is not None:
            w = agent_mask[:, :, None, None, None].astype(x.dtype)
            x = (x * w).sum(axis=1) / jnp.maximum(
                w.sum(axis=1), 1.0)
        else:
            x = x.mean(axis=1)  # reference mlp_head Reduce over max_cav
        x = layer_norm(dtype=self.dtype, name="mlp_head_2")(x)
        return nn.Dense(self.input_dim, dtype=self.dtype,
                        name="mlp_head_3")(x)

    def _fused_eval(self, x, mask, agent_mask, streaming=False,
                    interpret=False):
        B, L, H, W, d = x.shape
        w = self.window_size
        T = L * w * w
        heads = self.input_dim // self.dim_head
        table_size = ((2 * self.agent_size - 1) * (2 * w - 1)
                      * (2 * w - 1))
        dtype = x.dtype

        layers = []
        biases = []
        for i in range(self.depth):
            win_p, grid_p, tables = _SwapBlockParams(
                self.input_dim, self.mlp_dim, heads, table_size,
                self.mask, name=f"layers_{i}")()
            layers.append((win_p, grid_p))
            biases.append(jnp.stack(
                [expand_bias_flat(t, self.agent_size, w, L, w, w)
                 for t in tables], 0))
        bias_stack = jnp.stack(biases, 0)          # (depth, 2, T, hT)

        layer_params, p_slices = _pack_layer_params(
            layers, self.input_dim, self.mlp_dim, dtype)

        g_h, b_h = LNParams(self.input_dim, name="mlp_head_2")()
        w_h, bias_h = DenseParams(self.input_dim, self.input_dim, True,
                                  name="mlp_head_3")()
        head_params = jnp.concatenate(
            [g_h.reshape(1, -1), b_h.reshape(1, -1),
             w_h, bias_h.reshape(1, -1)], 0).astype(dtype)

        # additive key-mask rows per half, window-major
        if mask is not None:
            def half_mask(m, pattern):
                mm = rearrange(m, pattern, w1=w, w2=w)
                add = jnp.where(mm > 0, 0.0, NEG_INF).astype(jnp.float32)
                return jnp.tile(add, (1, 1, heads))
            mask_add = jnp.stack([
                half_mask(mask, "b l (x w1) (y w2) -> b (x y) (l w1 w2)"),
                half_mask(mask, "b l (w1 x) (w2 y) -> b (x y) (l w1 w2)"),
            ], 1)                                   # (B, 2, XY, h*T)
        else:
            n_win = (H // w) * (W // w)
            mask_add = jnp.zeros((B, 2, n_win, heads * T), jnp.float32)

        am = (agent_mask if agent_mask is not None
              else jnp.ones((B, L), jnp.float32))
        am8 = jnp.broadcast_to(
            am.astype(jnp.float32)[:, None, :], (B, 8, L))

        fn = fused_swap_fusion_streaming if streaming else \
            fused_swap_fusion
        return fn(
            x.astype(dtype), mask_add, am8, bias_stack, layer_params,
            head_params, window=w, heads=heads, mlp=self.mlp_dim,
            p_slices=p_slices,
            mean_over_valid=(self.mean_over_valid
                             and agent_mask is not None),
            interpret=interpret)
