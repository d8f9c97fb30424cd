"""Baseline multi-agent fusion zoo: F-Cooper max, per-pixel attention,
split attention, and the CAV transformer.

All modules take the framework's canonical padded layout —
x: (B, L, H, W, C) with zeroed padding rows, mask: (B, L) (or a spatial
(B, L, H, W) mask where noted) — and are jit-safe with static shapes.
The reference versions split stacked tensors by `record_len` in Python
loops; with key-side masking the padded formulations are numerically
identical for the valid agents (verified in tests/test_fusion_zoo.py).

Parity targets:
  * max fusion    — reference opv2v/opencood/models/fusion_modules/
                    f_cooper_fuse.py:10 (SpatialFusion) /:30
                    (SpatialFusionMask: zero-padded max, no mask)
  * AttFusion     — reference .../self_attn.py:36 (per-pixel scaled-dot
                    attention across agents; ego row output)
  * SplitAttn     — reference .../split_attn.py:32 (3-window radix
                    softmax re-weighting)
  * CavAttention / BaseEncoder / BaseTransformer — reference
                    opv2v/opencood/models/base_transformer.py:127/:322/:342
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import rearrange

from cobevt_tpu.nn.layers import gelu, layer_norm

NEG_INF = -1e9


def max_fusion(x, mask=None):
    """Elementwise max over agents.

    With ``mask`` (B, L): max over valid agents only (SpatialFusion
    semantics on padded tensors).  Without: plain max over the padded
    stack (SpatialFusionMask semantics — zero rows participate)."""
    if mask is None:
        return x.max(axis=1)
    neg = jnp.where(mask[:, :, None, None, None] > 0, x, NEG_INF)
    return neg.max(axis=1)


class AttFusion(nn.Module):
    """Per-pixel scaled-dot-product attention across agents; returns the
    ego (row 0) context."""

    feature_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (B, L, H, W, C); mask: (B, L) or None -> (B, H, W, C)."""
        B, L, H, W, C = x.shape
        t = rearrange(x, "b l h w c -> b (h w) l c")
        sim = jnp.einsum("bpic,bpjc->bpij", t, t,
                         preferred_element_type=jnp.float32)
        sim = sim / jnp.sqrt(jnp.float32(self.feature_dim))
        if mask is not None:
            sim = sim + jnp.where(mask[:, None, None, :] > 0, 0.0,
                                  NEG_INF).astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bpij,bpjc->bpic", attn, t.astype(sim.dtype))
        ego = ctx[:, :, 0]
        return ego.reshape(B, H, W, C).astype(x.dtype)


class SplitAttn(nn.Module):
    """Radix-3 split attention over three window-scale branches
    (defined-but-unused in the reference; kept for capability parity)."""

    input_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, windows):
        """windows: [(B, L, H, W, C)] * 3 -> (B, L, H, W, C)."""
        assert len(windows) == 3
        sw, mw, bw = windows
        gap = (sw + mw + bw).mean(axis=(2, 3), keepdims=True)
        gap = nn.Dense(self.input_dim, use_bias=False, dtype=self.dtype,
                       name="fc1")(gap)
        gap = nn.relu(layer_norm(dtype=self.dtype, name="bn1")(gap))
        attn = nn.Dense(3 * self.input_dim, use_bias=False,
                        dtype=self.dtype, name="fc2")(gap)
        B, L = attn.shape[:2]
        # radix softmax over the 3 branches per channel
        a = attn.reshape(B, L, 1, 1, 1, 3, self.input_dim)
        a = jax.nn.softmax(a, axis=5)
        w0, w1, w2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        return (sw * w0[:, :, 0] + mw * w1[:, :, 0] + bw * w2[:, :, 0])


class CavAttention(nn.Module):
    """Masked per-pixel attention across agents (heads batched)."""

    dim: int
    heads: int
    dim_head: int = 64
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, L, H, W, C); mask: (B, H, W, 1, L) spatial key mask."""
        B, L, H, W, C = x.shape
        t = rearrange(x, "b l h w c -> b h w l c")
        qkv = nn.Dense(3 * self.heads * self.dim_head, use_bias=False,
                       dtype=self.dtype, name="to_qkv")(t)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(z):
            return rearrange(z, "b h w l (m c) -> b m h w l c",
                             m=self.heads)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        sim = jnp.einsum("bmhwic,bmhwjc->bmhwij", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim * (self.dim_head ** -0.5)
        key_mask = mask[:, None]                  # (B,1,H,W,1,L)
        sim = sim + jnp.where(key_mask > 0, 0.0, NEG_INF).astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bmhwij,bmhwjc->bmhwic", attn, v.astype(sim.dtype))
        out = rearrange(out, "b m h w l c -> b h w l (m c)")
        out = nn.Dense(self.dim, dtype=self.dtype, name="to_out_0")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return rearrange(out, "b h w l c -> b l h w c").astype(x.dtype)


class _FeedForwardPlain(nn.Module):
    """Same MLP as fusion FeedForward (torch net.0/net.3 names)."""

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


class _PreNormCav(nn.Module):
    dim: int
    heads: int
    dim_head: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        y = layer_norm(dtype=self.dtype, name="norm")(x)
        return CavAttention(self.dim, self.heads, self.dim_head,
                            self.dropout, dtype=self.dtype,
                            name="fn")(y, mask, train)


class _PreNormFF(nn.Module):
    dim: int
    mlp_dim: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = layer_norm(dtype=self.dtype, name="norm")(x)
        return _FeedForwardPlain(self.dim, self.mlp_dim, self.dropout,
                                 dtype=self.dtype, name="fn")(y, train)


class BaseEncoder(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        for i in range(self.depth):
            x = _PreNormCav(self.dim, self.heads, self.dim_head,
                            self.dropout, dtype=self.dtype,
                            name=f"layers_{i}_0")(x, mask, train) + x
            x = _PreNormFF(self.dim, self.mlp_dim, self.dropout,
                           dtype=self.dtype,
                           name=f"layers_{i}_1")(x, train) + x
        return x


class BaseTransformer(nn.Module):
    """depth x (prenorm CavAttention + prenorm FF) then take the ego row.

    Torch names: encoder.layers.<i>.<0|1>.{norm,fn}."""

    dim: int
    depth: int = 3
    heads: int = 8
    dim_head: int = 32
    mlp_dim: int = 256
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (B, L, H, W, C); mask: (B, H, W, 1, L) -> (B, H, W, C)."""
        x = BaseEncoder(self.dim, self.depth, self.heads, self.dim_head,
                        self.mlp_dim, self.dropout, dtype=self.dtype,
                        name="encoder")(x, mask, train)
        return x[:, 0]
