"""Heterogeneous / temporal CAV attention (V2X-ViT carry-overs).

Capability parity with reference opv2v/opencood/models/base_transformer.py:
  * RelTemporalEncoding / RTE (:14/:40): sinusoid delay embedding added
    per agent based on its communication delay;
  * CavPositionalEncoding (:61): sinusoid per-agent-slot encoding;
  * HGTCavAttention (:175): heterogeneous-graph attention where each
    agent type gets its own q/k/v/out projections and each (type_i,
    type_j) relation its own attention/message transforms.

TPU-first: the reference loops Python over batch x agent x agent to pick
per-type linears and relation matrices (base_transformer.py:215-320);
here every projection is computed for *all* types and gathered by a
one-hot select — fully batched, jit-safe, identical numerics.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

NEG_INF = -1e9


@functools.lru_cache(maxsize=None)
def sinusoid_table(max_len: int, dim: int, scaled: bool = False):
    """(max_len, dim) sin/cos table; `scaled` divides by sqrt(dim)
    (the RTE variant)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) *
                 -(math.log(10000.0) / dim))
    tab = np.zeros((max_len, dim))
    tab[:, 0::2] = np.sin(pos * div)
    tab[:, 1::2] = np.cos(pos * div)
    if scaled:
        tab /= math.sqrt(dim)
    return tab.astype(np.float32)


def cav_positional_encoding(x, cav_num: int = None):
    """Add the per-agent-slot sinusoid (reference :61-90).
    x: (B, L, H, W, C)."""
    L, C = x.shape[1], x.shape[-1]
    table = jnp.asarray(sinusoid_table(L, C))
    return x + table[None, :, None, None, :]


class RTE(nn.Module):
    """x + Linear(sinusoid(delay * ratio)) per agent (reference :40-59)."""

    dim: int
    rte_ratio: int = 2
    max_len: int = 100
    dtype: Any = None

    @nn.compact
    def __call__(self, x, dts):
        """x: (B, L, H, W, C); dts: (B, L) int delays."""
        table = jnp.asarray(sinusoid_table(self.max_len, self.dim,
                                           scaled=True))
        emb = table[jnp.clip(dts * self.rte_ratio, 0, self.max_len - 1)]
        emb = nn.Dense(self.dim, dtype=self.dtype, name="emb_lin")(emb)
        return x + emb[:, :, None, None, :]


class HGTCavAttention(nn.Module):
    """Typed multi-head attention across agents per BEV pixel."""

    dim: int
    heads: int
    num_types: int = 2
    num_relations: int = 4
    dim_head: int = 64
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, prior_encoding, train: bool = False):
        """x: (B, L, H, W, C); mask: (B, H, W, L, 1);
        prior_encoding: (B, L, H, W, 3) [velocity, dt, type]."""
        B, L, H, W, C = x.shape
        inner = self.heads * self.dim_head
        t = rearrange(x, "b l h w c -> b h w l c")
        types = prior_encoding[:, :, 0, 0, 2].astype(jnp.int32)  # (B, L)
        onehot = jax.nn.one_hot(types, self.num_types,
                                dtype=t.dtype)               # (B, L, T)

        def typed_proj(z, name, out_dim):
            # compute all type projections, select by agent type
            outs = [nn.Dense(out_dim, dtype=self.dtype,
                             name=f"{name}_{ti}")(z)
                    for ti in range(self.num_types)]
            stack = jnp.stack(outs, axis=-2)      # (b, h, w, l, T, d)
            sel = onehot[:, None, None, :, :, None]
            return (stack * sel).sum(-2)

        q = typed_proj(t, "q_linears", inner)
        k = typed_proj(t, "k_linears", inner)
        v = typed_proj(t, "v_linears", inner)

        def heads_of(z):
            return rearrange(z, "b h w l (m c) -> b m h w l c",
                             m=self.heads)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)

        w_att = self.param(
            "relation_att",
            nn.initializers.xavier_uniform(),
            (self.num_relations, self.heads, self.dim_head,
             self.dim_head), jnp.float32)
        w_msg = self.param(
            "relation_msg",
            nn.initializers.xavier_uniform(),
            (self.num_relations, self.heads, self.dim_head,
             self.dim_head), jnp.float32)

        # relation index per (i, j) pair: type_i * num_types + type_j
        rel = types[:, :, None] * self.num_types + types[:, None, :]
        rel_onehot = jax.nn.one_hot(rel, self.num_relations,
                                    dtype=jnp.float32)   # (B, Li, Lj, R)
        w_att_sel = jnp.einsum("bijr,rmpq->bmijpq", rel_onehot, w_att)
        w_msg_sel = jnp.einsum("bijr,rmpq->bmijpq", rel_onehot, w_msg)

        att = jnp.einsum("bmhwip,bmijpq,bmhwjq->bmhwij",
                         q, w_att_sel, k,
                         preferred_element_type=jnp.float32)
        att = att * (self.dim_head ** -0.5)
        # NB the reference's mask broadcast (B,1,H,W,L,1) lands on the
        # *query* axis (base_transformer.py:302-304) — masked agents'
        # own rows are suppressed, keys are not.  We reproduce that, with
        # a large-negative fill instead of -inf so masked rows yield a
        # uniform (garbage-but-finite) distribution rather than NaN;
        # downstream consumers mask those rows anyway.
        q_mask = rearrange(mask[..., 0], "b h w l -> b 1 h w l 1")
        att = att + jnp.where(q_mask > 0, 0.0, NEG_INF).astype(att.dtype)
        att = jax.nn.softmax(att, axis=-1)

        v_msg = jnp.einsum("bmijpc,bmhwjp->bmhwijc", w_msg_sel, v)
        out = jnp.einsum("bmhwij,bmhwijc->bmhwic",
                         att.astype(v_msg.dtype), v_msg)
        out = rearrange(out, "b m h w l c -> b h w l (m c)")
        out = typed_proj(out, "a_linears", self.dim)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return rearrange(out, "b h w l c -> b l h w c")
