"""Dense CVT camera->BEV cross-attention (the baseline FAX sparsifies).

Capability parity with `CrossViewModule`
(reference opv2v/opencood/models/sub_modules/cvt_modules.py:280,
`CrossViewAttention` :165, `CrossAttention` :92, `BEVEmbedding` :41) and
the nuScenes twin (`cross_view_transformer/model/encoder.py:281`).

Every BEV query attends over *all* camera tokens jointly (softmax across
cameras x pixels) — one big einsum per stage, which the MXU happily eats;
the BEV grid stays at a single fixed resolution (no pyramid downsample).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat

from cobevt_tpu.geometry.transforms import generate_grid, get_view_matrix
from cobevt_tpu.models.fax import image_plane_grid
from cobevt_tpu.nn.layers import (
    Bottleneck,
    batch_norm,
    layer_norm,
    mlp_seq,
    torch_conv,
)


@functools.lru_cache(maxsize=None)
def dense_bev_grid(bev_height: int, bev_width: int, h_meters: float,
                   w_meters: float, offset: float, n_blocks: int):
    """(h, w, 2) ego-frame grid at bev_size // 2^n_blocks."""
    V_inv = np.linalg.inv(get_view_matrix(bev_height, bev_width, h_meters,
                                          w_meters, offset))
    h = bev_height // (2 ** n_blocks)
    w = bev_width // (2 ** n_blocks)
    grid = generate_grid(h, w)
    grid[0] *= bev_width
    grid[1] *= bev_height
    world = np.einsum("ij,jhw->ihw", V_inv.astype(np.float64), grid)
    return np.ascontiguousarray(
        world[:2].transpose(1, 2, 0).astype(np.float32))


class DenseCrossAttention(nn.Module):
    """Full BEV x (cameras * pixels) attention with prenorm MLP tail
    (reference cvt_modules.py:92)."""

    dim: int
    heads: int
    dim_head: int
    qkv_bias: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, skip=None):
        """q: (b, n, H, W, d); k, v: (b, n, h, w, d) -> (b, H, W, d)."""
        b, n, H, W, _ = q.shape
        _, _, h, w, _ = k.shape

        q = rearrange(q, "b n H W d -> b n (H W) d")
        k = rearrange(k, "b n h w d -> b n (h w) d")
        v = rearrange(v, "b n h w d -> b (n h w) d")

        def proj(t, name):
            t = layer_norm(dtype=self.dtype, name=f"{name}_0")(t)
            return nn.Dense(self.heads * self.dim_head,
                            use_bias=self.qkv_bias, dtype=self.dtype,
                            name=f"{name}_1")(t)

        q = proj(q, "to_q")
        k = proj(k, "to_k")
        v = proj(v, "to_v")

        def split_heads(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        q = split_heads(q) * (self.dim_head ** -0.5)
        k = split_heads(k)
        v = split_heads(v)

        # per-camera q.k scores, then one softmax joining all cameras'
        # keys (the reference's 'b n Q K -> b Q (n K)' collapse,
        # cvt_modules.py:143-145: camera n's keys are scored against
        # camera n's positional copy of the query)
        dot = jnp.einsum("bnqhd,bnkhd->bhqnk", q, k,
                         preferred_element_type=jnp.float32)
        dot = dot.reshape(b, self.heads, H * W, n * h * w)
        att = jax.nn.softmax(dot, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v.astype(att.dtype))
        out = out.reshape(b, H * W, self.heads * self.dim_head)
        z = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        if skip is not None:
            z = z + skip.reshape(b, H * W, -1)
        z = layer_norm(dtype=self.dtype, name="prenorm")(z)
        z = z + mlp_seq(z, 2 * self.dim, self.dim, self.dtype, "mlp")
        z = layer_norm(dtype=self.dtype, name="postnorm")(z)
        return z.reshape(b, H, W, self.dim)


class DenseCrossViewAttention(nn.Module):
    """Geometry embeds + dense cross attention
    (reference cvt_modules.py:165)."""

    feat_height: int
    feat_width: int
    feat_dim: int
    dim: int
    image_height: int
    image_width: int
    heads: int
    dim_head: int
    qkv_bias: bool
    no_image_features: bool = False
    skip: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, world, feature, I_inv, E_inv,
                 train: bool = False):
        """x: (b, H, W, dim); world: (H, W, 2); feature: (b, n, h, w, c);
        I_inv: (b, n, 3, 3); E_inv: (b, n, 4, 4)."""
        b, n, h, w, _ = feature.shape

        pixel = jnp.asarray(image_plane_grid(
            self.feat_height, self.feat_width, self.image_height,
            self.image_width))

        c = E_inv[..., -1]
        c_embed = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                           name="cam_embed")(c)

        cam = jnp.einsum("bnij,hwj->bnhwi", I_inv, pixel)
        cam = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], -1)
        d_vec = jnp.einsum("bnij,bnhwj->bnhwi", E_inv, cam)
        d_embed = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                           name="img_embed")(d_vec)

        img_embed = d_embed - c_embed[:, :, None, None]
        img_embed = img_embed / (jnp.linalg.norm(
            img_embed, axis=-1, keepdims=True) + 1e-7)

        w_embed = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                           name="bev_embed")(world)
        bev_embed = w_embed[None, None] - c_embed[:, :, None, None]
        bev_embed = bev_embed / (jnp.linalg.norm(
            bev_embed, axis=-1, keepdims=True) + 1e-7)
        query_pos = bev_embed                            # (b, n, H, W, d)

        def bn_relu_conv(t, name):
            flat = t.reshape(b * n, h, w, -1)
            flat = batch_norm(dtype=self.dtype, name=f"{name}_0")(
                flat, use_running_average=not train)
            flat = nn.relu(flat)
            flat = torch_conv(self.dim, 1, 1, 0, False, self.dtype,
                              f"{name}_2")(flat)
            return flat.reshape(b, n, h, w, self.dim)

        if self.no_image_features:
            key = img_embed
        else:
            key = img_embed + bn_relu_conv(feature, "feature_proj")
        val = bn_relu_conv(feature, "feature_linear")

        query = query_pos + x[:, None]
        return DenseCrossAttention(self.dim, self.heads, self.dim_head,
                                   self.qkv_bias, dtype=self.dtype,
                                   name="cross_attend")(
            query, key, val, skip=x if self.skip else None)


@dataclasses.dataclass(frozen=True)
class CVTModuleConfig:
    dim: int = 128
    middle: Tuple[int, ...] = (2, 2)
    backbone_output_shape: Tuple[Tuple[int, int, int], ...] = ()
    image_height: int = 512
    image_width: int = 512
    heads: int = 4
    dim_head: int = 32
    qkv_bias: bool = True
    no_image_features: bool = False
    skip: bool = True
    sigma: float = 1.0
    bev_height: int = 256
    bev_width: int = 256
    h_meters: float = 100.0
    w_meters: float = 100.0
    offset: float = 0.0
    decoder_blocks: int = 3


class _DenseBEVPrior(nn.Module):
    """Learned BEV queries, torch layout (dim, h, w) for porting."""

    dim: int
    sigma: float
    h: int
    w: int

    @nn.compact
    def __call__(self):
        feats = self.param(
            "learned_features",
            lambda key: self.sigma * jax.random.normal(
                key, (self.dim, self.h, self.w), jnp.float32))
        return feats.transpose(1, 2, 0)


class CrossViewModule(nn.Module):
    """Stages of dense cross-view attention + bottlenecks at one fixed
    BEV resolution (reference cvt_modules.py:280)."""

    config: CVTModuleConfig = CVTModuleConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, features, intrinsic, extrinsic, train: bool = False):
        """features: list of (b, l, n, h, w, c); returns (b, l, H, W, dim)."""
        cfg = self.config
        b, l, n = features[0].shape[:3]

        I_inv = jnp.linalg.inv(
            intrinsic.reshape(b * l, n, 3, 3).astype(jnp.float32))
        E_inv = extrinsic.reshape(b * l, n, 4, 4).astype(jnp.float32)

        grid_h = cfg.bev_height // (2 ** cfg.decoder_blocks)
        grid_w = cfg.bev_width // (2 ** cfg.decoder_blocks)
        world = jnp.asarray(dense_bev_grid(
            cfg.bev_height, cfg.bev_width, cfg.h_meters, cfg.w_meters,
            cfg.offset, cfg.decoder_blocks))

        prior = _DenseBEVPrior(cfg.dim, cfg.sigma, grid_h, grid_w,
                               name="bev_embedding")()
        x = repeat(prior, "H W d -> b H W d", b=b * l)
        if self.dtype is not None:
            x = x.astype(self.dtype)   # keep the BEV stream in compute dtype

        for i, feature in enumerate(features):
            fh, fw, fc = cfg.backbone_output_shape[i]
            feat = feature.reshape(b * l, n, fh, fw, fc)
            x = DenseCrossViewAttention(
                fh, fw, fc, cfg.dim, cfg.image_height, cfg.image_width,
                cfg.heads, cfg.dim_head, cfg.qkv_bias,
                cfg.no_image_features, cfg.skip, dtype=self.dtype,
                name=f"cross_views_{i}")(x, world, feat, I_inv, E_inv,
                                         train)
            for j in range(cfg.middle[i]):
                x = Bottleneck(cfg.dim // 4, dtype=self.dtype,
                               name=f"layers_{i}_{j}")(x, train)
        return x.reshape(b, l, grid_h, grid_w, cfg.dim)
