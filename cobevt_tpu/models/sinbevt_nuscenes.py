"""SinBEVT on nuScenes: PyramidAxialEncoder + residual Decoder + CVT head.

Capability parity with the reference nuScenes track:
  * PyramidAxialEncoder — nuscenes/cross_view_transformer/model/
    encoder_pyramid_axial.py:475 (same FAX design as OPV2V with the
    documented diffs: ImageNet input normalization, EfficientNet
    backbone, optional feature down-scale, pixel-unshuffle narrow factor
    //2 instead of //4, no final self-attention, extrinsics inverted
    inside the encoder);
  * Decoder — .../model/decoder.py:39 (bilinear x2 DecoderBlocks with a
    residual 1x1-conv skip from the encoder output);
  * CrossViewTransformer — .../model/cvt.py:4 (to_logits head + named
    channel slices).

Layouts channels-last; parameter names mirror the torch attribute paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from einops import repeat

from cobevt_tpu.models.fax import (
    BEVEmbedding,
    CrossViewSwapAttention,
)
from cobevt_tpu.nn.efficientnet import EfficientNetExtractor
from cobevt_tpu.nn.layers import (
    Bottleneck,
    batch_norm,
    images_from_uint8,
    pixel_unshuffle,
    torch_conv,
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(x):
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


@dataclasses.dataclass(frozen=True)
class PyramidAxialConfig:
    """Mirrors nuscenes/config/model/cvt_pyramid_axial.yaml.

    Geometry note: with the standard extract_endpoints semantics
    (reduction_2/3/4 = 1/4, 1/8, 1/16 resolution) the published
    feat_win_size ((6,12),(6,12),(14,30)) satisfies the window-count
    invariant (#query windows == #feature windows,
    encoder_pyramid_axial.py:239) exactly at 224x480 / BEV 200:
    padded feature grids (60,120)/(6,12)=100, (30,60)/(6,12)=25,
    (14,30)/(14,30)=1 windows match the 10x10 / 5x5 / 1x1 BEV query
    windows per stage.
    """

    dim: Tuple[int, ...] = (32, 64, 128)
    middle: Tuple[int, ...] = (2, 2, 2)
    scale: float = 1.0
    image_height: int = 224
    image_width: int = 480
    backbone_model: str = "efficientnet-b4"
    backbone_layers: Tuple[str, ...] = ("reduction_2", "reduction_3",
                                        "reduction_4")
    qkv_bias: bool = True
    heads: Tuple[int, ...] = (1, 2, 4)
    dim_head: Tuple[int, ...] = (32, 32, 32)
    q_win_size: Tuple[Tuple[int, int], ...] = ((10, 10), (10, 10), (25, 25))
    feat_win_size: Tuple[Tuple[int, int], ...] = ((6, 12), (6, 12),
                                                  (14, 30))
    bev_embedding_flag: Tuple[bool, ...] = (True, False, False)
    no_image_features: bool = False
    skip: bool = True
    sigma: float = 1.0
    bev_height: int = 200
    bev_width: int = 200
    h_meters: float = 100.0
    w_meters: float = 100.0
    offset: float = 0.0
    upsample_scales: Tuple[int, ...] = (2, 4, 8)
    remat_backbone: bool = True


class PyramidAxialEncoder(nn.Module):
    """Normalize -> EfficientNet pyramid -> 3 FAX stages (no final
    self-attention)."""

    config: PyramidAxialConfig = PyramidAxialConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False, features=None):
        """batch: image (B, n, H, W, 3) in [0,1]; intrinsics (B, n, 3, 3);
        extrinsics (B, n, 4, 4).  Returns (B, H', W', dim[-1]).

        ``features`` (list of (B*n, h, w, c)) bypasses the backbone —
        used for golden parity tests and backbone-feature caching."""
        cfg = self.config
        image = images_from_uint8(batch["image"], normalize=False)
        B, n, H, W, _ = image.shape

        I_inv = jnp.linalg.inv(batch["intrinsics"].astype(jnp.float32))
        E_inv = jnp.linalg.inv(batch["extrinsics"].astype(jnp.float32))

        if features is not None:
            feats = list(features)
        else:
            flat = normalize_image(image.reshape(B * n, H, W, 3))
            feats = EfficientNetExtractor(
                cfg.backbone_layers, cfg.backbone_model,
                remat=cfg.remat_backbone, dtype=self.dtype,
                name="backbone")(flat, train)
        if cfg.scale < 1.0:
            feats = [jax.image.resize(
                f, (f.shape[0], int(f.shape[1] * cfg.scale),
                    int(f.shape[2] * cfg.scale), f.shape[3]),
                "bilinear") for f in feats]

        shapes = [(f.shape[1], f.shape[2], f.shape[3]) for f in feats]

        bev = BEVEmbedding(cfg.dim[0], cfg.sigma, cfg.bev_height,
                           cfg.bev_width, cfg.h_meters, cfg.w_meters,
                           cfg.offset, cfg.upsample_scales,
                           name="bev_embedding")
        x = repeat(bev(), "H W d -> b H W d", b=B)

        for i, feat in enumerate(feats):
            fh, fw, fc = shapes[i]
            world = bev.world_grid(i) if cfg.bev_embedding_flag[i] else None
            x = CrossViewSwapAttention(
                fh, fw, fc, cfg.dim[i], cfg.image_height, cfg.image_width,
                cfg.qkv_bias, cfg.heads[i], cfg.dim_head[i],
                tuple(cfg.q_win_size[i]), tuple(cfg.feat_win_size[i]),
                cfg.bev_embedding_flag[i], cfg.no_image_features, cfg.skip,
                dtype=self.dtype, name=f"cross_views_{i}")(
                    x, world, feat.reshape(B, n, fh, fw, fc), I_inv, E_inv,
                    train)
            for j in range(cfg.middle[i]):
                x = Bottleneck(cfg.dim[i] // 4, dtype=self.dtype,
                               name=f"layers_{i}_{j}")(x, train)
            if i < len(feats) - 1:
                # narrow factor //2 (OPV2V FAX uses //4):
                # channels dim[i]//2 * 4 == dim[i+1] when dim doubles
                p = f"downsample_layers_{i}_0"
                x = torch_conv(cfg.dim[i] // 2, 3, 1, 1, False, self.dtype,
                               f"{p}_0")(x)
                x = pixel_unshuffle(x, 2)
                x = torch_conv(cfg.dim[i + 1], 3, 1, 1, False, self.dtype,
                               f"{p}_2")(x)
                x = batch_norm(dtype=self.dtype, name=f"{p}_3")(
                    x, use_running_average=not train)
                x = nn.relu(x)
                x = torch_conv(cfg.dim[i + 1], 1, 1, 0, False, self.dtype,
                               f"{p}_5")(x)
                x = batch_norm(dtype=self.dtype, name=f"{p}_6")(
                    x, use_running_average=not train)
        return x


class DecoderBlock(nn.Module):
    """bilinear x2 upsample -> conv-BN-ReLU -> conv-BN (+ residual 1x1
    skip from the decoder input, nearest-resized)."""

    out_channels: int
    skip_dim: int
    residual: bool = True
    factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        dim = self.out_channels // self.factor
        B, H, W, C = x.shape
        x = upsample_bilinear_2x_align_corners(x)
        x = torch_conv(dim, 3, 1, 1, False, self.dtype, "conv_1")(x)
        x = batch_norm(dtype=self.dtype, name="conv_2")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = torch_conv(self.out_channels, 1, 1, 0, False, self.dtype,
                       "conv_4")(x)
        x = batch_norm(dtype=self.dtype, name="conv_5")(
            x, use_running_average=not train)
        if self.residual:
            up = torch_conv(self.out_channels, 1, 1, 0, True, self.dtype,
                            "up")(skip)
            up = resize_nearest(up, x.shape[1:3])
            x = x + up
        return nn.relu(x)


def upsample_bilinear_2x_align_corners(x):
    """torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True) on NHWC."""
    B, H, W, C = x.shape
    Ho, Wo = 2 * H, 2 * W
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0).astype(x.dtype)
    wx = (xs - x0).astype(x.dtype)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + \
        bot * wy[None, :, None, None]


def resize_nearest(x, hw):
    """torch F.interpolate(mode='nearest') to target (H, W) on NHWC."""
    B, H, W, C = x.shape
    Ho, Wo = hw
    iy = (jnp.arange(Ho) * H // Ho).astype(jnp.int32)
    ix = (jnp.arange(Wo) * W // Wo).astype(jnp.int32)
    return x[:, iy][:, :, ix]


class Decoder(nn.Module):
    """Chain of DecoderBlocks, each skipping back to the encoder output
    (reference decoder.py:39)."""

    blocks: Tuple[int, ...] = (128, 128, 64)
    residual: bool = True
    factor: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i, out_ch in enumerate(self.blocks):
            y = DecoderBlock(out_ch, x.shape[-1], self.residual,
                             self.factor, dtype=self.dtype,
                             name=f"layers_{i}")(y, x, train)
        return y


class CrossViewTransformer(nn.Module):
    """encoder -> decoder -> to_logits, sliced into named outputs
    (reference cvt.py:4).

    The encoder is picked by the config's type — `PyramidAxialConfig`
    builds the FAX pyramid encoder; a `CVTNuScenesConfig`
    (models/cvt_nuscenes.py) builds the dense CVT baseline — mirroring
    the reference's Hydra model switch (config/model/{cvt_pyramid_axial,
    cvt}.yaml both targeting cvt.py:4)."""

    encoder_config: Any = PyramidAxialConfig()
    decoder_blocks: Tuple[int, ...] = (128, 128, 64)
    dim_last: int = 64
    outputs: Tuple[Tuple[str, Tuple[int, int]], ...] = (("bev", (0, 1)),)
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False):
        if isinstance(self.encoder_config, PyramidAxialConfig):
            x = PyramidAxialEncoder(self.encoder_config, dtype=self.dtype,
                                    name="encoder")(batch, train)
        else:
            from cobevt_tpu.models.cvt_nuscenes import CVTNuScenesEncoder
            x = CVTNuScenesEncoder(self.encoder_config, dtype=self.dtype,
                                   name="encoder")(batch, train)
        y = Decoder(self.decoder_blocks, dtype=self.dtype,
                    name="decoder")(x, train)
        z = torch_conv(self.dim_last, 3, 1, 1, False, self.dtype,
                       "to_logits_0")(y)
        z = batch_norm(dtype=self.dtype, name="to_logits_1")(
            z, use_running_average=not train)
        z = nn.relu(z)
        dim_max = max(stop for _, (_, stop) in self.outputs)
        z = torch_conv(dim_max, 1, 1, 0, True, self.dtype,
                       "to_logits_3")(z)
        return {k: z[..., start:stop] for k, (start, stop) in self.outputs}
