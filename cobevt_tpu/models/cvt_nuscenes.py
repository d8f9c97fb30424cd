"""Dense CVT encoder for the nuScenes track (baseline model M14).

Capability parity with reference
nuscenes/cross_view_transformer/model/encoder.py:281 (`Encoder` — the
original CVT: dense cross-view attention over EfficientNet features at a
fixed BEV resolution; config nuscenes/config/model/cvt.yaml).  Reuses
the dense attention core shared with the OPV2V twin
(models/cvt_dense.py) and plugs into the same `CrossViewTransformer`
decoder/head wrapper as the pyramid-axial encoder.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
from einops import repeat

from cobevt_tpu.models.cvt_dense import (
    CVTModuleConfig,
    DenseCrossViewAttention,
    _DenseBEVPrior,
    dense_bev_grid,
)
from cobevt_tpu.models.sinbevt_nuscenes import normalize_image
from cobevt_tpu.nn.efficientnet import EfficientNetExtractor
from cobevt_tpu.nn.layers import Bottleneck, images_from_uint8


@dataclasses.dataclass(frozen=True)
class CVTNuScenesConfig:
    dim: int = 128
    middle: Tuple[int, ...] = (2, 2)
    image_height: int = 224
    image_width: int = 480
    backbone_model: str = "efficientnet-b4"
    backbone_layers: Tuple[str, ...] = ("reduction_2", "reduction_4")
    heads: int = 4
    dim_head: int = 32
    qkv_bias: bool = True
    no_image_features: bool = False
    skip: bool = True
    sigma: float = 1.0
    bev_height: int = 200
    bev_width: int = 200
    h_meters: float = 100.0
    w_meters: float = 100.0
    offset: float = 0.0
    decoder_blocks: int = 3
    remat_backbone: bool = True


class CVTNuScenesEncoder(nn.Module):
    """Normalize -> EfficientNet -> dense cross-view stages at a fixed
    BEV resolution."""

    config: CVTNuScenesConfig = CVTNuScenesConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch: Dict, train: bool = False):
        cfg = self.config
        image = images_from_uint8(batch["image"], normalize=False)
        B, n, H, W, _ = image.shape

        I_inv = jnp.linalg.inv(batch["intrinsics"].astype(jnp.float32))
        E_inv = jnp.linalg.inv(batch["extrinsics"].astype(jnp.float32))

        feats = EfficientNetExtractor(
            cfg.backbone_layers, cfg.backbone_model,
            remat=cfg.remat_backbone, dtype=self.dtype, name="backbone")(
            normalize_image(image.reshape(B * n, H, W, 3)), train)

        grid_h = cfg.bev_height // (2 ** cfg.decoder_blocks)
        grid_w = cfg.bev_width // (2 ** cfg.decoder_blocks)
        world = jnp.asarray(dense_bev_grid(
            cfg.bev_height, cfg.bev_width, cfg.h_meters, cfg.w_meters,
            cfg.offset, cfg.decoder_blocks))
        prior = _DenseBEVPrior(cfg.dim, cfg.sigma, grid_h, grid_w,
                               name="bev_embedding")()
        x = repeat(prior, "H W d -> b H W d", b=B)
        if self.dtype is not None:
            x = x.astype(self.dtype)   # keep the BEV stream in compute dtype

        for i, feat in enumerate(feats):
            fh, fw, fc = feat.shape[1:]
            x = DenseCrossViewAttention(
                fh, fw, fc, cfg.dim, cfg.image_height, cfg.image_width,
                cfg.heads, cfg.dim_head, cfg.qkv_bias,
                cfg.no_image_features, cfg.skip, dtype=self.dtype,
                name=f"cross_views_{i}")(
                    x, world, feat.reshape(B, n, fh, fw, fc), I_inv,
                    E_inv, train)
            for j in range(cfg.middle[i]):
                x = Bottleneck(cfg.dim // 4, dtype=self.dtype,
                               name=f"layers_{i}_{j}")(x, train)
        return x
