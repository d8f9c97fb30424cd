"""Top-level camera-BEV model graphs: the CVT baselines and fusion
variants, plus the string->builder registry.

Capability parity with the reference model zoo (selected via
`model.core_method`, opv2v/opencood/tools/train_utils.py:102-135):

  | class                           | reference file                     |
  |---------------------------------|------------------------------------|
  | CrossViewTransformerOPV2V       | models/cross_view_transformer.py:14|
  | CrossViewTransformerAttFuse     | .../cross_view_transformer_att_fuse.py:63 |
  | CrossViewTransformerSwapFuse    | .../cross_view_transformer_swap_fuse.py:64|
  | CrossViewTransformerFcooper     | .../cross_view_transformer_fcooper.py:63  |
  | CrossViewTransformerV2VNet      | .../cross_view_transformer_v2vnet.py:13   |
  | CrossViewTransformerDiscoNet    | .../cross_view_transformer_disconet.py:14 |
  | (CorpBEVT / SinBEVT live in models/corpbevt.py)                      |

All share one skeleton (encoder -> cam2bev -> pad/mask -> [STTF] ->
fusion -> decoder -> head); `CameraBEVModel` expresses it once with the
camera->BEV module and fusion strategy as configuration.  V2VNet and
DiscoNet skip STTF: their fusion consumes the raw pairwise transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.geometry.warp import roi_and_agent_mask, sttf_warp
from cobevt_tpu.models.corpbevt import CorpBEVT, CorpBEVTConfig, SinBEVT
from cobevt_tpu.models.cvt_dense import CrossViewModule, CVTModuleConfig
from cobevt_tpu.models.fax import FAXConfig, FAXModule
from cobevt_tpu.models.fusion.graph_fusion import (
    DiscoNetFusion,
    V2VNetFusion,
)
from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder
from cobevt_tpu.models.fusion.zoo import BaseTransformer, max_fusion
from cobevt_tpu.models.heads import BevSegHead, NaiveDecoder
from cobevt_tpu.nn.layers import images_from_uint8
from cobevt_tpu.nn.resnet import ResNetEncoder


@dataclasses.dataclass(frozen=True)
class CameraBEVConfig:
    """Shared skeleton config (CVT-based variants)."""

    max_cav: int = 5
    target: str = "dynamic"
    encoder_num_layers: int = 34
    encoder_id_pick: Tuple[int, ...] = (1, 3)
    image_height: int = 512
    image_width: int = 512
    cvm: CVTModuleConfig = CVTModuleConfig()
    fusion: str = "none"   # none|att|swap|max|v2vnet|disconet
    sttf_resolution: float = 0.390625
    sttf_downsample_rate: int = 8
    use_roi_mask: bool = True
    # att fusion (BaseTransformer)
    att_depth: int = 1
    att_heads: int = 8
    att_dim_head: int = 32
    att_mlp_dim: int = 256
    att_dropout: float = 0.0
    # swap fusion
    swap_mlp_dim: int = 256
    swap_window_size: int = 8
    swap_dim_head: int = 32
    swap_dropout: float = 0.1
    swap_depth: int = 3
    swap_mask: bool = True
    # v2vnet / disconet
    graph_num_iteration: int = 2
    graph_gru_flag: bool = True
    graph_agg_operator: str = "avg"
    # decoder / head
    decoder_num_layer: int = 3
    decoder_num_ch: Tuple[int, ...] = (32, 64, 128)
    seg_head_dim: int = 32
    output_class: int = 2

    def resolved_cvm(self) -> CVTModuleConfig:
        if self.cvm.backbone_output_shape:
            return self.cvm
        shapes = ResNetEncoder.output_shapes(
            self.encoder_num_layers, self.encoder_id_pick,
            (self.image_height, self.image_width))
        return dataclasses.replace(
            self.cvm, backbone_output_shape=tuple(shapes),
            middle=self.cvm.middle or tuple([2] * len(shapes)),
            image_height=self.image_height, image_width=self.image_width)


class CameraBEVModel(nn.Module):
    """encoder -> dense CVT cam2bev -> (pad/mask ->) fusion -> decoder ->
    seg head.  ``fusion='none'`` decodes every agent independently (the
    plain CVT baseline)."""

    config: CameraBEVConfig = CameraBEVConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        cfg = self.config
        x = images_from_uint8(batch["inputs"])
        B, L, M = x.shape[:3]

        feats = ResNetEncoder(cfg.encoder_num_layers, cfg.encoder_id_pick,
                              dtype=self.dtype, name="encoder")(x, train)
        x = CrossViewModule(cfg.resolved_cvm(), dtype=self.dtype,
                            name="cvm")(feats, batch["intrinsic"],
                                        batch["extrinsic"], train)
        # (B, L, H, W, C)

        if cfg.fusion == "none":
            y = NaiveDecoder(x.shape[-1], cfg.decoder_num_layer,
                             cfg.decoder_num_ch, dtype=self.dtype,
                             name="decoder")(x, train)
            return BevSegHead(cfg.target, cfg.seg_head_dim,
                              cfg.output_class, dtype=self.dtype,
                              name="seg_head")(y)

        agent_mask = batch["agent_mask"]
        x = x * agent_mask[:, :, None, None, None].astype(x.dtype)
        H, W = x.shape[2:4]

        if cfg.fusion in ("v2vnet", "disconet"):
            pairwise = batch["pairwise_t_matrix"]
            FusionCls = (V2VNetFusion if cfg.fusion == "v2vnet"
                         else DiscoNetFusion)
            kwargs = dict(
                in_channels=x.shape[-1],
                num_iteration=cfg.graph_num_iteration,
                discrete_ratio=cfg.sttf_resolution,
                downsample_rate=cfg.sttf_downsample_rate,
                dtype=self.dtype, name="fusion_net")
            if cfg.fusion == "v2vnet":
                kwargs.update(gru_flag=cfg.graph_gru_flag,
                              agg_operator=cfg.graph_agg_operator)
            fused = FusionCls(**kwargs)(x, agent_mask, pairwise, train)
        else:
            tmat = batch["transformation_matrix"]
            x = sttf_warp(x, tmat, cfg.sttf_resolution,
                          cfg.sttf_downsample_rate)
            if cfg.use_roi_mask:
                com_mask = roi_and_agent_mask(
                    (B, L, H, W), agent_mask, tmat, cfg.sttf_resolution,
                    cfg.sttf_downsample_rate)
            else:
                com_mask = jnp.broadcast_to(
                    agent_mask[:, :, None, None].astype(jnp.float32),
                    (B, L, H, W))
            if cfg.fusion == "att":
                spatial = jnp.moveaxis(com_mask, 1, -1)[..., None, :]
                fused = BaseTransformer(
                    x.shape[-1], cfg.att_depth, cfg.att_heads,
                    cfg.att_dim_head, cfg.att_mlp_dim, cfg.att_dropout,
                    dtype=self.dtype, name="fusion_net")(
                        x, spatial, train)
            elif cfg.fusion == "swap":
                fused = SwapFusionEncoder(
                    input_dim=x.shape[-1], mlp_dim=cfg.swap_mlp_dim,
                    agent_size=cfg.max_cav,
                    window_size=cfg.swap_window_size,
                    dim_head=cfg.swap_dim_head, dropout=cfg.swap_dropout,
                    depth=cfg.swap_depth, mask=cfg.swap_mask,
                    dtype=self.dtype, name="fusion_net")(x, com_mask, train)
            elif cfg.fusion == "max":
                # reference Fcooper maxes the zero-padded stack directly
                fused = max_fusion(x)
            else:
                raise ValueError(f"unknown fusion: {cfg.fusion}")

        y = NaiveDecoder(fused.shape[-1], cfg.decoder_num_layer,
                         cfg.decoder_num_ch, dtype=self.dtype,
                         name="decoder")(fused[:, None], train)
        return BevSegHead(cfg.target, cfg.seg_head_dim, cfg.output_class,
                          dtype=self.dtype, name="seg_head")(y)


def _cvt_variant(fusion):
    def build(**overrides):
        cfg = CameraBEVConfig(fusion=fusion, **overrides)
        return CameraBEVModel(cfg)
    return build


MODEL_REGISTRY = {
    "corpbevt": lambda **kw: CorpBEVT(CorpBEVTConfig(**kw)),
    "fax": lambda **kw: SinBEVT(CorpBEVTConfig(**kw)),
    "cvt": _cvt_variant("none"),
    "cvt_att_fuse": _cvt_variant("att"),
    "cvt_swap_fuse": _cvt_variant("swap"),
    "cvt_fcooper": _cvt_variant("max"),
    "cvt_v2vnet": _cvt_variant("v2vnet"),
    "cvt_disconet": _cvt_variant("disconet"),
}


def create_model(core_method: str, **kwargs):
    """String dispatch mirroring `train_utils.create_model`
    (reference opv2v/opencood/tools/train_utils.py:102-135)."""
    if core_method not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown core_method {core_method!r}; "
            f"available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[core_method](**kwargs)
