"""CorpBEVT: the cooperative CoBEVT graph (SinBEVT per agent + ego warp +
FuseBEVT), plus the fusion-free SinBEVT variant.

Capability parity with `CorpBEVT`
(reference opv2v/opencood/models/corpbevt.py:67) and
`FaxFusedTransformer` (reference .../fax_fused_transformer.py:13).

TPU-first input contract: the batch arrives **padded to max_cav** with an
(B, L) agent validity mask and static shapes — never the reference's
(sum L_i)-stacked tensors split at trace time by `record_len`
(fuse_utils.py:26).  `cobevt_tpu.models.heads.regroup` converts stacked
inputs to this layout when needed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.geometry.warp import roi_and_agent_mask, sttf_warp
from cobevt_tpu.models.fax import FAXConfig, FAXModule
from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder
from cobevt_tpu.models.heads import BevSegHead, NaiveCompressor, NaiveDecoder
from cobevt_tpu.nn.layers import images_from_uint8
from cobevt_tpu.nn.resnet import ResNetEncoder


@dataclasses.dataclass(frozen=True)
class CorpBEVTConfig:
    """Mirrors the `model.args` block of
    opv2v/opencood/hypes_yaml/opcamera/corpbevt.yaml."""

    max_cav: int = 5
    target: str = "dynamic"
    # encoder
    encoder_num_layers: int = 34
    encoder_id_pick: Tuple[int, ...] = (1, 2, 3)
    # training-only gradient checkpointing of the trunk blocks (frees
    # the 512^2-spatial activations between blocks for larger per-chip
    # batches; no effect on eval)
    encoder_remat: bool = False
    image_height: int = 512
    image_width: int = 512
    # fax (backbone_output_shape auto-derived if empty)
    fax: FAXConfig = FAXConfig()
    # compression (0 = off)
    compression: int = 0
    # sttf
    sttf_resolution: float = 0.390625
    sttf_downsample_rate: int = 8
    use_roi_mask: bool = True
    # fusion
    fusion_mlp_dim: int = 256
    fusion_window_size: int = 8
    fusion_dim_head: int = 32
    fusion_dropout: float = 0.1
    fusion_depth: int = 3
    fusion_mask: bool = True
    fusion_mean_over_valid: bool = False
    # decoder / head
    decoder_num_layer: int = 3
    decoder_num_ch: Tuple[int, ...] = (32, 64, 128)
    seg_head_dim: int = 32
    output_class: int = 2

    def resolved_fax(self) -> FAXConfig:
        if self.fax.backbone_output_shape:
            return self.fax
        shapes = ResNetEncoder.output_shapes(
            self.encoder_num_layers, self.encoder_id_pick,
            (self.image_height, self.image_width))
        return dataclasses.replace(
            self.fax,
            backbone_output_shape=tuple(shapes),
            image_height=self.image_height,
            image_width=self.image_width)


class CorpBEVT(nn.Module):
    """encoder -> FAX -> (compressor) -> STTF ego warp -> ROI+agent mask ->
    FuseBEVT -> decoder -> seg head."""

    config: CorpBEVTConfig = CorpBEVTConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False, stage: str = "full",
                 agent_bev=None):
        """batch: dict with
             inputs: (B, L, M, H, W, 3) float images (padded to max_cav)
             intrinsic: (B, L, M, 3, 3)
             extrinsic: (B, L, M, 4, 4)
             transformation_matrix: (B, L, 4, 4) agent->ego SE(3)
             agent_mask: (B, L) 1.0 for live agents
        Returns dict of (B, 1, H, W, classes) seg logits.

        ``stage`` splits the graph at the per-agent/cooperative boundary
        for exact agent-count bucketing at serving time
        (cobevt_tpu/utils/serving.py):
          "full"   — the whole graph (default);
          "encode" — per-agent encoder -> FAX -> compressor only; returns
                     the (B, L, H, W, C) agent BEV maps;
          "fuse"   — warp -> mask -> fusion -> decoder -> head, consuming
                     ``agent_bev`` padded back to max_cav.  Padded rows
                     are zero before the warp, exactly as in a full
                     padded run, so the fusion input is bit-identical.
        """
        cfg = self.config
        if stage in ("full", "encode"):
            x = images_from_uint8(batch["inputs"])
            B, L, M = x.shape[:3]

            feats = ResNetEncoder(cfg.encoder_num_layers,
                                  cfg.encoder_id_pick,
                                  dtype=self.dtype,
                                  remat=cfg.encoder_remat,
                                  name="encoder")(
                x, train)
            x = FAXModule(cfg.resolved_fax(), dtype=self.dtype,
                          name="fax")(
                feats, batch["intrinsic"], batch["extrinsic"], train)
            # (B, L, H, W, C)

            if cfg.compression > 0:
                Bc, Lc, H, W, C = x.shape
                x = NaiveCompressor(C, cfg.compression, dtype=self.dtype,
                                    name="naive_compressor")(
                    x.reshape(Bc * Lc, H, W, C),
                    train).reshape(Bc, Lc, H, W, C)
            if stage == "encode":
                return x
        else:
            assert stage == "fuse" and agent_bev is not None
            x = agent_bev
            B, L = x.shape[:2]

        tmat = batch["transformation_matrix"]
        agent_mask = batch["agent_mask"]
        # zero padded agents so the padded layout is numerically identical
        # to the reference's regroup() zero-padding (fuse_utils.py:40-46)
        x = x * agent_mask[:, :, None, None, None].astype(x.dtype)
        x = sttf_warp(x, tmat, cfg.sttf_resolution, cfg.sttf_downsample_rate)

        H, W = x.shape[2:4]
        if cfg.use_roi_mask:
            com_mask = roi_and_agent_mask((B, L, H, W), agent_mask, tmat,
                                          cfg.sttf_resolution,
                                          cfg.sttf_downsample_rate)
        else:
            com_mask = jnp.broadcast_to(
                agent_mask[:, :, None, None].astype(jnp.float32),
                (B, L, H, W))

        fused = SwapFusionEncoder(
            input_dim=x.shape[-1], mlp_dim=cfg.fusion_mlp_dim,
            agent_size=cfg.max_cav, window_size=cfg.fusion_window_size,
            dim_head=cfg.fusion_dim_head, dropout=cfg.fusion_dropout,
            depth=cfg.fusion_depth, mask=cfg.fusion_mask,
            mean_over_valid=cfg.fusion_mean_over_valid, dtype=self.dtype,
            name="fusion_net")(x, com_mask, train,
                               agent_mask=agent_mask)

        y = NaiveDecoder(fused.shape[-1], cfg.decoder_num_layer,
                         cfg.decoder_num_ch, dtype=self.dtype,
                         name="decoder")(fused[:, None], train)
        return BevSegHead(cfg.target, cfg.seg_head_dim, cfg.output_class,
                          dtype=self.dtype, name="seg_head")(y)


class SinBEVT(nn.Module):
    """Single-agent FAX transformer, no V2V fusion (reference
    `FaxFusedTransformer`, opv2v/opencood/models/fax_fused_transformer.py:13).
    Operates per-agent; decodes each agent's BEV independently."""

    config: CorpBEVTConfig = CorpBEVTConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        cfg = self.config
        x = images_from_uint8(batch["inputs"])
        feats = ResNetEncoder(cfg.encoder_num_layers, cfg.encoder_id_pick,
                              dtype=self.dtype, remat=cfg.encoder_remat,
                              name="encoder")(x, train)
        x = FAXModule(cfg.resolved_fax(), dtype=self.dtype, name="fax")(
            feats, batch["intrinsic"], batch["extrinsic"], train)
        y = NaiveDecoder(x.shape[-1], cfg.decoder_num_layer,
                         cfg.decoder_num_ch, dtype=self.dtype,
                         name="decoder")(x, train)
        return BevSegHead(cfg.target, cfg.seg_head_dim, cfg.output_class,
                          dtype=self.dtype, name="seg_head")(y)
