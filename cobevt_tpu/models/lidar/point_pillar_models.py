"""Cooperative LiDAR detection: PointPillars + FuseBEVT (+ baselines).

The paper's OPV2V-LiDAR configuration (BASELINE config #4): per-agent
PointPillars pillar encoder -> BEV backbone -> optional shrink conv ->
STTF warp into the ego frame -> FuseBEVT swap-attention fusion ->
anchor-based detection head (cls + 7-dof regression per anchor).

The reference ships the pillar components as OpenCOOD carry-overs
(SURVEY.md section 2.4) without a wired LiDAR-CoBEVT model file; this
module provides the composition using parity-tested pieces
(pillar_encoder.py, bev_backbone.py, fusion/swap_fusion.py,
geometry/warp.py) plus a max-fusion baseline head.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.geometry.warp import roi_and_agent_mask, sttf_warp
from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder
from cobevt_tpu.models.fusion.zoo import max_fusion
from cobevt_tpu.models.lidar.bev_backbone import (
    BaseBEVBackbone,
    DownsampleConv,
)
from cobevt_tpu.models.lidar.pillar_encoder import PillarVFE, pillar_scatter
from cobevt_tpu.nn.layers import torch_conv


@dataclasses.dataclass(frozen=True)
class PointPillarConfig:
    max_cav: int = 5
    voxel_size: Tuple[float, float, float] = (0.4, 0.4, 4.0)
    point_cloud_range: Tuple[float, ...] = (-70.4, -40, -3, 70.4, 40, 1)
    max_voxels: int = 8000
    max_points_per_voxel: int = 32
    pillar_filters: Tuple[int, ...] = (64,)
    # backbone
    layer_nums: Tuple[int, ...] = (3, 5, 8)
    layer_strides: Tuple[int, ...] = (2, 2, 2)
    num_filters: Tuple[int, ...] = (64, 128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2, 4)
    num_upsample_filter: Tuple[int, ...] = (128, 128, 128)
    # shrink conv before fusion
    shrink_dim: int = 256
    # fusion
    fusion: str = "swap"           # swap | max
    fusion_window_size: int = 8
    fusion_dim_head: int = 32
    fusion_mlp_dim: int = 512
    fusion_depth: int = 2
    fusion_dropout: float = 0.1
    # sttf at feature stride 2 of the pillar grid
    sttf_downsample_rate: int = 2
    # head
    anchor_num: int = 2

    @property
    def grid_size(self):
        pr = self.point_cloud_range
        return (int(round((pr[3] - pr[0]) / self.voxel_size[0])),
                int(round((pr[4] - pr[1]) / self.voxel_size[1])), 1)


class PointPillarFuseBEVT(nn.Module):
    """Cooperative pillar detector with FuseBEVT fusion."""

    config: PointPillarConfig = PointPillarConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        """batch:
             voxel_features: (B, L, N, P, 4); voxel_num_points: (B, L, N)
             voxel_coords: (B, L, N, 4) [0, z, y, x] per-agent grids
             voxel_mask: (B, L, N) valid-voxel mask
             transformation_matrix: (B, L, 4, 4); agent_mask: (B, L)
        Returns {cls_preds (B, h, w, anchor_num),
                 reg_preds (B, h, w, anchor_num*7)}."""
        cfg = self.config
        vf = batch["voxel_features"]
        B, L, N, P, _ = vf.shape
        nx, ny, nz = cfg.grid_size

        pillars = PillarVFE(
            cfg.pillar_filters, True, False, True, cfg.voxel_size,
            cfg.point_cloud_range, dtype=self.dtype,
            name="pillar_vfe")(
            vf.reshape(B * L * N, P, 4),
            batch["voxel_num_points"].reshape(B * L * N),
            batch["voxel_coords"].reshape(B * L * N, 4), train)

        # per (batch, agent) canvas: build combined batch index
        agent_idx = jnp.arange(B * L).repeat(N)
        coords = batch["voxel_coords"].reshape(B * L * N, 4)
        coords = coords.at[:, 0].set(agent_idx)
        canvas = pillar_scatter(
            pillars, coords, B * L, cfg.grid_size,
            batch["voxel_mask"].reshape(B * L * N) > 0)    # (B*L,ny,nx,C)

        feats = BaseBEVBackbone(
            cfg.layer_nums, cfg.layer_strides, cfg.num_filters,
            cfg.upsample_strides, cfg.num_upsample_filter,
            dtype=self.dtype, name="backbone")(canvas, train)
        feats = DownsampleConv(
            (cfg.shrink_dim,), (1,), (1,),
            dtype=self.dtype, name="shrink_conv")(feats, train)

        h, w = feats.shape[1:3]
        x = feats.reshape(B, L, h, w, -1)
        agent_mask = batch["agent_mask"]
        x = x * agent_mask[:, :, None, None, None].astype(x.dtype)

        tmat = batch["transformation_matrix"]
        x = sttf_warp(x, tmat, cfg.voxel_size[0], cfg.sttf_downsample_rate)
        com_mask = roi_and_agent_mask((B, L, h, w), agent_mask, tmat,
                                      cfg.voxel_size[0],
                                      cfg.sttf_downsample_rate)

        if cfg.fusion == "swap":
            fused = SwapFusionEncoder(
                input_dim=x.shape[-1], mlp_dim=cfg.fusion_mlp_dim,
                agent_size=cfg.max_cav, window_size=cfg.fusion_window_size,
                dim_head=cfg.fusion_dim_head, dropout=cfg.fusion_dropout,
                depth=cfg.fusion_depth, mask=True, dtype=self.dtype,
                name="fusion_net")(x, com_mask, train)
        elif cfg.fusion == "max":
            fused = max_fusion(x)
        else:
            raise ValueError(cfg.fusion)

        cls = torch_conv(cfg.anchor_num, 1, 1, 0, True, self.dtype,
                         "cls_head")(fused)
        reg = torch_conv(7 * cfg.anchor_num, 1, 1, 0, True, self.dtype,
                         "reg_head")(fused)
        return {"cls_preds": cls, "reg_preds": reg}
