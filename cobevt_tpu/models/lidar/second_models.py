"""SECOND-style cooperative voxel detector (config-reachable).

Wires the parity-tested pieces — MeanVFE (misc.py:mean_vfe, reference
opv2v/opencood/models/sub_modules/mean_vfe.py:4), the dense spconv
replacement (voxel_backbone.py:DenseVoxelBackbone8x, reference
sparse_backbone_3d.py:33), HeightCompression (misc.py:height_compression,
reference height_compression.py:4) and BaseBEVBackbone (reference
backbones/base_bev_backbone.py:6) — into an end-to-end detector built
from a hypes dict whose geometry comes from the `load_second_params`
yaml parser (reference hypes_yaml/yaml_utils.py:128-168).

The reference ships these modules as OpenCOOD carry-overs without a
wired SECOND config; capability parity requires the pipeline to be
reachable from a hypes file, which this module provides (cooperative
variant: per-agent voxel grids, STTF ego warp, max/swap fusion —
consistent with the pillar track in point_pillar_models.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.geometry.warp import roi_and_agent_mask, sttf_warp
from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder
from cobevt_tpu.models.fusion.zoo import max_fusion
from cobevt_tpu.models.lidar.bev_backbone import BaseBEVBackbone
from cobevt_tpu.models.lidar.misc import height_compression, mean_vfe
from cobevt_tpu.models.lidar.voxel_backbone import (
    DenseVoxelBackbone8x,
    scatter_voxels_dense,
)
from cobevt_tpu.nn.layers import torch_conv


@dataclasses.dataclass(frozen=True)
class SecondConfig:
    max_cav: int = 1
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    point_cloud_range: Tuple[float, ...] = (-70.4, -40, -3, 70.4, 40, 1)
    # (W, H, D) in voxels, normally injected by load_second_params
    grid_size: Tuple[int, int, int] = (1408, 800, 40)
    num_point_features: int = 4
    # BEV backbone (SECOND defaults)
    layer_nums: Tuple[int, ...] = (5, 5)
    layer_strides: Tuple[int, ...] = (1, 2)
    num_filters: Tuple[int, ...] = (128, 256)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filter: Tuple[int, ...] = (256, 256)
    # fusion: none | max | swap
    fusion: str = "none"
    fusion_window_size: int = 4
    fusion_dim_head: int = 32
    fusion_mlp_dim: int = 256
    fusion_depth: int = 1
    fusion_dropout: float = 0.0
    anchor_num: int = 2

    @property
    def grid_dhw(self):
        W, H, D = self.grid_size
        return (D, H, W)


class SecondDetector(nn.Module):
    """mean-VFE -> dense voxel scatter -> VoxelBackbone8x -> height
    compression -> BEV backbone -> [STTF + fusion] -> anchor heads."""

    config: SecondConfig = SecondConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False):
        """batch:
             voxel_features: (B, L, N, P, 4); voxel_num_points: (B, L, N)
             voxel_coords: (B, L, N, 4) [0, z, y, x]
             voxel_mask: (B, L, N)
             transformation_matrix: (B, L, 4, 4); agent_mask: (B, L)
        Returns {cls_preds, reg_preds} on the fused (ego) BEV grid."""
        cfg = self.config
        vf = batch["voxel_features"]
        B, L, N, P, _ = vf.shape

        feats = mean_vfe(vf.reshape(B * L * N, P, -1),
                         batch["voxel_num_points"].reshape(B * L * N))

        agent_idx = jnp.arange(B * L).repeat(N)
        coords = batch["voxel_coords"].reshape(B * L * N, 4)
        coords = coords.at[:, 0].set(agent_idx)
        grid = scatter_voxels_dense(
            feats, coords, B * L, cfg.grid_dhw,
            batch["voxel_mask"].reshape(B * L * N) > 0)

        out3d = DenseVoxelBackbone8x(cfg.num_point_features,
                                     dtype=self.dtype,
                                     name="backbone_3d")(grid, train)
        bev = height_compression(out3d["encoded_voxel"])

        feats2d = BaseBEVBackbone(
            cfg.layer_nums, cfg.layer_strides, cfg.num_filters,
            cfg.upsample_strides, cfg.num_upsample_filter,
            dtype=self.dtype, name="backbone_2d")(bev, train)

        h, w = feats2d.shape[1:3]
        x = feats2d.reshape(B, L, h, w, -1)

        if cfg.fusion != "none" and L > 1:
            agent_mask = batch["agent_mask"]
            x = x * agent_mask[:, :, None, None, None].astype(x.dtype)
            tmat = batch["transformation_matrix"]
            # BEV cell size after 8x voxel + backbone stride
            res = cfg.voxel_size[0]
            rate = 8 * cfg.layer_strides[0]
            x = sttf_warp(x, tmat, res, rate)
            com_mask = roi_and_agent_mask((B, L, h, w), agent_mask, tmat,
                                          res, rate)
            if cfg.fusion == "swap":
                fused = SwapFusionEncoder(
                    input_dim=x.shape[-1], mlp_dim=cfg.fusion_mlp_dim,
                    agent_size=cfg.max_cav,
                    window_size=cfg.fusion_window_size,
                    dim_head=cfg.fusion_dim_head,
                    dropout=cfg.fusion_dropout, depth=cfg.fusion_depth,
                    mask=True, dtype=self.dtype,
                    name="fusion_net")(x, com_mask, train)
            else:
                fused = max_fusion(x)
        else:
            fused = x[:, 0]

        cls = torch_conv(cfg.anchor_num, 1, 1, 0, True, self.dtype,
                         "cls_head")(fused)
        reg = torch_conv(7 * cfg.anchor_num, 1, 1, 0, True, self.dtype,
                         "reg_head")(fused)
        return {"cls_preds": cls, "reg_preds": reg}


def second_config_from_hypes(hypes: dict) -> SecondConfig:
    """Map a second-style hypes dict (yaml_parser: load_second_params —
    reference yaml_utils.py:128, which injects model.args.grid_size from
    the lidar range and voxel size) onto SecondConfig."""
    args = hypes["model"]["args"]
    pre = hypes["preprocess"]
    grid = args["grid_size"]
    bb = args.get("base_bev_backbone", {})
    fusion = args.get("fusion", {})
    return SecondConfig(
        max_cav=hypes.get("train_params", {}).get("max_cav", 1),
        voxel_size=tuple(pre["args"]["voxel_size"]),
        point_cloud_range=tuple(pre["cav_lidar_range"]),
        grid_size=tuple(int(g) for g in grid),
        num_point_features=args.get("mean_vfe", {}).get(
            "num_point_features", 4),
        layer_nums=tuple(bb.get("layer_nums", (5, 5))),
        layer_strides=tuple(bb.get("layer_strides", (1, 2))),
        num_filters=tuple(bb.get("num_filters", (128, 256))),
        upsample_strides=tuple(bb.get("upsample_strides", (1, 2))),
        num_upsample_filter=tuple(bb.get("num_upsample_filter",
                                         (256, 256))),
        fusion=fusion.get("core_method", "none"),
        fusion_window_size=fusion.get("window_size", 4),
        fusion_dim_head=fusion.get("dim_head", 32),
        fusion_mlp_dim=fusion.get("mlp_dim", 256),
        fusion_depth=fusion.get("depth", 1),
        fusion_dropout=fusion.get("drop_out", 0.0),
        anchor_num=hypes.get("postprocess", {}).get(
            "anchor_args", {}).get("num", 2))
