"""Small LiDAR-track helpers.

Capability parity with reference
opv2v/opencood/models/sub_modules/mean_vfe.py:4 (voxel mean features)
and height_compression.py:4 (3D voxel grid -> dense BEV reshape; our
pipeline is dense, so the reshape is literal — the reference needed
spconv's sparse->dense first).
"""

from __future__ import annotations

import jax.numpy as jnp


def mean_vfe(voxel_features, voxel_num_points):
    """(N, P, C) zero-padded points -> (N, C) per-voxel mean."""
    P = voxel_features.shape[1]
    mask = (jnp.arange(P)[None] <
            voxel_num_points[:, None]).astype(voxel_features.dtype)
    s = (voxel_features * mask[..., None]).sum(axis=1)
    return s / jnp.maximum(voxel_num_points, 1).astype(
        voxel_features.dtype)[:, None]


def height_compression(dense_voxel_grid):
    """(B, D, H, W, C) -> (B, H, W, D*C) dense BEV features."""
    B, D, H, W, C = dense_voxel_grid.shape
    return dense_voxel_grid.transpose(0, 2, 3, 1, 4).reshape(B, H, W,
                                                             D * C)
