"""PointPillars encoder: pillar feature net + dense BEV scatter.

Capability parity with reference
opv2v/opencood/models/sub_modules/pillar_vfe.py (PFNLayer :10, PillarVFE
:56) and point_pillar_scatter.py (:5).

TPU-first: the pillar tensor is padded to a static ``max_voxels`` with a
validity mask (the reference's ragged voxel list breaks static shapes);
the scatter is one `scatter-add` into the dense BEV canvas instead of the
reference's per-batch Python loop with advanced indexing.  BatchNorm uses
eps 1e-3 / torch momentum 0.01 (flax 0.99), matching OpenPCDet.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class PFNLayer(nn.Module):
    """Linear -> BN over points -> ReLU -> max-pool (+concat if not
    last)."""

    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, point_mask, train: bool = False):
        """x: (N, P, C); point_mask: (N, P) 1 for real points."""
        out_ch = self.out_channels if self.last_layer else \
            self.out_channels // 2
        x = nn.Dense(out_ch, use_bias=not self.use_norm, dtype=self.dtype,
                     name="linear")(x)
        if self.use_norm:
            N, P, C = x.shape
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name="norm")(x.reshape(N * P, C))
            x = x.reshape(N, P, C)
        x = nn.relu(x)
        # reference semantics (pillar_vfe.py:45): padded point rows were
        # zeroed *before* the linear layer, but their transformed values
        # (bias/BN shifts) still participate in the max — reproduce that
        # exactly; padded *voxels* are masked later at scatter time.
        del point_mask
        x_max = x.max(axis=1, keepdims=True)
        if self.last_layer:
            return x_max
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1)


class PillarVFE(nn.Module):
    """Point -> pillar features: augment with cluster/center offsets,
    mask padding, run PFN stack, max-pool per pillar."""

    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    voxel_size: Tuple[float, float, float] = (0.4, 0.4, 4.0)
    point_cloud_range: Tuple[float, ...] = (-70.4, -40, -3, 70.4, 40, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, voxel_features, voxel_num_points, coords,
                 train: bool = False):
        """voxel_features: (N, P, 4) [x y z intensity] zero-padded;
        voxel_num_points: (N,); coords: (N, 4) [batch, z, y, x].
        Returns (N, C_out) pillar features (zero rows for empty pillars).
        """
        vx, vy, vz = self.voxel_size
        x_off = vx / 2 + self.point_cloud_range[0]
        y_off = vy / 2 + self.point_cloud_range[1]
        z_off = vz / 2 + self.point_cloud_range[2]

        n_pts = jnp.maximum(voxel_num_points, 1).astype(jnp.float32)
        P = voxel_features.shape[1]
        point_mask = (jnp.arange(P)[None] <
                      voxel_num_points[:, None]).astype(jnp.float32)

        masked_xyz = voxel_features[..., :3] * point_mask[..., None]
        points_mean = masked_xyz.sum(1, keepdims=True) / n_pts[:, None,
                                                               None]
        f_cluster = voxel_features[..., :3] - points_mean

        centers = jnp.stack([
            coords[:, 3].astype(jnp.float32) * vx + x_off,
            coords[:, 2].astype(jnp.float32) * vy + y_off,
            coords[:, 1].astype(jnp.float32) * vz + z_off], axis=-1)
        f_center = voxel_features[..., :3] - centers[:, None]

        feats = [voxel_features if self.use_absolute_xyz
                 else voxel_features[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxel_features[..., :3], axis=-1,
                                         keepdims=True))
        features = jnp.concatenate(feats, axis=-1) * point_mask[..., None]

        filters = list(self.num_filters)
        for i, out_ch in enumerate(filters):
            features = PFNLayer(
                out_ch, self.use_norm, last_layer=i == len(filters) - 1,
                dtype=self.dtype, name=f"pfn_layers_{i}")(
                features, point_mask, train)
        return features[:, 0, :]


def pillar_scatter(pillar_features, coords, batch_size: int,
                   grid_size: Tuple[int, int, int],
                   voxel_mask=None):
    """Scatter (N, C) pillar features into a dense (B, ny, nx, C) canvas.

    coords: (N, 4) [batch, z, y, x]; nz must be 1.  One vectorized
    scatter replaces the reference's per-batch loop
    (point_pillar_scatter.py:20-38)."""
    nx, ny, nz = grid_size
    assert nz == 1
    C = pillar_features.shape[-1]
    if voxel_mask is None:
        voxel_mask = jnp.ones(pillar_features.shape[0], bool)
    flat_idx = (coords[:, 0].astype(jnp.int32) * (ny * nx) +
                coords[:, 2].astype(jnp.int32) * nx +
                coords[:, 3].astype(jnp.int32))
    flat_idx = jnp.where(voxel_mask, flat_idx, batch_size * ny * nx)
    canvas = jnp.zeros((batch_size * ny * nx + 1, C),
                       pillar_features.dtype)
    feats = pillar_features * voxel_mask[:, None].astype(
        pillar_features.dtype)
    canvas = canvas.at[flat_idx].add(feats)
    return canvas[:-1].reshape(batch_size, ny, nx, C)
