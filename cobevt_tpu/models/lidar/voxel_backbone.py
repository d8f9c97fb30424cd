"""Dense 3D voxel backbone (SECOND-style) — the spconv replacement.

Capability parity with reference
opv2v/opencood/models/sub_modules/sparse_backbone_3d.py:33
(`VoxelBackBone8x` on spconv): same stage layout (16-16 / 32 / 64 / 64
channels, 8x spatial downsample, final (3,1,1)-stride-(2,1,1) conv to
128) built with dense 3D convolutions.  On TPU, dense 3D convs over the
shallow height axis map straight onto the MXU, whereas sparse gather/
scatter convs (spconv's CUDA path) do not vectorize — at OPV2V's ~5%
occupancy and D<=40 the dense formulation is both simpler and faster on
this hardware (SURVEY.md section 2.5's replacement plan).

Input layout: (B, D, H, W, C) dense voxel grids (use
`scatter_voxels_dense` below + `models/lidar/misc.height_compression`
downstream).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def scatter_voxels_dense(voxel_features, coords, batch_size: int,
                         grid_dhw: Tuple[int, int, int],
                         voxel_mask=None):
    """(N, C) voxel features + (N, 4) [b, z, y, x] coords -> dense
    (B, D, H, W, C) grid."""
    D, H, W = grid_dhw
    C = voxel_features.shape[-1]
    if voxel_mask is None:
        voxel_mask = jnp.ones(voxel_features.shape[0], bool)
    flat = (coords[:, 0].astype(jnp.int32) * (D * H * W) +
            coords[:, 1].astype(jnp.int32) * (H * W) +
            coords[:, 2].astype(jnp.int32) * W +
            coords[:, 3].astype(jnp.int32))
    flat = jnp.where(voxel_mask, flat, batch_size * D * H * W)
    canvas = jnp.zeros((batch_size * D * H * W + 1, C),
                       voxel_features.dtype)
    canvas = canvas.at[flat].add(
        voxel_features * voxel_mask[:, None].astype(voxel_features.dtype))
    return canvas[:-1].reshape(batch_size, D, H, W, C)


def _conv3d(features, kernel, strides, padding, name, dtype):
    if isinstance(kernel, int):
        kernel = (kernel,) * 3
    if isinstance(strides, int):
        strides = (strides,) * 3
    if isinstance(padding, int):
        padding = ((padding,) * 2,) * 3
    elif isinstance(padding, (tuple, list)) and \
            isinstance(padding[0], int):
        padding = tuple((p, p) for p in padding)
    return nn.Conv(features, kernel_size=kernel, strides=strides,
                   padding=padding, use_bias=False, dtype=dtype,
                   name=name)


class DenseVoxelBackbone8x(nn.Module):
    """conv_input -> conv1 -> conv2(/2) -> conv3(/2) -> conv4(/2) ->
    conv_out ((3,1,1) stride (2,1,1) to 128ch), BN eps 1e-3."""

    input_channels: int = 4
    dtype: Any = None

    def _bn(self, name):
        return nn.BatchNorm(use_running_average=None, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, D, H, W, C) -> dict of multiscale dense grids and the
        (B, D', H/8, W/8, 128) output."""
        def block(x, ch, k, s, p, prefix, n_subm=0):
            x = _conv3d(ch, k, s, p, f"{prefix}_conv", self.dtype)(x)
            x = self._bn(f"{prefix}_bn")(x, use_running_average=not train)
            x = nn.relu(x)
            for i in range(n_subm):
                x = _conv3d(ch, 3, 1, 1, f"{prefix}_subm{i}_conv",
                            self.dtype)(x)
                x = self._bn(f"{prefix}_subm{i}_bn")(
                    x, use_running_average=not train)
                x = nn.relu(x)
            return x

        x = block(x, 16, 3, 1, 1, "conv_input")
        x1 = block(x, 16, 3, 1, 1, "conv1")
        x2 = block(x1, 32, 3, 2, 1, "conv2", n_subm=2)
        x3 = block(x2, 64, 3, 2, 1, "conv3", n_subm=2)
        x4 = block(x3, 64, 3, 2, (0, 1, 1), "conv4", n_subm=2)
        out = block(x4, 128, (3, 1, 1), (2, 1, 1), 0, "conv_out")
        return {"encoded_voxel": out,
                "multi_scale_3d": {"x_conv1": x1, "x_conv2": x2,
                                   "x_conv3": x3, "x_conv4": x4}}
