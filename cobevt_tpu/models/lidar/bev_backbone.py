"""BEV conv backbones for the LiDAR track.

Capability parity with reference
opv2v/opencood/models/backbones/base_bev_backbone.py:6 (SECOND-style
conv pyramid + transpose-conv upsample concat),
backbones/att_bev_backbone.py:9 (AttFusion at every scale + optional
autoencoder compression), sub_modules/auto_encoder.py:5 and
sub_modules/downsample_conv.py:32.

All BN layers use OpenPCDet numerics (eps 1e-3, torch momentum 0.01 ->
flax 0.99).  Torch parameter paths are mirrored (blocks.<i>.<j>,
deblocks.<i>.<j>).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.models.fusion.zoo import AttFusion
from cobevt_tpu.nn.layers import torch_conv


def _bn(name, dtype=None):
    return nn.BatchNorm(use_running_average=None, momentum=0.99,
                        epsilon=1e-3, dtype=dtype, name=name)


class BaseBEVBackbone(nn.Module):
    """Downsampling conv blocks + per-level upsample deconvs, concat."""

    layer_nums: Sequence[int] = (3, 5, 8)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filter: Sequence[int] = (128, 128, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_multiscale=False):
        """x: (B, H, W, C) -> concat of upsampled levels
        (B, H/first_stride, W/first_stride, sum(num_upsample_filter))."""
        ups = []
        levels = []
        for i in range(len(self.layer_nums)):
            p = f"blocks_{i}"
            # torch: ZeroPad2d(1) + conv(k3, s, p0): indices 1 (conv),
            # 2 (bn); then layer_nums[i] x (conv(3+j*3), bn(4+j*3))
            x = torch_conv(self.num_filters[i], 3, self.layer_strides[i],
                           1, False, self.dtype, f"{p}_1")(x)
            x = _bn(f"{p}_2", self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
            for k in range(self.layer_nums[i]):
                x = torch_conv(self.num_filters[i], 3, 1, 1, False,
                               self.dtype, f"{p}_{4 + k * 3}")(x)
                x = _bn(f"{p}_{5 + k * 3}", self.dtype)(
                    x, use_running_average=not train)
                x = nn.relu(x)
            levels.append(x)

            if len(self.upsample_strides) > 0:
                s = self.upsample_strides[i]
                q = f"deblocks_{i}"
                if s >= 1:
                    up = nn.ConvTranspose(
                        self.num_upsample_filter[i], (s, s),
                        strides=(s, s), padding="VALID", use_bias=False,
                        dtype=self.dtype, name=f"{q}_0")(x)
                else:
                    ds = int(round(1 / s))
                    up = torch_conv(self.num_upsample_filter[i], ds, ds, 0,
                                    False, self.dtype, f"{q}_0")(x)
                up = _bn(f"{q}_1", self.dtype)(
                    up, use_running_average=not train)
                ups.append(nn.relu(up))
            else:
                ups.append(x)

        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if return_multiscale:
            return out, levels
        return out


class AutoEncoder(nn.Module):
    """Conv down/up autoencoder for per-scale feature compression
    (reference auto_encoder.py:5: conv s2 stack down, x2 nearest-up conv
    stack back)."""

    channels: int
    compress_layers: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.channels
        for i in range(self.compress_layers):
            x = torch_conv(C // (2 ** (i + 1)), 3, 2, 1, True, self.dtype,
                           f"encoder_{i}")(x)
            x = nn.relu(x)
        for i in range(self.compress_layers):
            ch = C // (2 ** (self.compress_layers - i - 1))
            x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
            x = torch_conv(ch, 3, 1, 1, True, self.dtype,
                           f"decoder_{i}")(x)
            x = nn.relu(x)
        return x


class DownsampleConv(nn.Module):
    """Strided double-conv stack (reference downsample_conv.py:32)."""

    dims: Sequence[int] = (256,)
    kernel_sizes: Sequence[int] = (1,)
    strides: Sequence[int] = (1,)
    input_dim: int = 384
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (d, k, s) in enumerate(zip(self.dims, self.kernel_sizes,
                                          self.strides)):
            p = f"layers_{i}"
            pad = k // 2
            x = torch_conv(d, k, s, pad, False, self.dtype, f"{p}_0")(x)
            x = _bn(f"{p}_1", self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
            x = torch_conv(d, k, 1, pad, False, self.dtype, f"{p}_3")(x)
            x = _bn(f"{p}_4", self.dtype)(x, use_running_average=not train)
            x = nn.relu(x)
        return x


class AttBEVBackbone(nn.Module):
    """BEV backbone fusing agents with per-pixel attention at every scale
    (reference att_bev_backbone.py:9).  Operates on the padded
    (B, L, H, W, C) layout; fusion happens before each level's deconv."""

    layer_nums: Sequence[int] = (3, 5, 8)
    layer_strides: Sequence[int] = (2, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filter: Sequence[int] = (128, 128, 128)
    compression: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, agent_mask, train: bool = False):
        """x: (B, L, H, W, C); agent_mask: (B, L) -> (B, h, w, C_out)."""
        B, L = x.shape[:2]
        ups = []
        flat = x.reshape(B * L, *x.shape[2:])
        for i in range(len(self.layer_nums)):
            p = f"blocks_{i}"
            flat = torch_conv(self.num_filters[i], 3,
                              self.layer_strides[i], 1, False, self.dtype,
                              f"{p}_1")(flat)
            flat = _bn(f"{p}_2", self.dtype)(
                flat, use_running_average=not train)
            flat = nn.relu(flat)
            for k in range(self.layer_nums[i]):
                flat = torch_conv(self.num_filters[i], 3, 1, 1, False,
                                  self.dtype, f"{p}_{4 + k * 3}")(flat)
                flat = _bn(f"{p}_{5 + k * 3}", self.dtype)(
                    flat, use_running_average=not train)
                flat = nn.relu(flat)

            if self.compression > 0:
                flat = AutoEncoder(self.num_filters[i], self.compression,
                                   dtype=self.dtype,
                                   name=f"compression_modules_{i}")(
                    flat, train)

            staged = flat.reshape(B, L, *flat.shape[1:])
            fused = AttFusion(self.num_filters[i], dtype=self.dtype,
                              name=f"fuse_modules_{i}")(staged, agent_mask)

            s = self.upsample_strides[i]
            q = f"deblocks_{i}"
            up = nn.ConvTranspose(self.num_upsample_filter[i], (s, s),
                                  strides=(s, s), padding="VALID",
                                  use_bias=False, dtype=self.dtype,
                                  name=f"{q}_0")(fused)
            up = _bn(f"{q}_1", self.dtype)(up,
                                           use_running_average=not train)
            ups.append(nn.relu(up))
        return jnp.concatenate(ups, axis=-1)
