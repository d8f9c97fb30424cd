"""Single-scale and FPN-concat ResNet encoder variants.

Capability parity with reference
opv2v/opencood/models/backbones/resnet_encoder.py:8 (one pyramid stage)
and resnet_encoder_concat.py:12 (layers 2-4 through a
FeaturePyramidNetwork, nearest-upsampled to a common stride and
concatenated, then fused by a 1x1 conv).  The FPN follows the standard
torchvision construction (1x1 lateral convs + top-down nearest upsample
+ 3x3 output convs), with parameter names mirroring
`fpn_network.inner_blocks.<i>.weight` / `layer_blocks.<i>.weight`.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.nn.layers import torch_conv
from cobevt_tpu.nn.resnet import ResNetTrunk


def _up_nearest(x, n: int):
    return jnp.repeat(jnp.repeat(x, n, axis=1), n, axis=2)


class FeaturePyramidNetwork(nn.Module):
    """torchvision-style FPN over a list of feature maps."""

    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        laterals = [
            torch_conv(self.out_channels, 1, 1, 0, True, self.dtype,
                       f"inner_blocks_{i}")(f)
            for i, f in enumerate(feats)]
        outs = [None] * len(feats)
        last = laterals[-1]
        outs[-1] = last
        for i in range(len(feats) - 2, -1, -1):
            last = laterals[i] + _up_nearest(last, 2)
            outs[i] = last
        return [
            torch_conv(self.out_channels, 3, 1, 1, True, self.dtype,
                       f"layer_blocks_{i}")(o)
            for i, o in enumerate(outs)]


class ResNetEncoderSingle(nn.Module):
    """One selected pyramid stage over multi-agent cameras
    (reference resnet_encoder.py:8)."""

    num_layers: int = 34
    id_pick: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        B, L, M, H, W, C = images.shape
        outs = ResNetTrunk(self.num_layers, dtype=self.dtype,
                           name="encoder")(
            images.reshape(B * L * M, H, W, C), train)
        f = outs[self.id_pick]
        return f.reshape(B, L, M, *f.shape[1:])


class ResNetEncoderConcat(nn.Module):
    """Layers 2-4 (optionally FPN-refined), upsampled to layer2's stride
    and concatenated, then fused by a 1x1 conv."""

    num_layers: int = 34
    fpn_out_dim: int = 0            # 0 disables the FPN
    conv_output_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, images, train: bool = False):
        B, L, M, H, W, C = images.shape
        outs = ResNetTrunk(self.num_layers, dtype=self.dtype,
                           name="encoder")(
            images.reshape(B * L * M, H, W, C), train)
        x1, x2, x3 = outs[1], outs[2], outs[3]
        if self.fpn_out_dim > 0:
            x1, x2, x3 = FeaturePyramidNetwork(
                self.fpn_out_dim, dtype=self.dtype,
                name="fpn_network")([x1, x2, x3])
        x3 = _up_nearest(x3, 4)
        x2 = _up_nearest(x2, 2)
        cat = jnp.concatenate([x1, x2, x3], axis=-1)
        fused = torch_conv(self.conv_output_dim, 1, 1, 0, True,
                           self.dtype, "conv2d")(cat)
        return fused.reshape(B, L, M, *fused.shape[1:])
