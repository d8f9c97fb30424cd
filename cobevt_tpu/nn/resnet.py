"""Multi-scale ResNet image encoder.

Capability parity with `ResnetEncoder`
(reference opv2v/opencood/models/backbones/resnet_ms.py:8): run a
torchvision-style ResNet over every camera of every agent and return the
feature-pyramid stages selected by ``id_pick``.

TPU-first differences: NHWC layout, all (B, L, M) axes folded into one
batch axis before the convs so the MXU sees one large batched conv, and
the output shapes are computed analytically instead of probing with a
dummy forward (shapes are static under jit anyway).
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.nn.layers import BasicBlock, Bottleneck, batch_norm, torch_conv
from cobevt_tpu.ops.int8_chain import BLOCK_GROWTH, quantize_dynamic

# (block type, per-stage depths, stage base widths)
_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}
_WIDTHS = (64, 128, 256, 512)


def _stage(x, block, planes, depth, stride, dtype, prefix, train,
           remat=False):
    """One ResNet stage; blocks named `<prefix>_<j>` (flattened torch
    `layer<i>.<j>` path)."""
    Block = BasicBlock if block == "basic" else Bottleneck
    if remat and train:
        # remat trades FLOPs for activation memory in the backward —
        # same training-only policy as the EfficientNet trunk
        Block = nn.remat(Block, static_argnums=(2,))
    expansion = 1 if block == "basic" else 4
    for j in range(depth):
        s = stride if j == 0 else 1
        needs_down = (j == 0 and
                      (s != 1 or x.shape[-1] != planes * expansion))
        x = Block(planes, s, downsample=needs_down, dtype=dtype,
                  name=f"{prefix}_{j}")(x, train)
    return x


class ResNetTrunk(nn.Module):
    """Bare torchvision-style trunk on (N, H, W, 3); returns all 4 stages."""

    num_layers: int = 34
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, depths = _SPECS[self.num_layers]
        x = torch_conv(64, 7, 2, 3, False, self.dtype, "conv1")(x)
        x = batch_norm(dtype=self.dtype, name="bn1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        outs = []
        for i in range(4):
            stride = 1 if i == 0 else 2
            if i == 0 and self._int8_layer1_active(block, train):
                x = self._int8_layer1(x, depths[0])
            else:
                x = _stage(x, block, _WIDTHS[i], depths[i], stride,
                           self.dtype, f"layer{i + 1}", train, self.remat)
            outs.append(x)
        return outs

    @staticmethod
    def _int8_layer1_active(block, train):
        """layer1 is the one bandwidth-bound narrow stage (C=64, full
        1/4-resolution maps) — under the lossy COBEVT_INT8=1 serving
        opt-in it runs int8-RESIDENT: measured 2.2x over the bf16 chain
        at the CorpBEVT shape (docs/DESIGN.md round 4; accuracy gated
        on HW by tools/validate_kernels.py).  Basic blocks only (the
        bottleneck layer1 carries a downsample projection);
        COBEVT_INT8_RESIDENT=0 isolates this lever from the C>=256
        int8 kernel for A/Bs.

        Both env vars are read at TRACE time: set them before the first
        jit compilation of the serving function.  A function compiled
        earlier keeps the behavior it was traced with (the jit cache is
        not keyed on these flags — unlike COBEVT_FLASH_BWD, which is
        threaded as a static argument)."""
        return (not train and block == "basic"
                and os.environ.get("COBEVT_INT8", "0") == "1"
                and os.environ.get("COBEVT_INT8_RESIDENT", "1") == "1")

    def _int8_layer1(self, x, depth):
        """Quantize once, run every layer1 block int8-resident on the
        geometric scale schedule (s0 * BLOCK_GROWTH**j — residual
        chains grow), and let the last block's conv2 epilogue
        dequantize back to `x.dtype` — region protocol of
        ops/int8_chain.py."""
        xq, s0 = quantize_dynamic(x)
        for j in range(depth):
            last = j == depth - 1
            s_in = s0 * (BLOCK_GROWTH ** j)
            s_out = None if last else s_in * BLOCK_GROWTH
            xq = BasicBlock(_WIDTHS[0], 1, downsample=False,
                            dtype=self.dtype, name=f"layer1_{j}")(
                xq, False, (s_in, s_out, x.dtype))
        return xq


class ResNetEncoder(nn.Module):
    """ResNet-{18,34,50,101,152} feature pyramid over multi-agent cameras.

    Input:  (B, L, M, H, W, 3) images (agents L, cameras M, channels-last).
    Output: list of (B, L, M, h_i, w_i, C_i) features for each stage in
    ``id_pick`` (stage 0 = after layer1 at 1/4 resolution, stage 3 =
    after layer4 at 1/32).  The trunk nests under scope "encoder" to
    mirror the reference's `ResnetEncoder.encoder` attribute for
    checkpoint porting.
    """

    num_layers: int = 34
    id_pick: Sequence[int] = (1, 2, 3)
    dtype: Any = None
    remat: bool = False

    @staticmethod
    def output_shapes(num_layers: int, id_pick, image_hw: Tuple[int, int]):
        block, _ = _SPECS[num_layers]
        expansion = 1 if block == "basic" else 4
        H, W = image_hw
        shapes = []
        for i in range(4):
            s = 4 * (2 ** i)
            shapes.append((H // s, W // s, _WIDTHS[i] * expansion))
        return [shapes[i] for i in id_pick]

    @nn.compact
    def __call__(self, images, train: bool = False):
        B, L, M, H, W, C = images.shape
        x = images.reshape(B * L * M, H, W, C)
        outs = ResNetTrunk(self.num_layers, dtype=self.dtype,
                           remat=self.remat, name="encoder")(x, train)
        picked = [outs[i] for i in self.id_pick]
        return [f.reshape(B, L, M, *f.shape[1:]) for f in picked]
