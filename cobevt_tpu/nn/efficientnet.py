"""EfficientNet-b0..b4 feature extractor (flax, NHWC, TF-SAME padding).

Capability parity with `EfficientNetExtractor`
(reference nuscenes/cross_view_transformer/model/backbones/
efficientnet.py:24): run the trunk up to the deepest requested
"reduction" endpoint and return the feature maps at each requested
endpoint.  ``reduction_k`` is the map at 1/2^k resolution — the standard
extract_endpoints convention the reference code implements:
``reduction_1`` is the stem output and ``reduction_{k+1}`` is the map
right after the k-th stride-2 block.  (The reference file's docstring
shows shifted shapes, but its runtime indexing — result[0] = stem,
layer_to_idx['reduction_2'] = 1, efficientnet.py:49-92 — yields the
standard endpoints; e.g. ``reduction_2`` of b4 at 224x480 is
(56, 120, 32) channels-last here.  The published cvt_pyramid_axial.yaml
feat_win_size ((6,12),(6,12),(14,30)) confirms it: those windows satisfy
the encoder's window-count invariant exactly at these shapes.)

Architecture follows the public EfficientNet recipe (MBConv with
squeeze-excitation, swish, stochastic depth); flax module names mirror
efficientnet_pytorch attribute paths (`_conv_stem`, `_blocks.N.
_expand_conv`, ...) so published torch checkpoints port via
cobevt_tpu.utils.torch_port.  BN uses eps 1e-3 / flax momentum 0.99.

Gradient checkpointing: pass ``remat=True`` to rematerialize each block
group in the backward pass (the reference wraps every block in
`torch.utils.checkpoint`, efficientnet.py:86-92).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel) for b0
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# width_mult, depth_mult (classifier dropout is irrelevant here)
_SCALING = {
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
}
# efficientnet_pytorch GlobalParams.drop_connect_rate — 0.2 for every
# variant (per-block stochastic-depth rate is i * rate / num_blocks)
_DROP_CONNECT = 0.2


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    drop_rate: float


def block_specs(model_name: str) -> List[BlockSpec]:
    w, d = _SCALING[model_name]
    specs: List[BlockSpec] = []
    in_ch = round_filters(32, w)
    total = sum(round_repeats(r, d) for (_, _, r, _, _) in _B0_STAGES)
    i = 0
    for expand, ch, repeats, stride, kernel in _B0_STAGES:
        out_ch = round_filters(ch, w)
        for j in range(round_repeats(repeats, d)):
            specs.append(BlockSpec(
                in_ch if j == 0 else out_ch, out_ch, expand,
                stride if j == 0 else 1, kernel,
                i * _DROP_CONNECT / total))
            i += 1
        in_ch = out_ch
    return specs


def reduction_boundaries(model_name: str) -> List[Tuple[str, Tuple[int, int]]]:
    """[(name, (first_block, last_block_exclusive))] endpoint groups in
    the standard extract_endpoints convention: ``reduction_1`` is the stem
    (empty block range) and ``reduction_{k+1}`` ends right after the k-th
    stride-2 block.  The non-stem ranges equal the reference's precomputed
    MODELS aliases for b0/b4 (reference efficientnet.py:8-21); the names
    reflect the reference's runtime indexing (result[0] = stem)."""
    specs = block_specs(model_name)
    out = [("reduction_1", (0, 0))]
    start = 0
    k = 2
    for b in (i for i, s in enumerate(specs) if s.stride == 2):
        out.append((f"reduction_{k}", (start, b + 1)))
        start = b + 1
        k += 1
    return out


def _bn(name, dtype=None):
    return nn.BatchNorm(use_running_average=None, momentum=0.99,
                        epsilon=1e-3, dtype=dtype, name=name)


class MBConvBlock(nn.Module):
    """MBConv: expand -> depthwise -> squeeze-excite -> project (+skip
    with stochastic depth).  Child names match efficientnet_pytorch."""

    spec: BlockSpec
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        inp = x
        mid = s.in_ch * s.expand
        if s.expand != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="_expand_conv")(x)
            x = _bn("_bn0", self.dtype)(x, use_running_average=not train)
            x = nn.silu(x)
        x = nn.Conv(mid, (s.kernel, s.kernel), strides=(s.stride, s.stride),
                    padding="SAME", feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="_depthwise_conv")(x)
        x = _bn("_bn1", self.dtype)(x, use_running_average=not train)
        x = nn.silu(x)

        # squeeze & excite (ratio 0.25 of *input* channels)
        se_ch = max(1, int(s.in_ch * 0.25))
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), dtype=self.dtype, name="_se_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(mid, (1, 1), dtype=self.dtype, name="_se_expand")(se)
        x = x * jax.nn.sigmoid(se)

        x = nn.Conv(s.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="_project_conv")(x)
        x = _bn("_bn2", self.dtype)(x, use_running_average=not train)

        if s.stride == 1 and s.in_ch == s.out_ch:
            if train and s.drop_rate > 0:
                keep = 1.0 - s.drop_rate
                rng = self.make_rng("dropout")
                gate = jax.random.bernoulli(
                    rng, keep, (x.shape[0], 1, 1, 1)).astype(x.dtype)
                x = x * gate / keep
            x = x + inp
        return x


class EfficientNetExtractor(nn.Module):
    """Trunk through the deepest requested reduction; returns one feature
    map per name in ``layer_names``."""

    layer_names: Sequence[str] = ("reduction_2", "reduction_3",
                                  "reduction_4")
    model_name: str = "efficientnet-b4"
    remat: bool = False
    dtype: Any = None

    @staticmethod
    def output_shapes(layer_names, image_hw, model_name="efficientnet-b4"):
        w_mult, _ = _SCALING[model_name]
        specs = block_specs(model_name)
        bounds = dict(reduction_boundaries(model_name))
        H, W = image_hw

        shapes = []
        for name in layer_names:
            _, end = bounds[name]
            ch = (specs[end - 1].out_ch if end > 0
                  else round_filters(32, w_mult))
            red = 2  # stem stride
            for s in specs[:end]:
                red *= s.stride
            shapes.append((-(-H // red), -(-W // red), ch))
        return shapes

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (N, H, W, 3) already normalized.  Returns list of
        (N, h_i, w_i, C_i), one per requested layer name."""
        w_mult, _ = _SCALING[self.model_name]
        specs = block_specs(self.model_name)
        bounds = reduction_boundaries(self.model_name)
        name_to_group = {n: gi for gi, (n, _) in enumerate(bounds)}
        idx_max = max(name_to_group[n] for n in self.layer_names)

        x = nn.Conv(round_filters(32, w_mult), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="layers_0_0")(images)
        x = _bn("layers_0_1", self.dtype)(x, use_running_average=not train)
        x = nn.silu(x)

        results = [x]                       # group 0 = stem = reduction_1
        Block = MBConvBlock
        if self.remat and train:
            # remat trades FLOPs for activation memory in the backward
            # pass; at inference it only inserts fusion barriers
            Block = nn.remat(MBConvBlock, static_argnums=(2,))
        for gi in range(1, idx_max + 1):
            _, (lo, hi) = bounds[gi]
            for bi in range(lo, hi):
                x = Block(specs[bi], dtype=self.dtype,
                          name=f"layers_{gi}_{bi - lo}")(x, train)
            results.append(x)

        return [results[name_to_group[n]] for n in self.layer_names]
