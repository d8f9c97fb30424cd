"""Common layers with torch-compatible numerics.

These exist so that (a) weights exported from the PyTorch reference can be
ported 1:1 (see cobevt_tpu/utils/torch_port.py) and (b) golden parity
tests can compare activations closely.  Numerics that differ between
torch and flax defaults are pinned here:

  * BatchNorm: eps 1e-5, torch momentum 0.1  ->  flax momentum 0.9
  * LayerNorm: eps 1e-5
  * GELU: exact (erf) form, flax defaults to tanh approximation

`torch_conv` / `batch_norm` / `layer_norm` are factories (not wrapper
modules) so the flax parameter tree mirrors the torch attribute path
exactly: torch ``layer1.0.conv1.weight`` lands at
``params/layer1/0/conv1/kernel``.

Everything is channels-last (NHWC): convolutions tile directly onto the
MXU without layout transposes.
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from cobevt_tpu.ops.conv2d import (
    fold_bn,
    fused_conv3x3,
    fused_conv3x3_int8,
)
from cobevt_tpu.ops.int8_chain import (
    INTERMEDIATE_HEADROOM,
    conv3x3_s8,
    quantize_kernel_per_out,
)


def gelu(x):
    """Exact GELU (torch nn.GELU default)."""
    return nn.gelu(x, approximate=False)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def images_from_uint8(x, normalize: bool = True):
    """Trace-time dtype dispatch for the uint8 host-pipeline contract.

    The host input pipeline can ship resized uint8 images (4x less
    host->device transfer and zero host float math — the one-core host
    is the training bottleneck, see docs/DESIGN.md round 4); the models
    then normalize on-device, where the (x/255 - mean)/std elementwise
    chain fuses into the first convolution's input for free.  f32 input
    passes through untouched (the host-normalized contract), so both
    pipelines hit identical downstream numerics.

    normalize=True applies the ImageNet mean/std used by the OPV2V
    track's host preprocessor (data/opv2v.py:preprocess_camera_image);
    normalize=False only rescales to [0, 1] (the nuScenes models
    normalize inside the graph already, sinbevt_nuscenes.py:39)."""
    if x.dtype != jnp.uint8:
        return x
    x = x.astype(jnp.float32) / 255.0
    if normalize:
        x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
            IMAGENET_STD, x.dtype)
    return x


def torch_conv(features: int, kernel_size=(3, 3), strides=(1, 1), padding=0,
               use_bias: bool = True, dtype=None, name=None) -> nn.Conv:
    """2D conv on NHWC with torch-style integer padding."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if isinstance(strides, int):
        strides = (strides, strides)
    pad = padding
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    elif isinstance(pad, (tuple, list)) and isinstance(pad[0], int):
        pad = ((pad[0], pad[0]), (pad[1], pad[1]))
    return nn.Conv(features, kernel_size=tuple(kernel_size),
                   strides=tuple(strides), padding=pad, use_bias=use_bias,
                   dtype=dtype, name=name)


def batch_norm(epsilon: float = 1e-5, momentum: float = 0.9, dtype=None,
               name=None) -> nn.BatchNorm:
    """BatchNorm pinned to torch defaults.  Call with
    ``bn(x, use_running_average=not train)``."""
    return nn.BatchNorm(use_running_average=None, momentum=momentum,
                        epsilon=epsilon, dtype=dtype, name=name)


def layer_norm(dtype=None, name=None) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=dtype, name=name)


class ConvKernelParams(nn.Module):
    """Declares/reads an `nn.Conv`-compatible kernel without computing.

    Same variable contract as `torch_conv(...)` with `use_bias=False`
    (path `<name>/kernel`, shape (kh, kw, in, out), lecun-normal init),
    so a model may run either the stock conv or the fused inference
    path against the same checkpoint."""

    kernel_size: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features), jnp.float32)


class BiasedConvParams(nn.Module):
    """Declares/reads an `nn.Conv`-compatible kernel + bias without
    computing (the fused-kernel mirror for biased 1x1 convs)."""

    kernel_size: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        return kernel, bias


class BNParams(nn.Module):
    """Declares/reads `nn.BatchNorm`-compatible variables without
    computing (params scale/bias; batch_stats mean/var) — the fused
    inference path folds them into the conv (`ops/conv2d.py:fold_bn`)."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        scale = self.param("scale", nn.initializers.ones_init(), f,
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), f,
                          jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(f, jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(f, jnp.float32))
        return scale, bias, mean.value, var.value


class LNParams(nn.Module):
    """Declares/reads `nn.LayerNorm`-compatible params (scale, bias)
    without computing — for fused kernels that apply the norm in-VMEM."""

    features: int

    @nn.compact
    def __call__(self):
        f = (self.features,)
        return (self.param("scale", nn.initializers.ones_init(), f,
                           jnp.float32),
                self.param("bias", nn.initializers.zeros_init(), f,
                           jnp.float32))


class DenseParams(nn.Module):
    """Declares/reads `nn.Dense`-compatible params (kernel [, bias])."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


def fused_conv_enabled(c_in: int, c_out: int, h: int = 0,
                       w: int = 0) -> bool:
    """Fused inference conv pays off when the channel axes fill whole
    128-lane registers (measured on the 5-agent CorpBEVT forward:
    ~25-40% faster than the XLA emitter per stride-1 block at C in
    {128, 256, 512}, but slower at C=64 where per-grid-step overhead and
    half-register operands dominate — see docs/DESIGN.md).  Narrow convs
    stay on XLA.  Env kill-switch: COBEVT_FUSED_CONV=0.

    The kernel keeps the whole (H, W, C_in) input block plus a packed
    ~2.5MB scratch resident in VMEM (ops/conv2d.py BlockSpecs), so large
    spatial maps must also fall back — otherwise an unusual config would
    fail Mosaic compilation at serve time instead of degrading to XLA."""
    if os.environ.get("COBEVT_FUSED_CONV", "1") == "0":
        return False
    if c_in < 128 or c_out < 128:
        return False
    if h and w:
        # bf16 input block + dy-packed scratch target + weights; bound
        # well under the ~16MB VMEM so output/residual tiles and Mosaic
        # overheads always fit.
        working_set = 2 * h * w * c_in + 2_600_000 + 2 * 9 * c_in * c_out
        if working_set > 8 * 1024 * 1024:
            return False
    return True


class BasicBlock(nn.Module):
    """ResNet v1 basic block (two 3x3 convs), torchvision-compatible.

    Inference runs the fused Pallas path (conv + folded BN + residual +
    ReLU in one kernel, `ops/conv2d.py`); training keeps the stock
    flax modules (live batch stats, autodiff).  Both paths share one
    parameter tree."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, int8_state=None):
        # int8-resident narrow-stage serving path (COBEVT_INT8=1): the
        # trunk hands the block an int8 tensor plus the region scale;
        # see ops/int8_chain.py and ResNetTrunk for the region protocol
        if int8_state is not None:
            return self._int8_resident_eval(x, *int8_state)
        # strided blocks stay fully on XLA: their conv1/downsample would
        # split across backends and the custom-call boundary costs more
        # than the fused conv2 saves (measured)
        if not train and self.stride == 1 and \
                fused_conv_enabled(x.shape[-1], self.planes,
                                   x.shape[-3], x.shape[-2]):
            return self._fused_eval(x)
        identity = x
        out = torch_conv(self.planes, 3, self.stride, 1, False,
                         self.dtype, "conv1")(x)
        out = batch_norm(dtype=self.dtype, name="bn1")(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = torch_conv(self.planes, 3, 1, 1, False, self.dtype,
                         "conv2")(out)
        out = batch_norm(dtype=self.dtype, name="bn2")(
            out, use_running_average=not train)
        if self.downsample:
            # torch names: downsample.0 (conv), downsample.1 (bn)
            identity = torch_conv(self.planes, 1, self.stride, 0, False,
                                  self.dtype, "downsample_0")(x)
            identity = batch_norm(dtype=self.dtype, name="downsample_1")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)

    def _fused_eval(self, x):
        # COBEVT_INT8=1 (serving opt-in): post-training-quantized conv
        # path — per-channel int8 weights, dynamic per-tensor int8
        # activations, quantized inside the kernel's scratch build.
        # Gated to C >= 256 where the MXU int8 rate wins (measured
        # 1.31x at 256, 1.64x at 512; 0.91x at 128 where the in-build
        # quantize VPU work dominates — docs/DESIGN.md round 3).
        cin = x.shape[-1]
        conv = fused_conv3x3
        if os.environ.get("COBEVT_INT8", "0") == "1" and \
                min(cin, self.planes) >= 256:
            conv = fused_conv3x3_int8
        k1 = ConvKernelParams(3, cin, self.planes, name="conv1")()
        w1, t1 = fold_bn(k1, *BNParams(self.planes, name="bn1")())
        out = conv(x, w1, t1, relu=True)

        identity = x
        if self.downsample:
            identity = torch_conv(self.planes, 1, 1, 0, False,
                                  self.dtype, "downsample_0")(x)
            identity = batch_norm(dtype=self.dtype, name="downsample_1")(
                identity, use_running_average=True)

        k2 = ConvKernelParams(3, self.planes, self.planes, name="conv2")()
        w2, t2 = fold_bn(k2, *BNParams(self.planes, name="bn2")())
        return conv(out, w2, t2, residual=identity, relu=True)

    def _int8_resident_eval(self, xq, s_in, s_out, out_dtype):
        """COBEVT_INT8=1 bandwidth path for narrow stride-1 blocks:
        activations arrive as int8 at scale `s_in` and leave as int8 at
        `s_out` (the region's growing schedule — residual chains
        accumulate) or as `out_dtype` when `s_out` is None (region
        exit, dequantize fused into conv2's epilogue instead of a
        separate pass).  Both convs run s8 x s8 -> s32 on the MXU with
        rescale+ReLU+requantize fused in (ops/int8_chain.py).  Declares
        the identical parameter tree as the stock / fused paths."""
        assert self.stride == 1 and not self.downsample, \
            "int8-resident path covers stride-1 blocks without downsample"
        cin = xq.shape[-1]
        k1 = ConvKernelParams(3, cin, self.planes, name="conv1")()
        w1, t1 = fold_bn(k1, *BNParams(self.planes, name="bn1")())
        w1q, s1 = quantize_kernel_per_out(w1)
        s_mid = s_in * INTERMEDIATE_HEADROOM
        h, sat1 = conv3x3_s8(xq, s_in, w1q, s1, t1, relu=True,
                             out_scale=s_mid, with_sat=True)
        k2 = ConvKernelParams(3, self.planes, self.planes, name="conv2")()
        w2, t2 = fold_bn(k2, *BNParams(self.planes, name="bn2")())
        w2q, s2 = quantize_kernel_per_out(w2)
        out, sat2 = conv3x3_s8(h, s_mid, w2q, s2, t2, relu=True,
                               out_scale=s_out,
                               residual_q=xq, residual_scale=s_in,
                               out_dtype=out_dtype, with_sat=True)
        # saturation telemetry: visible under mutable=["intermediates"]
        # (validate_kernels int8 gate); DCE'd in plain serving.  Skipped
        # at init so the flag cannot change the variable tree.
        if not self.is_initializing():
            self.sow("intermediates", "int8_sat_frac",
                     jnp.maximum(sat1, sat2))
        return out


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4).

    With ``planes = features // 4`` and no downsample this matches the
    `ResNetBottleNeck` lambda used inside FAX
    (reference opv2v/opencood/models/sub_modules/fax_modules.py:10).
    """

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = torch_conv(self.planes, 1, 1, 0, False, self.dtype,
                         "conv1")(x)
        out = batch_norm(dtype=self.dtype, name="bn1")(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = torch_conv(self.planes, 3, self.stride, 1, False, self.dtype,
                         "conv2")(out)
        out = batch_norm(dtype=self.dtype, name="bn2")(
            out, use_running_average=not train)
        out = nn.relu(out)
        out = torch_conv(self.planes * self.expansion, 1, 1, 0, False,
                         self.dtype, "conv3")(out)
        out = batch_norm(dtype=self.dtype, name="bn3")(
            out, use_running_average=not train)
        if self.downsample:
            identity = torch_conv(self.planes * self.expansion, 1,
                                  self.stride, 0, False, self.dtype,
                                  "downsample_0")(x)
            identity = batch_norm(dtype=self.dtype, name="downsample_1")(
                identity, use_running_average=not train)
        return nn.relu(out + identity)


def pixel_unshuffle(x, factor: int = 2):
    """NHWC pixel-unshuffle with torch channel ordering.

    torch `PixelUnshuffle(r)` maps (C, H*r, W*r) -> (C*r*r, H, W) with
    output channel index ``c*r*r + i*r + j`` for input offset (i, j);
    we keep that ordering so ported weights of downstream convs line up.
    """
    B, H, W, C = x.shape
    r = factor
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)       # B, H/r, W/r, C, r, r
    return x.reshape(B, H // r, W // r, C * r * r)


def mlp_seq(x, hidden: int, out: int, dtype=None, prefix: str = "mlp"):
    """Linear -> GELU -> Linear matching the reference FAX MLP; must be
    called inside an `@nn.compact` parent so the Dense layers land at the
    flattened torch Sequential names `<prefix>_0` / `<prefix>_2`."""
    x = nn.Dense(hidden, dtype=dtype, name=f"{prefix}_0")(x)
    x = gelu(x)
    return nn.Dense(out, dtype=dtype, name=f"{prefix}_2")(x)
