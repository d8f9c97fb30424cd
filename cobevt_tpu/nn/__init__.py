"""Neural-net building blocks (flax.linen, NHWC layouts, MXU-friendly)."""

from cobevt_tpu.nn.layers import (
    torch_conv,
    batch_norm,
    layer_norm,
    BasicBlock,
    Bottleneck,
    mlp_seq,
    pixel_unshuffle,
    gelu,
)
from cobevt_tpu.nn.resnet import ResNetEncoder
