"""BEV decoders, segmentation heads, feature compressor, regroup.

Capability parity targets:
  * NaiveDecoder   — reference opv2v/opencood/models/sub_modules/naive_decoder.py:8
  * BevSegHead     — reference .../bev_seg_head.py:10
  * NaiveCompressor— reference .../naive_compress.py:5
  * regroup        — reference .../fuse_utils.py:8 (dynamic tensor_split ->
                     here a static gather+mask so it jits)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from cobevt_tpu.nn.layers import batch_norm, torch_conv


def upsample_nearest_2x(x):
    """(B, H, W, C) -> (B, 2H, 2W, C), matching F.interpolate nearest."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class NaiveDecoder(nn.Module):
    """num_layer x (conv-BN-ReLU, 2x nearest upsample, conv-BN-ReLU).

    Torch registers its convs in a flat ModuleList named ``decoder`` in
    iteration order i = num_layer-1 .. 0 with a parameterless ReLU between
    each pair; we reproduce those indices for checkpoint porting."""

    input_dim: int = 128
    num_layer: int = 3
    num_ch_dec: Sequence[int] = (32, 64, 128)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, L, H, W, C) -> (B, L, 8H, 8W, num_ch_dec[0])."""
        B, L, H, W, C = x.shape
        x = x.reshape(B * L, H, W, C)
        for j, i in enumerate(range(self.num_layer - 1, -1, -1)):
            base = 6 * j
            ch = self.num_ch_dec[i]
            x = torch_conv(ch, 3, 1, 1, True, self.dtype,
                           f"decoder_{base}")(x)
            x = batch_norm(dtype=self.dtype, name=f"decoder_{base + 1}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            x = upsample_nearest_2x(x)
            x = torch_conv(ch, 3, 1, 1, True, self.dtype,
                           f"decoder_{base + 3}")(x)
            x = batch_norm(dtype=self.dtype, name=f"decoder_{base + 4}")(
                x, use_running_average=not train)
            x = nn.relu(x)
        return x.reshape(B, L, *x.shape[1:])


class BevSegHead(nn.Module):
    """3x3 conv logit head(s), target-gated (dynamic / static / both).

    Parameter-structure quirk preserved from the reference
    (bev_seg_head.py:13-33): a ``dynamic`` model *also* owns an unused
    static head (the reference's if/else creates both), so checkpoints
    port 1:1.  A ``static`` model owns only the static head.
    """

    target: str = "dynamic"
    input_dim: int = 32
    output_class: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (B, L, H, W, C) -> dict of (B, L, H, W, classes) logits."""
        B, L, H, W, C = x.shape
        flat = x.reshape(B * L, H, W, C)
        out = {}
        if self.target != "static":   # 'dynamic' and 'both'
            dyn = torch_conv(self.output_class, 3, 1, 1, True, self.dtype,
                             "dynamic_head")(flat)
            out["dynamic_seg"] = dyn.reshape(B, L, H, W, -1)
        # static_head exists for every target (unused when 'dynamic')
        st = torch_conv(self.output_class, 3, 1, 1, True, self.dtype,
                        "static_head")(flat)
        if self.target != "dynamic":
            out["static_seg"] = st.reshape(B, L, H, W, -1)
        if "dynamic_seg" not in out:
            out["dynamic_seg"] = jnp.zeros_like(out["static_seg"])
        if "static_seg" not in out:
            out["static_seg"] = jnp.zeros_like(out["dynamic_seg"])
        return out


class NaiveCompressor(nn.Module):
    """Conv autoencoder simulating V2V bandwidth limits
    (BN eps 1e-3, torch momentum 0.01 -> flax 0.99)."""

    input_dim: int = 128
    compress_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return batch_norm(epsilon=1e-3, momentum=0.99, dtype=self.dtype,
                              name=name)

        hidden = self.input_dim // self.compress_ratio
        x = torch_conv(hidden, 3, 1, 1, True, self.dtype, "encoder_0")(x)
        x = nn.relu(bn("encoder_1")(x, use_running_average=not train))
        x = torch_conv(self.input_dim, 3, 1, 1, True, self.dtype,
                       "decoder_0")(x)
        x = nn.relu(bn("decoder_1")(x, use_running_average=not train))
        x = torch_conv(self.input_dim, 3, 1, 1, True, self.dtype,
                       "decoder_3")(x)
        x = nn.relu(bn("decoder_4")(x, use_running_average=not train))
        return x


def regroup(dense, record_len, max_len: int):
    """(N, ...) stacked agent-major features -> (B, max_len, ...) + mask.

    Static-shape replacement for the reference's `tensor_split` loop:
    row l of sample b gathers ``dense[offset_b + l]`` when ``l <
    record_len[b]`` and zeros otherwise.  ``record_len`` is a traced
    (B,) int array; N must equal sum(record_len) (as in the reference).
    """
    record_len = jnp.asarray(record_len)
    B = record_len.shape[0]
    offsets = jnp.cumsum(record_len) - record_len          # (B,)
    idx = offsets[:, None] + jnp.arange(max_len)[None]     # (B, max_len)
    mask = (jnp.arange(max_len)[None] < record_len[:, None])
    safe = jnp.clip(idx, 0, dense.shape[0] - 1)
    out = dense[safe.reshape(-1)].reshape(B, max_len, *dense.shape[1:])
    bcast = mask.reshape(B, max_len, *([1] * (dense.ndim - 1)))
    return out * bcast.astype(dense.dtype), mask.astype(jnp.float32)
