"""Graph-style fusion: V2VNet (ConvGRU message passing) and DiscoNet
(learned per-pixel weights).

Capability parity with reference
opv2v/opencood/models/fusion_modules/v2v_fuse.py:15 (V2VNetFusion) and
.../disconet_fuse.py:44 (DiscoNetFusion).

TPU-first redesign: the reference iterates Python loops over batch x
iteration x node and warps one neighbor set at a time (v2v_fuse.py:69-136)
— trace-hostile and serial.  Here every pairwise warp in the batch is a
single batched `warp_affine` over (B*L*L) maps, message conv/aggregation
are masked tensor ops over the padded (B, L, ...) layout, and the
iteration count is a static unroll.  For valid agents the numerics match
the reference exactly (key-side masking + valid-count normalization),
verified in tests/test_fusion_zoo.py.

The reference applies its transpose/flip sandwich to features but builds
ROI masks in unflipped space (a latent square-BEV assumption we
reproduce faithfully).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cobevt_tpu.geometry.transforms import (
    affine_from_discretized,
    discretize_transformation,
)
from cobevt_tpu.geometry.warp import warp_affine
from cobevt_tpu.models.fusion.convgru import ConvGRU
from cobevt_tpu.nn.layers import batch_norm, torch_conv

NEG_INF = -1e9


def to_flipped(x):
    """Canonical (…, H, W, C) -> the reference's warp orientation
    (transpose H<->W then flip the trailing original-H axis)."""
    return jnp.flip(jnp.swapaxes(x, -3, -2), axis=-2)


def from_flipped(y):
    return jnp.swapaxes(jnp.flip(y, axis=-2), -3, -2)


def _pairwise_warp_flipped(y, M):
    """Warp every agent's *flipped-space* map into every agent's frame.

    y: (B, L, W, H, C) features already in flipped orientation;
    M: (B, L, L, 2, 3) discretized affines, M[b, j, i] maps j -> i.
    Returns (B, L_i, L_j, W, H, C) in flipped space.
    """
    B, L, W, H, C = y.shape
    src = jnp.broadcast_to(y[:, None], (B, L, L, W, H, C))
    T = affine_from_discretized(
        jnp.swapaxes(M, 1, 2), (W, H))                   # (B, L_i, L_j, 2, 3)
    out = warp_affine(src.reshape(B * L * L, W, H, C),
                      T.reshape(B * L * L, 2, 3), (W, H))
    return out.reshape(B, L, L, W, H, C)


def _pairwise_roi(M, hw):
    """(B, L_i, L_j, H, W) validity of neighbor j's warped map in frame i.

    Reproduces the reference exactly (v2v_fuse.py:80-84): unlike the
    feature warp, the ROI warp uses the *raw* discretized affine — no
    recentering via `get_transformation_matrix` — so the mask rotates
    about the origin, not the image center.  Bug-for-bug parity."""
    B, L = M.shape[:2]
    H, W = hw
    T = jnp.swapaxes(M, 1, 2)                 # [b, i, j] = M[b, j, i]
    ones = jnp.ones((B * L * L, H, W, 1), jnp.float32)
    roi = warp_affine(ones, T.reshape(B * L * L, 2, 3), (H, W),
                      mode="nearest")
    return roi.reshape(B, L, L, H, W)


class V2VNetFusion(nn.Module):
    """Iterative ConvGRU message passing over the agent graph."""

    in_channels: int
    num_iteration: int = 2
    gru_flag: bool = True
    agg_operator: str = "avg"
    discrete_ratio: float = 0.390625
    downsample_rate: int = 8
    gru_kernel: Tuple[int, int] = (3, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t_matrix,
                 train: bool = False):
        """x: (B, L, H, W, C) padded; agent_mask: (B, L);
        pairwise_t_matrix: (B, L, L, 4, 4) (j->i in [b, j, i]).
        Returns (B, H, W, C) ego-fused features."""
        B, L, H, W, C = x.shape
        M = discretize_transformation(pairwise_t_matrix,
                                      self.discrete_ratio,
                                      self.downsample_rate)
        roi = _pairwise_roi(M, (H, W))                    # (B,L_i,L_j,H,W)
        valid = agent_mask.astype(x.dtype)
        pair_valid = valid[:, None, :] * valid[:, :, None]  # (B, L_i, L_j)
        msg_mask = roi * pair_valid[..., None, None]

        msg_cnn = torch_conv(self.in_channels, 3, 1, 1, True, self.dtype,
                             "msg_cnn")
        gru = ConvGRU((self.in_channels,), self.gru_kernel,
                      dtype=self.dtype, name="conv_gru")
        feats = x
        # all conv work happens in the reference's flipped orientation
        # (reference v2v_fuse.py:86-135); the ROI mask is built unflipped
        # and applied to flipped tensors — a square-BEV assumption we
        # reproduce (asserted here).
        assert H == W, "V2VNet fusion assumes a square BEV (as reference)"
        for _ in range(self.num_iteration):
            y = to_flipped(feats)                         # (B, L, W, H, C)
            nb = _pairwise_warp_flipped(y, M)             # (B,L,L,W,H,C)
            ego = jnp.broadcast_to(y[:, :, None], (B, L, L, W, H, C))
            msg = msg_cnn(jnp.concatenate([nb, ego], -1).reshape(
                B * L * L, W, H, 2 * C)).reshape(B, L, L, W, H, C)
            msg = msg * msg_mask[..., None]
            if self.agg_operator == "avg":
                denom = jnp.maximum(valid.sum(1), 1.0)    # (B,)
                agg = msg.sum(axis=2) / denom[:, None, None, None, None]
            elif self.agg_operator == "max":
                # reference maxes over the ROI-zeroed messages directly
                # (v2v_fuse.py:113): zeros participate; only *padded
                # agents* (absent in the reference's ragged stack) are
                # excluded via -inf
                neg = jnp.where(
                    pair_valid[..., None, None, None] > 0, msg, NEG_INF)
                agg = neg.max(axis=2)
            else:
                raise ValueError(self.agg_operator)
            if self.gru_flag:
                upd = gru(jnp.concatenate([y, agg], -1).reshape(
                    B * L, W, H, 2 * C)).reshape(B, L, W, H, C)
            else:
                upd = y + agg
            feats = from_flipped(upd) * valid[:, :, None, None, None]
        out = feats[:, 0]
        return nn.Dense(self.in_channels, dtype=self.dtype,
                        name="mlp")(out)


class PixelWeightedFusionSoftmax(nn.Module):
    """1x1 conv stack producing per-pixel agent logits
    (reference disconet_fuse.py:16)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = torch_conv(128, 1, 1, 0, True, self.dtype, "conv1_1")(x)
        x = nn.relu(batch_norm(dtype=self.dtype, name="bn1_1")(
            x, use_running_average=not train))
        x = torch_conv(32, 1, 1, 0, True, self.dtype, "conv1_2")(x)
        x = nn.relu(batch_norm(dtype=self.dtype, name="bn1_2")(
            x, use_running_average=not train))
        x = torch_conv(8, 1, 1, 0, True, self.dtype, "conv1_3")(x)
        x = nn.relu(batch_norm(dtype=self.dtype, name="bn1_3")(
            x, use_running_average=not train))
        return nn.relu(torch_conv(1, 1, 1, 0, True, self.dtype,
                                  "conv1_4")(x))


class DiscoNetFusion(nn.Module):
    """Pairwise warp + learned per-pixel softmax weights over agents."""

    in_channels: int
    num_iteration: int = 1
    use_mask: bool = True
    discrete_ratio: float = 0.390625
    downsample_rate: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x, agent_mask, pairwise_t_matrix,
                 train: bool = False):
        """Same interface as V2VNetFusion; returns (B, H, W, C)."""
        B, L, H, W, C = x.shape
        M = discretize_transformation(pairwise_t_matrix,
                                      self.discrete_ratio,
                                      self.downsample_rate)
        roi = _pairwise_roi(M, (H, W))
        valid = agent_mask.astype(x.dtype)
        pair_valid = valid[:, None, :] * valid[:, :, None]
        msg_mask = roi * pair_valid[..., None, None]      # (B,L,L,H,W)

        weight_net = PixelWeightedFusionSoftmax(dtype=self.dtype,
                                                name="pixel_weighted_fusion")
        assert H == W, "DiscoNet fusion assumes a square BEV (as reference)"
        feats = x
        for _ in range(self.num_iteration):
            y = to_flipped(feats)
            nb = _pairwise_warp_flipped(y, M)             # (B,L,L,W,H,C)
            ego = jnp.broadcast_to(y[:, :, None], (B, L, L, W, H, C))
            logits = weight_net(
                jnp.concatenate([nb, ego], -1).reshape(
                    B * L * L, W, H, 2 * C), train).reshape(B, L, L, W, H)
            if self.use_mask:
                logits = jnp.where(msg_mask > 0, logits, NEG_INF)
            else:
                logits = jnp.where(pair_valid[..., None, None] > 0, logits,
                                   NEG_INF)
            w = jax.nn.softmax(logits, axis=2)            # over neighbors j
            fused = (w[..., None] * nb * msg_mask[..., None]).sum(axis=2)
            feats = from_flipped(fused) * valid[:, :, None, None, None]
        out = feats[:, 0]
        return nn.Dense(self.in_channels, dtype=self.dtype,
                        name="mlp")(out)
