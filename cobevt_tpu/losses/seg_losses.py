"""Segmentation losses for both tracks.

Parity targets:
  * VanillaSegLoss        — reference opv2v/opencood/loss/vanilla_seg_loss.py:7
                            (class-weighted CE with torch's weighted-mean
                            normalization)
  * sigmoid focal loss    — fvcore semantics as consumed by
                            nuscenes/cross_view_transformer/losses.py:10
  * BinarySegmentationLoss / CenterLoss — reference losses.py:27/:59
                            (visibility-masked focal, mean over kept pixels)
  * MultipleLoss          — reference losses.py:82 (weighted sum)

Pure functions / dataclass wrappers — no framework state, `jit`- and
`grad`-safe, all reductions mask-aware with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def weighted_cross_entropy(logits, labels, class_weights, valid_mask=None):
    """torch `CrossEntropyLoss(weight=w)` semantics.

    logits: (..., C) raw scores; labels: (...) int; class_weights: (C,).
    Returns sum(w[y]*ce) / sum(w[y]) over valid entries.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights)[labels]
    if valid_mask is not None:
        w = w * valid_mask
    return -(w * picked).sum() / jnp.maximum(w.sum(), 1e-12)


@dataclasses.dataclass(frozen=True)
class VanillaSegLoss:
    """total = s_coe * static_CE + d_coe * dynamic_CE."""

    target: str = "dynamic"
    d_weights: float = 75.0
    s_weights: float = 15.0
    l_weights: float = 50.0
    d_coe: float = 2.0
    s_coe: float = 0.0

    def __call__(self, output_dict: Dict, gt_dict: Dict):
        """output_dict: {static_seg, dynamic_seg} logits (B, L, H, W, C);
        gt_dict: {gt_static, gt_dynamic} int labels (B, L, H, W).
        Returns (total_loss, {static_loss, dynamic_loss})."""
        static_loss = jnp.zeros(())
        dynamic_loss = jnp.zeros(())
        if self.target in ("dynamic", "both"):
            dynamic_loss = weighted_cross_entropy(
                output_dict["dynamic_seg"], gt_dict["gt_dynamic"],
                jnp.asarray([1.0, self.d_weights]))
        if self.target in ("static", "both"):
            static_loss = weighted_cross_entropy(
                output_dict["static_seg"], gt_dict["gt_static"],
                jnp.asarray([1.0, self.s_weights, self.l_weights]))
        total = self.s_coe * static_loss + self.d_coe * dynamic_loss
        return total, {"static_loss": static_loss,
                       "dynamic_loss": dynamic_loss,
                       "total_loss": total}


def sigmoid_focal_loss(logits, targets, alpha: float = -1.0,
                       gamma: float = 2.0):
    """fvcore-style sigmoid focal loss, elementwise (no reduction)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable binary CE with logits (torch BCEWithLogits)."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _masked_mean(loss, mask):
    if mask is None:
        return loss.mean()
    mask = mask.astype(loss.dtype)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1e-12)


@dataclasses.dataclass(frozen=True)
class BinarySegmentationLoss:
    """Focal loss on BEV channels, optionally restricted to pixels with
    visibility >= min_visibility.  label_indices folds multi-channel
    labels with a max (reference losses.py:46-49)."""

    label_indices: Optional[Tuple[Tuple[int, ...], ...]] = None
    min_visibility: Optional[int] = None
    alpha: float = -1.0
    gamma: float = 2.0

    def __call__(self, pred: Dict, batch: Dict):
        logits = pred["bev"] if isinstance(pred, dict) else pred
        label = batch["bev"].astype(logits.dtype)   # (B, H, W, n)
        if self.label_indices is not None:
            label = jnp.stack(
                [label[..., list(idx)].max(-1) for idx in
                 self.label_indices], axis=-1)
        loss = sigmoid_focal_loss(logits, label, self.alpha, self.gamma)
        mask = None
        if self.min_visibility is not None:
            vis = batch["visibility"] >= self.min_visibility   # (B, H, W)
            mask = jnp.broadcast_to(vis[..., None], loss.shape)
        return _masked_mean(loss, mask)


@dataclasses.dataclass(frozen=True)
class CenterLoss:
    min_visibility: Optional[int] = None
    alpha: float = -1.0
    gamma: float = 2.0

    def __call__(self, pred: Dict, batch: Dict):
        logits = pred["center"]
        label = batch["center"].astype(logits.dtype)
        loss = sigmoid_focal_loss(logits, label, self.alpha, self.gamma)
        mask = None
        if self.min_visibility is not None:
            vis = batch["visibility"] >= self.min_visibility
            mask = jnp.broadcast_to(vis[..., None], loss.shape)
        return _masked_mean(loss, mask)


@dataclasses.dataclass(frozen=True)
class MultipleLoss:
    """Weighted sum of named losses: total, {name: unweighted value}."""

    losses: Tuple[Tuple[str, object], ...] = ()
    weights: Tuple[Tuple[str, float], ...] = ()

    def __call__(self, pred, batch):
        w = dict(self.weights)
        outputs = {name: fn(pred, batch) for name, fn in self.losses}
        total = sum(w.get(name, 1.0) * v for name, v in outputs.items())
        return total, outputs
