"""IoU metrics for both tracks, as psum-able counter states.

Parity targets:
  * threshold IoU with tp/fp/fn counters and cross-replica sum —
    reference nuscenes/cross_view_transformer/metrics.py:7-36
    (torchmetrics `dist_reduce_fx='sum'` becomes a `jax.lax.psum` /
    host-side sum over the counter pytree);
  * per-class mean IoU on argmax maps —
    reference opv2v/opencood/utils/seg_utils.py:25 (`mean_IU`).

States are plain pytrees so they ride inside jit'd train/eval steps and
across device meshes without special handling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IoUState:
    """tp/fp/fn counters per threshold (and optionally per channel)."""

    tp: jnp.ndarray
    fp: jnp.ndarray
    fn: jnp.ndarray

    @staticmethod
    def create(num_thresholds: int = 2, channels: int = 1) -> "IoUState":
        z = jnp.zeros((channels, num_thresholds), jnp.float32)
        return IoUState(z, z, z)


def iou_update(state: IoUState, logits, label, thresholds=(0.4, 0.5),
               visibility=None, min_visibility: Optional[int] = None,
               label_indices=None) -> IoUState:
    """Accumulate threshold-IoU counters.

    logits: (B, H, W, C) raw scores; label: (B, H, W, n) {0,1};
    visibility: (B, H, W) ints.  Matches `IoUMetric.update`
    (reference metrics.py:57-75) with channels-last layout.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    label = label.astype(jnp.float32)
    if label_indices is not None:
        # fold label channels into groups with one matmul against a
        # static membership matrix.  Channels are binarized first so
        # min(sum, 1) == per-group max for ANY input scaling (soft
        # labels included) — identical to a max-fold followed by the
        # > 0.5 threshold applied below.
        member = np.zeros((label.shape[-1], len(label_indices)),
                          np.float32)
        for g, idx in enumerate(label_indices):
            member[list(idx), g] = 1.0
        label = (label > 0.5).astype(jnp.float32)
        label = jnp.minimum(label @ jnp.asarray(member), 1.0)
    thr = jnp.asarray(thresholds, jnp.float32)

    pred = probs[..., None] >= thr                     # (B,H,W,C,T)
    lab = label[..., None] > 0.5                       # (B,H,W,C,1)
    if min_visibility is not None:
        keep = (visibility >= min_visibility)[..., None, None]
    else:
        keep = jnp.ones(probs.shape[:3], bool)[..., None, None]

    tp = (pred & lab & keep).sum((0, 1, 2)).astype(jnp.float32)
    fp = (pred & ~lab & keep).sum((0, 1, 2)).astype(jnp.float32)
    fn = (~pred & lab & keep).sum((0, 1, 2)).astype(jnp.float32)
    return IoUState(state.tp + tp, state.fp + fp, state.fn + fn)


def iou_compute(state: IoUState):
    """(channels, thresholds) IoU array."""
    return state.tp / (state.tp + state.fp + state.fn + 1e-7)


def confusion_counts(pred, gt, num_classes: int):
    """Confusion matrix counts (num_classes, num_classes): rows = gt."""
    idx = gt.astype(jnp.int32) * num_classes + pred.astype(jnp.int32)
    counts = jnp.bincount(idx.reshape(-1), length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes).astype(jnp.float32)


def per_class_iou(confusion):
    """IoU per class from a confusion matrix (diag / (row+col-diag))."""
    diag = jnp.diagonal(confusion)
    denom = confusion.sum(0) + confusion.sum(1) - diag
    return diag / jnp.maximum(denom, 1e-7)


def mean_iou_reference(pred: np.ndarray, gt: np.ndarray,
                       num_classes: int) -> list:
    """Host-side per-class IoU with the reference's skip rule: a class
    scores 0 unless it appears in *both* prediction and GT
    (reference seg_utils.py:41-49).  Operates on one (H, W) map pair."""
    ious = []
    for c in range(num_classes):
        p = pred == c
        g = gt == c
        if p.sum() == 0 or g.sum() == 0:
            ious.append(0.0)
            continue
        inter = np.logical_and(p, g).sum()
        union = p.sum() + g.sum() - inter
        ious.append(float(inter) / float(union))
    return ious
