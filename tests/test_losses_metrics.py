"""Losses/metrics parity vs torch-CPU oracles.

The reference loss classes hard-code `.cuda()` / depend on fvcore, so the
oracles here are the same public formulas evaluated with torch ops
(`F.cross_entropy(weight=...)`, fvcore's documented focal-loss math).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from cobevt_tpu.losses import (
    BinarySegmentationLoss,
    CenterLoss,
    MultipleLoss,
    VanillaSegLoss,
    sigmoid_focal_loss,
    weighted_cross_entropy,
)
from cobevt_tpu.metrics import (
    IoUState,
    confusion_counts,
    iou_compute,
    iou_update,
    per_class_iou,
)


def test_weighted_ce_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 8, 8, 3).astype(np.float32)
    labels = rng.randint(0, 3, (4, 8, 8))
    w = np.array([1.0, 15.0, 50.0], np.float32)

    ref = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels), weight=torch.from_numpy(w))
    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  w)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_vanilla_seg_loss():
    rng = np.random.RandomState(1)
    dyn_logits = rng.randn(2, 1, 16, 16, 2).astype(np.float32)
    dyn_gt = rng.randint(0, 2, (2, 1, 16, 16))
    loss_fn = VanillaSegLoss(target="dynamic", d_weights=75.0, d_coe=2.0)
    total, parts = loss_fn(
        {"dynamic_seg": jnp.asarray(dyn_logits),
         "static_seg": jnp.zeros_like(jnp.asarray(dyn_logits))},
        {"gt_dynamic": jnp.asarray(dyn_gt), "gt_static": jnp.asarray(dyn_gt)})
    ref = F.cross_entropy(
        torch.from_numpy(
            dyn_logits.reshape(2, 16, 16, 2).transpose(0, 3, 1, 2)),
        torch.from_numpy(dyn_gt.reshape(2, 16, 16)),
        weight=torch.tensor([1.0, 75.0]))
    np.testing.assert_allclose(float(total), 2.0 * float(ref), rtol=1e-5)
    assert float(parts["static_loss"]) == 0.0


def torch_focal(logits, targets, alpha, gamma):
    p = torch.sigmoid(logits)
    ce = F.binary_cross_entropy_with_logits(logits, targets,
                                            reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


@pytest.mark.parametrize("alpha", [-1.0, 0.25])
def test_sigmoid_focal_loss(alpha):
    rng = np.random.RandomState(2)
    logits = rng.randn(3, 5).astype(np.float32) * 3
    targets = (rng.rand(3, 5) > 0.5).astype(np.float32)
    ref = torch_focal(torch.from_numpy(logits), torch.from_numpy(targets),
                      alpha, 2.0).numpy()
    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets),
                              alpha, 2.0)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_visibility_masked_losses_and_multiple():
    rng = np.random.RandomState(3)
    B, H, W = 2, 8, 8
    pred = {"bev": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32)),
            "center": jnp.asarray(rng.randn(B, H, W, 1).astype(np.float32))}
    batch = {
        "bev": jnp.asarray((rng.rand(B, H, W, 12) > 0.7).astype(np.float32)),
        "center": jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32)),
        "visibility": jnp.asarray(rng.randint(0, 5, (B, H, W))),
    }
    seg = BinarySegmentationLoss(label_indices=((4, 5, 6, 7),),
                                 min_visibility=2)
    cen = CenterLoss(min_visibility=2)
    multi = MultipleLoss(losses=(("bev", seg), ("center", cen)),
                         weights=(("bev", 1.0), ("center", 0.1)))
    total, parts = multi(pred, batch)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(
        float(total), float(parts["bev"]) + 0.1 * float(parts["center"]),
        rtol=1e-6)

    # oracle for the masked focal mean
    label = np.asarray(batch["bev"])[..., 4:8].max(-1)[..., None]
    loss = torch_focal(torch.from_numpy(np.asarray(pred["bev"])),
                       torch.from_numpy(label.astype(np.float32)),
                       -1.0, 2.0).numpy()
    keep = np.asarray(batch["visibility"]) >= 2
    ref = loss[keep[..., None][..., 0]].mean()
    np.testing.assert_allclose(float(parts["bev"]), ref, rtol=1e-5)


def test_threshold_iou_counters():
    rng = np.random.RandomState(4)
    logits = rng.randn(2, 16, 16, 1).astype(np.float32)
    label = (rng.rand(2, 16, 16, 1) > 0.6).astype(np.float32)
    vis = rng.randint(0, 5, (2, 16, 16))

    state = IoUState.create(num_thresholds=2, channels=1)
    state = iou_update(state, jnp.asarray(logits), jnp.asarray(label),
                       (0.4, 0.5), jnp.asarray(vis), min_visibility=2)
    ious = np.asarray(iou_compute(state))

    # oracle mirroring reference metrics.py update
    p = 1 / (1 + np.exp(-logits)).reshape(-1)
    l = label.reshape(-1).astype(bool)
    keep = (vis >= 2).reshape(-1)
    for t_i, thr in enumerate([0.4, 0.5]):
        pr = (p >= thr) & keep
        la = l & keep
        tp = (pr & la).sum()
        fp = (pr & ~la).sum()
        fn = (~pr & la & keep).sum()
        np.testing.assert_allclose(ious[0, t_i], tp / (tp + fp + fn + 1e-7),
                                   rtol=1e-5)


def test_confusion_iou():
    rng = np.random.RandomState(5)
    pred = rng.randint(0, 3, (64, 64))
    gt = rng.randint(0, 3, (64, 64))
    conf = confusion_counts(jnp.asarray(pred), jnp.asarray(gt), 3)
    iou = np.asarray(per_class_iou(conf))
    for c in range(3):
        inter = np.logical_and(pred == c, gt == c).sum()
        union = (pred == c).sum() + (gt == c).sum() - inter
        np.testing.assert_allclose(iou[c], inter / union, rtol=1e-5)
