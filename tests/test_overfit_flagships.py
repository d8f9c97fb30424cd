"""Learning-signal tests for the other two flagships (VERDICT r4 #5).

`test_train_e2e.py::test_overfit_single_batch` pins the CorpBEVT seg
path; these do the same for the SinBEVT-nuScenes focal+center loss and
the cooperative PointPillar detection loss: N optimizer steps on one
fixed tiny batch must cut the loss materially.  Parity tests only prove
"same as torch at init" — a sign-flipped loss term or a dead gradient
passes them all; this is the test that trips it.

Reference losses being exercised:
  nuscenes/cross_view_transformer/losses.py:27 (BinarySegmentationLoss)
  and :59 (CenterLoss); opv2v/opencood/loss detection variants
  (losses/detection_loss.py here).
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from cobevt_tpu.train import create_train_state, make_optimizer
from cobevt_tpu.train.step import make_train_step


def _run_overfit(model, criterion, batch, steps, lr):
    state = create_train_state(
        model, make_optimizer(optax.constant_schedule(lr),
                              weight_decay=0.0, eps=1e-8), batch)
    step = make_train_step(model, criterion, donate=False)
    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(steps):
        state, logs = step(state, batch, jax.random.fold_in(key, i))
        if first is None:
            first = float(logs["loss"])
        last = float(logs["loss"])
    assert np.isfinite(first) and np.isfinite(last), (first, last)
    return first, last


def test_overfit_sinbevt_nuscenes_focal_center():
    """SinBEVT (nuScenes CVT) focal bev + center loss learns on one
    batch: >=40% loss drop in 30 steps."""
    from cobevt_tpu.losses import (
        BinarySegmentationLoss,
        CenterLoss,
        MultipleLoss,
    )
    from cobevt_tpu.models.sinbevt_nuscenes import (
        CrossViewTransformer,
        PyramidAxialConfig,
    )

    cfg = PyramidAxialConfig(
        dim=(16, 32, 64), middle=(1, 1, 1), scale=1.0,
        image_height=64, image_width=128,
        backbone_model="efficientnet-b0",
        backbone_layers=("reduction_2", "reduction_3", "reduction_4"),
        heads=(1, 2, 4), dim_head=(16, 16, 16),
        q_win_size=((5, 5), (5, 5), (5, 5)),
        feat_win_size=((4, 8), (4, 8), (4, 8)),
        bev_embedding_flag=(True, False, False),
        bev_height=40, bev_width=40, h_meters=100.0, w_meters=100.0,
        offset=0.0, upsample_scales=(2, 4, 8), remat_backbone=False)
    model = CrossViewTransformer(
        cfg, decoder_blocks=(64, 64, 32), dim_last=32,
        outputs=(("bev", (0, 1)), ("center", (1, 2))))

    rng = np.random.RandomState(0)
    B, n, h, w = 1, 2, 64, 128
    intr = np.zeros((B, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = w / 2
    intr[..., 1, 2] = h / 2
    intr[..., 2, 2] = 1.0
    batch = {
        "image": jnp.asarray(rng.rand(B, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, n, 1, 1))),
        # a learnable blob target, not uniform noise: the focal loss on
        # pure noise plateaus at its entropy floor and hides dead grads
        "bev": jnp.asarray(
            (rng.rand(B, 40, 40, 1) > 0.85).astype(np.float32)),
        "center": jnp.asarray(rng.rand(B, 40, 40, 1).astype(np.float32)),
        "visibility": jnp.asarray(
            np.full((B, 40, 40), 3, np.int32)),
    }
    criterion = MultipleLoss(
        losses=(("bev", BinarySegmentationLoss(min_visibility=2)),
                ("center", CenterLoss(min_visibility=2))),
        weights=(("bev", 1.0), ("center", 0.1)))

    first, last = _run_overfit(model, criterion, batch, steps=30, lr=2e-3)
    assert last < 0.6 * first, (first, last)


def test_overfit_pointpillar_detection():
    """Cooperative PointPillar detection loss (focal cls + smooth-L1
    reg) learns on one batch: >=40% loss drop in 30 steps."""
    from cobevt_tpu.losses.detection_loss import PointPillarLoss
    from cobevt_tpu.models.lidar.point_pillar_models import (
        PointPillarConfig,
        PointPillarFuseBEVT,
    )

    cfg = PointPillarConfig(
        max_cav=2, voxel_size=(0.4, 0.4, 4.0),
        point_cloud_range=(-8, -8, -3, 8, 8, 1),
        max_voxels=64, max_points_per_voxel=8, pillar_filters=(16,),
        layer_nums=(1, 1), layer_strides=(2, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filter=(16, 16),
        shrink_dim=32, fusion="swap", fusion_window_size=2,
        fusion_dim_head=8, fusion_mlp_dim=32, fusion_depth=1,
        fusion_dropout=0.0, sttf_downsample_rate=2, anchor_num=2)
    B, L, N, P = 1, 2, 64, 8
    rng = np.random.RandomState(5)
    pts = rng.rand(B, L, N, P, 4).astype(np.float32)
    pr = cfg.point_cloud_range
    pts[..., 0] = pts[..., 0] * (pr[3] - pr[0]) + pr[0]
    pts[..., 1] = pts[..., 1] * (pr[4] - pr[1]) + pr[1]
    pts[..., 2] = pts[..., 2] * (pr[5] - pr[2]) + pr[2]
    nx, ny, _ = cfg.grid_size
    coords = np.zeros((B, L, N, 4), np.int32)
    coords[..., 2] = rng.randint(0, ny, (B, L, N))
    coords[..., 3] = rng.randint(0, nx, (B, L, N))
    batch = {
        "voxel_features": jnp.asarray(pts),
        "voxel_num_points": jnp.asarray(
            rng.randint(1, P + 1, (B, L, N)).astype(np.int32)),
        "voxel_coords": jnp.asarray(coords),
        "voxel_mask": jnp.asarray(
            (rng.rand(B, L, N) < 0.8).astype(np.float32)),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }
    # fixed anchor-level targets, same protocol as the benchmark
    # criterion (tools/benchmark.py:make_criterion)
    h_map, w_map = ny // 2, nx // 2
    pos = (rng.rand(B, h_map, w_map, cfg.anchor_num) < 0.05).astype(
        np.float32)
    neg = ((1.0 - pos) *
           (rng.rand(B, h_map, w_map, cfg.anchor_num) < 0.9)).astype(
        np.float32)
    train_batch = dict(
        batch,
        pos_equal_one=jnp.asarray(pos),
        neg_equal_one=jnp.asarray(neg),
        targets=jnp.asarray(rng.randn(
            B, h_map, w_map, cfg.anchor_num * 7).astype(np.float32)))

    loss = PointPillarLoss()

    def criterion(out, b):
        return loss(
            {"cls_preds": out["cls_preds"], "reg_preds": out["reg_preds"]},
            {"pos_equal_one": b["pos_equal_one"],
             "neg_equal_one": b["neg_equal_one"],
             "targets": b["targets"]})

    model = PointPillarFuseBEVT(cfg)
    first, last = _run_overfit(model, criterion, train_batch,
                               steps=30, lr=2e-3)
    assert last < 0.6 * first, (first, last)
