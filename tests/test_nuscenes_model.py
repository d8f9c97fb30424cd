"""nuScenes-track model tests: EfficientNet extractor, pyramid-axial
encoder, residual decoder, CVT wrapper; plus a train-step smoke test with
the focal/center losses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.losses import BinarySegmentationLoss, CenterLoss, MultipleLoss
from cobevt_tpu.models.sinbevt_nuscenes import (
    CrossViewTransformer,
    Decoder,
    PyramidAxialConfig,
    upsample_bilinear_2x_align_corners,
    resize_nearest,
)
from cobevt_tpu.nn.efficientnet import EfficientNetExtractor


def small_cfg():
    return PyramidAxialConfig(
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


def nusc_batch(B=2, n=2, h=64, w=128, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.zeros((B, n, 3, 3), np.float32)
    intr[..., 0, 0] = 60.0
    intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = w / 2
    intr[..., 1, 2] = h / 2
    intr[..., 2, 2] = 1.0
    return {
        "image": jnp.asarray(rng.rand(B, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, n, 1, 1))),
    }


def test_efficientnet_b4_matches_reference_aliases():
    from cobevt_tpu.nn.efficientnet import reduction_boundaries
    # The block ranges must equal the reference MODELS dict
    # (efficientnet.py:8-21); the names follow the reference's *runtime*
    # indexing (result[0] = stem = reduction_1, efficientnet.py:62-92 —
    # its docstring shows stale shifted shapes).
    assert reduction_boundaries("efficientnet-b0")[:5] == [
        ("reduction_1", (0, 0)), ("reduction_2", (0, 2)),
        ("reduction_3", (2, 4)), ("reduction_4", (4, 6)),
        ("reduction_5", (6, 12))]
    assert reduction_boundaries("efficientnet-b4")[:5] == [
        ("reduction_1", (0, 0)), ("reduction_2", (0, 3)),
        ("reduction_3", (3, 7)), ("reduction_4", (7, 11)),
        ("reduction_5", (11, 23))]
    # standard endpoints: reduction_k at 1/2^k resolution
    shapes = EfficientNetExtractor.output_shapes(
        ("reduction_1", "reduction_2", "reduction_4"), (224, 480))
    assert shapes == [(112, 240, 48), (56, 120, 32), (14, 30, 112)]


def test_cvt_forward_shapes_and_outputs():
    cfg = small_cfg()
    model = CrossViewTransformer(
        cfg, decoder_blocks=(64, 64, 32), dim_last=32,
        outputs=(("bev", (0, 1)), ("center", (1, 2))))
    batch = nusc_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out["bev"].shape == (2, 40, 40, 1)
    assert out["center"].shape == (2, 40, 40, 1)
    assert np.isfinite(np.asarray(out["bev"])).all()


@pytest.mark.slow
def test_cvt_train_step_with_losses():
    cfg = small_cfg()
    model = CrossViewTransformer(
        cfg, decoder_blocks=(64, 64, 32), dim_last=32,
        outputs=(("bev", (0, 1)), ("center", (1, 2))))
    batch = nusc_batch()
    rng = np.random.RandomState(1)
    batch["bev"] = jnp.asarray(
        (rng.rand(2, 40, 40, 12) > 0.8).astype(np.float32))
    batch["center"] = jnp.asarray(rng.rand(2, 40, 40, 1).astype(np.float32))
    batch["visibility"] = jnp.asarray(rng.randint(0, 5, (2, 40, 40)))

    criterion = MultipleLoss(
        losses=(("bev", BinarySegmentationLoss(
            label_indices=((4, 5, 6, 7, 8, 10, 11),), min_visibility=2)),
            ("center", CenterLoss(min_visibility=2))),
        weights=(("bev", 1.0), ("center", 0.1)))

    variables = model.init(jax.random.PRNGKey(0), batch, False)

    def loss_fn(params):
        out, updates = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        total, _ = criterion(out, batch)
        return total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0


def test_bilinear_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 5, 7).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                        mode="bilinear", align_corners=True).numpy()
    ours = upsample_bilinear_2x_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_nearest_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.randn(1, 2, 5, 5).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(20, 20)).numpy()
    ours = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), (20, 20))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=0)


def test_cvt_nuscenes_dense_encoder():
    from cobevt_tpu.models.cvt_nuscenes import (
        CVTNuScenesConfig,
        CVTNuScenesEncoder,
    )

    cfg = CVTNuScenesConfig(
        dim=16, middle=(1, 1), image_height=64, image_width=128,
        backbone_model="efficientnet-b0",
        backbone_layers=("reduction_2", "reduction_4"),
        heads=2, dim_head=8, bev_height=40, bev_width=40,
        decoder_blocks=3, remat_backbone=False)
    model = CVTNuScenesEncoder(cfg)
    batch = nusc_batch()
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    out = model.apply(variables, batch, False)
    assert out.shape == (2, 5, 5, 16)
    assert np.isfinite(np.asarray(out)).all()
