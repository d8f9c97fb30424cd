"""Golden parity: nuScenes PyramidAxialEncoder vs the torch reference
(backbone bypassed with injected features on both sides)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from cobevt_tpu.models.sinbevt_nuscenes import (
    PyramidAxialConfig,
    PyramidAxialEncoder,
)
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    install_torchvision_shim()
    try:
        from cross_view_transformer.model import (
            encoder_pyramid_axial as ref_epa,
        )
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

B, N = 1, 2
IMG_H, IMG_W = 64, 128
FEAT_SHAPES = [(8, 16, 24), (4, 8, 40), (2, 4, 64)]   # (h, w, c)
DIMS = (16, 32, 64)


class FakeBackbone(torch.nn.Module):
    """Returns injected feature maps; carries output_shapes like the
    reference EfficientNetExtractor."""

    def __init__(self, feats):
        super().__init__()
        self.feats = feats
        self.output_shapes = [f.shape for f in feats]

    def forward(self, x):
        return [f.clone() for f in self.feats]


@needs_ref
def test_pyramid_axial_encoder_parity():
    rng = np.random.RandomState(0)
    feats_t = [torch.from_numpy(
        rng.randn(B * N, c, h, w).astype(np.float32) * 0.5)
        for (h, w, c) in FEAT_SHAPES]

    torch.manual_seed(0)
    ref = ref_epa.PyramidAxialEncoder(
        backbone=FakeBackbone(feats_t),
        cross_view={"image_height": IMG_H, "image_width": IMG_W,
                    "no_image_features": False, "skip": True,
                    "heads": [1, 2, 4], "dim_head": [16, 16, 16],
                    "qkv_bias": True},
        cross_view_swap={"rel_pos_emb": False,
                         "q_win_size": [[5, 5], [5, 5], [5, 5]],
                         "feat_win_size": [[2, 4], [2, 4], [2, 4]],
                         "bev_embedding_flag": [True, False, False]},
        bev_embedding={"sigma": 1.0, "bev_height": 40, "bev_width": 40,
                       "h_meters": 100, "w_meters": 100, "offset": 0.0,
                       "upsample_scales": [2, 4, 8]},
        self_attn={"dim_head": 16, "dropout": 0.0, "window_size": 5},
        dim=list(DIMS), middle=[1, 1, 1], scale=1.0).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=2)

    intr = np.zeros((B, N, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = IMG_W / 2
    intr[..., 1, 2] = IMG_H / 2
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    extr[..., :3, 3] = rng.randn(B, N, 3) * 0.3

    with torch.no_grad():
        ref_out = ref({
            "image": torch.zeros(B, N, 3, IMG_H, IMG_W),
            "intrinsics": torch.from_numpy(intr.copy()),
            "extrinsics": torch.from_numpy(extr.copy()),
        }).numpy()                                    # (B, d, H, W)

    cfg = PyramidAxialConfig(
        dim=DIMS, middle=(1, 1, 1), scale=1.0,
        image_height=IMG_H, image_width=IMG_W,
        heads=(1, 2, 4), dim_head=(16, 16, 16),
        q_win_size=((5, 5), (5, 5), (5, 5)),
        feat_win_size=((2, 4), (2, 4), (2, 4)),
        bev_embedding_flag=(True, False, False),
        bev_height=40, bev_width=40, upsample_scales=(2, 4, 8),
        remat_backbone=False)
    model = PyramidAxialEncoder(cfg)
    batch = {
        "image": jnp.zeros((B, N, IMG_H, IMG_W, 3)),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
               for f in feats_t]
    init = model.init(jax.random.PRNGKey(0), batch, False,
                      features=feats_j)

    sd = state_dict_to_numpy(ref.state_dict())
    # drop the fake backbone's captured tensors if any leak into the dict
    sd = {k: v for k, v in sd.items() if not k.startswith("backbone")}
    converted = torch_to_flax(sd)
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, batch, False, features=feats_j)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out, atol=5e-4, rtol=1e-3)


@needs_ref
def test_pyramid_axial_encoder_real_trunk_parity():
    """Full-stack golden: reference encoder over the torch EfficientNet
    oracle vs our encoder over the real flax trunk — the whole nuScenes
    camera path from raw [0,1] images (both sides normalize internally),
    no feature injection (VERDICT r1 item 3)."""
    from tests.ref_shims import TorchEfficientNetExtractor, calibrate_bn

    torch.manual_seed(3)
    backbone = TorchEfficientNetExtractor(
        ["reduction_2", "reduction_3", "reduction_4"], IMG_H, IMG_W,
        model_name="efficientnet-b0")
    ref = ref_epa.PyramidAxialEncoder(
        backbone=backbone,
        cross_view={"image_height": IMG_H, "image_width": IMG_W,
                    "no_image_features": False, "skip": True,
                    "heads": [1, 2, 4], "dim_head": [16, 16, 16],
                    "qkv_bias": True},
        cross_view_swap={"rel_pos_emb": False,
                         "q_win_size": [[5, 5], [5, 5], [5, 5]],
                         "feat_win_size": [[4, 8], [4, 8], [4, 8]],
                         "bev_embedding_flag": [True, False, False]},
        bev_embedding={"sigma": 1.0, "bev_height": 40, "bev_width": 40,
                       "h_meters": 100, "w_meters": 100, "offset": 0.0,
                       "upsample_scales": [2, 4, 8]},
        self_attn={"dim_head": 16, "dropout": 0.0, "window_size": 5},
        dim=list(DIMS), middle=[1, 1, 1], scale=1.0)

    rng = np.random.RandomState(5)
    image = rng.rand(B, N, 3, IMG_H, IMG_W).astype(np.float32)
    intr = np.zeros((B, N, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 60.0
    intr[..., 0, 2] = IMG_W / 2
    intr[..., 1, 2] = IMG_H / 2
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (B, N, 1, 1))
    extr[..., :3, 3] = rng.randn(B, N, 3) * 0.3

    def make_batch(img):
        return {"image": torch.from_numpy(img),
                "intrinsics": torch.from_numpy(intr.copy()),
                "extrinsics": torch.from_numpy(extr.copy())}

    cal_img = rng.rand(B, N, 3, IMG_H, IMG_W).astype(np.float32)
    calibrate_bn(ref, lambda: ref(make_batch(cal_img)))
    ref = ref.eval()

    with torch.no_grad():
        ref_out = ref(make_batch(image)).numpy()
        # input-sensitivity guard: saturated random nets make this vacuous
        ref_pert = ref(make_batch(
            image + 0.1 * rng.rand(*image.shape).astype(np.float32)))
        assert float((ref_pert.numpy() - ref_out).max()) > 0.01

    cfg = PyramidAxialConfig(
        dim=DIMS, middle=(1, 1, 1), scale=1.0,
        image_height=IMG_H, image_width=IMG_W,
        backbone_model="efficientnet-b0",
        backbone_layers=("reduction_2", "reduction_3", "reduction_4"),
        heads=(1, 2, 4), dim_head=(16, 16, 16),
        q_win_size=((5, 5), (5, 5), (5, 5)),
        feat_win_size=((4, 8), (4, 8), (4, 8)),
        bev_embedding_flag=(True, False, False),
        bev_height=40, bev_width=40, upsample_scales=(2, 4, 8),
        remat_backbone=False)
    model = PyramidAxialEncoder(cfg)
    batch = {
        "image": jnp.asarray(image.transpose(0, 1, 3, 4, 2)),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    init = model.init(jax.random.PRNGKey(0), batch, False)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, batch, False)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out, atol=2e-3, rtol=1e-3)
