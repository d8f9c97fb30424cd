"""Golden parity at the SHIPPING geometries (slow lane).

The toy-shape goldens (test_corpbevt_parity.py: 128^2 / dim 32) never
reach the shape-dependent code paths the benchmarks run through
(query-axis chunking, window-size-dependent bias tables, grid-branch
factor swap at real aspect ratios).  These tests pin the stock path
against the imported torch reference at exactly the shapes
`tools/validate_kernels.py` pins the fused Pallas path against:

  * CorpBEVT at corpbevt.yaml geometry — 512^2 images, dim 128,
    q_win 16x16 / 32x32, self_attn_window 32, max_cav 5
    (reference opv2v/opencood/hypes_yaml/opcamera/corpbevt.yaml:6-137)
  * SinBEVT nuScenes at cvt_pyramid_axial.yaml geometry — 6 cams
    224x480, EfficientNet-b4 trunk, BEV 200^2
    (reference nuscenes/config/model/cvt_pyramid_axial.yaml)

fp32, CPU, one batch, un-jitted apply (avoids a multi-minute CPU
compile; eager dispatch matches jit numerics op-for-op).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import (
    TorchEfficientNetExtractor,
    calibrate_bn,
    install_torchvision_shim,
    randomize_bn_stats,
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
        from opencood.models import corpbevt as ref_corp
        from cross_view_transformer.model import cvt as ref_cvt
        from cross_view_transformer.model import decoder as ref_decoder
        from cross_view_transformer.model import (
            encoder_pyramid_axial as ref_epa,
        )
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


# ---------------------------------------------------------------------------
# CorpBEVT @ corpbevt.yaml shipping geometry
# ---------------------------------------------------------------------------

MAX_CAV = 5
N_REAL = 4          # ragged: exercises the pad/mask path at full width
M = 4               # cameras per agent (OPV2V rig)
IMG = 512


def shipping_ref_config():
    """Verbatim model args of corpbevt.yaml:48-113 (pretrained off —
    no torchvision weights in this environment; random weights are the
    golden)."""
    return {
        "max_cav": MAX_CAV,
        "target": "dynamic",
        "encoder": {"num_layers": 34, "pretrained": False,
                    "image_width": IMG, "image_height": IMG,
                    "id_pick": [1, 2, 3]},
        "compression": 0,
        "fax": {
            "dim": [128, 128, 128],
            "middle": [2, 2, 2],
            "bev_embedding": {
                "sigma": 1.0, "bev_height": 256, "bev_width": 256,
                "h_meters": 100, "w_meters": 100, "offset": 0.0,
                "upsample_scales": [2, 4, 8]},
            "cross_view": {
                "image_height": IMG, "image_width": IMG,
                "no_image_features": False, "skip": True,
                "heads": [4, 4, 4], "dim_head": [32, 32, 32],
                "qkv_bias": True},
            "cross_view_swap": {
                "rel_pos_emb": False,
                "q_win_size": [[16, 16], [16, 16], [32, 32]],
                "feat_win_size": [[8, 8], [8, 8], [16, 16]],
                "bev_embedding_flag": [True, False, False]},
            "self_attn": {"dim_head": 32, "dropout": 0.1,
                          "window_size": 32},
        },
        "sttf": {"resolution": 0.390625, "downsample_rate": 8,
                 "use_roi_mask": True},
        "fax_fusion": {"input_dim": 128, "mlp_dim": 256,
                       "agent_size": MAX_CAV, "window_size": 8,
                       "dim_head": 32, "drop_out": 0.1, "depth": 3,
                       "mask": True},
        "decoder": {"input_dim": 128, "num_layer": 3,
                    "num_ch_dec": [32, 64, 128]},
        "seg_head_dim": 32,
        "output_class": 2,
    }


def make_corpbevt_batch(seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(N_REAL, 1, M, IMG, IMG, 3).astype(np.float32)
    intrinsic = np.zeros((N_REAL, 1, M, 3, 3), np.float32)
    intrinsic[..., 0, 0] = 460.0
    intrinsic[..., 1, 1] = 460.0
    intrinsic[..., 0, 2] = IMG / 2
    intrinsic[..., 1, 2] = IMG / 2
    intrinsic[..., 2, 2] = 1.0
    extrinsic = np.tile(np.eye(4, dtype=np.float32),
                        (N_REAL, 1, M, 1, 1))
    extrinsic[..., :3, 3] = rng.randn(N_REAL, 1, M, 3) * 0.5

    tmat = np.tile(np.eye(4, dtype=np.float32), (1, MAX_CAV, 1, 1))
    ang = rng.uniform(-0.3, 0.3, MAX_CAV)
    ang[0] = 0.0    # ego
    for l in range(MAX_CAV):
        c, s = np.cos(ang[l]), np.sin(ang[l])
        tmat[0, l, :2, :2] = [[c, -s], [s, c]]
        tmat[0, l, :2, 3] = rng.uniform(-4, 4, 2) * (0 if l == 0 else 1)
    return images, intrinsic, extrinsic, tmat


@pytest.mark.slow
@needs_ref
def test_corpbevt_shipping_geometry_parity():
    from cobevt_tpu.configs import corpbevt_default
    from cobevt_tpu.models.corpbevt import CorpBEVT

    torch.manual_seed(0)
    ref = ref_corp.CorpBEVT(shipping_ref_config()).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=5)

    images, intrinsic, extrinsic, tmat = make_corpbevt_batch()
    batch_t = {
        "inputs": torch.from_numpy(images.copy()),
        "intrinsic": torch.from_numpy(intrinsic.copy()),
        "extrinsic": torch.from_numpy(extrinsic.copy()),
        "transformation_matrix": torch.from_numpy(tmat.copy()),
        "record_len": torch.tensor([N_REAL]),
    }
    # capture the per-agent FAX BEV maps: the random-weight graph
    # attenuates input perturbations ~100x per downstream stage at this
    # depth (measured: 0.1-noise -> 4.7e-4 at fax -> 1.3e-6 at the
    # head), so a final-output-only comparison would be vacuous for the
    # camera trunk — stage-wise comparison keeps every path loud.
    fax_out = {}
    ref.fax.register_forward_hook(
        lambda m, i, o: fax_out.__setitem__("y", o.detach().clone()))
    with torch.no_grad():
        ref_out = ref(batch_t)
    ref_dyn = ref_out["dynamic_seg"].numpy()          # (1, 1, C, H, W)
    ref_fax = fax_out["y"].squeeze(1).numpy()         # (N_REAL, C, H, W)

    # input-sensitivity guard AT THE FAX STAGE (random noise — a
    # constant shift is removed exactly by the first BatchNorm)
    rng_p = np.random.RandomState(99)
    with torch.no_grad():
        ref({**batch_t, "inputs": batch_t["inputs"] +
             torch.from_numpy(0.1 * rng_p.rand(
                 *images.shape).astype(np.float32))})
    pert_fax = fax_out["y"].squeeze(1).numpy()
    assert float(np.abs(pert_fax - ref_fax).max()) > 1e-4

    def pad(x):
        y = x[:, 0]
        pads = [(0, MAX_CAV - N_REAL)] + [(0, 0)] * (y.ndim - 1)
        return np.pad(y, pads)[None]

    intr = pad(intrinsic)
    intr[:, N_REAL:] = np.eye(3, dtype=np.float32)    # padded: invertible
    batch_j = {
        "inputs": jnp.asarray(pad(images)),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(pad(extrinsic)),
        "transformation_matrix": jnp.asarray(tmat),
        "agent_mask": jnp.asarray(
            (np.arange(MAX_CAV) < N_REAL)[None].astype(np.float32)),
    }

    model = CorpBEVT(corpbevt_default(max_cav=MAX_CAV))
    init = jax.eval_shape(
        lambda k, b: model.init(k, b, False), jax.random.PRNGKey(0),
        batch_j)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }

    # stage 1: encoder -> FAX per-agent BEV maps at activation scale
    # (catches any camera-trunk/attention bug at O(0.2) magnitude)
    ours_enc = model.apply(variables, batch_j, False, stage="encode")
    ours_fax = np.asarray(ours_enc)[0, :N_REAL].transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_fax, ref_fax, atol=5e-3, rtol=1e-2)

    # stage 2: the full cooperative forward (warp/mask/fusion/decoder/
    # head bugs appear at output scale regardless of input attenuation)
    ours = model.apply(variables, batch_j, False)
    ours_dyn = np.asarray(ours["dynamic_seg"]).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours_dyn, ref_dyn, atol=1e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# SinBEVT nuScenes @ cvt_pyramid_axial.yaml shipping geometry
# ---------------------------------------------------------------------------

B, N_CAM = 1, 6
IMG_H, IMG_W = 224, 480


@pytest.mark.slow
@needs_ref
def test_sinbevt_nuscenes_shipping_geometry_parity():
    """Full CrossViewTransformer (b4 trunk -> pyramid-axial encoder ->
    decoder -> heads) at the published nuScenes geometry."""
    from cobevt_tpu.models.sinbevt_nuscenes import (
        CrossViewTransformer,
        PyramidAxialConfig,
    )

    torch.manual_seed(3)
    backbone = TorchEfficientNetExtractor(
        ["reduction_2", "reduction_3", "reduction_4"], IMG_H, IMG_W,
        model_name="efficientnet-b4")
    encoder = ref_epa.PyramidAxialEncoder(
        backbone=backbone,
        cross_view={"image_height": IMG_H, "image_width": IMG_W,
                    "no_image_features": False, "skip": True,
                    "heads": [1, 2, 4], "dim_head": [32, 32, 32],
                    "qkv_bias": True},
        cross_view_swap={"rel_pos_emb": False,
                         "q_win_size": [[10, 10], [10, 10], [25, 25]],
                         "feat_win_size": [[6, 12], [6, 12], [14, 30]],
                         "bev_embedding_flag": [True, False, False]},
        bev_embedding={"sigma": 1.0, "bev_height": 200, "bev_width": 200,
                       "h_meters": 100, "w_meters": 100, "offset": 0.0,
                       "upsample_scales": [2, 4, 8]},
        self_attn={"dim_head": 32, "dropout": 0.1, "window_size": 25},
        dim=[32, 64, 128], middle=[2, 2, 2], scale=1.0)
    ref = ref_cvt.CrossViewTransformer(
        encoder=encoder,
        decoder=ref_decoder.Decoder(
            dim=128, blocks=[128, 128, 64], residual=True, factor=2),
        dim_last=64, outputs={"bev": (0, 1)})

    rng = np.random.RandomState(7)
    image = rng.rand(B, N_CAM, 3, IMG_H, IMG_W).astype(np.float32)
    intr = np.zeros((B, N_CAM, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 250.0
    intr[..., 0, 2] = IMG_W / 2
    intr[..., 1, 2] = IMG_H / 2
    intr[..., 2, 2] = 1.0
    extr = np.tile(np.eye(4, dtype=np.float32), (B, N_CAM, 1, 1))
    extr[..., :3, 3] = rng.randn(B, N_CAM, 3) * 0.3

    def make_batch(img):
        return {"image": torch.from_numpy(img),
                "intrinsics": torch.from_numpy(intr.copy()),
                "extrinsics": torch.from_numpy(extr.copy())}

    cal_img = rng.rand(B, N_CAM, 3, IMG_H, IMG_W).astype(np.float32)
    calibrate_bn(ref, lambda: ref(make_batch(cal_img)))
    ref = ref.eval()

    with torch.no_grad():
        ref_out = ref(make_batch(image))["bev"].numpy()   # (B, 1, H, W)
        pert = ref(make_batch(
            image + 0.1 * rng.rand(*image.shape).astype(np.float32)))
        assert float((pert["bev"].numpy() - ref_out).max()) > 0.01

    model = CrossViewTransformer(
        PyramidAxialConfig(remat_backbone=False),
        decoder_blocks=(128, 128, 64), dim_last=64,
        outputs=(("bev", (0, 1)),))
    batch = {
        "image": jnp.asarray(image.transpose(0, 1, 3, 4, 2)),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(extr),
    }
    init = jax.eval_shape(
        lambda k, b: model.init(k, b, False), jax.random.PRNGKey(0),
        batch)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, batch, False)["bev"]
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                               ref_out, atol=1e-2, rtol=1e-2)
