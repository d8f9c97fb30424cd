"""Golden parity: the full CorpBEVT graph vs the torch reference.

Covers the end-to-end composition: ResNet encoder -> FAX -> regroup/pad ->
STTF ego-warp -> ROI+agent mask -> FuseBEVT -> decoder -> seg head, on a
small config with a ragged agent count (record_len < max_cav).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from cobevt_tpu.models.corpbevt import CorpBEVT, CorpBEVTConfig
from cobevt_tpu.models.fax import FAXConfig
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
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

MAX_CAV = 4
N_REAL = 3
M = 2           # cameras per agent
IMG = 128
RES = 0.390625
DOWN = 8


def ref_config():
    return {
        "max_cav": MAX_CAV,
        "target": "dynamic",
        "encoder": {"num_layers": 18, "pretrained": False,
                    "image_width": IMG, "image_height": IMG,
                    "id_pick": [1, 2, 3]},
        "compression": 0,
        "fax": {
            "dim": [32, 32, 32],
            "middle": [1, 1, 1],
            "bev_embedding": {
                "sigma": 1.0, "bev_height": 64, "bev_width": 64,
                "h_meters": 100, "w_meters": 100, "offset": 0.0,
                "upsample_scales": [2, 4, 8]},
            "cross_view": {
                "image_height": IMG, "image_width": IMG,
                "no_image_features": False, "skip": True,
                "heads": [2, 2, 2], "dim_head": [16, 16, 16],
                "qkv_bias": True},
            "cross_view_swap": {
                "rel_pos_emb": False,
                "q_win_size": [[8, 8], [8, 8], [8, 8]],
                "feat_win_size": [[4, 4], [4, 4], [4, 4]],
                "bev_embedding_flag": [True, False, False]},
            "self_attn": {"dim_head": 16, "dropout": 0.0,
                          "window_size": 8},
        },
        "sttf": {"resolution": RES, "downsample_rate": DOWN,
                 "use_roi_mask": True},
        "fax_fusion": {"input_dim": 32, "mlp_dim": 32,
                       "agent_size": MAX_CAV, "window_size": 4,
                       "dim_head": 8, "drop_out": 0.0, "depth": 2,
                       "mask": True},
        "decoder": {"input_dim": 32, "num_layer": 3,
                    "num_ch_dec": [16, 24, 32]},
        "seg_head_dim": 16,
        "output_class": 2,
    }


def our_config():
    fax = FAXConfig(
        dim=(32, 32, 32), middle=(1, 1, 1),
        image_height=IMG, image_width=IMG, qkv_bias=True,
        heads=(2, 2, 2), dim_head=(16, 16, 16),
        q_win_size=((8, 8), (8, 8), (8, 8)),
        feat_win_size=((4, 4), (4, 4), (4, 4)),
        bev_embedding_flag=(True, False, False),
        sigma=1.0, bev_height=64, bev_width=64,
        h_meters=100, w_meters=100, offset=0.0,
        upsample_scales=(2, 4, 8),
        self_attn_dim_head=16, self_attn_dropout=0.0, self_attn_window=8)
    return CorpBEVTConfig(
        max_cav=MAX_CAV, target="dynamic",
        encoder_num_layers=18, encoder_id_pick=(1, 2, 3),
        image_height=IMG, image_width=IMG, fax=fax, compression=0,
        sttf_resolution=RES, sttf_downsample_rate=DOWN, use_roi_mask=True,
        fusion_mlp_dim=32, fusion_window_size=4, fusion_dim_head=8,
        fusion_dropout=0.0, fusion_depth=2, fusion_mask=True,
        decoder_num_layer=3, decoder_num_ch=(16, 24, 32),
        seg_head_dim=16, output_class=2)


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(N_REAL, 1, M, IMG, IMG, 3).astype(np.float32)
    intrinsic = np.zeros((N_REAL, 1, M, 3, 3), np.float32)
    intrinsic[..., 0, 0] = 120.0
    intrinsic[..., 1, 1] = 120.0
    intrinsic[..., 0, 2] = IMG / 2
    intrinsic[..., 1, 2] = IMG / 2
    intrinsic[..., 2, 2] = 1.0
    extrinsic = np.tile(np.eye(4, dtype=np.float32),
                        (N_REAL, 1, M, 1, 1))
    extrinsic[..., :3, 3] = rng.randn(N_REAL, 1, M, 3) * 0.5

    tmat = np.tile(np.eye(4, dtype=np.float32), (1, MAX_CAV, 1, 1))
    ang = rng.uniform(-0.3, 0.3, MAX_CAV)
    ang[0] = 0.0  # ego
    for l in range(MAX_CAV):
        c, s = np.cos(ang[l]), np.sin(ang[l])
        tmat[0, l, :2, :2] = [[c, -s], [s, c]]
        tmat[0, l, :2, 3] = rng.uniform(-4, 4, 2) * (0 if l == 0 else 1)
    return images, intrinsic, extrinsic, tmat


@needs_ref
def test_corpbevt_end_to_end_parity():
    torch.manual_seed(0)
    ref = ref_corp.CorpBEVT(ref_config()).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=5)

    images, intrinsic, extrinsic, tmat = make_batch()
    batch_t = {
        "inputs": torch.from_numpy(images.copy()),
        "intrinsic": torch.from_numpy(intrinsic.copy()),
        "extrinsic": torch.from_numpy(extrinsic.copy()),
        "transformation_matrix": torch.from_numpy(tmat.copy()),
        "record_len": torch.tensor([N_REAL]),
    }
    with torch.no_grad():
        ref_out = ref(batch_t)
    ref_dyn = ref_out["dynamic_seg"].numpy()      # (1, 1, C, H, W)

    # ours: padded layout (B=1, L=MAX_CAV)
    def pad(x):
        y = x[:, 0]                                  # (N_REAL, ...)
        pads = [(0, MAX_CAV - N_REAL)] + [(0, 0)] * (y.ndim - 1)
        return np.pad(y, pads)[None]

    batch_j = {
        "inputs": jnp.asarray(pad(images)),
        "intrinsic": jnp.asarray(pad(intrinsic)),
        "extrinsic": jnp.asarray(pad(extrinsic)),
        "transformation_matrix": jnp.asarray(tmat),
        "agent_mask": jnp.asarray(
            (np.arange(MAX_CAV) < N_REAL)[None].astype(np.float32)),
    }
    # padded agents need identity intrinsics (they get inverted)
    eye3 = np.tile(np.eye(3, dtype=np.float32),
                   (1, MAX_CAV - N_REAL, M, 1, 1))
    intr = np.array(batch_j["intrinsic"])
    intr[:, N_REAL:] = eye3
    batch_j["intrinsic"] = jnp.asarray(intr)

    model = CorpBEVT(our_config())
    init = model.init(jax.random.PRNGKey(0), batch_j, False)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, batch_j, False)
    ours_dyn = np.asarray(ours["dynamic_seg"]).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours_dyn, ref_dyn, atol=5e-3, rtol=1e-2)
