"""Golden parity: FAX camera->BEV module vs the imported torch reference.

Builds the reference `FAXModule` (opv2v fax_modules.py:444) with random
weights on CPU, ports the state_dict mechanically, and compares full
forward passes.  This covers BEVEmbedding, both CrossWinAttention paths
(local window + global grid), geometry embeddings, bottleneck stacks,
pixel-unshuffle downsampling and the final windowed self-attention.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from cobevt_tpu.models.fax import FAXConfig, FAXModule
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    install_torchvision_shim()
    try:
        from opencood.models.sub_modules import fax_modules as ref_fax
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

B, L, N = 1, 2, 2
IMG_H = IMG_W = 128
# ResNet-ish pyramid shapes for a 128x128 image, tiny channel counts
FEAT_SHAPES = [(16, 16, 24), (8, 8, 40), (4, 4, 64)]
DIMS = (32, 32, 32)


def small_ref_config():
    return {
        "dim": list(DIMS),
        "middle": [1, 1, 1],
        "backbone_output_shape": [
            (B, L, N, c, h, w) for (h, w, c) in FEAT_SHAPES],
        "cross_view": {
            "image_height": IMG_H,
            "image_width": IMG_W,
            "no_image_features": False,
            "skip": True,
            "heads": [2, 2, 2],
            "dim_head": [16, 16, 16],
            "qkv_bias": True,
        },
        "cross_view_swap": {
            "rel_pos_emb": False,
            "q_win_size": [[8, 8], [8, 8], [8, 8]],
            "feat_win_size": [[4, 4], [4, 4], [4, 4]],
            "bev_embedding_flag": [True, False, False],
        },
        "bev_embedding": {
            "sigma": 1.0,
            "bev_height": 64,
            "bev_width": 64,
            "h_meters": 100,
            "w_meters": 100,
            "offset": 0.0,
            "upsample_scales": [2, 4, 8],
        },
        "self_attn": {"dim_head": 16, "dropout": 0.0, "window_size": 8},
    }


def small_config():
    return FAXConfig(
        dim=DIMS, middle=(1, 1, 1),
        backbone_output_shape=tuple(FEAT_SHAPES),
        image_height=IMG_H, image_width=IMG_W, qkv_bias=True,
        heads=(2, 2, 2), dim_head=(16, 16, 16),
        q_win_size=((8, 8), (8, 8), (8, 8)),
        feat_win_size=((4, 4), (4, 4), (4, 4)),
        bev_embedding_flag=(True, False, False),
        sigma=1.0, bev_height=64, bev_width=64, h_meters=100, w_meters=100,
        offset=0.0, upsample_scales=(2, 4, 8),
        self_attn_dim_head=16, self_attn_dropout=0.0, self_attn_window=8)


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    feats = [rng.randn(B, L, N, c, h, w).astype(np.float32) * 0.5
             for (h, w, c) in FEAT_SHAPES]
    intrinsic = np.zeros((B, L, N, 3, 3), np.float32)
    intrinsic[..., 0, 0] = 100 + 10 * rng.rand(B, L, N)
    intrinsic[..., 1, 1] = 100 + 10 * rng.rand(B, L, N)
    intrinsic[..., 0, 2] = IMG_W / 2
    intrinsic[..., 1, 2] = IMG_H / 2
    intrinsic[..., 2, 2] = 1.0
    extrinsic = np.tile(np.eye(4, dtype=np.float32), (B, L, N, 1, 1))
    extrinsic[..., :3, 3] = rng.randn(B, L, N, 3)
    # small random rotations
    a = rng.uniform(-0.4, 0.4, (B, L, N))
    extrinsic[..., 0, 0] = np.cos(a)
    extrinsic[..., 0, 1] = -np.sin(a)
    extrinsic[..., 1, 0] = np.sin(a)
    extrinsic[..., 1, 1] = np.cos(a)
    return feats, intrinsic, extrinsic


@needs_ref
def test_fax_forward_parity():
    torch.manual_seed(0)
    ref = ref_fax.FAXModule(small_ref_config()).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=3)

    feats, intrinsic, extrinsic = make_inputs()
    batch = {
        "inputs": torch.zeros(B, L, N, IMG_H, IMG_W, 3),
        "intrinsic": torch.from_numpy(intrinsic.copy()),
        "extrinsic": torch.from_numpy(extrinsic.copy()),
        "features": [torch.from_numpy(f.copy()) for f in feats],
    }
    with torch.no_grad():
        ref_out = ref(batch).numpy()          # (B, L, d, H, W)

    model = FAXModule(small_config())
    feats_j = [jnp.asarray(f.transpose(0, 1, 2, 4, 5, 3)) for f in feats]
    init = model.init(jax.random.PRNGKey(0), feats_j,
                      jnp.asarray(intrinsic), jnp.asarray(extrinsic), False)

    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, feats_j, jnp.asarray(intrinsic),
                       jnp.asarray(extrinsic), False)
    ours = np.asarray(ours).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=1e-3)
