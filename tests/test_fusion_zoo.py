"""Golden parity: baseline fusion zoo vs the torch reference modules.

Each test feeds the reference its native stacked/record_len interface and
our module the padded+masked layout, with mechanically ported weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from cobevt_tpu.models.fusion.graph_fusion import (
    DiscoNetFusion,
    V2VNetFusion,
)
from cobevt_tpu.models.fusion.zoo import (
    AttFusion,
    BaseTransformer,
    SplitAttn,
    max_fusion,
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
        from opencood.models.fusion_modules import f_cooper_fuse as ref_fc
        from opencood.models.fusion_modules import self_attn as ref_sa
        from opencood.models.fusion_modules import split_attn as ref_split
        from opencood.models.fusion_modules import v2v_fuse as ref_v2v
        from opencood.models.fusion_modules import disconet_fuse as ref_disco
        from opencood.models import base_transformer as ref_bt
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

B, L, N_REAL, C, H, W = 2, 4, 3, 8, 16, 16


def stacked_and_padded(seed=0):
    rng = np.random.RandomState(seed)
    record_len = [N_REAL, 2]
    total = sum(record_len)
    stacked = rng.randn(total, C, H, W).astype(np.float32)
    padded = np.zeros((B, L, C, H, W), np.float32)
    mask = np.zeros((B, L), np.float32)
    o = 0
    for b, n in enumerate(record_len):
        padded[b, :n] = stacked[o:o + n]
        mask[b, :n] = 1
        o += n
    return stacked, padded, mask, record_len


def pairwise_mats(seed=1):
    rng = np.random.RandomState(seed)
    mats = np.tile(np.eye(4, dtype=np.float32), (B, L, L, 1, 1))
    for b in range(B):
        for j in range(L):
            for i in range(L):
                if i == j:
                    continue
                a = rng.uniform(-0.3, 0.3)
                cs, sn = np.cos(a), np.sin(a)
                mats[b, j, i, :2, :2] = [[cs, -sn], [sn, cs]]
                mats[b, j, i, :2, 3] = rng.uniform(-3, 3, 2) * 0.4 * 8
    return mats


@needs_ref
def test_f_cooper_parity():
    stacked, padded, mask, record_len = stacked_and_padded()
    ref = ref_fc.SpatialFusion()(torch.from_numpy(stacked.copy()),
                                 torch.tensor(record_len)).numpy()
    ours = max_fusion(jnp.asarray(padded.transpose(0, 1, 3, 4, 2)),
                      jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-6)

    # zero-padded variant (SpatialFusionMask semantics)
    ref2 = ref_fc.SpatialFusionMask()(
        torch.from_numpy(padded.transpose(0, 1, 3, 4, 2).copy())).numpy()
    ours2 = max_fusion(jnp.asarray(padded.transpose(0, 1, 3, 4, 2)))
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=1e-6)


@needs_ref
def test_att_fusion_parity():
    stacked, padded, mask, record_len = stacked_and_padded(2)
    torch.manual_seed(0)
    ref_mod = ref_sa.AttFusion(C).eval()
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(stacked.copy()),
                      torch.tensor(record_len)).numpy()

    model = AttFusion(C)
    xj = jnp.asarray(padded.transpose(0, 1, 3, 4, 2))
    ours = model.apply({"params": {}}, xj, jnp.asarray(mask))
    # NOTE reference AttFusion views (N, C, W*H) with shape names swapped;
    # numerically it is attention over flattened pixels either way.
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


@needs_ref
def test_split_attn_parity():
    torch.manual_seed(1)
    ref_mod = ref_split.SplitAttn(C).eval()
    rng = np.random.RandomState(3)
    wins = [rng.randn(B, L, H, W, C).astype(np.float32) for _ in range(3)]
    with torch.no_grad():
        ref = ref_mod([torch.from_numpy(w.copy()) for w in wins]).numpy()

    model = SplitAttn(C)
    init = model.init(jax.random.PRNGKey(0), [jnp.asarray(w) for w in wins])
    conv = torch_to_flax(state_dict_to_numpy(ref_mod.state_dict()))
    variables = {"params": fit_to_template(conv["params"], init["params"])}
    ours = model.apply(variables, [jnp.asarray(w) for w in wins])
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


@needs_ref
def test_base_transformer_parity():
    torch.manual_seed(2)
    args = {"dim": C, "depth": 2, "heads": 2, "dim_head": 4,
            "mlp_dim": 16, "dropout": 0.0, "max_cav": L}
    ref_mod = ref_bt.BaseTransformer(args).eval()

    _, padded, mask, _ = stacked_and_padded(4)
    x_t = torch.from_numpy(padded.transpose(0, 1, 3, 4, 2).copy())
    # spatial mask (B, H, W, 1, L)
    com_mask = np.broadcast_to(mask[:, None, None, None, :],
                               (B, H, W, 1, L)).copy()
    with torch.no_grad():
        ref = ref_mod(x_t, torch.from_numpy(com_mask)).numpy()

    model = BaseTransformer(C, depth=2, heads=2, dim_head=4, mlp_dim=16,
                            dropout=0.0)
    xj = jnp.asarray(padded.transpose(0, 1, 3, 4, 2))
    mj = jnp.asarray(com_mask)
    init = model.init(jax.random.PRNGKey(0), xj, mj, False)
    conv = torch_to_flax(state_dict_to_numpy(ref_mod.state_dict()))
    variables = {"params": fit_to_template(conv["params"], init["params"])}
    ours = model.apply(variables, xj, mj, False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def v2v_args(gru=True, agg="avg"):
    return {"in_channels": C, "conv_gru": {"H": H, "W": W,
                                           "kernel_size": (3, 3),
                                           "num_layers": 1},
            "resolution": 0.4, "downsample_rate": 8, "num_iteration": 2,
            "gru_flag": gru, "agg_operator": agg}


@needs_ref
@pytest.mark.parametrize("gru,agg", [(True, "avg"), (False, "max")])
def test_v2vnet_parity(gru, agg):
    torch.manual_seed(3)
    ref_mod = ref_v2v.V2VNetFusion(v2v_args(gru, agg)).eval()
    stacked, padded, mask, record_len = stacked_and_padded(5)
    mats = pairwise_mats()
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(stacked.copy()),
                      torch.tensor(record_len),
                      torch.from_numpy(mats.copy()),
                      None).numpy()          # (B, H, W, C)

    model = V2VNetFusion(C, num_iteration=2, gru_flag=gru,
                         agg_operator=agg, discrete_ratio=0.4,
                         downsample_rate=8)
    xj = jnp.asarray(padded.transpose(0, 1, 3, 4, 2))
    init = model.init(jax.random.PRNGKey(0), xj, jnp.asarray(mask),
                      jnp.asarray(mats), False)
    sd = state_dict_to_numpy(ref_mod.state_dict())
    if not gru:
        # reference creates (unused) ConvGRU params even when disabled
        sd = {k: v for k, v in sd.items() if not k.startswith("conv_gru")}
    conv = torch_to_flax(sd)
    variables = {"params": fit_to_template(conv["params"], init["params"])}
    ours = model.apply(variables, xj, jnp.asarray(mask),
                       jnp.asarray(mats), False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


@needs_ref
def test_disconet_parity():
    torch.manual_seed(4)
    args = v2v_args()
    args.update({"num_iteration": 1, "use_temporal_encoding": False,
                 "use_mask": True})
    ref_mod = ref_disco.DiscoNetFusion(args).eval()
    with torch.no_grad():
        randomize_bn_stats(ref_mod, seed=6)
    stacked, padded, mask, record_len = stacked_and_padded(6)
    mats = pairwise_mats(7)
    with torch.no_grad():
        ref = ref_mod(torch.from_numpy(stacked.copy()),
                      torch.tensor(record_len),
                      torch.from_numpy(mats.copy())).numpy()  # (B,H,W,C)

    model = DiscoNetFusion(C, num_iteration=1, use_mask=True,
                           discrete_ratio=0.4, downsample_rate=8)
    xj = jnp.asarray(padded.transpose(0, 1, 3, 4, 2))
    init = model.init(jax.random.PRNGKey(0), xj, jnp.asarray(mask),
                      jnp.asarray(mats), False)
    # reference DiscoNet declares cnn/msg_cnn/conv_gru but never uses them
    sd = {k: v for k, v in
          state_dict_to_numpy(ref_mod.state_dict()).items()
          if not k.startswith(("cnn", "msg_cnn", "conv_gru"))}
    conv = torch_to_flax(sd)
    variables = {
        "params": fit_to_template(conv["params"], init["params"]),
        "batch_stats": fit_to_template(conv["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, xj, jnp.asarray(mask),
                       jnp.asarray(mats), False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)
