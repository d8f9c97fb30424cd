"""Parity: HGT attention / RTE / CAV positional encoding vs reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim
from cobevt_tpu.models.fusion.hetero import (
    HGTCavAttention,
    RTE,
    cav_positional_encoding,
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
        from opencood.models import base_transformer as ref_bt
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")

B, L, H, W, C = 1, 3, 4, 4, 16


@needs_ref
def test_cav_positional_encoding_parity():
    ref = ref_bt.CavPositionalEncoding(C, cav_num=L)
    rng = np.random.RandomState(0)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy())).numpy()
    ours = cav_positional_encoding(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), r, atol=1e-5)


@needs_ref
def test_rte_parity():
    torch.manual_seed(0)
    ref = ref_bt.RTE(C, RTE_ratio=2).eval()
    rng = np.random.RandomState(1)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    dts = np.array([[0, 2, 5]], np.int64)
    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy()),
                torch.from_numpy(dts)).numpy()

    model = RTE(C, rte_ratio=2)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(dts))
    sd = state_dict_to_numpy(ref.state_dict())
    # torch path emb.lin.{weight,bias}; our single Dense named emb_lin
    sd = {("emb_lin." + k.split(".")[-1]): v for k, v in sd.items()
          if k.startswith("emb.lin")}
    conv = torch_to_flax(sd)
    variables = {"params": fit_to_template(conv["params"],
                                           init["params"])}
    ours = model.apply(variables, jnp.asarray(x), jnp.asarray(dts))
    np.testing.assert_allclose(np.asarray(ours), r, atol=2e-5)


@needs_ref
def test_hgt_attention_parity():
    torch.manual_seed(1)
    heads, dim_head = 2, 8
    ref = ref_bt.HGTCavAttention(C, heads=heads, num_types=2,
                                 num_relations=4, dim_head=dim_head,
                                 dropout=0.0).eval()
    rng = np.random.RandomState(2)
    x = rng.randn(B, L, H, W, C).astype(np.float32)
    mask = np.ones((B, H, W, L, 1), np.float32)
    mask[:, :, :, 2] = 0          # one agent masked out
    prior = np.zeros((B, L, H, W, 3), np.float32)
    prior[:, :, :, :, 2] = np.array([0, 1, 0])[None, :, None, None]
    prior[:, :, :, :, 1] = np.array([0, 2, 1])[None, :, None, None]

    with torch.no_grad():
        r = ref(torch.from_numpy(x.copy()), torch.from_numpy(mask.copy()),
                torch.from_numpy(prior.copy())).numpy()

    model = HGTCavAttention(C, heads=heads, num_types=2, num_relations=4,
                            dim_head=dim_head, dropout=0.0)
    init = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(mask), jnp.asarray(prior), False)
    conv = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {"params": fit_to_template(conv["params"],
                                           init["params"])}
    ours = model.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                       jnp.asarray(prior), False)
    # the reference's query-axis masking produces NaN rows for masked
    # agents (softmax over an all -inf row); compare valid agents only
    np.testing.assert_allclose(np.asarray(ours)[:, :2], r[:, :2],
                               atol=3e-5)
    assert np.isnan(r[:, 2]).all() and np.isfinite(
        np.asarray(ours)[:, 2]).all()
