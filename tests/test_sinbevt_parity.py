"""Golden parity: SinBEVT (FaxFusedTransformer) vs the torch reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from tests.test_corpbevt_parity import (
    IMG,
    M,
    our_config,
    ref_config,
)
from cobevt_tpu.models.corpbevt import SinBEVT
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    install_torchvision_shim()
    try:
        from opencood.models import fax_fused_transformer as ref_fax
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


@needs_ref
def test_sinbevt_forward_parity():
    torch.manual_seed(0)
    cfg_ref = ref_config()
    ref = ref_fax.FaxFusedTransformer(cfg_ref).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=4)

    rng = np.random.RandomState(0)
    B, L = 1, 2
    images = rng.rand(B, L, M, IMG, IMG, 3).astype(np.float32)
    intrinsic = np.zeros((B, L, M, 3, 3), np.float32)
    intrinsic[..., 0, 0] = intrinsic[..., 1, 1] = 120.0
    intrinsic[..., 0, 2] = intrinsic[..., 1, 2] = IMG / 2
    intrinsic[..., 2, 2] = 1.0
    extrinsic = np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))

    with torch.no_grad():
        ref_out = ref({
            "inputs": torch.from_numpy(images.copy()),
            "intrinsic": torch.from_numpy(intrinsic.copy()),
            "extrinsic": torch.from_numpy(extrinsic.copy()),
        })["dynamic_seg"].numpy()

    model = SinBEVT(our_config())
    batch = {
        "inputs": jnp.asarray(images),
        "intrinsic": jnp.asarray(intrinsic),
        "extrinsic": jnp.asarray(extrinsic),
    }
    init = model.init(jax.random.PRNGKey(0), batch, False)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    out = model.apply(variables, batch, False)
    ours = np.asarray(out["dynamic_seg"]).transpose(0, 1, 4, 2, 3)
    # reference reshapes (b l) into batch for the head: (B*L, 1, ...)
    assert ours.shape == (B, L, *ref_out.shape[2:])
    np.testing.assert_allclose(
        ours.reshape(ref_out.shape), ref_out, atol=5e-3, rtol=1e-2)
