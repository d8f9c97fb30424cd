"""Golden parity: FuseBEVT SwapFusionEncoder vs the torch reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim
from cobevt_tpu.models.fusion.swap_fusion import SwapFusionEncoder
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)

HAVE_REF = add_reference_to_path()
if HAVE_REF:
    install_torchvision_shim()
    try:
        from opencood.models.fusion_modules import swap_fusion_modules as ref_sf
    except Exception:
        HAVE_REF = False

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


@needs_ref
@pytest.mark.parametrize("use_mask", [True, False])
def test_swap_fusion_parity(use_mask):
    torch.manual_seed(0)
    args = {"input_dim": 32, "mlp_dim": 32, "agent_size": 4,
            "window_size": 4, "dim_head": 8, "drop_out": 0.0, "depth": 2,
            "mask": use_mask}
    ref = ref_sf.SwapFusionEncoder(args).eval()

    rng = np.random.RandomState(1)
    B, L, C, H, W = 2, 4, 32, 16, 16
    x = rng.randn(B, L, C, H, W).astype(np.float32)
    if use_mask:
        # partially-valid agents + a spatially varying (ROI-like) mask
        mask = (rng.rand(B, H, W, 1, L) > 0.3).astype(np.float32)
        mask[..., 0] = 1.0   # ego always fully valid
    else:
        mask = np.ones((B, H, W, 1, L), np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.copy()),
                      torch.from_numpy(mask.copy())).numpy()

    model = SwapFusionEncoder(input_dim=32, mlp_dim=32, agent_size=4,
                              window_size=4, dim_head=8, dropout=0.0,
                              depth=2, mask=use_mask)
    xj = jnp.asarray(x.transpose(0, 1, 3, 4, 2))          # B L H W C
    mj = jnp.asarray(mask[:, :, :, 0, :].transpose(0, 3, 1, 2))  # B L H W
    init = model.init(jax.random.PRNGKey(0), xj, mj, False)
    converted = torch_to_flax(state_dict_to_numpy(ref.state_dict()))
    variables = {"params": fit_to_template(converted["params"],
                                           init["params"])}
    ours = model.apply(variables, xj, mj, False)
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=1e-3)
