"""Golden parity: flax ResNet encoder vs a torch oracle with ported weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_shims import make_torch_resnet, randomize_bn_stats
from cobevt_tpu.nn.resnet import ResNetEncoder, ResNetTrunk
from cobevt_tpu.utils.torch_port import state_dict_to_numpy, torch_to_flax


@pytest.mark.parametrize("num_layers", [18, 34, 50])
def test_resnet_forward_parity(num_layers):
    torch.manual_seed(0)
    oracle = make_torch_resnet(num_layers).eval()
    with torch.no_grad():
        randomize_bn_stats(oracle, seed=1)

    variables = torch_to_flax(state_dict_to_numpy(oracle.state_dict()))

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 64, 96).astype(np.float32)

    with torch.no_grad():
        ref = [t.numpy() for t in oracle(torch.from_numpy(x))]

    model = ResNetTrunk(num_layers=num_layers)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    ours = model.apply(variables, xj, False)
    for o, r in zip(ours, ref):
        o = np.asarray(o).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(o, r, atol=2e-4, rtol=1e-4)


def test_resnet_train_mode_updates_stats():
    model = ResNetEncoder(num_layers=18, id_pick=(0,))
    x = jnp.ones((1, 1, 1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    _, updates = model.apply(variables, x, True, mutable=["batch_stats"])
    old = variables["batch_stats"]["encoder"]["bn1"]["mean"]
    new = updates["batch_stats"]["encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
