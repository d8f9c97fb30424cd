"""Golden parity for the EfficientNet trunk (VERDICT r1 item 3).

The env lacks efficientnet_pytorch, so tests/ref_shims.py carries a torch
oracle mirroring its public semantics (static TF-SAME padding, SE on
input channels, swish, BN eps 1e-3, drop-connect off in eval) and the
reference extractor's slicing/indexing
(nuscenes/cross_view_transformer/model/backbones/efficientnet.py:24-96).
Random weights + randomized BN stats port to flax via torch_port; the
activations must match at every requested endpoint.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.ref_shims import TorchEfficientNetExtractor, calibrate_bn
from cobevt_tpu.nn.efficientnet import EfficientNetExtractor
from cobevt_tpu.utils.torch_port import (
    fit_to_template,
    state_dict_to_numpy,
    torch_to_flax,
)


def _run_parity(model_name, layer_names, img_hw, atol, seed=0):
    H, W = img_hw
    torch.manual_seed(seed)
    oracle = TorchEfficientNetExtractor(
        list(layer_names), H, W, model_name=model_name)
    rng = np.random.RandomState(seed)
    cal = torch.from_numpy(rng.rand(2, 3, H, W).astype(np.float32))
    calibrate_bn(oracle, lambda: oracle(cal))
    oracle = oracle.eval()

    x = rng.rand(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        ref_feats = [f.numpy() for f in oracle(torch.from_numpy(x))]
        # guard: the oracle must actually be input-sensitive, else the
        # parity comparison is vacuous (uncalibrated random nets saturate)
        perturbed = oracle(torch.from_numpy(
            (x + 0.1 * rng.rand(*x.shape).astype(np.float32))))
        assert float((perturbed[-1].numpy() - ref_feats[-1]).max()) > 0.01

    model = EfficientNetExtractor(tuple(layer_names), model_name,
                                  remat=False)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    init = model.init(jax.random.PRNGKey(0), xj, False)
    sd = state_dict_to_numpy(oracle.state_dict())
    converted = torch_to_flax(sd)
    variables = {
        "params": fit_to_template(converted["params"], init["params"]),
        "batch_stats": fit_to_template(converted["batch_stats"],
                                       init["batch_stats"]),
    }
    ours = model.apply(variables, xj, False)

    assert [tuple(f.shape) for f in ref_feats] == \
        [tuple(np.asarray(f).transpose(0, 3, 1, 2).shape) for f in ours]
    for ref_f, our_f in zip(ref_feats, ours):
        np.testing.assert_allclose(
            np.asarray(our_f).transpose(0, 3, 1, 2), ref_f,
            atol=atol, rtol=1e-3)


def test_efficientnet_b0_parity_small():
    _run_parity("efficientnet-b0",
                ("reduction_1", "reduction_2", "reduction_3",
                 "reduction_4"), (64, 128), atol=2e-3)


@pytest.mark.slow
def test_efficientnet_b4_parity_224x480():
    """The flagship trunk at the published nuScenes geometry."""
    _run_parity("efficientnet-b4",
                ("reduction_2", "reduction_3", "reduction_4"),
                (224, 480), atol=5e-3)


def test_oracle_output_shapes_match_static_helper():
    oracle = TorchEfficientNetExtractor(
        ["reduction_2", "reduction_3", "reduction_4"], 224, 480,
        model_name="efficientnet-b4")
    ours = EfficientNetExtractor.output_shapes(
        ("reduction_2", "reduction_3", "reduction_4"), (224, 480),
        "efficientnet-b4")
    assert [s[1:] for s in oracle.output_shapes] == \
        [(c, h, w) for (h, w, c) in ours]
