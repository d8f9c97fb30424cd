"""Single-scale / FPN-concat ResNet encoder variants."""

import numpy as np
import jax
import jax.numpy as jnp

from cobevt_tpu.nn.resnet_variants import (
    FeaturePyramidNetwork,
    ResNetEncoderConcat,
    ResNetEncoderSingle,
)


def test_single_scale_shapes():
    m = ResNetEncoderSingle(num_layers=18, id_pick=1)
    x = jnp.ones((1, 2, 1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape == (1, 2, 1, 8, 8, 128)


def test_fpn_topdown_math():
    fpn = FeaturePyramidNetwork(out_channels=8)
    feats = [jnp.ones((1, 8, 8, 4)), jnp.ones((1, 4, 4, 6)),
             jnp.ones((1, 2, 2, 8))]
    v = fpn.init(jax.random.PRNGKey(0), feats)
    outs = fpn.apply(v, feats)
    assert [o.shape for o in outs] == [(1, 8, 8, 8), (1, 4, 4, 8),
                                       (1, 2, 2, 8)]


def test_concat_encoder_shapes():
    m = ResNetEncoderConcat(num_layers=18, fpn_out_dim=16,
                            conv_output_dim=32)
    x = jnp.ones((1, 1, 2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    # all stages upsampled to layer2's 1/8 stride then fused
    assert out.shape == (1, 1, 2, 8, 8, 32)

    # without FPN the concat dims are raw stage channels
    m2 = ResNetEncoderConcat(num_layers=18, fpn_out_dim=0,
                             conv_output_dim=24)
    v2 = m2.init(jax.random.PRNGKey(0), x, False)
    out2 = m2.apply(v2, x, False)
    assert out2.shape == (1, 1, 2, 8, 8, 24)


def test_dataset_registry():
    from cobevt_tpu.data import DATASET_REGISTRY, build_dataset
    assert set(DATASET_REGISTRY) == {"CamIntermediateFusionDataset",
                                     "CamLateFusionDataset"}
    import pytest
    with pytest.raises(KeyError):
        build_dataset({"fusion": {"core_method": "nope"}})


def test_config_export_roundtrip(tmp_path):
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "cobevt_tpu.tools.export_config",
         "corpbevt"], capture_output=True, text=True, check=True)
    path = tmp_path / "corpbevt.yaml"
    path.write_text(out.stdout)

    from cobevt_tpu.configs import corpbevt_default
    from cobevt_tpu.configs.hypes import (
        corpbevt_config_from_hypes,
        load_hypes,
    )
    cfg = corpbevt_config_from_hypes(load_hypes(str(path)))
    assert cfg == corpbevt_default()
