"""Agent-count bucketing: sliced forward agrees with the padded one."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dataclasses

from tests.test_train_multichip import tiny_batch, tiny_config
from cobevt_tpu.models.corpbevt import CorpBEVT
from cobevt_tpu.utils.serving import BucketedRunner


def test_bucketed_matches_padded():
    # exact bucketing needs the valid-agent mean (the reference's
    # mean-over-max_cav makes outputs depend on how much padding exists)
    cfg = dataclasses.replace(tiny_config(max_cav=2),
                              fusion_mean_over_valid=True)
    model = CorpBEVT(cfg)
    batch = tiny_batch(B=1, L=2)
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    # one live agent out of two padded slots
    batch_1live = dict(batch)
    mask = np.zeros((1, 2), np.float32)
    mask[0, 0] = 1
    batch_1live["agent_mask"] = jnp.asarray(mask)

    padded_out = model.apply(variables, batch_1live, False)
    runner = BucketedRunner(model, variables)
    bucketed_out = runner(batch_1live)

    np.testing.assert_allclose(
        np.asarray(bucketed_out["dynamic_seg"]),
        np.asarray(padded_out["dynamic_seg"]), atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_staged_bucketing_exact_for_reference_default():
    """Default fusion semantics (mean over max_cav, reference
    swap_fusion_modules.py:275-281): staged bucketing must match the
    padded forward exactly — plain slicing must NOT (that mismatch is
    what makes this test meaningful)."""
    from cobevt_tpu.utils.serving import StagedBucketedRunner

    cfg = tiny_config(max_cav=3)   # fusion_mean_over_valid defaults False
    assert not cfg.fusion_mean_over_valid
    model = CorpBEVT(cfg)
    batch = tiny_batch(B=1, L=3)
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    batch_2live = dict(batch)
    mask = np.zeros((1, 3), np.float32)
    mask[0, :2] = 1
    batch_2live["agent_mask"] = jnp.asarray(mask)

    padded_out = model.apply(variables, batch_2live, False)

    staged = StagedBucketedRunner(model, variables, max_cav=3)
    staged_out = staged(batch_2live)
    np.testing.assert_allclose(
        np.asarray(staged_out["dynamic_seg"]),
        np.asarray(padded_out["dynamic_seg"]), atol=2e-4, rtol=1e-3)

    # plain whole-graph slicing is approximate in this mode — assert the
    # discrepancy actually exists, so the staged runner is load-bearing
    plain = BucketedRunner(model, variables)
    plain_out = plain(batch_2live)
    assert np.abs(np.asarray(plain_out["dynamic_seg"]) -
                  np.asarray(padded_out["dynamic_seg"])).max() > 1e-3


@pytest.mark.slow
def test_staged_bucketing_data_parallel_over_mesh():
    """The staged-bucketed serving path run data-parallel over a device
    mesh (data_sharding=P("data")) must agree with the single-device
    padded forward and actually distribute the batch — the serving-side
    counterpart of test_train_multichip's loss-parity checks."""
    from cobevt_tpu.parallel import batch_sharding, make_mesh, replicated
    from cobevt_tpu.utils.serving import StagedBucketedRunner

    cfg = tiny_config(max_cav=3)
    model = CorpBEVT(cfg)
    B = 4
    batch = tiny_batch(B=B, L=3)
    mask = np.zeros((B, 3), np.float32)
    mask[:, :2] = 1
    batch = dict(batch, agent_mask=jnp.asarray(mask))
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    padded_out = jax.jit(lambda v, b: model.apply(v, b, False))(
        variables, batch)["dynamic_seg"]

    mesh = make_mesh(n_data=4, n_model=2)
    runner = StagedBucketedRunner(
        model, jax.device_put(variables, replicated(mesh)), max_cav=3,
        data_sharding=batch_sharding(mesh))
    served = runner(batch)["dynamic_seg"]

    assert len(served.sharding.device_set) == 8, served.sharding
    np.testing.assert_allclose(np.asarray(served, np.float32),
                               np.asarray(padded_out, np.float32),
                               atol=2e-4, rtol=1e-3)
