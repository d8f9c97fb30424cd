"""Agent-count bucketing: sliced forward agrees with the padded one."""

import numpy as np
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
