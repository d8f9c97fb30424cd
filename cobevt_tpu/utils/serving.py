"""Serving helpers: agent-count bucketing.

The padded-to-`max_cav` contract keeps training shapes static, but at
inference most cooperative frames carry fewer agents than the pad (OPV2V
averages ~3 of 5); computing the encoder/FAX on padding wastes FLOPs
linearly.  `BucketedRunner` compiles one forward per agent count (XLA
caches each specialization) and dispatches on the actual count —
throughput on typical scenes scales with real agents, not the pad.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


class BucketedRunner:
    """Dispatch cooperative-camera batches to per-agent-count jits."""

    BATCH_AGENT_AXES = {
        "inputs": 1, "intrinsic": 1, "extrinsic": 1,
        "transformation_matrix": 1, "pairwise_t_matrix": 1,
        "agent_mask": 1,
    }

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._fns: Dict[int, callable] = {}

    def _fn(self, n_agents: int):
        if n_agents not in self._fns:
            model = self.model

            @jax.jit
            def run(variables, batch):
                return model.apply(variables, batch, False)

            self._fns[n_agents] = run
        return self._fns[n_agents]

    def _slice(self, batch, n: int):
        out = {}
        for key, value in batch.items():
            axis = self.BATCH_AGENT_AXES.get(key)
            if axis is None:
                out[key] = value
                continue
            sliced = np.asarray(value)
            sliced = np.take(sliced, np.arange(n), axis=axis)
            if key == "pairwise_t_matrix" and sliced.ndim >= 3:
                sliced = np.take(sliced, np.arange(n), axis=axis + 1)
            out[key] = sliced
        return out

    def __call__(self, batch):
        """batch: padded sample dict with `agent_mask`; runs the model on
        exactly the live agents."""
        n = int(np.asarray(batch["agent_mask"]).sum(axis=-1).max())
        n = max(n, 1)
        return self._fn(n)(self.variables, self._slice(batch, n))
