"""Serving helpers: agent-count bucketing.

The padded-to-`max_cav` contract keeps training shapes static, but at
inference most cooperative frames carry fewer agents than the pad (OPV2V
averages ~3 of 5); computing the encoder/FAX on padding wastes FLOPs
linearly.  `BucketedRunner` compiles one forward per agent count (XLA
caches each specialization) and dispatches on the actual count —
throughput on typical scenes scales with real agents, not the pad.

Exactness: the reference's fusion head averages over *max_cav* rows
(swap_fusion_modules.py:275-281), and padded query rows are nonzero
after masked attention (they attend to live keys) — so simply slicing
the whole graph to n agents changes the output unless the model uses
`fusion_mean_over_valid`.  `StagedBucketedRunner` is exact for the
reference-parity default: it buckets only the per-agent stages
(encoder -> FAX -> compressor, ~90% of the FLOPs), zero-pads the agent
BEV maps back to max_cav, and runs warp/fusion/decoder at full width —
the fusion input is bit-identical to a full padded run.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


class BucketedRunner:
    """Dispatch cooperative-camera batches to per-agent-count jits.

    Exact when the model's fusion averages over valid agents only
    (`fusion_mean_over_valid=True`); for the reference-parity default
    use `StagedBucketedRunner`."""

    BATCH_AGENT_AXES = {
        "inputs": 1, "intrinsic": 1, "extrinsic": 1,
        "transformation_matrix": 1, "pairwise_t_matrix": 1,
        "agent_mask": 1,
    }

    def __init__(self, model, variables, data_sharding=None):
        """`data_sharding`: optional `jax.sharding.NamedSharding` (batch
        axis over a mesh's "data" axis) for data-parallel serving — every
        sliced batch is placed with it, so the per-agent-count jits run
        sharded over the mesh instead of on device 0.  Pass variables
        already placed (replicated) on the same mesh."""
        self.model = model
        self.variables = variables
        self.data_sharding = data_sharding
        self._fns: Dict[int, callable] = {}

    def _place(self, value):
        if self.data_sharding is None:
            return value
        return jax.device_put(value, self.data_sharding)

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
        return {k: self._place(v) for k, v in out.items()}

    def __call__(self, batch):
        """batch: padded sample dict with `agent_mask`; runs the model on
        exactly the live agents."""
        n = int(np.asarray(batch["agent_mask"]).sum(axis=-1).max())
        n = max(n, 1)
        return self._fn(n)(self.variables, self._slice(batch, n))


class StagedBucketedRunner(BucketedRunner):
    """Exact agent-count bucketing for staged models (CorpBEVT).

    Per-agent stages (encoder -> FAX -> compressor) run on exactly the
    live agents; their BEV maps are zero-padded back to max_cav and the
    cooperative tail (warp -> mask -> fusion -> decoder -> head) runs at
    full width with the original padded transforms/mask — bit-identical
    to the full padded forward for ANY fusion-mean semantics, including
    the reference's mean-over-max_cav."""

    def __init__(self, model, variables, max_cav: int, data_sharding=None):
        super().__init__(model, variables, data_sharding=data_sharding)
        self.max_cav = max_cav
        self._enc_fns: Dict[int, callable] = {}
        model_ = model

        @jax.jit
        def fuse(variables, batch, agent_bev):
            return model_.apply(variables, batch, False, stage="fuse",
                                agent_bev=agent_bev)

        self._fuse = fuse

    def _enc(self, n_agents: int):
        if n_agents not in self._enc_fns:
            model = self.model

            @jax.jit
            def encode(variables, batch):
                return model.apply(variables, batch, False,
                                   stage="encode")

            self._enc_fns[n_agents] = encode
        return self._enc_fns[n_agents]

    def __call__(self, batch):
        n = int(np.asarray(batch["agent_mask"]).sum(axis=-1).max())
        n = max(n, 1)
        agent_bev = self._enc(n)(self.variables, self._slice(batch, n))
        pad = self.max_cav - n
        if pad:
            agent_bev = self._place(
                np.pad(np.asarray(agent_bev),
                       ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))))
        fuse_batch = {k: self._place(batch[k])
                      for k in ("transformation_matrix", "agent_mask")}
        return self._fuse(self.variables, fuse_batch, agent_bev)
