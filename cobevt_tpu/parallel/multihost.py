"""Multi-process array assembly: host-local shards -> global jax.Arrays.

In a multi-process launch (after ``jax.distributed.initialize`` via
`parallel.distributed`) every process loads only its shard of the batch
(`data.loader.DataLoader(num_shards=process_count, shard_index=
process_index)`), but the sharded-jit train step consumes *global*
arrays laid out over the whole mesh.  These helpers bridge the two: each
process contributes its local rows and gets back a global ``jax.Array``
whose addressable shards live on its own devices — the TPU-native
replacement for the reference's DistributedSampler + DDP allreduce
contract (opv2v/opencood/tools/multi_gpu_utils.py:16-39, the per-rank
sampler at train_camera.py:52-60).

Single-process runs degrade to plain `device_put`, so callers can use
these unconditionally.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_local(mesh: Mesh, local_batch, spec: P = P("data")):
    """Assemble a global batch from each process's local shard.

    ``local_batch`` holds this process's rows only (leading axis =
    global_B / process_count, matching the DataLoader's contiguous
    shard-by-host split); the returned arrays are global, sharded over
    ``spec`` (default: batch axis over the "data" mesh axis)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding),
                            local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch)


def replicate_to_mesh(mesh: Mesh, pytree):
    """Fully replicate a host pytree (params / optimizer state) over a
    possibly multi-process mesh.  Every process must pass bit-identical
    values (same-PRNG-key init gives this for free — the seed-sync the
    reference does with an explicit broadcast)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), pytree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        pytree)
