"""Multi-host bring-up: the JAX distributed-runtime rendezvous.

TPU-native replacement for the reference's NCCL process-group bootstrap
(opv2v/opencood/tools/multi_gpu_utils.py:16-39: env/SLURM rendezvous +
``torch.distributed.init_process_group``).  On JAX the analogue is
``jax.distributed.initialize`` — after it runs, ``jax.devices()`` spans
every host's chips and one sharded-jit program per host drives the whole
pod; there is no user-visible communicator.

Detection ladder (first match wins; see `detect_cluster`):

  1. Explicit env: ``COBEVT_COORDINATOR`` (or the JAX-standard
     ``JAX_COORDINATOR_ADDRESS``) + ``JAX_NUM_PROCESSES`` +
     ``JAX_PROCESS_ID`` — mirrors the reference's
     MASTER_ADDR/WORLD_SIZE/RANK contract.
  2. SLURM: ``SLURM_NTASKS > 1`` — JAX's built-in cluster autodetect
     resolves coordinator/rank from the SLURM env (the reference's
     ``--launcher slurm`` path).
  3. TPU pod: ``TPU_WORKER_HOSTNAMES`` listing >1 hosts, or
     ``COBEVT_MULTIHOST=1`` to force autodetect on platforms that
     publish pod metadata another way.

Anything else is a single-process run and the bring-up is a NO-OP —
``jax.process_count() == 1`` and every CLI behaves exactly as before.
The train CLIs call `maybe_initialize_distributed()` first thing; the
per-host data sharding downstream already keys off
``jax.process_count()/process_index()``.

Launch recipe (documented in README):

  # SLURM, one process per host
  srun --ntasks-per-node=1 python -m cobevt_tpu.tools.train_camera ...
  # explicit rendezvous, torchrun-style
  COBEVT_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
      python -m cobevt_tpu.tools.train_camera ...
  # Cloud TPU pod slice (one process per host, launched by the platform)
  COBEVT_MULTIHOST=1 python -m cobevt_tpu.tools.train_camera ...
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Optional


@dataclasses.dataclass(frozen=True)
class ClusterSpec:
    """How to initialize the distributed runtime.

    ``coordinator/num_processes/process_id`` of None means "let JAX's
    cluster autodetect fill it in" (SLURM / TPU-pod metadata)."""

    source: str                       # "env" | "slurm" | "tpu_pod"
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def detect_cluster(env: Mapping[str, str]) -> Optional[ClusterSpec]:
    """Pure detection over an env mapping; None means single-process."""
    coord = env.get("COBEVT_COORDINATOR") or env.get(
        "JAX_COORDINATOR_ADDRESS")
    if coord:
        nproc = env.get("JAX_NUM_PROCESSES") or env.get("WORLD_SIZE")
        pid = env.get("JAX_PROCESS_ID") or env.get("RANK")
        if nproc is None or pid is None:
            raise ValueError(
                "COBEVT_COORDINATOR set but JAX_NUM_PROCESSES / "
                "JAX_PROCESS_ID (or WORLD_SIZE / RANK) missing — the "
                "explicit rendezvous needs all three "
                "(reference contract: multi_gpu_utils.py:16-39)")
        if int(nproc) <= 1:
            return None
        return ClusterSpec("env", coord, int(nproc), int(pid))

    ntasks = env.get("SLURM_NTASKS") or env.get("SLURM_NPROCS")
    if ntasks and int(ntasks) > 1:
        # JAX's SlurmCluster autodetect derives coordinator + rank.
        return ClusterSpec("slurm")

    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return ClusterSpec("tpu_pod")
    if env.get("COBEVT_MULTIHOST") == "1":
        return ClusterSpec("tpu_pod")
    return None


_INITIALIZED = False


def maybe_initialize_distributed(env: Optional[Mapping[str, str]] = None,
                                 verbose: bool = True) -> bool:
    """Initialize ``jax.distributed`` iff a multi-process launch is
    detected.  Idempotent; no-op (returns False) for single-process runs
    so every CLI works unchanged on one host."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    spec = detect_cluster(os.environ if env is None else env)
    if spec is None:
        return False

    import jax

    kwargs = {}
    if spec.coordinator is not None:
        kwargs = dict(coordinator_address=spec.coordinator,
                      num_processes=spec.num_processes,
                      process_id=spec.process_id)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    if verbose:
        print(f"[distributed] initialized via {spec.source}: "
              f"process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    return True
