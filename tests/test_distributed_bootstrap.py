"""Multi-host bring-up: detection ladder + single-process no-op.

The real rendezvous needs a pod; here we pin the pure detection logic
(reference contract: opv2v/opencood/tools/multi_gpu_utils.py:16-39) and
that `maybe_initialize_distributed` is a no-op on this single-process
environment — the property every CLI relies on.
"""

import pytest

from cobevt_tpu.parallel.distributed import (
    detect_cluster,
    maybe_initialize_distributed,
)


def test_empty_env_is_single_process():
    assert detect_cluster({}) is None


def test_explicit_env_rendezvous():
    spec = detect_cluster({
        "COBEVT_COORDINATOR": "host0:8476",
        "JAX_NUM_PROCESSES": "4",
        "JAX_PROCESS_ID": "2",
    })
    assert spec.source == "env"
    assert spec.coordinator == "host0:8476"
    assert spec.num_processes == 4
    assert spec.process_id == 2


def test_jax_standard_env_names():
    spec = detect_cluster({
        "JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234",
        "WORLD_SIZE": "2",
        "RANK": "1",
    })
    assert spec.source == "env"
    assert (spec.num_processes, spec.process_id) == (2, 1)


def test_explicit_env_missing_rank_is_loud():
    with pytest.raises(ValueError, match="JAX_PROCESS_ID"):
        detect_cluster({"COBEVT_COORDINATOR": "host0:8476"})


def test_world_size_one_is_single_process():
    assert detect_cluster({
        "COBEVT_COORDINATOR": "host0:8476",
        "WORLD_SIZE": "1", "RANK": "0"}) is None


def test_slurm_autodetect():
    spec = detect_cluster({"SLURM_NTASKS": "8"})
    assert spec.source == "slurm"
    assert spec.coordinator is None     # JAX cluster autodetect fills it
    assert detect_cluster({"SLURM_NTASKS": "1"}) is None


def test_tpu_pod_hostnames():
    spec = detect_cluster({"TPU_WORKER_HOSTNAMES": "t-0,t-1,t-2,t-3"})
    assert spec.source == "tpu_pod"
    assert detect_cluster({"TPU_WORKER_HOSTNAMES": "t-0"}) is None
    assert detect_cluster({"COBEVT_MULTIHOST": "1"}).source == "tpu_pod"


def test_single_process_noop():
    """On this one-process box the bring-up must do nothing and return
    False, leaving process_count() == 1 for the data-sharding path."""
    import jax

    assert maybe_initialize_distributed(env={}) is False
    assert jax.process_count() == 1
