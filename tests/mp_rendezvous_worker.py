"""Subprocess worker for test_multiprocess_rendezvous — NOT a test module.

Runs as one rank of a 2-process CPU rendezvous: detects the explicit-env
cluster (COBEVT_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
reference's MASTER_ADDR/WORLD_SIZE/RANK contract,
opv2v/opencood/tools/multi_gpu_utils.py:16-39), executes
``jax.distributed.initialize`` for real, loads its host shard through the
production DataLoader branch, assembles the global batch, and runs one
data-parallel CorpBEVT train step over the global 4-device mesh.
"""

import json
import os
import sys


def main():
    out_path = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS; force the CPU backend
    # through the config API before any backend/distributed init
    jax.config.update("jax_platforms", "cpu")

    from cobevt_tpu.parallel import (
        global_batch_from_local,
        make_mesh,
        maybe_initialize_distributed,
        replicate_to_mesh,
    )

    assert maybe_initialize_distributed() is True, "rendezvous not detected"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    # shared tiny-model fixtures from the multichip test module
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mp_tiny", os.path.join(repo, "tests", "test_train_multichip.py"))
    tiny = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tiny)

    import numpy as np

    from cobevt_tpu.data.loader import DataLoader
    from cobevt_tpu.models.corpbevt import CorpBEVT
    from cobevt_tpu.train import (
        cosine_warmup_schedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = CorpBEVT(tiny.tiny_config())
    # deterministic global batch (seed 0) — both ranks see the same one
    global_batch = {k: np.asarray(v)
                    for k, v in tiny.tiny_batch(B=4).items()}

    class _DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {k: v[i] for k, v in global_batch.items()}

        @staticmethod
        def collate(samples):
            return {k: np.stack([s[k] for s in samples])
                    for k in samples[0]}

    # the real per-host sharded loading branch (train_camera.py wiring)
    loader = DataLoader(_DS(), batch_size=2, shuffle=False,
                        num_shards=jax.process_count(),
                        shard_index=jax.process_index())
    assert len(loader) == 1
    local = next(iter(loader))
    lo = 2 * jax.process_index()
    np.testing.assert_array_equal(local["inputs"],
                                  global_batch["inputs"][lo:lo + 2])

    mesh = make_mesh(n_data=4, n_model=1)
    tx = make_optimizer(cosine_warmup_schedule(2e-4, 2e-5, 10, 100),
                        weight_decay=1e-2, eps=1e-10)
    # same PRNGKey on every rank -> bit-identical init (seed sync)
    state = replicate_to_mesh(mesh, create_train_state(model, tx, local))
    batch = global_batch_from_local(mesh, local)

    step = make_train_step(model, tiny.make_criterion(), donate=False)
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    loss = float(logs["loss"])          # fully-replicated global scalar
    assert np.isfinite(loss), loss
    assert int(jax.device_get(new_state.step)) == 1

    with open(out_path, "w") as f:
        json.dump({
            "process_id": jax.process_index(),
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "local_device_count": jax.local_device_count(),
            "loss": loss,
        }, f)


if __name__ == "__main__":
    main()
