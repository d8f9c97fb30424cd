"""Executed 2-process rendezvous (VERDICT r4 #2).

`test_distributed_bootstrap.py` pins the detection ladder; this test
actually RUNS ``jax.distributed.initialize`` across two local CPU
subprocesses — coordinator + client handshake, global 4-device mesh over
2 processes, per-host sharded loading, global-batch assembly, and one
data-parallel CorpBEVT train step — then asserts loss parity with a
single-process run of the identical step.  This is the executable
analogue of the reference's multi-GPU launch
(opv2v/opencood/tools/multi_gpu_utils.py:16-39 env rendezvous +
init_process_group; DistributedSampler at train_camera.py:52-60).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_rendezvous_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        env = os.environ.copy()
        env.pop("JAX_PLATFORMS", None)
        # 2 virtual CPU devices per process -> 4 global
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["COBEVT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        out = tmp_path / f"rank{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(out)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    logs = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(f"--- rank {pid} (rc={p.returncode}) ---\n{stdout}")
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    results = [json.loads(o.read_text()) for o in outs]
    for pid, r in enumerate(results):
        assert r["process_id"] == pid
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["local_device_count"] == 2
    # both ranks observed the same (psum-reduced) global loss
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"],
                               rtol=1e-6)

    # parity vs a single-process run of the identical step on the
    # identical global batch (this pytest process: 8-device CPU backend)
    import jax

    import test_train_multichip as tiny

    from cobevt_tpu.models.corpbevt import CorpBEVT
    from cobevt_tpu.train import (
        cosine_warmup_schedule,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    model = CorpBEVT(tiny.tiny_config())
    batch = tiny.tiny_batch(B=4)
    tx = make_optimizer(cosine_warmup_schedule(2e-4, 2e-5, 10, 100),
                        weight_decay=1e-2, eps=1e-10)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, tiny.make_criterion(), donate=False)
    _, logs_1 = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(results[0]["loss"], float(logs_1["loss"]),
                               rtol=1e-4)
