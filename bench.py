"""Benchmark: CoBEVT flagship forward throughput on one TPU chip.

Protocol mirrors the reference latency harness
(nuscenes/scripts/benchmark.py:44-55: mean latency over timed batch-1
forwards, device-synchronized) with `jax.block_until_ready` in place of
`torch.cuda.synchronize()`.  One "frame" here is a full 5-agent x 4-camera
512x512 cooperative sample through CorpBEVT (BEV 256^2) in bf16 — i.e.
20 cameras per frame vs the baseline protocol's 6.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.md north star = 30 BEV frames/sec/chip.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from cobevt_tpu.configs import corpbevt_default
    from cobevt_tpu.models.corpbevt import CorpBEVT

    cfg = corpbevt_default(max_cav=5)
    model = CorpBEVT(cfg, dtype=jnp.bfloat16)

    B, L, M, img = 1, cfg.max_cav, 4, 512
    rng = np.random.RandomState(0)
    intrinsic = np.zeros((B, L, M, 3, 3), np.float32)
    intrinsic[..., 0, 0] = 460.0
    intrinsic[..., 1, 1] = 460.0
    intrinsic[..., 0, 2] = img / 2
    intrinsic[..., 1, 2] = img / 2
    intrinsic[..., 2, 2] = 1.0
    batch = {
        "inputs": jnp.asarray(rng.rand(B, L, M, img, img, 3), jnp.float32),
        "intrinsic": jnp.asarray(intrinsic),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }

    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch, False)

    # Timing protocol: chain K forwards inside one jitted lax.scan with a
    # true data dependency between iterations (each frame's input is
    # perturbed by the previous output), then fetch a scalar.  This
    # defeats dispatch memoization/elision in remote-TPU tunnels where
    # `block_until_ready` is unreliable, and amortizes the host round
    # trip over K frames.
    K = 10

    def chain(v, b):
        def body(x, _):
            out = model.apply(v, dict(b, inputs=x), False)
            x2 = x + 1e-12 * out["dynamic_seg"].mean().astype(x.dtype)
            return x2, ()
        xK, _ = jax.lax.scan(body, b["inputs"], None, length=K)
        return xK.sum()

    chain_fn = jax.jit(chain)
    float(chain_fn(variables, batch))        # compile + warmup

    times = []
    for i in range(3):
        b2 = dict(batch, inputs=batch["inputs"] * (1.0 + 0.001 * (i + 1)))
        t0 = time.perf_counter()
        float(chain_fn(variables, b2))       # scalar fetch forces completion
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / K

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "corpbevt_5agent_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
