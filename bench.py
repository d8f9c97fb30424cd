"""Benchmark: BEV frames/sec on one TPU chip.

Headline metric matches the BASELINE.md north-star protocol — single-
vehicle 6-camera nuScenes SinBEVT (224x480 images, BEV 200^2, bf16,
batch 1) with target >= 30 frames/sec/chip.  The cooperative flagship
(CorpBEVT: 5 agents x 4 cameras x 512^2 -> fused BEV 256^2) is measured
too and reported on stderr.

Timing protocol mirrors the reference harness
(nuscenes/scripts/benchmark.py:44-55) but chains K forwards inside one
jitted `lax.scan` with true data dependencies and fetches a scalar:
remote-TPU tunnels can elide repeated identical dispatches and make
`block_until_ready` unreliable, and the chain defeats both.  The chain
is timed at two lengths and differenced, which removes the fixed
per-call cost (tunnel round-trip + dispatch) exactly — see measure().

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def measure(model, batch, chain_key, K=10, K_big=60, repeats=3):
    """Steady-state per-frame time, fixed-cost-free.

    A single chained call carries a fixed cost (tunnel round-trip
    ~25 ms + dispatch) that dividing by K only amortizes, never removes
    — at K=10 it inflates per-frame time by ~2.5 ms, at K=50 by
    ~0.5 ms.  Timing the SAME chain at two lengths and differencing
    removes it exactly:  dt = (t(K_big) - t(K)) / (K_big - K).
    This is the per-frame cost under back-to-back serving, which is
    what frames/sec means; the fixed cost is reported by the serving
    CLI's per-frame latency percentiles instead."""
    import jax

    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch, False)

    def chain(v, b, length):
        def body(x, _):
            out = model.apply(v, dict(b, **{chain_key: x}), False)
            leaf = jax.tree.leaves(out)[0]
            return x + 1e-12 * leaf.mean().astype(x.dtype), ()
        xK, _ = jax.lax.scan(body, b[chain_key], None, length=length)
        return xK.sum()

    chain_fn = jax.jit(chain, static_argnums=2)

    def timed(length):
        float(chain_fn(variables, batch, length))   # compile + warmup
        times = []
        for i in range(repeats):
            b2 = dict(batch, **{chain_key: batch[chain_key] *
                                (1.0 + 0.001 * (i + 1))})
            t0 = time.perf_counter()
            float(chain_fn(variables, b2, length))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_small, t_big = timed(K), timed(K_big)
    return (t_big - t_small) / (K_big - K), variables


def main():
    import jax
    import jax.numpy as jnp

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    from cobevt_tpu.tools.benchmark import (
        build_corpbevt,
        build_pointpillar,
        build_sinbevt_nuscenes,
    )

    from cobevt_tpu.utils.flops import compiled_costs, utilization

    def fwd_util(model, variables, batch, dt):
        costs = compiled_costs(
            jax.jit(lambda v, b: model.apply(v, b, False)),
            variables, batch)
        return utilization(costs, dt)

    # headline: the BASELINE protocol (6-cam nuScenes SinBEVT)
    model, batch, key = build_sinbevt_nuscenes(True, None)
    dt, variables = measure(model, batch, key, K=10, K_big=60)
    headline = {
        "metric": "sinbevt_nuscenes_6cam_frames_per_sec_per_chip",
        "value": round(1.0 / dt, 3),
        "unit": "frames/s",
        **fwd_util(model, variables, batch, dt),
        "vs_baseline": round((1.0 / dt) / 30.0, 3),
    }

    # secondary: the cooperative flagship (5 agents x 4 cams x 512^2)
    try:
        model_c, batch_c, key_c = build_corpbevt(True, 5)
        dt_c, variables_c = measure(model_c, batch_c, key_c, K=10, K_big=60)
        print(json.dumps({
            "metric": "corpbevt_5agent_frames_per_sec_per_chip",
            "value": round(1.0 / dt_c, 3),
            "unit": "frames/s",
            **fwd_util(model_c, variables_c, batch_c, dt_c),
            "vs_baseline": round((1.0 / dt_c) / 30.0, 3),
        }), file=sys.stderr)
        # BASELINE.md tracked metric: end-to-end cooperative latency.
        # Named for what it is: the steady-state mean per-frame time of
        # the FULL cooperative forward (two-K differenced scan chain) —
        # not a per-frame p50 distribution (the serving CLI
        # `tools/serve_camera.py --report` computes real percentiles,
        # including the fixed dispatch cost) and not the fusion stage
        # alone.
        print(json.dumps({
            "metric": "corpbevt_5agent_mean_frame_latency_ms",
            "value": round(dt_c * 1000.0, 3),
            "unit": "ms",
            "note": "steady-state mean of full cooperative forward",
            "vs_baseline": round((1000.0 / 30.0) / (dt_c * 1000.0), 3),
        }), file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"corpbevt secondary bench failed: {e}", file=sys.stderr)

    # int8 serving mode (COBEVT_INT8=1): the lossy PTQ path, accuracy-
    # gated by tools/validate_kernels.py (argmax-IoU proxy >= 0.99 vs
    # bf16, KERNELS_r05).  Trace-time flag: set before the fresh jit.
    try:
        import os

        os.environ["COBEVT_INT8"] = "1"
        try:
            model_q, batch_q, key_q = build_corpbevt(True, 5)
            dt_q, variables_q = measure(model_q, batch_q, key_q,
                                        K=10, K_big=60)
        finally:
            os.environ.pop("COBEVT_INT8", None)
        print(json.dumps({
            "metric": "corpbevt_5agent_int8_frames_per_sec_per_chip",
            "value": round(1.0 / dt_q, 3),
            "unit": "frames/s",
            "note": "COBEVT_INT8=1 PTQ serving mode; argmax-IoU proxy "
                    "gated >= 0.99 (KERNELS_r05.json)",
            "vs_baseline": round((1.0 / dt_q) / 30.0, 3),
        }), file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"corpbevt int8 bench failed: {e}", file=sys.stderr)

    # tertiary: the cooperative LiDAR flagship (BASELINE config #4,
    # 5-agent PointPillar + FuseBEVT at production scale) — tracked as a
    # driver artifact, not just a README claim
    try:
        model_p, batch_p, key_p = build_pointpillar(True, 5)
        dt_p, variables_p = measure(model_p, batch_p, key_p, K=10, K_big=60)
        print(json.dumps({
            "metric": "pointpillar_5agent_frames_per_sec_per_chip",
            "value": round(1.0 / dt_p, 3),
            "unit": "frames/s",
            **fwd_util(model_p, variables_p, batch_p, dt_p),
            "vs_baseline": round((1.0 / dt_p) / 30.0, 3),
        }), file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"pointpillar tertiary bench failed: {e}", file=sys.stderr)

    print(json.dumps(headline))


if __name__ == "__main__":
    main()
