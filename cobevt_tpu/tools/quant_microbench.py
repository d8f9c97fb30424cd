"""int8-vs-bf16 microbenchmark at the flagship's hot matmul shapes.

The MXU's int8 path doubles peak throughput (v5e: 394 TOPS int8 vs 197
TFLOP/s bf16), making post-training quantization the one major TPU
serving lever not yet exercised.  Before wiring quantization through the
models, this measures whether int8 actually wins at OUR shapes — the
measured cost model says several hot convs are window-walk- or
HBM-bound, where int8's extra quantize/rescale traffic can erase the
MXU gain.  Results (positive or negative) go to docs/DESIGN.md.

Shapes measured (from the CorpBEVT/SinBEVT profiles, docs/DESIGN.md):
  * ResNet34 layer2-4 stride-1 3x3 convs at 20x(64..16)^2, C 128..512
    (the fused-conv kernel's domain)
  * FAX QKV / O-proj / MLP dense shapes (tokens x dim @ dim x dim)

Timing: scan-chain protocol (see bench.py) — K chained iterations with
true data deps inside one jit; tunnel-safe.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def chain_time(fn, x, K_small=50, K_big=2050, repeats=5):
    """Per-iteration seconds of y <- fn(y-ish), fixed-cost-free.

    A single chained call carries a fixed cost (tunnel round-trip ~25 ms
    + dispatch) that at any practical K swamps a microsecond-scale op —
    dividing one chain's wall time by K yields a floor of ~25ms/K per
    iteration, not the op cost.  Timing the SAME chain at two lengths
    and differencing removes the fixed cost exactly:
        per_iter = (t(K_big) - t(K_small)) / (K_big - K_small)
    """
    import jax
    import jax.numpy as jnp

    def chain(x0, length):
        def body(c, _):
            y = fn(c)
            # fold the output back into the carry so iterations chain
            c2 = (c * 0.999 + 0.001 * jnp.mean(y).astype(c.dtype))
            return c2, ()
        cK, _ = jax.lax.scan(body, x0, None, length=length)
        return cK.sum()

    def timed(length):
        cf = jax.jit(chain, static_argnums=1)
        float(cf(x, length))                      # compile + warmup
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            float(cf(x * (1.0 + 0.001 * i), length))
            times.append(time.perf_counter() - t0)
        # min-of-repeats: tunnel noise is one-sided additive, so the
        # fastest run is the best estimate of the true cost
        return float(np.min(times))

    t_small, t_big = timed(K_small), timed(K_big)
    return max(t_big - t_small, 1e-9) / (K_big - K_small)


def bench_dot(M, K_, N):
    """bf16 vs int8 (dynamic act quant + per-channel weight scales)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K_).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K_, N).astype(np.float32), jnp.bfloat16)
    # offline per-channel weight quantization
    s_w = jnp.max(jnp.abs(w).astype(jnp.float32), axis=0) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w[None, :]),
                   -127, 127).astype(jnp.int8)

    def f_bf16(a):
        return jax.lax.dot(a, w)

    def f_int8(a):
        # dynamic per-tensor activation scale (one VPU reduce)
        s_a = jnp.max(jnp.abs(a).astype(jnp.float32)) / 127.0
        a_q = jnp.clip(jnp.round(a.astype(jnp.float32) / s_a),
                       -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            a_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s_a * s_w)[None, :]
                ).astype(jnp.bfloat16)

    def f_int8_static(a):
        # pre-quantized activations: isolates the pure matmul gain
        a_q = a.astype(jnp.int8)
        acc = jax.lax.dot_general(
            a_q, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc

    t_b = chain_time(f_bf16, x)
    t_q = chain_time(f_int8, x)
    t_s = chain_time(f_int8_static, x)
    return {"shape": f"{M}x{K_}@{K_}x{N}",
            "bf16_us": round(t_b * 1e6, 2),
            "int8_dyn_us": round(t_q * 1e6, 2),
            "int8_pure_us": round(t_s * 1e6, 2),
            "speedup_dyn": round(t_b / t_q, 3),
            "speedup_pure": round(t_b / t_s, 3)}


def bench_conv(N, H, W, C, O):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, C).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, C, O).astype(np.float32),
                    jnp.bfloat16)
    s_w = jnp.max(jnp.abs(w).astype(jnp.float32), axis=(0, 1, 2)) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127,
                   127).astype(jnp.int8)

    def f_bf16(a):
        return lax.conv_general_dilated(
            a, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def f_int8(a):
        s_a = jnp.max(jnp.abs(a).astype(jnp.float32)) / 127.0
        a_q = jnp.clip(jnp.round(a.astype(jnp.float32) / s_a),
                       -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            a_q, w_q, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (s_a * s_w)
                ).astype(jnp.bfloat16)

    t_b = chain_time(f_bf16, x)
    t_q = chain_time(f_int8, x)
    return {"shape": f"conv3x3 {N}x{H}x{W}x{C}->{O}",
            "bf16_us": round(t_b * 1e6, 2),
            "int8_dyn_us": round(t_q * 1e6, 2),
            "speedup_dyn": round(t_b / t_q, 3)}


def main():
    p = argparse.ArgumentParser("int8 microbench")
    p.add_argument("--quick", action="store_true")
    opt = p.parse_args()
    import jax

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    results = []
    # FAX/fusion dense shapes (tokens x dim): BEV 64^2 queries dim 128,
    # QKV 128->384-ish, MLP 128->256->128 at window token counts
    for (M, K_, N) in [(4096, 128, 384), (4096, 128, 256),
                       (4096, 256, 128), (81920, 128, 128)]:
        results.append(bench_dot(M, K_, N))
        print(json.dumps(results[-1]), flush=True)
    if not opt.quick:
        # ResNet34 layer2-4 stride-1 blocks at corpbevt shapes (N=20)
        for (H, W, C, O) in [(64, 64, 128, 128), (32, 32, 256, 256),
                             (16, 16, 512, 512)]:
            results.append(bench_conv(20, H, W, C, O))
            print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
