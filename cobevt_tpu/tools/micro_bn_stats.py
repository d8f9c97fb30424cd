"""Micro: BN-stats reductions — XLA convert_reduce vs a Pallas sweep.

Measures whether a Pallas kernel can beat XLA's convert+reduce fusions
(the f32 BatchNorm statistics over bf16 activations that are 34% of the
SinBEVT b8 train step, reference recipe opv2v/opencood train loop) at
the hot shapes from the train trace, NHWC flattened to (R, C).

Result (v5e, 2026-08-19, recorded in docs/DESIGN.md): XLA's isolated
multi-output reduction runs at 650-750 GB/s (~90% of achievable read
bandwidth); the Pallas sweep reaches only 410-440 GB/s (grid overhead +
non-128 lane padding).  The in-model 408 GB/s is fusion/layout context,
not an attackable kernel gap — measured negative, lever closed.

Timing: scan-chained with a max(x, s) perturbation that XLA cannot
factor out of the reduce (and a carry that consumes every output, so
nothing is dead-code-eliminated); two-K differenced.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cobevt_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

f32 = jnp.float32


def pick_rb(R, C, target_bytes=4 << 20):
    rows = max(8, target_bytes // (2 * C) // 8 * 8)
    rb = min(rows, R)
    while R % rb:
        rb -= 8
    return rb


def _fwd_kernel(s_ref, x_ref, sum_ref, sumsq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

    xb = jnp.maximum(x_ref[...], s_ref[0]).astype(f32)
    sum_ref[...] += jnp.sum(xb, axis=0, keepdims=True)
    sumsq_ref[...] += jnp.sum(xb * xb, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("rb",))
def pallas_fwd(x, s, rb):
    R, C = x.shape
    grid = R // rb
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 << 20),
    )(jnp.asarray([s], x.dtype), x)


@jax.jit
def xla_fwd(x, s):
    xf = jnp.maximum(x, s).astype(f32)
    return jnp.sum(xf, axis=0), jnp.sum(xf * xf, axis=0)


def _bwd_kernel(s_ref, dy_ref, x_ref, sdy_ref, sdyx_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sdy_ref[...] = jnp.zeros_like(sdy_ref)
        sdyx_ref[...] = jnp.zeros_like(sdyx_ref)

    dyb = jnp.maximum(dy_ref[...], s_ref[0]).astype(f32)
    xb = x_ref[...].astype(f32)
    sdy_ref[...] += jnp.sum(dyb, axis=0, keepdims=True)
    sdyx_ref[...] += jnp.sum(dyb * xb, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("rb",))
def pallas_bwd(dy, x, s, rb):
    R, C = x.shape
    return pl.pallas_call(
        _bwd_kernel,
        grid=(R // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, C), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, C), f32),
                   jax.ShapeDtypeStruct((1, C), f32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 << 20),
    )(jnp.asarray([s], dy.dtype), dy, x)


@jax.jit
def xla_bwd(dy, x, s):
    dyf = jnp.maximum(dy, s).astype(f32)
    xf = x.astype(f32)
    return jnp.sum(dyf, axis=0), jnp.sum(dyf * xf, axis=0)


def timed_chain(fn, args, K, K_big, n_in):
    """fn(*arrays, s) -> tuple; chain via s."""
    def chain(arrs, length):
        def body(s, _):
            outs = fn(*arrs, s)
            nxt = sum(o.reshape(-1)[0] for o in outs) * 1e-30 - 1e30
            return nxt.astype(arrs[0].dtype), ()
        sK, _ = jax.lax.scan(body, jnp.asarray(-1e30, arrs[0].dtype),
                             None, length=length)
        return sK

    cf = jax.jit(chain, static_argnums=1)

    def t(length):
        float(cf(args, length))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(cf(args, length))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (t(K_big) - t(K)) / (K_big - K)


def main():
    shapes = [((48 * 112 * 240, 144), "sin_stage1"),
              ((48 * 56 * 120, 192), "sin_stage2"),
              ((48 * 28 * 60, 336), "sin_stage3"),
              ((5 * 128 * 128, 128), "corp_layer2")]
    key = jax.random.PRNGKey(0)
    for (R, C), name in shapes:
        rb = pick_rb(R, C)
        x = jax.random.normal(key, (R, C), jnp.bfloat16)
        dy = jax.random.normal(jax.random.PRNGKey(1), (R, C), jnp.bfloat16)
        gb_fwd = R * C * 2 / 1e9
        gb_bwd = 2 * gb_fwd
        # correctness
        pf = pallas_fwd(x, -1e30, rb)
        xf = xla_fwd(x, jnp.asarray(-1e30, x.dtype))
        err = max(float(jnp.max(jnp.abs(pf[0] - xf[0]))) /
                  (float(jnp.max(jnp.abs(xf[0]))) + 1e-9),
                  float(jnp.max(jnp.abs(pf[1] - xf[1]))) /
                  (float(jnp.max(jnp.abs(xf[1]))) + 1e-9))
        pb = pallas_bwd(dy, x, -1e30, rb)
        xb = xla_bwd(dy, x, jnp.asarray(-1e30, x.dtype))
        errb = max(float(jnp.max(jnp.abs(pb[0] - xb[0]))) /
                   (float(jnp.max(jnp.abs(xb[0]))) + 1e-9),
                   float(jnp.max(jnp.abs(pb[1] - xb[1]))) /
                   (float(jnp.max(jnp.abs(xb[1]))) + 1e-9))
        rows = {}
        rows["xla_fwd"] = timed_chain(lambda a, s: xla_fwd(a, s), (x,), 20, 80, 1)
        rows["pl_fwd"] = timed_chain(
            lambda a, s: pallas_fwd(a, s, rb), (x,), 20, 80, 1)
        rows["xla_bwd"] = timed_chain(
            lambda a, b, s: xla_bwd(a, b, s), (dy, x), 20, 80, 2)
        rows["pl_bwd"] = timed_chain(
            lambda a, b, s: pallas_bwd(a, b, s, rb), (dy, x), 20, 80, 2)
        print(f"{name} (R={R}, C={C}, rb={rb}) err_fwd={err:.2e} "
              f"err_bwd={errb:.2e}")
        for k, dt in rows.items():
            gb = gb_fwd if "fwd" in k else gb_bwd
            print(f"  {k:8s} {dt*1e3:7.3f} ms  {gb/dt:7.1f} GB/s")


if __name__ == "__main__":
    main()
