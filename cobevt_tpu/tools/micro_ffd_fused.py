"""Micro: fused PreNorm-FFD (LN -> W1 -> gelu -> W2 -> +residual) with a
recompute custom-VJP Pallas pair, vs XLA autodiff of the same math.

Result (v5e, 2026-08-19, recorded in docs/DESIGN.md): XLA 1.536 ms vs
Pallas 1.545 ms fwd+bwd at the pillar fusion token count (84480 x 256,
mlp 512, bf16) — measured NEUTRAL (0.99x), lever closed: XLA already
fuses the bare FFD chain to its floor.  Kept as the reproducible
protocol; grads match autodiff to ~1e-7 on CPU (--cpu).

Token-blocked: grid walks row blocks; weights resident; weight grads
accumulate into revisited constant-index output blocks.
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
INV_SQRT_2PI = 0.3989422804014327


def _erf_f32(x):
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(t):
    return 0.5 * t * (1.0 + _erf_f32(t * (2.0 ** -0.5)))


def _dgelu(t):
    phi = jnp.exp(-0.5 * t * t) * INV_SQRT_2PI
    return 0.5 * (1.0 + _erf_f32(t * (2.0 ** -0.5))) + t * phi


def _ln_parts(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    r = lax.rsqrt(var + EPS)
    return (xf - mu) * r, r


def _fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, cd):
    xhat, _ = _ln_parts(x_ref[...])
    t = (xhat * g_ref[0][None, :].astype(jnp.float32)
         + b_ref[0][None, :].astype(jnp.float32)).astype(cd)
    h = lax.dot_general(t, w1_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) \
        + b1_ref[0][None, :].astype(jnp.float32)
    a = _gelu(h).astype(cd)
    y = lax.dot_general(a, w2_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) \
        + b2_ref[0][None, :].astype(jnp.float32)
    o_ref[...] = (x_ref[...].astype(jnp.float32) + y).astype(o_ref.dtype)


def _bwd_kernel(x_ref, dy_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, cd):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    gamma = g_ref[0][None, :].astype(jnp.float32)
    xhat, r = _ln_parts(x_ref[...])
    t = (xhat * gamma + b_ref[0][None, :].astype(jnp.float32)).astype(cd)
    h = lax.dot_general(t, w1_ref[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) \
        + b1_ref[0][None, :].astype(jnp.float32)
    a = _gelu(h).astype(cd)

    g_out = dy_ref[...].astype(jnp.float32)
    gc = g_out.astype(cd)
    da = lax.dot_general(gc, w2_ref[...], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dh = (da * _dgelu(h)).astype(cd)
    dt = lax.dot_general(dh, w1_ref[...], (((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32)
    dg_ref[0, :] += jnp.sum(dt * xhat, axis=0).astype(dg_ref.dtype)
    db_ref[0, :] += jnp.sum(dt, axis=0).astype(db_ref.dtype)
    dxhat = dt * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = r * (dxhat - m1 - xhat * m2)
    dx_ref[...] = (g_out + dx_ln).astype(dx_ref.dtype)
    dw2_ref[...] += lax.dot_general(
        a, gc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw2_ref.dtype)
    db2_ref[0, :] += jnp.sum(g_out, axis=0).astype(db2_ref.dtype)
    dw1_ref[...] += lax.dot_general(
        t, dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dw1_ref.dtype)
    db1_ref[0, :] += jnp.sum(dh, axis=0).astype(db1_ref.dtype)


def _pallas_fwd(x, gamma, beta, w1, b1, w2, b2, R, interpret):
    N, D = x.shape
    M = w1.shape[1]
    row = lambda v: v.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cd=x.dtype),
        grid=(N // R,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0)),
                  pl.BlockSpec((D, M), lambda i: (0, 0)),
                  pl.BlockSpec((1, M), lambda i: (0, 0)),
                  pl.BlockSpec((M, D), lambda i: (0, 0)),
                  pl.BlockSpec((1, D), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=interpret,
    )(x, row(gamma), row(beta), w1, row(b1), w2, row(b2))


def _pallas_bwd(x, dy, gamma, beta, w1, b1, w2, R, interpret):
    N, D = x.shape
    M = w1.shape[1]
    row = lambda v: v.reshape(1, -1)
    cst = lambda shp: pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cd=x.dtype),
        grid=(N // R,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0)),
                  cst((1, D)), cst((1, D)), cst((D, M)), cst((1, M)),
                  cst((M, D))],
        out_specs=[pl.BlockSpec((R, D), lambda i: (i, 0)),
                   cst((8, D)), cst((8, D)), cst((D, M)), cst((8, M)),
                   cst((M, D)), cst((8, D))],
        out_shape=[jax.ShapeDtypeStruct((N, D), x.dtype),
                   jax.ShapeDtypeStruct((8, D), jnp.float32),
                   jax.ShapeDtypeStruct((8, D), jnp.float32),
                   jax.ShapeDtypeStruct((D, M), jnp.float32),
                   jax.ShapeDtypeStruct((8, M), jnp.float32),
                   jax.ShapeDtypeStruct((M, D), jnp.float32),
                   jax.ShapeDtypeStruct((8, D), jnp.float32)],
        interpret=interpret,
    )(x, dy, row(gamma), row(beta), w1, row(b1), w2)
    dx, dg, db, dw1, db1, dw2, db2 = outs
    return (dx, dg[0], db[0], dw1, db1[0], dw2, db2[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_ffd(x, gamma, beta, w1, b1, w2, b2, R, interpret):
    return _pallas_fwd(x, gamma, beta, w1, b1, w2, b2, R, interpret)


def fused_ffd_fwd(x, gamma, beta, w1, b1, w2, b2, R, interpret):
    out = _pallas_fwd(x, gamma, beta, w1, b1, w2, b2, R, interpret)
    return out, (x, gamma, beta, w1, b1, w2)


def fused_ffd_bwd(R, interpret, res, g):
    x, gamma, beta, w1, b1, w2 = res
    dx, dg, db, dw1, db1, dw2, db2 = _pallas_bwd(
        x, g, gamma, beta, w1, b1, w2, R, interpret)
    return (dx, dg.astype(gamma.dtype), db.astype(beta.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b1.dtype))


fused_ffd.defvjp(fused_ffd_fwd, fused_ffd_bwd)


def ref_ffd(x, gamma, beta, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    t = ((xf - mu) * lax.rsqrt(var + EPS) * gamma + beta).astype(x.dtype)
    h = (t @ w1).astype(jnp.float32) + b1
    a = (0.5 * h * (1.0 + lax.erf(h * 2 ** -0.5))).astype(x.dtype)
    y = (a @ w2).astype(jnp.float32) + b2
    return (xf + y).astype(x.dtype)


def main():
    import sys
    on_cpu = "--cpu" in sys.argv
    if on_cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.RandomState(0)
    if on_cpu:
        N, D, M, R = 1024, 256, 512, 256
        dt = jnp.float32
    else:
        N, D, M, R = 84480, 256, 512, 960
        dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(N, D) * 0.3, dt)
    gamma = jnp.asarray(rng.rand(D) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(D, M) * 0.05, dt)
    b1 = jnp.asarray(rng.randn(M) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(M, D) * 0.05, dt)
    b2 = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)
    args = (x, gamma, beta, w1, b1, w2, b2)

    def loss_f(*a):
        return (fused_ffd(*a, R, on_cpu).astype(jnp.float32) ** 2).sum()

    def loss_r(*a):
        return (ref_ffd(*a).astype(jnp.float32) ** 2).sum()

    # parity
    of = fused_ffd(*args, R, on_cpu)
    orf = ref_ffd(*args)
    print("fwd max rel:", float(jnp.max(jnp.abs(
        of.astype(jnp.float32) - orf.astype(jnp.float32)) /
        (jnp.abs(orf.astype(jnp.float32)) + 1e-3))))
    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ["dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2"]
    for n, a, b in zip(names, gf, gr):
        rel = float(jnp.linalg.norm((a - b).astype(jnp.float32)) /
                    (jnp.linalg.norm(b.astype(jnp.float32)) + 1e-9))
        print(f"  {n:7s} rel {rel:.2e}")
    if on_cpu:
        return

    # timing: fused vs XLA autodiff of the same math
    def timed(lossfn, iters=8):
        def chain(x0, length):
            def body(z, _):
                g = jax.grad(lossfn, argnums=0)(
                    z, gamma, beta, w1, b1, w2, b2)
                return z + 1e-12 * g, ()
            zK, _ = lax.scan(body, x0, None, length=length)
            return zK.sum()
        cf = jax.jit(chain, static_argnums=1)

        def run(length):
            float(cf(x, length))
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                float(cf(x * (1.0 + 1e-3 * i), length))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))
        return (run(3 * iters) - run(iters)) / (2 * iters)

    dt_x = timed(loss_r)
    dt_p = timed(loss_f)
    print(f"xla  fwd+bwd: {dt_x*1e3:.3f} ms")
    print(f"pallas fwd+bwd: {dt_p*1e3:.3f} ms  ({dt_x/dt_p:.2f}x)")


if __name__ == "__main__":
    main()
