"""Micro: CorpBEVT stem maxpool backward — select-and-scatter vs argmax routing.

Result (v5e, 2026-08-19, recorded in docs/DESIGN.md): XLA
select-and-scatter 3.99 ms vs argmax-routed 55.7 ms fwd+bwd — the
scatter-free formulation materializes a 9-tap stack the fused composite
never writes.  Measured 14x NEGATIVE, lever closed; kept as the
reproducible protocol (grad parity is exact, incl. tie-heavy inputs).

Shape: the ResNet stem pool at bench scale — (20, 128, 128, 64) out of
(20, 256, 256, 64), 3x3 stride 2 SAME (torch MaxPool2d(3,2,1)).

A. XLA composite: jax.grad through lax.reduce_window max (lowers the
   backward to select-and-scatter — 1.7 ms/step in the r04 train trace).
B. Argmax-routing pair: forward computes max AND the winning tap index
   via an iota-encoded reduce (exact first-match tie-break), backward
   routes dY to the winner with 9 masked pad-adds (no scatter).
Both formulations are mathematically the gradient of the same pool;
tie-breaking picks the first window position, matching
select-and-scatter's order.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, W, C = 20, 256, 256, 64


def pool_xla(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def pool_argmax_fwd(x):
    """max + winner tap index, one fused reduce over an (value, -idx)
    lexicographic pair packed into f32 via scaled-iota tricks is
    fragile; use 9 shifted compares instead (still no scatter)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    Ho, Wo = H // 2, W // 2
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(jax.lax.slice(
                xp, (0, dy, dx, 0), (B, dy + H - 1, dx + W - 1, C),
                (1, 2, 2, 1)))
    stack = jnp.stack(taps, axis=0)                 # (9, B, Ho, Wo, C)
    out = stack.max(axis=0)
    win = jnp.argmax(stack == out[None], axis=0).astype(jnp.int8)
    return out, win


@jax.custom_vjp
def pool_routed(x):
    return pool_xla(x)


def pool_routed_fwd(x):
    out, win = pool_argmax_fwd(x)
    return out, win


def pool_routed_bwd(win, g):
    # pure pad-adds: interior padding un-strides, low/high padding
    # places the tap offset, negative high padding truncates — no
    # scatter anywhere.  Output region is rows/cols [1, H] of the
    # (H+2) padded frame, i.e. low offset dy-1 relative to dX.
    dx_acc = jnp.zeros((B, H, W, C), g.dtype)
    for t in range(9):
        dy, dxo = t // 3, t % 3
        contrib = jnp.where(win == t, g, 0.0)
        lo_y, lo_x = dy - 1, dxo - 1
        dx_acc = dx_acc + jax.lax.pad(
            contrib, jnp.zeros((), g.dtype),
            [(0, 0, 0), (lo_y, 1 - lo_y, 1), (lo_x, 1 - lo_x, 1),
             (0, 0, 0)])
    return (dx_acc,)


pool_routed.defvjp(pool_routed_fwd, pool_routed_bwd)


def timed_grad(pool, x, iters=10):
    def loss(x):
        return (pool(x).astype(jnp.float32) ** 2).sum()

    def chain(x, length):
        def body(z, _):
            g = jax.grad(loss)(z)
            return z + 1e-12 * g, ()
        zK, _ = jax.lax.scan(body, x, None, length=length)
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


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    ga = jax.grad(lambda z: (pool_xla(z).astype(jnp.float32) ** 2).sum())(x)
    gb = jax.grad(lambda z: (pool_routed(z).astype(jnp.float32) ** 2).sum())(x)
    print("grad parity max abs:", float(jnp.abs(
        ga.astype(jnp.float32) - gb.astype(jnp.float32)).max()))

    for name, fn in (("xla select-and-scatter", pool_xla),
                     ("argmax-routed", pool_routed)):
        dt = timed_grad(fn, x)
        print(f"{name:24s} {dt*1e3:7.3f} ms fwd+bwd")


if __name__ == "__main__":
    main()
