"""Validate the fused TPU kernels against the stock module paths on
real hardware.

The CPU test lane pins every Pallas kernel's *fallback* (and its
interpreter-mode body) to the stock modules; this tool closes the last
gap — the Mosaic-compiled kernels themselves — by running both paths of
each fused model component on the TPU at benchmark shapes and reporting
max abs/rel deviations against a bf16 noise budget.

  python -m cobevt_tpu.tools.validate_kernels [--dtype bf16]

Prints one JSON line per component and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _set_env(value):
    for k in ("COBEVT_FUSED_CONV", "COBEVT_FUSED_XATTN",
              "COBEVT_FUSED_FUSION"):
        os.environ[k] = value


def _run(model, variables, batch):
    import jax

    fn = jax.jit(lambda v, b: model.apply(v, b, False))
    return jax.tree.map(np.asarray, jax.block_until_ready(
        fn(variables, batch)))


def compare(name, fused, stock, budget):
    report = []
    ok = True
    for key in stock:
        f, s = np.asarray(fused[key], np.float32), \
            np.asarray(stock[key], np.float32)
        adiff = float(np.abs(f - s).max())
        scale = float(np.abs(s).max()) + 1e-9
        rel = adiff / scale
        ok = ok and rel <= budget
        report.append((key, adiff, rel))
    print(json.dumps({
        "component": name, "ok": ok,
        "max_rel": round(max(r for _, _, r in report), 6),
        "outputs": {k: {"abs": round(a, 6), "rel": round(r, 6)}
                    for k, a, r in report},
    }))
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    opt = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": "no TPU backend"}))
        return 0

    from cobevt_tpu.tools.benchmark import (
        build_corpbevt,
        build_sinbevt_nuscenes,
    )

    # both paths carry ~1e-2 relative rounding on deep graphs at either
    # dtype: TPU "f32" matmuls run as bf16 passes in XLA and Mosaic
    # alike, so f32 is no tighter on this hardware (exact agreement is
    # pinned on CPU by the golden suite + interpreter-mode kernel tests)
    budget = 0.05
    bf16 = opt.dtype == "bf16"
    ok = True

    for name, builder, arg in (
            ("corpbevt_5agent", build_corpbevt, 5),
            ("sinbevt_nuscenes", build_sinbevt_nuscenes, None)):
        model, batch, _ = builder(bf16, arg)
        _set_env("1")
        variables = jax.jit(model.init, static_argnums=2)(
            jax.random.PRNGKey(0), batch, False)
        fused = _run(model, variables, batch)
        _set_env("0")
        stock = _run(model, variables, batch)
        _set_env("1")
        out = compare(name, fused, stock, budget)
        ok = ok and out

        if name == "corpbevt_5agent":
            # COBEVT_INT8=1 is an intentionally lossy serving mode —
            # pin its end-to-end drift against the stock path under a
            # wider PTQ budget so a quantization regression is loud
            os.environ["COBEVT_INT8"] = "1"
            try:
                quant = _run(model, variables, batch)
            finally:
                os.environ.pop("COBEVT_INT8", None)
            ok = compare(name + "_int8_ptq", quant, stock, 0.15) and ok

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
