"""AOT serving export: serialize the eval forward to StableHLO.

Production deployment should not re-trace Python or depend on the
training codebase: `jax.export` captures the jitted eval forward
(including the fused Pallas kernels as TPU custom calls) as a
versioned, serialized StableHLO artifact that a serving binary
deserializes and calls with (variables, batch) — the orbax checkpoint
stays the single weights source.  The reference has no deployment
path at all (its eval loop re-instantiates the torch net per run,
opv2v/opencood/tools/inference_camera.py:24).

  # export a trained model for 5-agent serving on TPU
  python -m cobevt_tpu.tools.export_serving --model_dir runs/corpbevt \
      --out runs/corpbevt/serving.stablehlo

  # smoke-export the benchmark flagship with fresh weights
  python -m cobevt_tpu.tools.export_serving --synthetic corpbevt \
      --out /tmp/corpbevt.stablehlo

Library API: `export_model` / `load_exported` round-trip; the loaded
artifact is called as `exported.call(variables, batch)` under jit.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def export_model(model, variables, sample_batch, platforms=("tpu",)):
    """Serialize `model.apply(variables, batch, train=False)` traced at
    `sample_batch`'s shapes for the given platforms.  Returns bytes."""
    import jax
    from jax import export as jexport

    def fwd(v, b):
        return model.apply(v, b, False)

    disabled = [jexport.DisabledSafetyCheck.custom_call(
        "tpu_custom_call")]
    exp = jexport.export(jax.jit(fwd), platforms=list(platforms),
                         disabled_checks=disabled)(
        variables, sample_batch)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported artifact; call as
    `jax.jit(exported.call)(variables, batch)`."""
    from jax import export as jexport

    return jexport.deserialize(blob)


def main():
    p = argparse.ArgumentParser("cobevt_tpu serving export")
    p.add_argument("--model_dir", default=None,
                   help="hypes + checkpoint dir (config.yaml, ckpt/)")
    p.add_argument("--synthetic", default=None,
                   choices=["corpbevt", "sinbevt_nuscenes"],
                   help="export a benchmark model with fresh weights")
    p.add_argument("--out", required=True)
    p.add_argument("--platforms", default=None,
                   help="comma list; default: current backend")
    p.add_argument("--max_cav", type=int, default=5)
    opt = p.parse_args()

    import jax

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    platforms = (opt.platforms.split(",") if opt.platforms
                 else [jax.default_backend()])

    if opt.synthetic:
        from cobevt_tpu.tools.benchmark import (
            build_corpbevt,
            build_sinbevt_nuscenes,
        )

        if opt.synthetic == "corpbevt":
            model, batch, _ = build_corpbevt(True, opt.max_cav)
        else:
            model, batch, _ = build_sinbevt_nuscenes(True, None)
        variables = jax.jit(model.init, static_argnums=2)(
            jax.random.PRNGKey(0), batch, False)
    else:
        import optax

        from cobevt_tpu.configs.hypes import load_hypes
        from cobevt_tpu.tools.serve_camera import synthetic_frame
        from cobevt_tpu.tools.train_camera import build_from_hypes
        from cobevt_tpu.train import create_train_state, make_optimizer
        from cobevt_tpu.train.checkpoint import restore_checkpoint

        hypes = load_hypes(os.path.join(opt.model_dir, "config.yaml"))
        cfg, model, _ = build_from_hypes(hypes)
        rng = np.random.RandomState(0)
        batch = synthetic_frame(rng, cfg, cfg.max_cav)
        state = create_train_state(
            model, make_optimizer(optax.constant_schedule(0.0)), batch)
        state, step = restore_checkpoint(
            os.path.join(opt.model_dir, "ckpt"), state)
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint under {opt.model_dir}/ckpt")
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

    blob = export_model(model, variables, batch, platforms)
    with open(opt.out, "wb") as f:
        f.write(blob)

    # round-trip sanity: deserialize and run on the current backend
    exported = load_exported(blob)
    out = jax.jit(exported.call)(variables, batch)
    shapes = {k: list(np.asarray(v).shape) for k, v in out.items()}
    print(json.dumps({"out": opt.out, "bytes": len(blob),
                      "platforms": platforms, "outputs": shapes}))


if __name__ == "__main__":
    main()
