"""One-command reference-checkpoint port: torch .pth -> orbax dir.

The reference's value proposition includes its published trained weights
(opv2v/README.md:55-56 Google-Drive checkpoints; nuScenes
sinbevt_nuscenes_vehicle_50k.ckpt).  This CLI shrinks the migration
boundary to "supply the file": it wraps manifest-check -> mechanical
state_dict conversion (utils/torch_port.py) -> orbax save -> optional
forward self-check into one command, replacing the reference's
`load_saved_model` (opv2v/opencood/tools/train_utils.py:24-65) for
cross-framework porting.

  python -m cobevt_tpu.tools.port_checkpoint \
      --torch net_epoch60.pth --hypes_yaml corpbevt.yaml --out ported/

The ported directory is a drop-in `--model_dir` for train_camera /
inference_camera (orbax step-0 checkpoint + config.yaml snapshot).
Mismatched checkpoints fail loudly with the full weights-manifest diff
(every missing / unexpected / shape-mismatched leaf at once) rather
than a silently partial load.

Container formats handled: plain `torch.save(model.state_dict())` (the
reference OPV2V format), full-object dicts with a "state_dict" /
"model_state_dict" key (pytorch-lightning .ckpt, the nuScenes format),
and `--strip_prefix` for wrapper nesting (lightning saves
"backbone.encoder..." when the module lives on an attribute).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("cobevt_tpu checkpoint porter")
    p.add_argument("--torch", required=True, dest="torch_path",
                   help="reference .pth/.ckpt checkpoint file")
    p.add_argument("--hypes_yaml", required=True,
                   help="hypes yaml describing the model the weights "
                        "belong to (reference hypes files parse as-is)")
    p.add_argument("--out", required=True,
                   help="output dir (becomes a --model_dir: orbax "
                        "step-0 checkpoint + config.yaml snapshot)")
    p.add_argument("--strip_prefix", default="",
                   help="strip this prefix from every state_dict key "
                        "before conversion (e.g. 'backbone.' for "
                        "lightning-wrapped checkpoints)")
    p.add_argument("--drop_prefix", action="append", default=[],
                   help="drop keys with this prefix (repeatable; the "
                        "strict=False escape hatch for heads we don't "
                        "instantiate)")
    p.add_argument("--selfcheck", action="store_true",
                   help="run one forward pass with the ported weights "
                        "on a synthetic batch and report output "
                        "statistics (finite-ness + per-output "
                        "mean/std) as JSON")
    p.add_argument("--image_hw", default="",
                   help="override HxW of the synthetic init batch "
                        "(e.g. 64x64; default: the hypes resolution). "
                        "Parameter shapes are resolution-independent, "
                        "so a small init is fine and much faster")
    return p.parse_args(argv)


def load_torch_state_dict(path: str, strip_prefix: str = ""):
    """torch.load + container unwrap + prefix strip -> {key: ndarray}."""
    import torch

    from cobevt_tpu.utils.torch_port import state_dict_to_numpy

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj \
                and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise ValueError(
            f"{path}: expected a state_dict (or a dict containing one "
            f"under 'state_dict'/'model_state_dict'), got {type(obj)}")
    sd = state_dict_to_numpy(obj)
    if strip_prefix:
        sd = {(k[len(strip_prefix):] if k.startswith(strip_prefix)
               else k): v for k, v in sd.items()}
    return sd


def synthetic_batch(hypes: dict, image_hw=None):
    """Init/self-check batch matching a hypes camera graph (all 8 graph
    variants consume a subset of these keys)."""
    import jax.numpy as jnp

    args = hypes["model"]["args"]
    L = args.get("max_cav", 1)
    H = image_hw[0] if image_hw else args["encoder"]["image_height"]
    W = image_hw[1] if image_hw else args["encoder"]["image_width"]
    B, M = 1, 4
    rng = np.random.RandomState(0)
    intr = np.tile(np.eye(3, dtype=np.float32), (B, L, M, 1, 1))
    intr[..., 0, 0] = intr[..., 1, 1] = 0.5 * W
    intr[..., 0, 2] = 0.5 * W
    intr[..., 1, 2] = 0.5 * H
    return {
        "inputs": jnp.asarray(rng.rand(B, L, M, H, W, 3), jnp.float32),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "pairwise_t_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }


def port(opt) -> dict:
    import jax
    import optax

    from cobevt_tpu.configs.hypes import (
        build_from_hypes,
        load_hypes,
        save_config_snapshot,
    )
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train.checkpoint import (
        restore_from_torch,
        save_checkpoint,
    )

    hypes = load_hypes(opt.hypes_yaml)
    model = build_from_hypes(hypes)
    image_hw = None
    if opt.image_hw:
        h, w = opt.image_hw.lower().split("x")
        image_hw = (int(h), int(w))
    batch = synthetic_batch(hypes, image_hw)

    tx = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, tx, batch)

    sd = load_torch_state_dict(opt.torch_path, opt.strip_prefix)
    state = restore_from_torch(state, sd,
                               drop_prefixes=tuple(opt.drop_prefix))

    os.makedirs(opt.out, exist_ok=True)
    save_checkpoint(os.path.join(opt.out, "ckpt"), state, 0)
    save_config_snapshot(hypes, opt.out)

    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(state.params))
    report = {"ported": opt.torch_path, "out": opt.out,
              "torch_keys": len(sd), "params": n_params, "ok": True}

    if opt.selfcheck:
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = jax.jit(lambda v, b: model.apply(v, b, False))(
            variables, batch)
        stats = {}
        finite = True
        for k, v in (out.items() if isinstance(out, dict)
                     else enumerate(jax.tree.leaves(out))):
            a = np.asarray(v, np.float32)
            finite = finite and bool(np.isfinite(a).all())
            stats[str(k)] = {"shape": list(a.shape),
                             "mean": round(float(a.mean()), 6),
                             "std": round(float(a.std()), 6)}
        report["selfcheck"] = {"finite": finite, "outputs": stats}
        report["ok"] = finite
    return report


def main(argv=None):
    opt = parse_args(argv)
    report = port(opt)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
