"""Cooperative-camera serving CLI: bucketed low-latency inference.

Production counterpart of the reference's batch-1 eval loop
(opv2v/opencood/tools/inference_camera.py:24) reworked for deployment:
one compiled program per live agent count (`utils/serving.py`), so
per-frame latency scales with the agents actually present instead of
the max_cav pad.  Exact for the reference-parity fusion semantics via
the staged encode/fuse split (CorpBEVT `stage=` contract).

  # latency report over synthetic frames with mixed agent counts
  python -m cobevt_tpu.tools.serve_camera --model_dir runs/corpbevt \
      --synthetic 50

  # serve a dataset directory, writing per-frame seg maps
  python -m cobevt_tpu.tools.serve_camera --model_dir runs/corpbevt \
      --root_dir /data/opv2v/validate --out_dir preds/

Prints one JSON summary line: per-bucket p50/p95/p99 latency (ms) and
overall frames/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("cobevt_tpu camera serving")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--bucketing", default="staged",
                   choices=["staged", "sliced", "off"],
                   help="staged = exact for reference-parity fusion; "
                        "sliced = exact only under fusion_mean_over_valid; "
                        "off = full padded forward")
    p.add_argument("--synthetic", type=int, default=0,
                   help="serve N synthetic frames with mixed agent "
                        "counts instead of a dataset")
    p.add_argument("--root_dir", default=None,
                   help="dataset dir (defaults to hypes validate_dir)")
    p.add_argument("--out_dir", default=None,
                   help="write per-frame argmax seg maps (npz) here")
    p.add_argument("--half", action="store_true",
                   help="bfloat16 compute (params stay f32)")
    p.add_argument("--int8", action="store_true",
                   help="post-training-quantized int8 conv path "
                        "(C>=256 ResNet blocks; ~1.5%% per-block drift, "
                        "see docs/DESIGN.md round 3)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report", default=None,
                   help="also write the JSON summary (per-bucket AND "
                        "overall p50/p95/p99 + frames/sec) to this file")
    p.add_argument("--pipeline", type=int, default=1,
                   help="in-flight dispatch depth: 1 = block per frame "
                        "(pure latency), >1 overlaps host dispatch + "
                        "transfer of the next frame with device compute "
                        "of the current one (throughput; latencies are "
                        "then completion latencies incl. queueing)")
    return p.parse_args()


def build_runner(model, variables, cfg, bucketing: str):
    from cobevt_tpu.models.corpbevt import CorpBEVT
    from cobevt_tpu.utils.serving import (
        BucketedRunner,
        StagedBucketedRunner,
    )

    if bucketing == "staged" and isinstance(model, CorpBEVT):
        return StagedBucketedRunner(model, variables, cfg.max_cav)
    if bucketing == "sliced":
        if not getattr(cfg, "fusion_mean_over_valid", True):
            print("warning: sliced bucketing is approximate for "
                  "mean-over-max_cav fusion; use --bucketing staged")
        return BucketedRunner(model, variables)
    if bucketing == "staged":
        # graphs without the stage= contract fall back to slicing
        return BucketedRunner(model, variables)

    import jax

    fn = jax.jit(lambda v, b: model.apply(v, b, False))
    return lambda batch: fn(variables, batch)


def synthetic_frame(rng, cfg, n_agents: int):
    """One padded synthetic frame with `n_agents` live agents."""
    L, M = cfg.max_cav, 4
    H, W = cfg.image_height, cfg.image_width
    intr = np.zeros((1, L, M, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = W * 0.9
    intr[..., 0, 2] = W / 2
    intr[..., 1, 2] = H / 2
    intr[..., 2, 2] = 1.0
    mask = np.zeros((1, L), np.float32)
    mask[:, :n_agents] = 1.0
    inputs = np.zeros((1, L, M, H, W, 3), np.float32)
    inputs[:, :n_agents] = rng.rand(1, n_agents, M, H, W, 3)
    return {
        "inputs": inputs,
        "intrinsic": intr,
        "extrinsic": np.tile(np.eye(4, dtype=np.float32),
                             (1, L, M, 1, 1)),
        "transformation_matrix": np.tile(np.eye(4, dtype=np.float32),
                                         (1, L, 1, 1)),
        "agent_mask": mask,
    }


def main():
    opt = parse_args()
    if opt.int8:
        os.environ["COBEVT_INT8"] = "1"
    import jax

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import optax

    from cobevt_tpu.configs.hypes import load_hypes
    from cobevt_tpu.tools.train_camera import build_from_hypes
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train.checkpoint import restore_checkpoint

    hypes = load_hypes(os.path.join(opt.model_dir, "config.yaml"))
    cfg, model, _ = build_from_hypes(hypes, half=opt.half)

    rng = np.random.RandomState(opt.seed)
    sample = synthetic_frame(rng, cfg, cfg.max_cav)
    state = create_train_state(
        model, make_optimizer(optax.constant_schedule(0.0)), sample)
    state, step = restore_checkpoint(os.path.join(opt.model_dir, "ckpt"),
                                     state)
    if step is None:
        raise FileNotFoundError(
            f"no checkpoint found under {opt.model_dir}/ckpt")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    runner = build_runner(model, variables, cfg, opt.bucketing)

    if opt.synthetic:
        frames = []
        for i in range(opt.synthetic):
            n = 1 + rng.randint(cfg.max_cav)
            frames.append((n, synthetic_frame(rng, cfg, n)))
    else:
        from cobevt_tpu.data.opv2v import (
            OPV2VCameraDataset,
            OPV2VScenarioDatabase,
        )

        root = opt.root_dir or hypes["validate_dir"]
        tp = hypes["train_params"]
        db = OPV2VScenarioDatabase(root, max_cav=tp["max_cav"])
        ds = OPV2VCameraDataset(
            db, image_hw=(hypes["preprocess"]["args"]["resize_y"],
                          hypes["preprocess"]["args"]["resize_x"]),
            visible=tp.get("visible", True), train=False)
        frames = []
        for i in range(len(ds)):
            s = {k: np.stack([v]) for k, v in ds[i].items()}
            frames.append((int(s["agent_mask"].sum()), s))

    # warm every bucket that will be served (compile outside the
    # latency-measured loop, as a server would at startup)
    for n in sorted({n for n, _ in frames}):
        warm = synthetic_frame(rng, cfg, n)
        jax.block_until_ready(runner(warm))

    if opt.out_dir:
        os.makedirs(opt.out_dir, exist_ok=True)

    def save(i, n, out):
        if opt.out_dir:
            key = "dynamic_seg" if "dynamic_seg" in out else \
                sorted(out)[0]
            seg = np.asarray(out[key]).argmax(-1)
            np.savez_compressed(
                os.path.join(opt.out_dir, f"frame_{i:06d}.npz"),
                seg=seg.astype(np.uint8), n_agents=n)

    lat = {}
    inflight = []        # (t_dispatch, i, n, async out) FIFO
    t_all0 = time.perf_counter()
    for i, (n, frame) in enumerate(frames):
        t0 = time.perf_counter()
        out = runner(frame)              # async dispatch
        inflight.append((t0, i, n, out))
        while len(inflight) >= max(opt.pipeline, 1):
            td, j, m, o = inflight.pop(0)
            o = jax.block_until_ready(o)
            lat.setdefault(m, []).append((time.perf_counter() - td) * 1e3)
            save(j, m, o)
    for td, j, m, o in inflight:         # drain
        o = jax.block_until_ready(o)
        lat.setdefault(m, []).append((time.perf_counter() - td) * 1e3)
        save(j, m, o)
    wall = time.perf_counter() - t_all0

    buckets = {
        str(n): {
            "frames": len(v),
            "p50_ms": round(float(np.percentile(v, 50)), 2),
            "p95_ms": round(float(np.percentile(v, 95)), 2),
            "p99_ms": round(float(np.percentile(v, 99)), 2),
        }
        for n, v in sorted(lat.items())
    }
    all_lat = [t for v in lat.values() for t in v]
    summary = {
        "bucketing": opt.bucketing,
        "pipeline": opt.pipeline,
        "frames": len(frames),
        "frames_per_sec": round(len(frames) / wall, 2),
        # true per-frame latency percentiles over every served frame
        # (each frame individually dispatched + blocked on)
        "p50_ms": round(float(np.percentile(all_lat, 50)), 2),
        "p95_ms": round(float(np.percentile(all_lat, 95)), 2),
        "p99_ms": round(float(np.percentile(all_lat, 99)), 2),
        "buckets": buckets,
    }
    print(json.dumps(summary))
    if opt.report:
        with open(opt.report, "w") as f:
            json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
