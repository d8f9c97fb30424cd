"""Model latency / training-throughput benchmark CLI.

Capability parity with reference nuscenes/scripts/benchmark.py:27-59
(batch-1 timed forwards, fp32/bf16 switches, device sync) — with the
dedup-proof scan-chain protocol from bench.py (remote-TPU tunnels can
elide repeated identical dispatches, so each iteration's input depends on
the previous output).  Beyond the reference it also reports model FLOPs
utilization (XLA cost analysis over the compiled program / chip peak)
and a `--train` mode timing the FULL optimizer step (fwd + bwd + AdamW),
chained through the train state — the counterpart of the reference's
published training economics (nuscenes/README.md:89-90: 50k steps ~ 8h
at total batch 16).

  python -m cobevt_tpu.tools.benchmark --model corpbevt --iters 20
  python -m cobevt_tpu.tools.benchmark --model sinbevt_nuscenes --bf16
  python -m cobevt_tpu.tools.benchmark --model corpbevt --train
  python -m cobevt_tpu.tools.benchmark --model sinbevt_nuscenes --train \
      --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("cobevt_tpu benchmark")
    p.add_argument("--model", default="corpbevt",
                   choices=["corpbevt", "sinbevt_nuscenes",
                            "pointpillar"])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--max_cav", type=int, default=5)
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--train", action="store_true",
                   help="time the full optimizer step instead of the "
                        "eval forward")
    p.add_argument("--batch", type=int, default=1,
                   help="batch size (eval: throughput batching; train: "
                        "per-step batch)")
    p.add_argument("--no_donate", action="store_true",
                   help="train mode: keep the input state (debug path); "
                        "default donates it into the step")
    p.add_argument("--remat", action="store_true",
                   help="corpbevt train A/B: gradient-checkpoint the "
                        "ResNet trunk blocks (encoder_remat)")
    p.add_argument("--no_grad_norm", action="store_true",
                   help="train A/B: drop the per-step global grad-norm "
                        "logging reduction")
    p.add_argument("--fused_xattn_train", action="store_true",
                   help="train A/B: run the fused cross-view kernels "
                        "in the train step (COBEVT_FUSED_XATTN_TRAIN=1)")
    p.add_argument("--int8", action="store_true",
                   help="serving A/B: the lossy COBEVT_INT8=1 PTQ mode "
                        "(C>=256 in-kernel int8 + int8-resident layer1; "
                        "accuracy gated by tools/validate_kernels.py)")
    return p.parse_args()


def build_corpbevt(bf16, max_cav):
    import jax.numpy as jnp

    from cobevt_tpu.configs import corpbevt_default
    from cobevt_tpu.models.corpbevt import CorpBEVT

    cfg = corpbevt_default(max_cav=max_cav)
    model = CorpBEVT(cfg, dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    B, L, M, img = 1, max_cav, 4, 512
    intr = np.zeros((B, L, M, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 460.0
    intr[..., 0, 2] = intr[..., 1, 2] = img / 2
    intr[..., 2, 2] = 1.0
    batch = {
        "inputs": jnp.asarray(rng.rand(B, L, M, img, img, 3), jnp.float32),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }
    return model, batch, "inputs"


def build_sinbevt_nuscenes(bf16, _):
    import jax.numpy as jnp

    from cobevt_tpu.models.sinbevt_nuscenes import (
        CrossViewTransformer,
        PyramidAxialConfig,
    )

    model = CrossViewTransformer(
        PyramidAxialConfig(), decoder_blocks=(128, 128, 64), dim_last=64,
        outputs=(("bev", (0, 1)), ("center", (1, 2))),
        dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    B, n, h, w = 1, 6, 224, 480
    intr = np.zeros((B, n, 3, 3), np.float32)
    intr[..., 0, 0] = intr[..., 1, 1] = 250.0
    intr[..., 0, 2] = w / 2
    intr[..., 1, 2] = h / 2
    intr[..., 2, 2] = 1.0
    batch = {
        "image": jnp.asarray(rng.rand(B, n, h, w, 3), jnp.float32),
        "intrinsics": jnp.asarray(intr),
        "extrinsics": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, n, 1, 1))),
    }
    return model, batch, "image"


def build_pointpillar(bf16, max_cav):
    """Cooperative LiDAR flagship: 5-agent PointPillar + FuseBEVT at
    production scale (8000 pillars x 32 points per agent, 0.4m voxels,
    +/-70.4 x +/-38.4 m range -> 352x192 grid; the lateral range keeps
    the stride-2 fused map window-divisible)."""
    import jax.numpy as jnp

    from cobevt_tpu.models.lidar.point_pillar_models import (
        PointPillarConfig,
        PointPillarFuseBEVT,
    )

    cfg = PointPillarConfig(
        max_cav=max_cav,
        point_cloud_range=(-70.4, -38.4, -3, 70.4, 38.4, 1))
    model = PointPillarFuseBEVT(cfg, dtype=jnp.bfloat16 if bf16 else None)
    rng = np.random.RandomState(0)
    B, L, N, P = 1, max_cav, cfg.max_voxels, cfg.max_points_per_voxel
    nx, ny, _ = cfg.grid_size

    pts = rng.rand(B, L, N, P, 4).astype(np.float32)
    pr = cfg.point_cloud_range
    pts[..., 0] = pts[..., 0] * (pr[3] - pr[0]) + pr[0]
    pts[..., 1] = pts[..., 1] * (pr[4] - pr[1]) + pr[1]
    pts[..., 2] = pts[..., 2] * (pr[5] - pr[2]) + pr[2]
    coords = np.zeros((B, L, N, 4), np.int32)
    coords[..., 2] = rng.randint(0, ny, (B, L, N))
    coords[..., 3] = rng.randint(0, nx, (B, L, N))
    batch = {
        "voxel_features": jnp.asarray(pts),
        "voxel_num_points": jnp.asarray(
            rng.randint(1, P + 1, (B, L, N)).astype(np.int32)),
        "voxel_coords": jnp.asarray(coords),
        "voxel_mask": jnp.asarray(
            (rng.rand(B, L, N) < 0.8).astype(np.float32)),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
    }
    return model, batch, "voxel_features"


def tile_batch(batch, B: int):
    """Tile every array's leading (batch) axis from 1 to B."""
    if B == 1:
        return batch
    import jax.numpy as jnp

    return {k: jnp.tile(v, (B,) + (1,) * (v.ndim - 1))
            for k, v in batch.items()}


def make_criterion(model_name: str, model, batch):
    """(criterion, train_batch): synthetic GT labels shaped from the
    model's own eval outputs + the shipping loss config."""
    import jax
    import jax.numpy as jnp

    from cobevt_tpu.losses import VanillaSegLoss
    from cobevt_tpu.losses.seg_losses import (
        BinarySegmentationLoss,
        CenterLoss,
        MultipleLoss,
    )

    rng = np.random.RandomState(1)
    var_shapes = jax.eval_shape(lambda k: model.init(k, batch, False),
                                jax.random.PRNGKey(0))
    out_shapes = jax.eval_shape(lambda v, b: model.apply(v, b, False),
                                var_shapes, batch)

    if model_name == "corpbevt":
        # corpbevt.yaml loss: target dynamic, d_weights 75, d_coe 2
        seg = VanillaSegLoss(target="dynamic", d_weights=75.0, d_coe=2.0)
        s = out_shapes["dynamic_seg"].shape        # (B, L, H, W, C)
        gt = jnp.asarray(rng.randint(0, 2, s[:-1]).astype(np.int32))
        train_batch = dict(batch, gt_dynamic=gt, gt_static=gt)

        def criterion(out, b):
            return seg(out, {"gt_dynamic": b["gt_dynamic"],
                             "gt_static": b["gt_static"]})
        return criterion, train_batch

    if model_name == "sinbevt_nuscenes":
        # reference config.yaml loss: visibility-masked focal bev +
        # center, weights 1.0 / 0.1
        losses = MultipleLoss(
            losses=(("bev", BinarySegmentationLoss(min_visibility=2)),
                    ("center", CenterLoss(min_visibility=2))),
            weights=(("bev", 1.0), ("center", 0.1)))
        bev_s = out_shapes["bev"].shape            # (B, H, W, C)
        cen_s = out_shapes["center"].shape
        train_batch = dict(
            batch,
            bev=jnp.asarray(
                rng.randint(0, 2, bev_s).astype(np.float32)),
            center=jnp.asarray(
                rng.rand(*cen_s).astype(np.float32)),
            visibility=jnp.asarray(
                rng.randint(0, 4, bev_s[:-1]).astype(np.int32)))
        return losses, train_batch

    if model_name == "pointpillar":
        # OpenCOOD's PointPillar recipe: focal cls over pos/neg anchors
        # + smooth-L1 reg on positives (losses/detection_loss.py)
        from cobevt_tpu.losses.detection_loss import PointPillarLoss

        loss = PointPillarLoss()
        cls_s = out_shapes["cls_preds"].shape      # (B, h, w, A)
        reg_s = out_shapes["reg_preds"].shape      # (B, h, w, A*7)
        pos = (rng.rand(*cls_s) < 0.02).astype(np.float32)
        neg = ((1.0 - pos) *
               (rng.rand(*cls_s) < 0.9)).astype(np.float32)
        train_batch = dict(
            batch,
            pos_equal_one=jnp.asarray(pos),
            neg_equal_one=jnp.asarray(neg),
            targets=jnp.asarray(
                rng.randn(*reg_s).astype(np.float32)))

        def criterion(out, b):
            return loss(
                {"cls_preds": out["cls_preds"],
                 "reg_preds": out["reg_preds"]},
                {"pos_equal_one": b["pos_equal_one"],
                 "neg_equal_one": b["neg_equal_one"],
                 "targets": b["targets"]})
        return criterion, train_batch

    raise ValueError(f"no train criterion for {model_name}")


def measure_train(model, model_name, batch, opt):
    """Chain full optimizer steps through the train state (true data
    dependency — dedup-proof) and report ms/step + MFU + HBM util.

    Same two-length differenced clock as the eval path: the chain is
    timed at K and 3K steps and differenced, so the fixed per-call cost
    (tunnel round-trip + dispatch + scalar fetch, ~30 ms) cancels
    exactly instead of leaking ~30/K ms into every step."""
    import jax
    import optax

    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.utils.flops import compiled_costs, utilization

    criterion, train_batch = make_criterion(model_name, model, batch)
    train_batch = tile_batch(train_batch, opt.batch)
    tx = make_optimizer(optax.constant_schedule(2e-4), weight_decay=1e-2,
                        eps=1e-10)
    state = create_train_state(model, tx, train_batch)

    # the jitted production step (train/step.py) — tracing through it
    # inside the scan inlines it, so the K-step chain is ONE XLA program
    from cobevt_tpu.train.step import make_train_step

    loss_and_grad_step = make_train_step(
        model, criterion, donate=False,
        log_grad_norm=not opt.no_grad_norm)

    K, K_big = opt.iters, 3 * opt.iters

    def chain(s, b, key, length):
        def body(carry, i):
            s, key = carry
            key, sub = jax.random.split(key)
            s2, logs = loss_and_grad_step(s, b, sub)
            return (s2, key), logs["loss"]
        (sK, _), losses = jax.lax.scan(body, (s, key),
                                       np.arange(length))
        return sK, losses.sum()

    donate = () if opt.no_donate else (0,)
    chain_fn = jax.jit(chain, static_argnums=3, donate_argnums=donate)

    costs_step = compiled_costs(
        jax.jit(loss_and_grad_step), state, train_batch,
        jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(0)

    def timed(state, length):
        nonlocal key
        state, warm_loss = chain_fn(state, train_batch, key, length)
        float(warm_loss)                     # compile + warmup
        times = []
        for i in range(opt.repeats):
            key = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            state, l = chain_fn(state, train_batch, key, length)
            float(l)
            times.append(time.perf_counter() - t0)
        return float(np.median(times)), state

    t_small, state = timed(state, K)
    if opt.profile_dir:
        with jax.profiler.trace(opt.profile_dir):
            state, l = chain_fn(state, train_batch, key, K)
            float(l)
    t_big, state = timed(state, K_big)
    dt = (t_big - t_small) / (K_big - K)
    print(json.dumps({
        "model": model_name,
        "mode": "train",
        "precision": "bf16" if opt.bf16 else "fp32",
        "batch": opt.batch,
        "donate": not opt.no_donate,
        "remat": opt.remat,
        "grad_norm_logged": not opt.no_grad_norm,
        "fused_xattn_train": opt.fused_xattn_train,
        "clock": "two-K differenced",
        "ms_per_step": round(dt * 1000, 3),
        "steps_per_sec": round(1.0 / dt, 3),
        "samples_per_sec": round(opt.batch / dt, 3),
        "flops_per_step": costs_step["flops"],
        **utilization(costs_step, dt),
    }))


def main():
    opt = parse_args()
    if opt.fused_xattn_train:
        os.environ["COBEVT_FUSED_XATTN_TRAIN"] = "1"
    if opt.int8:
        os.environ["COBEVT_INT8"] = "1"   # trace-time flag: set before jit
    import jax

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    builder = {"corpbevt": build_corpbevt,
               "sinbevt_nuscenes": build_sinbevt_nuscenes,
               "pointpillar": build_pointpillar}[opt.model]
    model, batch, chain_key = builder(opt.bf16, opt.max_cav)

    if opt.remat:
        import dataclasses
        if not (hasattr(model, "config") and
                hasattr(model.config, "encoder_remat")):
            raise SystemExit("--remat: model has no encoder_remat knob")
        model = model.clone(config=dataclasses.replace(
            model.config, encoder_remat=True))

    if opt.train:
        measure_train(model, opt.model, batch, opt)
        return

    from cobevt_tpu.utils.flops import compiled_costs, utilization

    batch = tile_batch(batch, opt.batch)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch, False)

    K, K_big = opt.iters, 3 * opt.iters

    def chain(v, b, length):
        def body(x, _):
            out = model.apply(v, dict(b, **{chain_key: x}), False)
            leaf = jax.tree.leaves(out)[0]
            return x + 1e-12 * leaf.mean().astype(x.dtype), ()
        xK, _ = jax.lax.scan(body, b[chain_key], None, length=length)
        return xK.sum()

    costs_fwd = compiled_costs(
        jax.jit(lambda v, b: model.apply(v, b, False)), variables, batch)

    chain_fn = jax.jit(chain, static_argnums=2)

    def timed(length):
        float(chain_fn(variables, batch, length))   # compile + warmup
        times = []
        for i in range(opt.repeats):
            b2 = dict(batch, **{chain_key: batch[chain_key] *
                                (1.0 + 0.001 * (i + 1))})
            t0 = time.perf_counter()
            float(chain_fn(variables, b2, length))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    t_small = timed(K)
    if opt.profile_dir:
        with jax.profiler.trace(opt.profile_dir):
            float(chain_fn(variables, batch, K))
    t_big = timed(K_big)
    dt = (t_big - t_small) / (K_big - K)
    print(json.dumps({
        "model": opt.model,
        "precision": "bf16" if opt.bf16 else "fp32",
        "int8": opt.int8,
        "batch": opt.batch,
        "clock": "two-K differenced",
        "latency_ms": round(dt * 1000, 3),
        "frames_per_sec": round(opt.batch / dt, 3),
        "flops_per_frame": (costs_fwd["flops"] / opt.batch
                            if costs_fwd["flops"] is not None else None),
        **utilization(costs_fwd, dt),
    }))


if __name__ == "__main__":
    main()
