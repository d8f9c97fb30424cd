"""nuScenes SinBEVT training CLI.

Capability parity with the reference Lightning pipeline
(nuscenes/scripts/train.py:37 + model_module.py:5 + config/config.yaml):
step-based AdamW + OneCycleLR with grad-clip 5.0, visibility-masked
focal + center losses, threshold-IoU validation metrics (vis>=2 and
with-occlusions variants), step-based checkpointing, auto-resume.

  python -m cobevt_tpu.tools.train_nuscenes \
      --dataset_dir /data/nuscenes --labels_dir /data/cvt_labels \
      --save_dir runs/sinbevt [--steps 50001] [--batch 8]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    from cobevt_tpu.configs.nuscenes_experiments import (
        all_nuscenes_experiments,
    )

    p = argparse.ArgumentParser("cobevt_tpu nuScenes training")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--labels_dir", required=True)
    p.add_argument("--save_dir", default="runs/sinbevt_nuscenes")
    p.add_argument("--experiment",
                   default="cvt_pyramid_axial_nuscenes_vehicle",
                   choices=sorted(all_nuscenes_experiments()),
                   help="composed experiment preset (reference "
                        "config/experiment/*.yaml equivalent)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--grad_clip", type=float, default=None)
    p.add_argument("--ckpt_every", type=int, default=None)
    p.add_argument("--half", action="store_true")
    p.add_argument("--scenes", nargs="*", default=None,
                   help="scene names; defaults to every labels json")
    p.add_argument("--label_indices", type=int, nargs="*", default=None,
                   help="override the experiment's label grouping")
    return p.parse_args()


def main():
    opt = parse_args()
    # multi-host rendezvous BEFORE any other JAX call (no-op on one
    # host) — reference NCCL bring-up equivalent, multi_gpu_utils.py:16
    from cobevt_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    import jax
    import jax.numpy as jnp

    from cobevt_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    from cobevt_tpu.configs.nuscenes_experiments import (
        build_criterion,
        build_model,
        nuscenes_experiment,
    )
    from cobevt_tpu.data.loader import DataLoader
    from cobevt_tpu.data.nuscenes_gen import concat_scene_datasets
    from cobevt_tpu.metrics import IoUState, iou_compute, iou_update
    from cobevt_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
        onecycle_schedule,
    )
    from cobevt_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from cobevt_tpu.train.loop import MetricLogger

    exp = nuscenes_experiment(opt.experiment)
    if opt.label_indices is not None:
        exp = dataclasses.replace(
            exp, label_indices=(tuple(opt.label_indices),))
    overrides = {k: getattr(opt, a) for k, a in
                 [("lr", "lr"), ("weight_decay", "weight_decay"),
                  ("grad_clip", "grad_clip"), ("steps", "steps"),
                  ("batch_size", "batch"),
                  ("checkpoint_interval", "ckpt_every")]
                 if getattr(opt, a) is not None}
    if overrides:
        exp = dataclasses.replace(exp, **overrides)

    scenes = opt.scenes
    if scenes is None:
        scenes = sorted(f[:-5] for f in os.listdir(opt.labels_dir)
                        if f.endswith(".json"))
    dataset = concat_scene_datasets(scenes, opt.dataset_dir,
                                    opt.labels_dir)
    loader = DataLoader(dataset, exp.batch_size, shuffle=True)

    model = build_model(exp, half=opt.half)
    label_idx = exp.label_indices
    criterion = build_criterion(exp)

    tx = make_optimizer(
        onecycle_schedule(exp.lr, exp.steps),
        weight_decay=exp.weight_decay, eps=1e-8,
        grad_clip=exp.grad_clip)

    sample = dataset[0]
    sample_batch = {k: np.stack([v]) for k, v in sample.items()}
    state = create_train_state(model, tx, sample_batch)
    ckpt_dir = os.path.join(opt.save_dir, "ckpt")
    state, resumed = restore_checkpoint(ckpt_dir, state)

    def loss_adapter(out, batch):
        total, parts = criterion(out, batch)
        return total, parts

    train_step = make_train_step(model, loss_adapter, donate=False)
    eval_step = make_eval_step(model, loss_adapter)
    logger = MetricLogger(os.path.join(opt.save_dir, "logs"))
    rng = jax.random.PRNGKey(exp.seed)

    step = int(state.step)
    epoch = 0
    while step < exp.steps:
        loader.set_epoch(epoch)
        for batch in loader:
            rng, srng = jax.random.split(rng)
            state, logs = train_step(state, batch, srng)
            step += 1
            if step % 50 == 0:
                logger.log(step, {k: float(v) for k, v in logs.items()})
                print(f"step {step} loss {float(logs['loss']):.4f}")
            if step % exp.checkpoint_interval == 0:
                save_checkpoint(ckpt_dir, state, step)
            if step >= exp.steps:
                break
        epoch += 1
    save_checkpoint(ckpt_dir, state, step)

    # final validation sweep: IoU @ {0.4, 0.5}, vis>=2 and all pixels
    vis_state = IoUState.create(2, 1)
    all_state = IoUState.create(2, 1)
    for batch in DataLoader(dataset, 1, shuffle=False, drop_last=False):
        out, _ = eval_step(state, batch)
        import jax.numpy as jnp
        vis_state = iou_update(vis_state, out["bev"],
                               jnp.asarray(batch["bev"]),
                               (0.4, 0.5), jnp.asarray(
                                   batch["visibility"]), 2, label_idx)
        all_state = iou_update(all_state, out["bev"],
                               jnp.asarray(batch["bev"]),
                               (0.4, 0.5), None, None, label_idx)
    print("IoU (vis>=2):", np.asarray(iou_compute(vis_state)))
    print("IoU (with occlusions):", np.asarray(iou_compute(all_state)))


if __name__ == "__main__":
    main()
