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
    p = argparse.ArgumentParser("cobevt_tpu nuScenes training")
    p.add_argument("--dataset_dir", required=True)
    p.add_argument("--labels_dir", required=True)
    p.add_argument("--save_dir", default="runs/sinbevt_nuscenes")
    p.add_argument("--steps", type=int, default=50001)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--weight_decay", type=float, default=1e-7)
    p.add_argument("--grad_clip", type=float, default=5.0)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--half", action="store_true")
    p.add_argument("--scenes", nargs="*", default=None,
                   help="scene names; defaults to every labels json")
    p.add_argument("--label_indices", type=int, nargs="*",
                   default=[4, 5, 6, 7, 8, 10, 11],
                   help="channels folded into the vehicle class")
    return p.parse_args()


def main():
    opt = parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")

    from cobevt_tpu.data.loader import DataLoader
    from cobevt_tpu.data.nuscenes_gen import concat_scene_datasets
    from cobevt_tpu.losses import (
        BinarySegmentationLoss,
        CenterLoss,
        MultipleLoss,
    )
    from cobevt_tpu.metrics import IoUState, iou_compute, iou_update
    from cobevt_tpu.models.sinbevt_nuscenes import (
        CrossViewTransformer,
        PyramidAxialConfig,
    )
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

    scenes = opt.scenes
    if scenes is None:
        scenes = sorted(f[:-5] for f in os.listdir(opt.labels_dir)
                        if f.endswith(".json"))
    dataset = concat_scene_datasets(scenes, opt.dataset_dir,
                                    opt.labels_dir)
    loader = DataLoader(dataset, opt.batch, shuffle=True)

    model = CrossViewTransformer(
        PyramidAxialConfig(),
        decoder_blocks=(128, 128, 64), dim_last=64,
        outputs=(("bev", (0, 1)), ("center", (1, 2))),
        dtype=jnp.bfloat16 if opt.half else None)

    label_idx = (tuple(opt.label_indices),)
    criterion = MultipleLoss(
        losses=(("bev", BinarySegmentationLoss(
            label_indices=label_idx, min_visibility=2)),
            ("center", CenterLoss(min_visibility=2))),
        weights=(("bev", 1.0), ("center", 0.1)))

    tx = make_optimizer(
        onecycle_schedule(opt.lr, opt.steps),
        weight_decay=opt.weight_decay, eps=1e-8,
        grad_clip=opt.grad_clip)

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
    rng = jax.random.PRNGKey(0)

    step = int(state.step)
    epoch = 0
    while step < opt.steps:
        loader.set_epoch(epoch)
        for batch in loader:
            rng, srng = jax.random.split(rng)
            state, logs = train_step(state, batch, srng)
            step += 1
            if step % 50 == 0:
                logger.log(step, {k: float(v) for k, v in logs.items()})
                print(f"step {step} loss {float(logs['loss']):.4f}")
            if step % opt.ckpt_every == 0:
                save_checkpoint(ckpt_dir, state, step)
            if step >= opt.steps:
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
