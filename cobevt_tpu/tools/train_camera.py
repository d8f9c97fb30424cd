"""OPV2V cooperative camera training CLI.

Capability parity with reference opv2v/opencood/tools/train_camera.py:
  python -m cobevt_tpu.tools.train_camera --hypes_yaml <yaml> \
      [--model_dir <resume_dir>] [--half]

Builds dataset + model + loss from the hypes yaml, trains with the
sharded-jit data-parallel step over all local devices, checkpoints via
orbax, and logs to tensorboard/JSONL.  `--half` switches model compute
to bfloat16 (the TPU analogue of the reference's AMP flag,
train_camera.py:123-124).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("cobevt_tpu camera training")
    p.add_argument("--hypes_yaml", required=True)
    p.add_argument("--model_dir", default="",
                   help="resume from this checkpoint dir")
    p.add_argument("--half", action="store_true",
                   help="bfloat16 compute")
    p.add_argument("--save_dir", default="runs/default")
    p.add_argument("--uint8_input", action="store_true",
                   help="host ships resized uint8 images, models "
                        "normalize on device (4x less host float work "
                        "and host->device bytes; numerics identical — "
                        "nn/layers.py:images_from_uint8)")
    p.add_argument("--input_cache", default="",
                   help="directory for the decode-once sample cache "
                        "(data/cache.py); with --uint8_input this is "
                        "the pipeline that feeds the chip on a 1-core "
                        "host (INPUT_r04.json).  Freezes wild-setting "
                        "noise draws and per-epoch CAV shuffling at "
                        "cache-build time.")
    return p.parse_args()


def build_from_hypes(hypes, half=False):
    """Model + criterion from hypes — dispatches over ALL 8 camera graphs
    (reference train_utils.create_model, train_utils.py:102-135)."""
    import jax.numpy as jnp

    from cobevt_tpu.configs.hypes import (
        build_from_hypes as build_model,
        model_config_from_hypes,
    )
    from cobevt_tpu.losses import VanillaSegLoss

    _, cfg = model_config_from_hypes(hypes)
    model = build_model(hypes, dtype=jnp.bfloat16 if half else None)

    loss_args = hypes["loss"]["args"]
    seg_loss = VanillaSegLoss(
        target=loss_args["target"], d_weights=loss_args["d_weights"],
        s_weights=loss_args["s_weights"],
        l_weights=loss_args.get("l_weights", 50.0),
        d_coe=loss_args["d_coe"], s_coe=loss_args["s_coe"])

    def criterion(out, batch):
        return seg_loss(out, {"gt_dynamic": batch["gt_dynamic"],
                              "gt_static": batch["gt_static"]})
    return cfg, model, criterion


def main():
    opt = parse_args()

    # multi-host rendezvous BEFORE any other JAX call (no-op on one
    # host) — reference NCCL bring-up equivalent, multi_gpu_utils.py:16
    from cobevt_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()

    from cobevt_tpu.configs.hypes import load_hypes, save_config_snapshot
    from cobevt_tpu.data.loader import DataLoader
    from cobevt_tpu.data.opv2v import (
        OPV2VScenarioDatabase,
        WildConfig,
    )
    from cobevt_tpu.train import (
        cosine_warmup_schedule,
        create_train_state,
        make_optimizer,
    )
    from cobevt_tpu.train.loop import Trainer, TrainerConfig

    hypes = load_hypes(opt.hypes_yaml,
                       opt.model_dir if opt.model_dir else None)
    cfg, model, criterion = build_from_hypes(hypes, opt.half)

    tp = hypes["train_params"]
    wild = WildConfig(**hypes.get("wild_setting", {})) \
        if "wild_setting" in hypes else WildConfig()
    img_hw = (hypes["preprocess"]["args"]["resize_y"],
              hypes["preprocess"]["args"]["resize_x"])

    from cobevt_tpu.data import DATASET_REGISTRY

    ds_cls = DATASET_REGISTRY[hypes["fusion"]["core_method"]]
    train_db = OPV2VScenarioDatabase(hypes["root_dir"],
                                     max_cav=tp["max_cav"],
                                     shuffle_cavs=True)
    val_db = OPV2VScenarioDatabase(hypes["validate_dir"],
                                   max_cav=tp["max_cav"])
    ds_kwargs = {}
    if opt.uint8_input:
        ds_kwargs["normalize"] = False
    train_ds = ds_cls(train_db, image_hw=img_hw,
                      visible=tp.get("visible", True),
                      wild=wild, train=True, **ds_kwargs)
    val_ds = ds_cls(val_db, image_hw=img_hw,
                    visible=tp.get("visible", True),
                    train=False, **ds_kwargs)
    if opt.input_cache:
        from cobevt_tpu.data.cache import CachedDataset

        train_ds = CachedDataset(train_ds,
                                 os.path.join(opt.input_cache, "train"))
        val_ds = CachedDataset(val_ds,
                               os.path.join(opt.input_cache, "val"))

    # per-host sharding (after maybe_initialize_distributed,
    # process_count/index span the pod; replaces DistributedSampler)
    train_loader = DataLoader(train_ds, tp["batch_size"], shuffle=True,
                              num_shards=jax.process_count(),
                              shard_index=jax.process_index())
    val_loader = DataLoader(val_ds, 1, shuffle=False, drop_last=False,
                            num_shards=jax.process_count(),
                            shard_index=jax.process_index())

    steps_per_epoch = max(len(train_loader), 1)
    sched_cfg = hypes["lr_scheduler"]
    schedule = cosine_warmup_schedule(
        base_lr=hypes["optimizer"]["lr"],
        warmup_lr=sched_cfg.get("warmup_lr", hypes["optimizer"]["lr"]),
        warmup_steps=sched_cfg.get("warmup_epoches", 0) * steps_per_epoch,
        total_steps=tp["epoches"] * steps_per_epoch,
        lr_min=sched_cfg.get("lr_min", 0.0))
    tx = make_optimizer(schedule,
                        weight_decay=hypes["optimizer"]["args"].get(
                            "weight_decay", 1e-2),
                        eps=hypes["optimizer"]["args"].get("eps", 1e-10))

    sample = train_ds[0]
    sample_batch = {k: np.stack([v]) for k, v in sample.items()}
    state = create_train_state(model, tx, sample_batch)

    save_dir = opt.model_dir or opt.save_dir
    save_config_snapshot(hypes, save_dir)
    trainer = Trainer(model, criterion, state, TrainerConfig(
        epochs=tp["epoches"], eval_freq=tp.get("eval_freq", 5),
        save_freq=tp.get("save_freq", 5),
        ckpt_dir=os.path.join(save_dir, "ckpt"),
        log_dir=os.path.join(save_dir, "logs"),
        seg_target=cfg.target))
    trainer.maybe_resume()

    def reshuffle(epoch):
        train_db.reinitialize()          # re-shuffle CAV ordering

    # the sample cache keys on index only — re-shuffling CAV order under
    # it would serve stale agents, so the cache pins one CAV ordering
    # (the batch-order shuffle in DataLoader is unaffected)
    on_epoch_end = None if opt.input_cache else reshuffle
    trainer.fit(train_loader, val_loader, on_epoch_end=on_epoch_end)


if __name__ == "__main__":
    main()
