"""OPV2V cooperative camera inference/eval CLI.

Capability parity with reference opv2v/opencood/tools/inference_camera.py:
  python -m cobevt_tpu.tools.inference_camera --model_dir <ckpt_dir>

Loads config.yaml + the latest checkpoint from the model dir, runs the
validation set, prints mean Road/Lane/Dynamic IoU, and optionally dumps
prediction panels.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("cobevt_tpu camera inference")
    p.add_argument("--model_dir", required=True)
    p.add_argument("--save_vis", action="store_true")
    return p.parse_args()


def main():
    opt = parse_args()

    from cobevt_tpu.configs.hypes import load_hypes
    from cobevt_tpu.data.loader import DataLoader
    from cobevt_tpu.data.opv2v import (
        OPV2VCameraDataset,
        OPV2VScenarioDatabase,
    )
    from cobevt_tpu.tools.train_camera import build_from_hypes
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train.checkpoint import restore_checkpoint
    from cobevt_tpu.train.loop import Trainer, TrainerConfig
    import optax

    hypes = load_hypes(os.path.join(opt.model_dir, "config.yaml"))
    cfg, model, criterion = build_from_hypes(hypes)

    tp = hypes["train_params"]
    img_hw = (hypes["preprocess"]["args"]["resize_y"],
              hypes["preprocess"]["args"]["resize_x"])
    db = OPV2VScenarioDatabase(hypes["validate_dir"],
                               max_cav=tp["max_cav"])
    ds = OPV2VCameraDataset(db, image_hw=img_hw,
                            visible=tp.get("visible", True), train=False)
    loader = DataLoader(ds, 1, shuffle=False, drop_last=False)

    sample_batch = {k: np.stack([v]) for k, v in ds[0].items()}
    state = create_train_state(model, make_optimizer(optax.constant_schedule(0.0)),
                               sample_batch)
    state, step = restore_checkpoint(os.path.join(opt.model_dir, "ckpt"),
                                     state)
    if step is None:
        raise FileNotFoundError(
            f"no checkpoint found under {opt.model_dir}/ckpt")

    trainer = Trainer(model, criterion, state,
                      TrainerConfig(seg_target=cfg.target))
    ious = trainer.evaluate(loader)
    for k, v in sorted(ious.items()):
        print(f"{k}: {v:.4f}")
    if opt.save_vis:
        from cobevt_tpu.utils.visualization import save_prediction_panels
        save_prediction_panels(model, state, loader,
                               os.path.join(opt.model_dir, "vis"),
                               target=cfg.target)


if __name__ == "__main__":
    main()
