"""Training / evaluation loops.

Capability parity with the reference OPV2V loop
(opv2v/opencood/tools/train_camera.py:133-237): epoch loop with tqdm-less
progress prints, periodic validation with per-class IoU, periodic
checkpointing, LR scheduling per global step, dataset CAV-order
reshuffling between epochs, and tensorboard scalar logging.  The nuScenes
Lightning loop (model_module.py) maps onto the same Trainer with a
step-based schedule.

The whole optimizer step is ONE jitted program (see train/step.py); the
loop's Python is just data feeding, logging, and checkpoint IO.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Optional

import jax
import numpy as np

from cobevt_tpu.metrics.iou import confusion_counts, per_class_iou
from cobevt_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from cobevt_tpu.train.step import make_eval_step, make_train_step


def snapshot_git_state(log_dir: str):
    """Record the working-tree diff + HEAD at train start (reference
    nuscenes/.../callbacks/gitdiff_callback.py:23)."""
    import subprocess

    try:
        head = subprocess.run(["git", "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout
        diff = subprocess.run(["git", "diff"], capture_output=True,
                              text=True).stdout
        with open(os.path.join(log_dir, "git_state.txt"), "w") as f:
            f.write(f"HEAD: {head}\n{diff}")
    except Exception:
        pass


class MetricLogger:
    """Scalar logging: stdout + JSONL + tensorboard when available."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._tb = None
        self._jsonl = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            snapshot_git_state(log_dir)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float]):
        if self._tb:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"step": step, **{k: float(v) for k, v in
                                  scalars.items()}}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb:
            self._tb.close()
        if self._jsonl:
            self._jsonl.close()


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 1
    eval_freq: int = 5          # epochs between validations
    save_freq: int = 5          # epochs between checkpoints
    log_every: int = 10         # steps between scalar logs
    ckpt_dir: Optional[str] = None
    log_dir: Optional[str] = None
    seg_target: str = "dynamic"
    vis_dir: Optional[str] = None   # dump GT|pred panels at validation
    vis_samples: int = 4
    # donate the (params, opt_state) pytree into the jitted step so XLA
    # updates it in place — halves state HBM footprint and traffic.
    # Disable only for debugging (keeps the pre-step state readable).
    donate: bool = True


class Trainer:
    def __init__(self, model, criterion, state, config: TrainerConfig,
                 rng=None):
        self.model = model
        self.criterion = criterion
        self.state = state
        self.cfg = config
        self.rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.train_step = make_train_step(model, criterion,
                                          donate=config.donate)
        self.eval_step = make_eval_step(model, criterion)
        self.logger = MetricLogger(config.log_dir)
        self.global_step = int(self.state.step)

    def maybe_resume(self):
        if self.cfg.ckpt_dir:
            self.state, step = restore_checkpoint(self.cfg.ckpt_dir,
                                                  self.state)
            if step is not None:
                self.global_step = int(self.state.step)
                print(f"resumed from step {step}")

    def fit(self, train_loader, val_loader=None,
            on_epoch_end: Optional[Callable] = None):
        for epoch in range(self.cfg.epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            for batch in train_loader:
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, logs = self.train_step(self.state, batch,
                                                   step_rng)
                self.global_step += 1
                if self.global_step % self.cfg.log_every == 0:
                    scalars = {k: float(v) for k, v in logs.items()}
                    scalars["epoch"] = epoch
                    self.logger.log(self.global_step, scalars)
                    print(f"[epoch {epoch}] step {self.global_step} "
                          f"loss {scalars['loss']:.4f}")

            print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

            if val_loader is not None and \
                    (epoch + 1) % self.cfg.eval_freq == 0:
                ious = self.evaluate(val_loader)
                self.logger.log(self.global_step,
                                {f"val_{k}": v for k, v in ious.items()})
                print(f"[epoch {epoch}] val IoU: {ious}")

            if self.cfg.ckpt_dir and (epoch + 1) % self.cfg.save_freq == 0:
                save_checkpoint(self.cfg.ckpt_dir, self.state,
                                self.global_step)

            if on_epoch_end is not None:
                on_epoch_end(epoch)
        return self.state

    def evaluate(self, val_loader) -> Dict[str, float]:
        """Mean per-class IoU over the validation set (reference
        seg_utils.cal_iou_training / inference_camera.py:78-84)."""
        conf_dyn = np.zeros((2, 2), np.float64)
        conf_static = np.zeros((3, 3), np.float64)
        dumped = 0
        for batch in val_loader:
            out, _ = self.eval_step(self.state, batch)
            if self.cfg.vis_dir and dumped < self.cfg.vis_samples:
                # per-epoch image dumps (reference
                # train_utils.save_bev_seg_binary :275)
                from cobevt_tpu.utils.visualization import (
                    save_image,
                    seg_panel,
                )
                panel = seg_panel(
                    {k: np.asarray(v) for k, v in out.items()}, batch)
                save_image(os.path.join(
                    self.cfg.vis_dir,
                    f"step{self.global_step}_{dumped}.png"), panel)
                dumped += 1
            if "gt_dynamic" in batch:
                pred = np.asarray(out["dynamic_seg"]).argmax(-1)
                conf_dyn += np.asarray(confusion_counts(
                    pred.reshape(-1), np.asarray(
                        batch["gt_dynamic"]).reshape(-1), 2))
            if "gt_static" in batch and self.cfg.seg_target != "dynamic":
                pred = np.asarray(out["static_seg"]).argmax(-1)
                conf_static += np.asarray(confusion_counts(
                    pred.reshape(-1), np.asarray(
                        batch["gt_static"]).reshape(-1), 3))
        ious = {}
        dyn = np.asarray(per_class_iou(conf_dyn))
        ious["iou_dynamic"] = float(dyn[1])
        if conf_static.sum() > 0:
            st = np.asarray(per_class_iou(conf_static))
            ious["iou_road"] = float(st[1])
            ious["iou_lane"] = float(st[2])
        return ious
