"""Optimizers and LR schedules matching the reference recipes.

  * OPV2V: AdamW(lr 2e-4, eps 1e-10, wd 1e-2) + cosine anneal with linear
    warmup (reference train_utils.py:174-258, corpbevt.yaml:125-137).
  * nuScenes: AdamW(lr 5e-3, wd 1e-7) + OneCycle + grad-clip 5.0
    (reference model_module.py:85-94, config.yaml:20-31).
"""

from __future__ import annotations

from typing import Optional

import optax


def cosine_warmup_schedule(base_lr: float, warmup_lr: float,
                           warmup_steps: int, total_steps: int,
                           lr_min: float = 0.0):
    """Linear warmup from warmup_lr to base_lr, then cosine to lr_min
    (timm `CosineLRScheduler` semantics used by the reference)."""
    warmup = optax.linear_schedule(warmup_lr, base_lr,
                                   max(warmup_steps, 1))
    cosine = optax.cosine_decay_schedule(
        base_lr, max(total_steps - warmup_steps, 1),
        alpha=lr_min / base_lr if base_lr > 0 else 0.0)
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def onecycle_schedule(max_lr: float, total_steps: int,
                      pct_start: float = 0.3, div_factor: float = 10.0,
                      final_div_factor: float = 10.0):
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr,
        pct_start=pct_start, div_factor=div_factor,
        final_div_factor=final_div_factor)


def make_optimizer(schedule, weight_decay: float = 1e-2,
                   eps: float = 1e-10, grad_clip: Optional[float] = None):
    tx = optax.adamw(schedule, eps=eps, weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
