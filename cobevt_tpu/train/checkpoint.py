"""Orbax checkpointing with epoch-scan resume.

Capability parity with the reference checkpoint flow:
  * periodic `net_epoch{N}.pth` saves + regex scan-resume of the latest
    epoch (opv2v/opencood/tools/train_utils.py:24-65,
    train_camera.py:232-235) -> orbax step directories + latest-step scan;
  * config.yaml snapshot preferred on resume (yaml_utils.py:25-26) ->
    cobevt_tpu.configs.hypes.save_config_snapshot / load_hypes(model_dir).

Also restores from *torch* reference checkpoints via the mechanical
state_dict porter (cobevt_tpu/utils/torch_port.py), which replaces the
reference's `load_saved_model` for cross-framework migration.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = None):
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state, step: int,
                    max_to_keep: Optional[int] = None):
    """Save {params, batch_stats, opt_state, step} at `step`."""
    with _manager(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }))
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if re.fullmatch(r"\d+", name):
            steps.append(int(name))
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, state, step: Optional[int] = None):
    """Restore into an existing TrainState template.  Returns (state,
    step) or (state, None) when nothing to restore."""
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        return state, None
    with _manager(ckpt_dir) as mgr:
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(template))
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"]), step


def restore_from_torch(state, torch_state_dict, drop_prefixes=()):
    """Load a reference torch checkpoint into a TrainState (strict=False
    equivalent: `drop_prefixes` skips modules we don't instantiate).

    Fails loudly with a full weights-manifest diff (every missing /
    unexpected / shape-mismatched leaf at once) when the checkpoint does
    not line up with the model — real published checkpoints with drifted
    key naming or BN layout surface as one readable report, never as a
    silently partial load."""
    from cobevt_tpu.utils.torch_port import (
        check_manifest,
        fit_to_template,
        torch_to_flax,
    )

    sd = {k: v for k, v in torch_state_dict.items()
          if not k.startswith(tuple(drop_prefixes))}
    converted = torch_to_flax(sd)
    check_manifest(converted["params"], state.params, "params")
    if state.batch_stats and "batch_stats" in converted:
        check_manifest(converted["batch_stats"], state.batch_stats,
                       "batch_stats")
    params = fit_to_template(converted["params"], state.params)
    bs = state.batch_stats
    if state.batch_stats and "batch_stats" in converted:
        bs = fit_to_template(converted["batch_stats"], state.batch_stats)
    return state.replace(
        params=jax.tree.map(np.asarray, params),
        batch_stats=jax.tree.map(np.asarray, bs))
