"""PyTorch state_dict -> flax variables converter.

The flax modules in this framework name their parameters after the torch
attribute paths of the reference implementation, so conversion is purely
mechanical:

  conv  ``*.weight`` (4D)  -> ``kernel`` transposed OIHW -> HWIO
  linear ``*.weight`` (2D) -> ``kernel`` transposed
  embedding ``*.weight``   -> ``embedding`` (path-hint set, no transpose)
  norm  ``*.weight`` (1D)  -> ``scale``;  ``*.bias`` -> ``bias``
  BN running stats         -> ``batch_stats`` collection {mean, var}
  ``num_batches_tracked``  -> dropped

This is the keystone for golden parity tests (random torch weights ->
flax, compare activations) and for importing the reference's published
checkpoints (reference checkpoint format:
opv2v/opencood/tools/train_utils.py:24-65 — plain `torch.save(state_dict)`).

Works on numpy arrays; call `state_dict_to_numpy` first if you have torch
tensors.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np


def state_dict_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in state_dict.items()}


def _set(tree: dict, path, leaf):
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = leaf


def _default_rename(path):
    """Merge torch `downsample.<i>` into flax `downsample_<i>`."""
    out = []
    i = 0
    while i < len(path):
        if path[i] == "downsample" and i + 1 < len(path) and \
                path[i + 1].isdigit():
            out.append(f"downsample_{path[i + 1]}")
            i += 2
        else:
            out.append(path[i])
            i += 1
    return out


def torch_to_flax(
    state_dict: Dict[str, np.ndarray],
    embedding_paths: Iterable[str] = ("rel_pos_bias",
                                      "relative_position_bias_table"),
    rename: Optional[Callable] = None,
) -> dict:
    """Convert a (numpy) torch state_dict to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` (batch_stats omitted
    if the model has no BatchNorm).
    """
    rename = rename or _default_rename
    embedding_paths = set(embedding_paths)

    # find modules that are BatchNorm (have running stats)
    bn_modules = set()
    for key in state_dict:
        parts = key.split(".")
        if parts[-1] in ("running_mean", "running_var"):
            bn_modules.add(tuple(parts[:-1]))

    params: dict = {}
    batch_stats: dict = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        leaf = parts[-1]
        module = tuple(parts[:-1])
        path = rename(parts[:-1])

        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            _set(batch_stats, path + ["mean" if leaf == "running_mean"
                                      else "var"], value)
            continue
        if leaf == "bias":
            _set(params, path + ["bias"], value)
            continue
        if leaf == "weight":
            if module in bn_modules:
                _set(params, path + ["scale"], value)
            elif value.ndim == 4:
                _set(params, path + ["kernel"],
                     np.transpose(value, (2, 3, 1, 0)))
            elif value.ndim == 2:
                if any(seg in embedding_paths for seg in module):
                    _set(params, path + ["embedding"], value)
                else:
                    _set(params, path + ["kernel"], np.transpose(value))
            elif value.ndim == 1:
                _set(params, path + ["scale"], value)
            else:
                raise ValueError(f"unhandled weight ndim for {key}")
            continue
        # any other leaf (e.g. learned positional tensors) passes through
        _set(params, path + [leaf], value)

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
