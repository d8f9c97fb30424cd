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
    """Flatten torch Sequential/ModuleList digit indices into their parent
    segment: ``layers.0.0.conv1`` -> ``layers_0_0 / conv1``.  Our flax
    modules never use bare-digit child names, so this is bijective."""
    out = []
    for seg in path:
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


def _leaves_match(a_shape, b_shape):
    return int(np.prod(a_shape)) == int(np.prod(b_shape))


def _flatten(tree: dict, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, path + (k,))
        else:
            yield "/".join(path + (k,)), np.shape(v)


def manifest_diff(converted: dict, template: dict):
    """Compare a converted checkpoint tree against a model's variable
    template: returns (missing, unexpected, mismatched) flat-path lists.

    Unlike `fit_to_template` (which raises at the first problem), this
    reports the complete weights manifest in one pass — the loud-fail
    surface for porting *real* published reference checkpoints whose key
    naming or BN layout may drift from the synthetic test fixtures.
    """
    conv = dict(_flatten(converted))
    temp = dict(_flatten(template))
    missing = sorted(set(temp) - set(conv))
    unexpected = sorted(set(conv) - set(temp))
    mismatched = sorted(
        f"{k}: torch {conv[k]} vs flax {temp[k]}"
        for k in set(conv) & set(temp)
        if int(np.prod(conv[k])) != int(np.prod(temp[k])))
    return missing, unexpected, mismatched


def check_manifest(converted: dict, template: dict, what: str = "params"):
    """Raise one consolidated error listing every missing/unexpected/
    mismatched leaf between a ported checkpoint and the model."""
    missing, unexpected, mismatched = manifest_diff(converted, template)
    if not (missing or unexpected or mismatched):
        return
    lines = [f"torch checkpoint does not match the model ({what}):"]
    for title, items in (("missing in checkpoint", missing),
                         ("unexpected in checkpoint", unexpected),
                         ("shape mismatch", mismatched)):
        if items:
            lines.append(f"  {title} ({len(items)}):")
            lines.extend(f"    {it}" for it in items[:50])
            if len(items) > 50:
                lines.append(f"    ... and {len(items) - 50} more")
    raise ValueError("\n".join(lines))


def fit_to_template(converted: dict, template: dict, path=()) -> dict:
    """Reshape converted leaves to the template's leaf shapes.

    Handles rank mismatches like a torch 1x1 Conv2d ported as (1,1,I,O)
    where the flax module uses a Dense (I,O).  Raises with the offending
    path on any missing key or element-count mismatch — this doubles as a
    structural check that the port is complete.
    """
    out = {}
    for key, tval in template.items():
        if key not in converted:
            raise KeyError(f"missing in torch port: {'/'.join(path + (key,))}")
        cval = converted[key]
        if isinstance(tval, dict):
            out[key] = fit_to_template(cval, tval, path + (key,))
        else:
            cshape = np.shape(cval)
            tshape = np.shape(tval)
            if not _leaves_match(cshape, tshape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path + (key,))}: "
                    f"torch {cshape} vs flax {tshape}")
            out[key] = np.asarray(cval).reshape(tshape)
    extra = set(converted) - set(template)
    if extra:
        raise KeyError(
            f"unexpected torch keys at {'/'.join(path)}: {sorted(extra)}")
    return out


def torch_to_flax(
    state_dict: Dict[str, np.ndarray],
    embedding_paths: Iterable[str] = ("rel_pos_bias",
                                      "relative_position_bias_table"),
    rename: Optional[Callable] = None,
    convtranspose_markers: Iterable[str] = (),
) -> dict:
    """Convert a (numpy) torch state_dict to flax variables.

    Returns ``{"params": ..., "batch_stats": ...}`` (batch_stats omitted
    if the model has no BatchNorm).
    """
    rename = rename or _default_rename
    embedding_paths = set(embedding_paths)
    convtranspose_markers = tuple(convtranspose_markers)

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
        if leaf in ("relative_position_index", "rel_pos_indices",
                    "pos_table"):
            # constant index buffers; recomputed statically on our side
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
                # torch Conv2d is OIHW; ConvTranspose2d is IOHW and flax
                # ConvTranspose (transpose_kernel=False) additionally
                # needs the spatial taps flipped (verified empirically in
                # tests/test_lidar_track.py)
                if any(m in seg for m in convtranspose_markers
                       for seg in module):
                    _set(params, path + ["kernel"],
                         np.ascontiguousarray(
                             np.transpose(value,
                                          (2, 3, 0, 1))[::-1, ::-1]))
                else:
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
