"""Jitted train/eval steps over a device mesh.

The reference's per-step flow (forward, loss, backward, DDP allreduce,
optimizer step — opv2v/opencood/tools/train_camera.py:133-237) compiles
here into ONE XLA program: gradients reduce over the "data" mesh axis
inside the step, BN stats are global-batch, and the optimizer update runs
sharded.  No separate communication phase exists.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cobevt_tpu.parallel.mesh import batch_sharding, param_sharding
from cobevt_tpu.train.state import TrainState


def make_train_step(model, criterion, mesh=None, use_tp: bool = True,
                    donate: bool = True, log_grad_norm: bool = True):
    """Build a jitted train step:  (state, batch, rng) -> (state, logs).

    ``criterion(output, batch) -> (loss, parts_dict)``.
    If ``mesh`` is given, input/output shardings are pinned: batch over
    "data", state per tensor-parallel rules.
    ``log_grad_norm=False`` drops the global-norm reduction over every
    parameter leaf from the step (pure observability — the reference
    loop logs loss only, opv2v/opencood/tools/train_camera.py:150-162).
    """

    def step(state: TrainState, batch, rng):
        def loss_fn(params):
            variables = {"params": params}
            has_bn = bool(state.batch_stats)
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, batch, True,
                              mutable=["batch_stats"] if has_bn else [],
                              rngs={"dropout": rng})
            if isinstance(out, tuple):
                out, updates = out
                new_bs = updates.get("batch_stats", state.batch_stats)
            else:
                new_bs = state.batch_stats
            loss, parts = criterion(out, batch)
            return loss, (new_bs, parts)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, parts)), grads = grad_fn(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        logs = dict(parts)
        logs["loss"] = loss
        if log_grad_norm:
            logs["grad_norm"] = optax_global_norm(grads)
        return new_state, logs

    # Sharding is carried by the argument placements (see `place_state` /
    # `shard_batch`); jit propagates them and inserts the collectives.
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _fresh_put(x, sharding):
    """device_put that never aliases its input.

    ``jax.device_put`` returns the SAME array when the sharding already
    matches; a later donated train step would then delete the caller's
    buffers through the alias (the dryrun places the same host state onto
    several meshes and donates one of them).  Force a real copy in that
    case — it only triggers when the placement would have been free."""
    y = jax.device_put(x, sharding)
    if y is x:
        y = jax.device_put(jnp.array(x, copy=True), sharding)
    return y


def place_state(state: TrainState, mesh, use_tp: bool = True) -> TrainState:
    """Device-put the train state onto the mesh: params/opt_state follow
    the tensor-parallel rules (or replication), counters replicated.
    Always returns fresh buffers (donation-safe, see `_fresh_put`)."""
    shardings = param_sharding(mesh, state.params, use_tp)
    from cobevt_tpu.parallel.mesh import replicated
    rep = replicated(mesh)
    # opt_state starts replicated; after the first donated step XLA leaves
    # the Adam moments sharded like their params.
    return state.replace(
        step=_fresh_put(state.step, rep),
        params=jax.tree_util.tree_map_with_path(
            lambda p, l: _fresh_put(l, _lookup(shardings, p)),
            state.params),
        batch_stats=jax.tree.map(lambda l: _fresh_put(l, rep),
                                 state.batch_stats),
        opt_state=jax.tree.map(lambda l: _fresh_put(l, rep),
                               state.opt_state))


def _lookup(tree, path):
    node = tree
    for k in path:
        key = getattr(k, "key", None)
        if key is None:
            key = getattr(k, "idx", None)
        node = node[key]
    return node


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.vdot(x, x).real for x in leaves))


def make_eval_step(model, criterion=None):
    """Jitted eval step: (state, batch) -> (outputs, loss_parts|None)."""

    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = model.apply(variables, batch, False)
        if criterion is None:
            return out, None
        loss, parts = criterion(out, batch)
        parts = dict(parts)
        parts["loss"] = loss
        return out, parts

    return jax.jit(step)
