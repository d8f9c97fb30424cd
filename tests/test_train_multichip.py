"""Multi-device training tests on the virtual 8-CPU mesh.

Validates the TPU-native replacement for the reference's DDP stack:
sharded-jit data parallelism (+ tensor-parallel kernel splits) produces
the same loss as single-device execution and actually updates params.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cobevt_tpu.losses import VanillaSegLoss
from cobevt_tpu.models.corpbevt import CorpBEVT, CorpBEVTConfig
from cobevt_tpu.models.fax import FAXConfig
from cobevt_tpu.parallel import make_mesh, shard_batch
from cobevt_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    place_state,
    cosine_warmup_schedule,
)


def tiny_config(max_cav=2):
    fax = FAXConfig(
        dim=(32, 32, 32), middle=(1, 1, 1),
        image_height=64, image_width=64,
        heads=(2, 2, 2), dim_head=(16, 16, 16),
        q_win_size=((4, 4), (4, 4), (4, 4)),
        feat_win_size=((2, 2), (2, 2), (2, 2)),
        bev_embedding_flag=(True, False, False),
        bev_height=32, bev_width=32, upsample_scales=(2, 4, 8),
        self_attn_dim_head=16, self_attn_dropout=0.0, self_attn_window=4)
    return CorpBEVTConfig(
        max_cav=max_cav, target="dynamic", encoder_num_layers=18,
        encoder_id_pick=(1, 2, 3), image_height=64, image_width=64,
        fax=fax, sttf_resolution=0.8, sttf_downsample_rate=4,
        use_roi_mask=True, fusion_mlp_dim=32, fusion_window_size=2,
        fusion_dim_head=8, fusion_dropout=0.0, fusion_depth=1,
        fusion_mask=True, decoder_num_layer=3, decoder_num_ch=(16, 24, 32),
        seg_head_dim=16, output_class=2)


def tiny_batch(B=4, L=2, M=1, img=64, bev_out=32, seed=0):
    rng = np.random.RandomState(seed)
    intrinsic = np.zeros((B, L, M, 3, 3), np.float32)
    intrinsic[..., 0, 0] = 60.0
    intrinsic[..., 1, 1] = 60.0
    intrinsic[..., 0, 2] = img / 2
    intrinsic[..., 1, 2] = img / 2
    intrinsic[..., 2, 2] = 1.0
    return {
        "inputs": jnp.asarray(
            rng.rand(B, L, M, img, img, 3).astype(np.float32)),
        "intrinsic": jnp.asarray(intrinsic),
        "extrinsic": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, M, 1, 1))),
        "transformation_matrix": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (B, L, 1, 1))),
        "agent_mask": jnp.ones((B, L), jnp.float32),
        "gt_dynamic": jnp.asarray(
            rng.randint(0, 2, (B, 1, bev_out, bev_out))),
    }


def make_criterion():
    loss = VanillaSegLoss(target="dynamic", d_weights=75.0, d_coe=2.0)

    def criterion(out, batch):
        return loss(out, {"gt_dynamic": batch["gt_dynamic"],
                          "gt_static": batch["gt_dynamic"]})
    return criterion


@pytest.mark.slow
@pytest.mark.parametrize("n_model", [1, 2])
def test_train_step_dp_tp(n_model):
    assert jax.device_count() >= 8
    model = CorpBEVT(tiny_config())
    batch = tiny_batch(B=4)
    tx = make_optimizer(cosine_warmup_schedule(2e-4, 2e-5, 10, 100),
                        weight_decay=1e-2, eps=1e-10)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, make_criterion(), donate=False)

    mesh = make_mesh(n_data=4, n_model=n_model)
    sharded_state = place_state(state, mesh, use_tp=n_model > 1)
    sharded_batch = shard_batch(mesh, batch)
    new_state, logs = step(sharded_state, sharded_batch,
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))

    # parity vs single-device execution
    single_state, single_logs = step(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(logs["loss"]),
                               float(single_logs["loss"]), rtol=1e-4)

    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         new_state.params, state.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_metrics_reduce_over_mesh():
    """IoU counters sum correctly when computed per-shard then reduced."""
    from cobevt_tpu.metrics import IoUState, iou_compute, iou_update

    rng = np.random.RandomState(0)
    logits = rng.randn(8, 16, 16, 1).astype(np.float32)
    label = (rng.rand(8, 16, 16, 1) > 0.5).astype(np.float32)

    full = iou_update(IoUState.create(), jnp.asarray(logits),
                      jnp.asarray(label))
    parts = [iou_update(IoUState.create(), jnp.asarray(logits[i::2]),
                        jnp.asarray(label[i::2])) for i in range(2)]
    summed = jax.tree.map(lambda *xs: sum(xs), *parts)
    np.testing.assert_allclose(np.asarray(iou_compute(summed)),
                               np.asarray(iou_compute(full)), rtol=1e-6)


@pytest.mark.slow
def test_agent_axis_sharding():
    """Cooperative parallelism: batch over "data" x agents over "model"
    — per-agent encoder/FAX runs chip-local, fusion all-gathers.  Loss
    must match single-device execution."""
    from cobevt_tpu.parallel import cooperative_batch_sharding

    model = CorpBEVT(tiny_config())
    batch = tiny_batch(B=2)
    tx = make_optimizer(cosine_warmup_schedule(2e-4, 2e-5, 10, 100),
                        weight_decay=1e-2, eps=1e-10)
    state = create_train_state(model, tx, batch)
    step = make_train_step(model, make_criterion(), donate=False)

    mesh = make_mesh(n_data=2, n_model=2)   # L=2 agents over "model"
    sharded_state = place_state(state, mesh, use_tp=False)
    sharded_batch = cooperative_batch_sharding(mesh, batch)
    new_state, logs = step(sharded_state, sharded_batch,
                           jax.random.PRNGKey(3))
    single_state, single_logs = step(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(logs["loss"]),
                               float(single_logs["loss"]), rtol=1e-4)
