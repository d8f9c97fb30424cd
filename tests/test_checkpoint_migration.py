"""Checkpoint flows: orbax save/restore round trip and migration from a
reference-format torch checkpoint (`torch.save(state_dict)` ->
TrainState)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")

from tests.conftest import add_reference_to_path
from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from tests.test_corpbevt_parity import (
    HAVE_REF,
    make_batch,
    our_config,
    ref_config,
    MAX_CAV,
    N_REAL,
    M,
)
from cobevt_tpu.models.corpbevt import CorpBEVT
from cobevt_tpu.train import create_train_state, make_optimizer
from cobevt_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    restore_from_torch,
    save_checkpoint,
)

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


def small_state(model, batch):
    tx = make_optimizer(optax.constant_schedule(1e-3))
    return create_train_state(model, tx, batch)


def pad_batch(images, intrinsic, extrinsic, tmat):
    def pad(x):
        y = x[:, 0]
        pads = [(0, MAX_CAV - N_REAL)] + [(0, 0)] * (y.ndim - 1)
        return np.pad(y, pads)[None]

    intr = pad(intrinsic)
    intr[:, N_REAL:] = np.eye(3, dtype=np.float32)
    return {
        "inputs": jnp.asarray(pad(images)),
        "intrinsic": jnp.asarray(intr),
        "extrinsic": jnp.asarray(pad(extrinsic)),
        "transformation_matrix": jnp.asarray(tmat),
        "agent_mask": jnp.asarray(
            (np.arange(MAX_CAV) < N_REAL)[None].astype(np.float32)),
    }


@pytest.mark.slow
def test_orbax_roundtrip(tmp_path):
    model = CorpBEVT(our_config())
    images, intrinsic, extrinsic, tmat = make_batch()
    batch = pad_batch(images, intrinsic, extrinsic, tmat)
    state = small_state(model, batch)

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 7)
    assert latest_step(ckpt) == 7

    # restore into a freshly initialized state
    state2 = small_state(model, batch)
    restored, step = restore_checkpoint(ckpt, state2)
    assert step == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_ref
def test_migrate_reference_torch_checkpoint(tmp_path):
    """Save a reference CorpBEVT the reference's way (torch.save of the
    state_dict, train_camera.py:232-235), then load it into our
    TrainState and verify the forward outputs match the torch model."""
    import importlib

    install_torchvision_shim()
    ref_corp = importlib.import_module("opencood.models.corpbevt")

    torch.manual_seed(0)
    ref = ref_corp.CorpBEVT(ref_config()).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=5)
    pth = str(tmp_path / "net_epoch3.pth")
    torch.save(ref.state_dict(), pth)

    images, intrinsic, extrinsic, tmat = make_batch()
    with torch.no_grad():
        ref_out = ref({
            "inputs": torch.from_numpy(images.copy()),
            "intrinsic": torch.from_numpy(intrinsic.copy()),
            "extrinsic": torch.from_numpy(extrinsic.copy()),
            "transformation_matrix": torch.from_numpy(tmat.copy()),
            "record_len": torch.tensor([N_REAL]),
        })["dynamic_seg"].numpy()

    model = CorpBEVT(our_config())
    batch = pad_batch(images, intrinsic, extrinsic, tmat)
    state = small_state(model, batch)

    loaded = torch.load(pth, weights_only=True)
    sd = {k: np.asarray(v.numpy()) for k, v in loaded.items()}
    state = restore_from_torch(state, sd)

    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, False)
    ours = np.asarray(out["dynamic_seg"]).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(ours, ref_out, atol=5e-3, rtol=1e-2)


def test_manifest_check_fails_loudly_on_drifted_checkpoint():
    """A real checkpoint with drifted key naming must raise one
    consolidated manifest report (missing + unexpected + mismatched),
    not a partial load or a single-key error."""
    import pytest

    from cobevt_tpu.utils.torch_port import check_manifest, manifest_diff

    template = {"encoder": {"conv1": {"kernel": np.zeros((3, 3, 4, 8)),
                                      "bias": np.zeros((8,))}},
                "head": {"kernel": np.zeros((8, 2))}}
    converted = {"encoder": {"conv1": {"kernel": np.zeros((3, 3, 4, 8))},
                             "conv_extra": {"kernel": np.zeros((1,))}},
                 "head": {"kernel": np.zeros((8, 3))}}
    missing, unexpected, mismatched = manifest_diff(converted, template)
    assert missing == ["encoder/conv1/bias"]
    assert unexpected == ["encoder/conv_extra/kernel"]
    assert len(mismatched) == 1 and mismatched[0].startswith("head/kernel")

    with pytest.raises(ValueError) as exc:
        check_manifest(converted, template)
    msg = str(exc.value)
    assert "encoder/conv1/bias" in msg
    assert "encoder/conv_extra/kernel" in msg
    assert "head/kernel" in msg

    # a matching manifest is silent
    check_manifest({"encoder": {"conv1": {"kernel": np.zeros((3, 3, 4, 8)),
                                          "bias": np.zeros((8,))}},
                    "head": {"kernel": np.zeros((8, 2))}}, template)
