"""One-command checkpoint porter (tools/port_checkpoint.py): container
unwrapping, prefix stripping, and the end-to-end port of a
reference-format torch checkpoint into a drop-in orbax model_dir."""

import json
import os

import numpy as np
import pytest
import yaml

torch = pytest.importorskip("torch")

from cobevt_tpu.tools.port_checkpoint import (
    load_torch_state_dict,
    parse_args,
    port,
)

from tests.ref_shims import install_torchvision_shim, randomize_bn_stats
from tests.test_corpbevt_parity import HAVE_REF, our_config, ref_config

needs_ref = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


def test_container_unwrap_and_prefix_strip(tmp_path):
    """Plain state_dict, lightning-style {'state_dict': ...}, and
    wrapper-prefix stripping all normalize to the same flat dict."""
    sd = {"backbone.conv.weight": torch.ones(2, 3, 1, 1),
          "backbone.conv.bias": torch.zeros(2)}
    plain = str(tmp_path / "plain.pth")
    torch.save(sd, plain)
    lightning = str(tmp_path / "lightning.ckpt")
    torch.save({"state_dict": sd, "epoch": 3, "optimizer_states": []},
               lightning)

    a = load_torch_state_dict(plain, strip_prefix="backbone.")
    b = load_torch_state_dict(lightning, strip_prefix="backbone.")
    assert set(a) == set(b) == {"conv.weight", "conv.bias"}
    np.testing.assert_array_equal(a["conv.weight"], b["conv.weight"])


def test_non_state_dict_rejected(tmp_path):
    p = str(tmp_path / "bad.pth")
    torch.save([1, 2, 3], p)
    with pytest.raises(ValueError, match="state_dict"):
        load_torch_state_dict(p)


@needs_ref
@pytest.mark.slow
def test_port_reference_checkpoint_end_to_end(tmp_path):
    """torch.save(reference_model.state_dict()) -> port_checkpoint CLI
    -> orbax dir that restores to the same weights, with a finite
    selfcheck forward."""
    import importlib

    import jax
    import optax

    from cobevt_tpu.configs.hypes import load_hypes, model_config_from_hypes
    from cobevt_tpu.models.corpbevt import CorpBEVT
    from cobevt_tpu.tools.export_config import hypes_from_corpbevt
    from cobevt_tpu.tools.port_checkpoint import synthetic_batch
    from cobevt_tpu.train import create_train_state, make_optimizer
    from cobevt_tpu.train.checkpoint import latest_step, restore_checkpoint

    install_torchvision_shim()
    ref_corp = importlib.import_module("opencood.models.corpbevt")

    torch.manual_seed(0)
    ref = ref_corp.CorpBEVT(ref_config()).eval()
    with torch.no_grad():
        randomize_bn_stats(ref, seed=5)
    pth = str(tmp_path / "net_epoch3.pth")
    torch.save(ref.state_dict(), pth)

    cfg = our_config()
    hypes = hypes_from_corpbevt(cfg, "tiny_port_test")
    ypath = str(tmp_path / "tiny.yaml")
    with open(ypath, "w") as f:
        yaml.safe_dump(hypes, f)
    # the exported yaml must rebuild the exact config the weights fit
    _, rebuilt = model_config_from_hypes(load_hypes(ypath))
    assert rebuilt == cfg

    out = str(tmp_path / "ported")
    report = port(parse_args([
        "--torch", pth, "--hypes_yaml", ypath, "--out", out,
        "--selfcheck"]))
    assert report["ok"] and report["selfcheck"]["finite"]
    assert os.path.exists(os.path.join(out, "config.yaml"))
    assert latest_step(os.path.join(out, "ckpt")) == 0

    # restore the ported orbax checkpoint and pin one leaf against the
    # torch source (conv1 OIHW -> HWIO)
    model = CorpBEVT(cfg)
    hypes2 = load_hypes(ypath)
    batch = synthetic_batch(hypes2)
    tx = make_optimizer(optax.constant_schedule(1e-3))
    state = create_train_state(model, tx, batch)
    restored, step = restore_checkpoint(os.path.join(out, "ckpt"), state)
    assert step == 0
    want = ref.state_dict()["encoder.encoder.conv1.weight"].numpy()
    got = np.asarray(jax.tree.leaves(
        {"k": restored.params["encoder"]["encoder"]["conv1"]["kernel"]}
    )[0])
    np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0),
                               atol=1e-6)
