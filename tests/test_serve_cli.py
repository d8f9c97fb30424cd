"""Serving CLI smoke: checkpoint -> bucketed synthetic serving loop.

End-to-end over the deployment path (reference batch-1 eval loop,
opv2v/opencood/tools/inference_camera.py:24): export a corpbevt hypes
YAML, save an orbax checkpoint, then run `tools/serve_camera.py` in
synthetic mode and check the latency summary covers every agent-count
bucket it served.
"""

import copy
import json
import os
import sys

import pytest
import yaml
import optax

from cobevt_tpu.configs.hypes import load_hypes, model_config_from_hypes
from cobevt_tpu.tools.export_config import export_preset
from cobevt_tpu.tools.train_camera import build_from_hypes
from cobevt_tpu.train import create_train_state, make_optimizer
from cobevt_tpu.train.checkpoint import save_checkpoint

from tests.test_config_reachability import _shrink, _tiny_batch


@pytest.mark.slow
def test_serve_camera_synthetic(tmp_path, monkeypatch, capsys):
    import numpy as np

    from cobevt_tpu.tools import serve_camera

    small = _shrink(export_preset("corpbevt"))
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(small, f, sort_keys=False)

    hypes = load_hypes(str(tmp_path / "config.yaml"))
    cfg, model, _ = build_from_hypes(hypes)
    rng = np.random.RandomState(0)
    sample = _tiny_batch(cfg.max_cav, 32, rng)
    state = create_train_state(
        model, make_optimizer(optax.constant_schedule(0.0)), sample)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=0)

    monkeypatch.setattr(sys, "argv", [
        "serve_camera", "--model_dir", str(tmp_path),
        "--synthetic", "6", "--bucketing", "staged",
        "--report", str(tmp_path / "report.json"),
        "--out_dir", str(tmp_path / "preds")])
    summary = serve_camera.main()

    assert summary["frames"] == 6
    assert summary["frames_per_sec"] > 0
    # overall percentiles are true per-frame distributions
    assert summary["p50_ms"] <= summary["p95_ms"] <= summary["p99_ms"]
    served = sum(b["frames"] for b in summary["buckets"].values())
    assert served == 6
    # every served frame wrote an argmax map
    preds = [p for p in os.listdir(tmp_path / "preds")
             if p.endswith(".npz")]
    assert len(preds) == 6
    # the summary line is machine-readable
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["bucketing"] == "staged"
    # --report wrote the same summary
    with open(tmp_path / "report.json") as f:
        assert json.load(f)["frames"] == 6

    # pipelined mode (dispatch-ahead) serves the same frames
    monkeypatch.setattr(sys, "argv", [
        "serve_camera", "--model_dir", str(tmp_path),
        "--synthetic", "5", "--bucketing", "staged", "--pipeline", "2"])
    summary2 = serve_camera.main()
    assert summary2["frames"] == 5
    assert sum(b["frames"] for b in summary2["buckets"].values()) == 5
