"""The trace-table CLI attributes device time by module scope.

The optimization protocol (docs/DESIGN.md) depends on this attribution;
pin it on a synthetic Perfetto trace so the checked-in tool keeps
producing the module tables the design notes cite.
"""

import gzip
import json
import os

from cobevt_tpu.tools.parse_trace import (
    device_pids,
    find_trace_files,
    load_events,
    main,
    module_key,
)


def _write_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 (TensorCore)"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "Host threads python"}},
        # device ops: two under encoder/layer1_0, one under fax/stage0
        {"ph": "X", "pid": 1, "ts": 0, "dur": 1500.0, "name": "fusion.1",
         "args": {"tf_op": "jit(chain)/encoder/layer1_0/conv1/conv"}},
        {"ph": "X", "pid": 1, "ts": 2, "dur": 500.0, "name": "fusion.2",
         "args": {"tf_op": "jit(chain)/encoder/layer1_0/conv2/conv"}},
        {"ph": "X", "pid": 1, "ts": 4, "dur": 1000.0,
         "name": "convolution.3",
         "args": {"tf_op": "jit(chain)/fax/stage0/attn/dot"}},
        # host event must be excluded
        {"ph": "X", "pid": 2, "ts": 0, "dur": 9999.0, "name": "hostwork",
         "args": {}},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    p = d / "host.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_module_aggregation(tmp_path, capsys):
    root = _write_trace(tmp_path)
    files = find_trace_files(root)
    assert len(files) == 1
    events = load_events(files[0])
    pids = device_pids(events)
    assert pids == {1}

    assert main([root, "--depth", "2", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["device_total_ms"] == 3.0
    rows = {r["key"]: r for r in out["rows"]}
    assert rows["encoder/layer1_0"]["ms"] == 2.0
    assert rows["fax/stage0"]["ms"] == 1.0
    assert abs(rows["encoder/layer1_0"]["pct"] - 66.67) < 0.1


def test_opcode_mode(tmp_path, capsys):
    root = _write_trace(tmp_path)
    assert main([root, "--by", "op", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    rows = {r["key"]: r for r in out["rows"]}
    assert rows["fusion"]["ms"] == 2.0
    assert rows["convolution"]["ms"] == 1.0


def test_bandwidth_report(tmp_path, capsys):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        # container: excluded from leaf sums
        {"ph": "X", "pid": 1, "ts": 0, "dur": 5000.0, "name": "while.1",
         "args": {"hlo_category": "while", "bytes_accessed": "999999"}},
        {"ph": "X", "pid": 1, "ts": 0, "dur": 1000.0, "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion",
                  "bytes_accessed": str(2 * 10 ** 9)}},
        {"ph": "X", "pid": 1, "ts": 2, "dur": 1000.0, "name": "copy.2",
         "args": {"hlo_category": "copy-done",
                  "bytes_accessed": str(1 * 10 ** 9)}},
    ]
    d = tmp_path / "p"
    d.mkdir()
    p = d / "h.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    assert main([str(tmp_path), "--bandwidth", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["leaf_device_ms"] == 2.0
    assert out["bytes_gb"] == 3.0
    # 3 GB over 2 ms = 1500 GB/s
    assert out["achieved_gbs"] == 1500.0
    cats = {c["category"]: c for c in out["by_category"]}
    assert cats["convolution fusion"]["gb"] == 2.0
    assert "while" not in cats


def test_depth_key():
    ev = {"name": "fusion.7",
          "args": {"tf_op": "jit(f)/a/b/c/d"}}
    assert module_key(ev, 2, "module") == "a/b"
    assert module_key(ev, 9, "module") == "a/b/c/d"
    assert module_key({"name": "%custom-call.42", "args": {}}, 3,
                      "op") == "custom-call"
