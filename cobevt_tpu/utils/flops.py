"""FLOPs / bytes / MFU / HBM-utilization accounting for bench artifacts.

The reference ships latency only (nuscenes/scripts/benchmark.py); we
additionally report model FLOPs utilization AND achieved HBM bandwidth
so "is the perf work converged?" is answerable from the artifacts — a
low-MFU workload is only "done" if it sits at the bandwidth roofline.
MFU = achieved FLOP/s over the chip's peak matmul FLOP/s;
hbm_util = achieved bytes/s over the chip's peak HBM bandwidth.
Both numerators come from XLA's own cost model on the compiled
executable (`jit(...).lower(...).compile().cost_analysis()`), so they
track the program actually measured, including Pallas custom calls that
register `CostEstimate`s.  Caveat on bytes: XLA counts logical operand
bytes per HLO, so fully fused chains under-count re-reads and fusion
over-counts never-materialized intermediates roughly cancel — treat
hbm_util as a roofline *position* indicator, not a meter.
"""

from __future__ import annotations

import os
from typing import Optional

# Peak dense matmul FLOP/s by device kind (bf16 inputs, f32 accumulate).
# Sources: published TPU specs; int8 peaks are 2x these.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,     # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,          # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,     # v6e / Trillium
    "TPU v6e": 918e12,
}

# Peak HBM bandwidth (bytes/s) by device kind.  Published TPU specs.
_PEAK_HBM = {
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,      # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,          # v5p
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,     # v6e / Trillium
    "TPU v6e": 1640e9,
}


def device_peak_flops(device=None, int8: bool = False) -> Optional[float]:
    """Peak matmul FLOP/s for `device` (default: first device), or None
    if unknown.  Override with COBEVT_PEAK_TFLOPS (bf16 TFLOP/s)."""
    env = os.environ.get("COBEVT_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12 * (2.0 if int8 else 1.0)
    if device is None:
        import jax

        device = jax.devices()[0]
    peak = _PEAK_BF16.get(getattr(device, "device_kind", ""))
    if peak is None:
        return None
    return peak * 2.0 if int8 else peak


def device_peak_hbm(device=None) -> Optional[float]:
    """Peak HBM bandwidth (bytes/s) for `device`, or None if unknown.
    Override with COBEVT_PEAK_HBM_GBS (GB/s)."""
    env = os.environ.get("COBEVT_PEAK_HBM_GBS")
    if env:
        return float(env) * 1e9
    if device is None:
        import jax

        device = jax.devices()[0]
    return _PEAK_HBM.get(getattr(device, "device_kind", ""))


def _cost_analysis(jitted_fn, *args) -> Optional[dict]:
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):           # one entry per executable
            cost = cost[0]
        return cost
    except Exception:
        return None


def compiled_costs(jitted_fn, *args) -> dict:
    """{'flops': F, 'bytes': B} for one call of `jitted_fn(*args)` from
    XLA's cost analysis (multiply-add = 2 FLOPs; bytes = logical operand
    + output bytes over all HLOs).  Values are None where the backend
    doesn't report."""
    cost = _cost_analysis(jitted_fn, *args)
    out = {"flops": None, "bytes": None}
    if cost is None:
        return out
    flops = cost.get("flops")
    if flops is not None and flops > 0:
        out["flops"] = float(flops)
    nbytes = cost.get("bytes accessed")
    if nbytes is not None and nbytes > 0:
        out["bytes"] = float(nbytes)
    return out


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """FLOPs of one call of `jitted_fn(*args)` from XLA's cost analysis
    (counts a multiply-add as 2).  None if the backend doesn't report."""
    return compiled_costs(jitted_fn, *args)["flops"]


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None if unknown."""
    peak = device_peak_flops(device)
    if flops_per_call is None or peak is None or seconds_per_call <= 0:
        return None
    return flops_per_call / seconds_per_call / peak


def hbm_util(bytes_per_call: Optional[float], seconds_per_call: float,
             device=None) -> Optional[float]:
    """Achieved HBM bandwidth over peak, in [0, ~1], or None if unknown.
    >1 would mean XLA's logical byte count exceeds what the bus can move
    — i.e. heavy fusion elided most of those bytes."""
    peak = device_peak_hbm(device)
    if bytes_per_call is None or peak is None or seconds_per_call <= 0:
        return None
    return bytes_per_call / seconds_per_call / peak


def utilization(costs: dict, seconds_per_call: float, device=None) -> dict:
    """{'mfu': m, 'hbm_util': h, 'hbm_gbs': g} rounded for artifacts."""
    m = mfu(costs.get("flops"), seconds_per_call, device)
    h = hbm_util(costs.get("bytes"), seconds_per_call, device)
    g = (costs["bytes"] / seconds_per_call / 1e9
         if costs.get("bytes") and seconds_per_call > 0 else None)
    out = {
        "mfu": round(m, 4) if m is not None else None,
        "hbm_util": round(h, 4) if h is not None else None,
        "hbm_gbs": round(g, 1) if g is not None else None,
    }
    if h is not None and h > 1.0:
        # >100% of the bus is physically impossible: the cost model's
        # logical byte count exceeds what actually moved (fusion elided
        # re-reads).  Flag inline so no artifact ships an impossible
        # bandwidth unmarked; trace-attributed GB/s (parse_trace
        # --bandwidth) is the meter.
        out["hbm_flag"] = ("cost-model logical bytes > physical peak; "
                           "not achieved bandwidth — see trace_gbs")
    return out
