"""FLOPs / MFU accounting for bench artifacts.

The reference ships latency only (nuscenes/scripts/benchmark.py); we
additionally report model FLOPs utilization so "is the perf work
converged?" is answerable from the artifacts: MFU = achieved FLOP/s over
the chip's peak matmul FLOP/s.  FLOPs come from XLA's own cost model on
the compiled executable (`jit(...).lower(...).compile().cost_analysis()`),
so they track the program actually measured, including Pallas custom
calls that register `CostEstimate`s.
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


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """FLOPs of one call of `jitted_fn(*args)` from XLA's cost analysis
    (counts a multiply-add as 2).  None if the backend doesn't report."""
    try:
        compiled = jitted_fn.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):           # one entry per executable
            cost = cost[0]
        flops = cost.get("flops")
        if flops is None or flops <= 0:
            return None
        return float(flops)
    except Exception:
        return None


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization in [0, 1], or None if unknown."""
    peak = device_peak_flops(device)
    if flops_per_call is None or peak is None or seconds_per_call <= 0:
        return None
    return flops_per_call / seconds_per_call / peak
