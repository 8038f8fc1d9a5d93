"""Profiling and timing harness.

The reference has no tracing/profiling at all (SURVEY.md §5 — only
commented-out cout probes in the CUDA op).  BASELINE.md asks for
"speed-of-light kernels (profiled)", so this module makes the evidence
cheap to produce:

- ``time_jitted``: robust wall-clock timing of a compiled function
  (median over repeats, after warmup, with block_until_ready);
- ``cost_summary``: the compiled HLO's own FLOP/byte counts plus a
  roofline speed-of-light estimate for a given chip spec;
- ``trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Callable, Dict

import jax

# Per-chip peak specs used for roofline ratios.
CHIP_SPECS = {
    "tpu_v5e": {"flops_bf16": 197e12, "hbm_bytes_per_s": 819e9},
    "tpu_v4": {"flops_bf16": 275e12, "hbm_bytes_per_s": 1228e9},
    "cpu": {"flops_bf16": 1e11, "hbm_bytes_per_s": 5e10},
}


def time_jitted(fn: Callable, *args, warmup: int = 2,
                repeats: int = 10) -> Dict[str, float]:
    """Median/min wall time of fn(*args) in seconds (fn may be jitted
    or not; outputs are blocked on)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "median_s": statistics.median(times),
        "min_s": min(times),
        "mean_s": statistics.fmean(times),
    }


def cost_summary(jitted_fn, *args, chip: str = "tpu_v5e",
                 measured_s: float = None) -> Dict[str, Any]:
    """FLOPs/bytes from the compiled HLO + roofline SOL estimate."""
    compiled = jitted_fn.lower(*args).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else (cost or {})
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    spec = CHIP_SPECS[chip]
    sol_s = max(flops / spec["flops_bf16"],
                bytes_acc / spec["hbm_bytes_per_s"])
    out = {
        "flops": flops,
        "bytes_accessed": bytes_acc,
        "sol_s": sol_s,
        "compute_bound": flops / spec["flops_bf16"] >=
        bytes_acc / spec["hbm_bytes_per_s"],
    }
    if measured_s is not None:
        out["measured_s"] = measured_s
        out["fraction_of_sol"] = sol_s / measured_s if measured_s else 0.0
    return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
