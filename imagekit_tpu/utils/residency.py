"""Honest device-resident throughput measurement.

Round 3 proved (BASELINE.md, "device-resident measurement corrected")
that on the tunnelled runtime ``jax.block_until_ready`` resolves
client-side futures WITHOUT a device round trip — a timing loop that
ends with it measured up to 40x optimistic. Two mechanisms are required
for a trustworthy reading, and this module is the single place both
live (pinned by ``tests/test_residency.py`` — VERDICT r3 #8):

1. **Chained dependency**: every step's input carries a data dependency
   on the previous step's output, so the runtime cannot elide, dedupe,
   or overlap executions behind the timing window.
2. **Host readback sync**: each timed window ends with a host readback
   of at least one output element — the only sync primitive that
   provably waits for the device on this tunnel. Its RTT is amortized
   over the window and NOT subtracted (readings are conservative).

Round 4 adds the adaptive estimator (VERDICT r3 #1): the round-3 loop
ran a fixed 64 reps, ~0.45 s per window, of which the ~35-95 ms
readback RTT was 8-20%% — tunnel noise, not chip time, dominated the
spread (4.5-22k img/s across recorded runs). The window now GROWS until
the measured readback RTT is below ``target_overhead`` of the window,
then K independent windows are taken and the median/min/max reported.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

__all__ = ["chained_readback_rate"]


def chained_readback_rate(
    dstep: Callable[..., Any],
    dep0: Any,
    args: Sequence[Any],
    *,
    items_per_step: int,
    readback: Callable[[Any], np.ndarray],
    target_overhead: float = 0.02,
    windows: int = 5,
    reps0: int = 32,
    reps_cap: int = 4096,
    rtt_s: float | None = None,
    max_total_s: float = 90.0,
) -> Dict[str, Any]:
    """Measure a chained device-resident loop's throughput.

    ``dstep(dep, *args) -> (dep', out)`` must thread ``dep`` through a
    data dependency on ``out`` (the jitted step does
    ``dep' = dep + 0 * f(out)``); ``readback(out)`` must pull >=1 output
    element to the host. Returns a dict with the per-window rates and
    the median/min/max statistic, the final dependency value (so tests
    can prove every execution actually ran), and the RTT estimate.
    """
    dep = dep0
    # one step + full-window sync so compile/stage costs are outside
    # every timed window
    dep, out = dstep(dep, *args)
    readback(out)
    if rtt_s is None:
        # readback of an already-computed buffer = pure link round trip
        t0 = time.perf_counter()
        readback(out)
        rtt_s = time.perf_counter() - t0

    last_out = out

    def window(reps: int) -> float:
        nonlocal dep, last_out
        t0 = time.perf_counter()
        for _ in range(reps):
            dep, out = dstep(dep, *args)
        readback(out)
        last_out = out
        return time.perf_counter() - t0

    t_start = time.perf_counter()
    reps = reps0
    dt = window(reps)
    grow = 1
    while (
        rtt_s > target_overhead * dt
        and reps < reps_cap
        and time.perf_counter() - t_start < max_total_s / 2
    ):
        reps = min(reps * 2, reps_cap)
        dt = window(reps)
        grow += 1

    rates: List[float] = [reps * items_per_step / dt]
    dts: List[float] = [dt]
    for _ in range(max(0, windows - 1)):
        if time.perf_counter() - t_start > max_total_s:
            break  # report what we have rather than run unbounded
        dt = window(reps)
        rates.append(reps * items_per_step / dt)
        dts.append(dt)

    return {
        "ips_median": float(np.median(rates)),
        "ips_min": float(min(rates)),
        "ips_max": float(max(rates)),
        "ips_windows": [round(r, 1) for r in rates],
        "window_s": [round(t, 3) for t in dts],
        "reps": reps,
        "rtt_ms": round(rtt_s * 1e3, 2),
        "overhead_pct": round(100.0 * rtt_s / (sum(dts) / len(dts)), 2),
        "final_dep": dep,
        "final_out": last_out,  # device refs of the last step's output
    }
