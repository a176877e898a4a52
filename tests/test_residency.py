"""Pins the device-resident measurement honesty mechanisms (VERDICT r3
#8). Round 3 discovered that ``jax.block_until_ready`` does NOT sync on
the tunnelled runtime (readings up to 40x optimistic) and rebuilt the
resident loop with chained dependencies + a host readback
(``imagekit_tpu/utils/residency.py``). These tests fail if that
methodology silently regresses:

- the dependency chain must force every execution (proven by a counting
  kernel: eliding any step changes the final dependency value);
- each timed window must end in a host readback of output data;
- ``bench.py``'s resident section must route through the helper and must
  not reintroduce ``block_until_ready`` as its sync.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from imagekit_tpu.utils.residency import chained_readback_rate

REPO = pathlib.Path(__file__).resolve().parent.parent


def _counting_step():
    """A dstep whose dep counts executions and whose out depends on dep,
    so both chain directions are load-bearing."""

    @jax.jit
    def dstep(dep, x):
        out = x * 2.0 + dep  # out depends on dep
        dep2 = dep + 1.0 + 0.0 * out.flatten()[0]  # dep depends on out
        return dep2, out

    return dstep


def test_chain_counts_every_execution():
    dstep = _counting_step()
    x = jnp.ones((8, 128), jnp.float32)
    readback_calls = []

    def readback(out):
        v = np.asarray(out[:1, :1])
        readback_calls.append(v)
        return v

    stats = chained_readback_rate(
        dstep, jnp.float32(0.0), [x],
        items_per_step=4, readback=readback, windows=3, reps0=4,
        target_overhead=1.0,  # no growth needed on CPU
    )
    # warmup step + the adaptive growth sequence (reps0 doubling up to
    # the final reps — usually just one window on an idle CPU, but a
    # loaded host can legitimately trigger growth) + 2 more windows
    reps = stats["reps"]
    grow = 4
    total_steps = 1 + grow + 2 * reps
    while grow < reps:
        grow *= 2
        total_steps += grow
    assert float(stats["final_dep"]) == total_steps
    # every window ended with a real host readback (plus warmup + RTT)
    assert len(readback_calls) >= 3 + 1
    assert stats["ips_min"] <= stats["ips_median"] <= stats["ips_max"]
    assert len(stats["ips_windows"]) == 3


def test_adaptive_growth_until_overhead_bound():
    """With an artificially large injected RTT the window must grow
    until the RTT is within the target fraction (or the cap)."""
    dstep = _counting_step()
    x = jnp.ones((8, 128), jnp.float32)
    stats = chained_readback_rate(
        dstep, jnp.float32(0.0), [x],
        items_per_step=1,
        readback=lambda out: np.asarray(out[:1, :1]),
        windows=1, reps0=4, reps_cap=256,
        rtt_s=0.05, target_overhead=0.5,
    )
    # 4 reps of a trivial CPU kernel run far under 100 ms, so growth
    # must have engaged; the cap bounds the worst case
    assert stats["reps"] > 4
    assert stats["reps"] <= 256
    assert stats["rtt_ms"] == 50.0


def test_bench_resident_section_uses_helper():
    """Structural pin: the resident measurement in bench.py must route
    through chained_readback_rate and must not reintroduce
    block_until_ready as its sync primitive."""
    src = (REPO / "bench.py").read_text()
    i = src.index("Device-RESIDENT")
    resident_section = src[i:]
    assert "chained_readback_rate" in resident_section
    # comments may MENTION block_until_ready (they document why it's
    # banned); a call to it is the regression
    assert "block_until_ready(" not in resident_section
    assert ".block_until_ready" not in resident_section
    # and the helper itself must still do a per-window host readback
    helper = (REPO / "imagekit_tpu/utils/residency.py").read_text()
    assert "readback(out)" in helper
    assert "block_until_ready(" not in helper
