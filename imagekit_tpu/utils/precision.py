"""Process-level matmul precision knob for the fused device kernels.

Every contraction in the compute path (ops/resize.py, ops/dct.py,
ops/color.py, parallel/sharding.py) historically hard-coded
``jax.lax.Precision.HIGHEST``. On TPU that selects the deepest bf16
multi-pass decomposition of an f32 matmul; ``HIGH`` is the 3-pass form
(error ~2^-21 relative — well inside the host-mirror contract of
"identical math modulo float associativity at quantisation boundaries",
tests/test_batcher.py::test_jpeg_transcode_device_matches_host_mirror).

``IMAGEKIT_MATMUL_PRECISION`` ∈ {highest, high, default} selects the
precision for the whole process (read once at import: jit caches are
keyed by traced HLO, so a per-call knob would silently split the
compile-budgeted signature set). The production default is ``high``,
chosen by the round-4 A/B (tools/precision_ab.py + the nb=32 per-head
re-measure, BASELINE.md "matmul precision A/B"): every fused head runs
+29-40% faster (jxc 28.7k → 40.3k img/s/chip) and the u8 outputs move
by at most ±1 on ~0.04-0.12% of pixels — quantisation-boundary flips,
inside every pinned contract (decode parity is host-side C++; device
contracts are PSNR-level; ETags/cache keys are param-derived, not
content-derived). ``highest`` restores the historical bit pattern.
"""

from __future__ import annotations

import os

import jax

_MAP = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

_name = os.environ.get("IMAGEKIT_MATMUL_PRECISION", "high").strip().lower()
if _name not in _MAP:
    raise ValueError(
        f"IMAGEKIT_MATMUL_PRECISION={_name!r}: expected one of {sorted(_MAP)}"
    )

#: The contraction precision every fused kernel uses (trace-time constant).
MATMUL_PRECISION: jax.lax.Precision = _MAP[_name]

#: The knob's string form, for bench/env reporting.
MATMUL_PRECISION_NAME: str = _name

# TRIED AND REJECTED (late round 4): a manual "split-weight" 2-pass
# contraction for the first resize pass (weights hi+lo bf16 x u8-exact
# pixels — u8 integers are exact in bf16, so HIGH's third pass
# multiplies zeros). tools/split_einsum_probe.py measured it SLOWER
# than HIGH (2.46 vs 1.81 ms/batch on the rgbyuv core) with worse
# numerics (65k ppm of ±1 flips vs 1.2k): two separate XLA dots
# re-read the ~400 MB pixel operand from HBM twice and materialise a
# bf16 copy, while HIGH's internal decomposition runs its passes per
# VMEM tile with ONE pixel read. The MXU share of these heads at HIGH
# is only ~30-40% (pass-count ladder in BASELINE.md), so even a
# perfect in-tile version (a Pallas rewrite) caps at ~13%. Don't retry
# at the einsum level; a Pallas variant must keep the pixel tile
# resident across both partial dots to win anything.
