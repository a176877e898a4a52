"""Pins for the process-level matmul precision knob (utils/precision.py).

The knob exists so the speed/precision trade on the MXU-bound
full-resolution heads is an explicit, benchmarked decision
(tools/precision_ab.py) rather than an accident of whichever literal a
kernel author typed. These tests pin the contract: default is the
historical HIGHEST, the mapping is total over the documented values,
and garbage fails loudly at import (a silently-misread knob would split
the compile-budgeted signature set without anyone noticing).
"""

import os
import subprocess
import sys

import jax

from imagekit_tpu.utils.precision import (
    MATMUL_PRECISION,
    MATMUL_PRECISION_NAME,
)


def test_default_is_high():
    # the conftest does not set the env var, so this process carries the
    # shipped default — HIGH, the round-4 measured operating point
    # (+29-40% on every fused head at ±1-ppm-scale u8 deltas; BASELINE.md
    # "matmul precision A/B"). highest restores the historical bits.
    assert os.environ.get("IMAGEKIT_MATMUL_PRECISION") is None
    assert MATMUL_PRECISION_NAME == "high"
    assert MATMUL_PRECISION is jax.lax.Precision.HIGH


def _probe(value):
    env = dict(os.environ, IMAGEKIT_MATMUL_PRECISION=value)
    env.setdefault("JAX_PLATFORMS", "cpu")
    return subprocess.run(
        [
            sys.executable,
            "-c",
            "from imagekit_tpu.utils.precision import MATMUL_PRECISION_NAME;"
            "print(MATMUL_PRECISION_NAME)",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_env_override_maps_documented_values():
    r = _probe("highest")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "highest"


def test_invalid_value_fails_at_import():
    r = _probe("fast")
    assert r.returncode != 0
    assert "IMAGEKIT_MATMUL_PRECISION" in r.stderr
