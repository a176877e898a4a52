"""``python -m imagekit_tpu.serving`` — start the server.

Reference entrypoint analogue (``src/main.rs:20-59``).
"""

import os
import sys

# glibc arena retention balloons RSS ~6x under load (see
# utils.limit_malloc_arenas). MALLOC_ARENA_MAX must be in the environment
# BEFORE glibc spawns arenas, and the TPU plugin's sitecustomize starts
# XLA threads at interpreter start — so re-exec once with the cap set
# before importing anything heavyweight.
if os.environ.get("MALLOC_ARENA_MAX") is None and sys.platform == "linux":
    os.environ["MALLOC_ARENA_MAX"] = "2"
    os.execv(
        sys.executable,
        [sys.executable, "-m", "imagekit_tpu.serving", *sys.argv[1:]],
    )

import argparse  # noqa: E402

# Serve-through-failure (reference posture, src/lib.rs:194-197): if the TPU
# relay is dead, the axon plugin would hang the first backend init forever
# and the server would never answer even /health. Probe-or-scrub before the
# engine can touch JAX: TPU when reachable, CPU backend otherwise (requests
# then ride the host-fallback/CPU path instead of hanging).
from imagekit_tpu.utils.relay_guard import ensure_usable_backend  # noqa: E402

_guard = ensure_usable_backend()
if _guard["mode"] != "tpu":
    print(f"[imagekit] relay guard: {_guard}", file=sys.stderr, flush=True)

from imagekit_tpu.serving.app import run  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="imagekit_tpu server")
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args()
    run(port=args.port)
