"""``python -m imagekit_tpu.serving`` — start the server.

Reference entrypoint analogue (``src/main.rs:20-59``).
"""

import argparse

from imagekit_tpu.serving.app import run

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="imagekit_tpu server")
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args()
    run(port=args.port)
