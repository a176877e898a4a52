#!/usr/bin/env python3
"""Extract AV1's sm_weights table (SMOOTH prediction, spec 7.11.2.6)
from the system libaom binary and patch it into av1_tables.npz.

Provenance (class-(b) unavoidable constant table, same policy as
tools/extract_av1_tables.py): the concatenated per-size weight arrays
(block sizes 4/8/16/32/64, 124 bytes) are located in libaom's .rodata
by their unique 4-byte head {255, 149, 85, 64}; extraction requires

  * at least TWO identical occurrences inside libaom (the library
    keeps aligned copies), and
  * every per-size run to start at 255 and be non-increasing with a
    positive tail (the structural shape the spec prescribes; the
    size-64 run bottoms out at 4),

and aborts otherwise.  The values are then certified behaviorally: the
SMOOTH/SMOOTH_V/SMOOTH_H conformance tests encode real blocks and
require bit-exact reconstruction through libdav1d — a single wrong
weight desyncs the RD-chosen residual.
"""

from __future__ import annotations

import glob
import sys

import numpy as np

sys.path.insert(0, ".")

NPZ = "imagekit_tpu/codecs/av1_tables.npz"
SIZES = (4, 8, 16, 32, 64)
HEAD = bytes([255, 149, 85, 64])


def main() -> int:
    paths = sorted(glob.glob("/usr/lib/x86_64-linux-gnu/libaom.so*"))
    if not paths:
        print("ABORT: no libaom on this box")
        return 1
    data = open(paths[0], "rb").read()
    total = sum(SIZES)
    hits = []
    off = 0
    while True:
        i = data.find(HEAD, off)
        if i < 0:
            break
        blob = data[i:i + total]
        ok = True
        p = 0
        for n in SIZES:
            run = blob[p:p + n]
            if len(run) < n or run[0] != 255 or run[-1] < 4:
                ok = False
                break
            if any(run[k + 1] > run[k] for k in range(n - 1)):
                ok = False
                break
            p += n
        if ok:
            hits.append(blob)
        off = i + 1
    uniq = {h for h in hits}
    if len(hits) < 2 or len(uniq) != 1:
        print(f"ABORT: {len(hits)} structural hits, {len(uniq)} distinct")
        return 1
    weights = np.frombuffer(hits[0], np.uint8).astype(np.uint16)
    raw = dict(np.load(NPZ))
    raw["sm_weights"] = weights
    np.savez_compressed(NPZ, **raw)
    print(f"OK: sm_weights ({total} values, {len(hits)} identical "
          f"occurrences in {paths[0]}) -> {NPZ}")
    print("  per-size heads:",
          [int(weights[sum(SIZES[:k])]) for k in range(len(SIZES))])
    return 0


if __name__ == "__main__":
    sys.exit(main())
