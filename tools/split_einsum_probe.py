#!/usr/bin/env python
"""Split-weight einsum probe — MEASURED NEGATIVE (late round 4).

Question: on the fused full-resolution heads, does replacing the
FIRST resize pass (weights x u8-exact pixels) with a 2-pass
split-weight contraction beat Precision.HIGH's 3-pass form — and what
does it do to the u8 outputs?

Answer (TPU v5e, 1080p->400 rgbyuv core, nb=32, 2026-08-17): NO.
  highest 2.974 ms/batch | high 1.811 | split1 2.462 | split2 2.094
  diff vs highest: high 1,187 ppm of ±1; split1 64,960 ppm; split2
  143,297 ppm (all max |delta| = 1).
Two separate XLA dots re-read the large pixel operand from HBM and
materialise a bf16 copy; HIGH's internal decomposition runs its three
passes per VMEM tile with one pixel read. The arithmetic saving
(u8 ints are bf16-exact, so HIGH's lo*hi pass multiplies zeros) is
real but only reachable inside a Pallas kernel that keeps the pixel
tile resident across both partial dots — and the MXU share of these
heads at HIGH is ~30-40%, capping even that at ~13%. Kept as the
record of why utils/precision.py has no split helper.

Measures three jitted variants of the rgbyuv-head resize core at the
bench geometry (1080p bucket -> 400px bucket, nb=32), device-resident
(utils/residency.py), plus max |delta| of the final u8 pixels against
the HIGHEST-precision reference run in the same process:

  A: both passes HIGH                    (production form at the knob)
  B: pass1 split-weight, pass2 HIGH      (the candidate: 2+3 passes)
  C: both passes split                   (UNSOUND for pass2 — its input
     is a non-integer f32 intermediate; included to SHOW the error)

Run on the real TPU:  python tools/split_einsum_probe.py
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from imagekit_tpu.ops.resize import padded_weights  # noqa: E402
from imagekit_tpu.utils.bucketing import bucket_for  # noqa: E402
from imagekit_tpu.utils.residency import chained_readback_rate  # noqa: E402

HP_HI = jax.lax.Precision.HIGHEST
HP_H3 = jax.lax.Precision.HIGH
_DEF = dict(
    precision=jax.lax.Precision.DEFAULT, preferred_element_type=jnp.float32
)


def _split(w):
    wh = w.astype(jnp.bfloat16)
    wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
    return wh, wl


def make_kernel(mode):
    @jax.jit
    def kern(wv, x_u8, wh):
        x = x_u8.astype(jnp.float32)
        if mode in ("split1", "split2"):
            vh, vl = _split(wv)
            xb = x_u8.astype(jnp.bfloat16)  # u8 -> exact bf16
            t = jnp.einsum("boh,bhwc->bowc", vh, xb, **_DEF) + jnp.einsum(
                "boh,bhwc->bowc", vl, xb, **_DEF
            )
        else:
            hp = HP_HI if mode == "highest" else HP_H3
            t = jnp.einsum("boh,bhwc->bowc", wv, x, precision=hp)
        if mode == "split2":
            hh, hl = _split(wh)
            tb = t.astype(jnp.bfloat16)  # LOSSY: t is not integer
            o = jnp.einsum("bpw,bowc->bopc", hh, tb, **_DEF) + jnp.einsum(
                "bpw,bowc->bopc", hl, tb, **_DEF
            )
        else:
            hp = HP_HI if mode == "highest" else HP_H3
            o = jnp.einsum("bpw,bowc->bopc", wh, t, precision=hp)
        o = jnp.clip(o, 0.0, 255.0)
        return jnp.floor(o + 0.5).astype(jnp.uint8)

    return kern


def main():
    th, tw_, oh, ow = 1080, 1920, 225, 400
    bh, bw = bucket_for(th), bucket_for(tw_)
    obh, obw = bucket_for(oh), bucket_for(ow)
    nb = 32
    r = np.random.default_rng(3)
    yy, xx = np.mgrid[0:bh, 0:bw].astype(np.float32)
    imgs = np.zeros((nb, bh, bw, 3), np.uint8)
    for b in range(nb):
        if b % 2 == 0:
            for c in range(3):
                imgs[b, :, :, c] = np.clip(
                    110 + 70 * np.sin(xx / 37 + b + c)
                    + 55 * np.cos(yy / 23 - c), 0, 255
                ).astype(np.uint8)
        else:
            imgs[b] = r.integers(0, 256, (bh, bw, 3)).astype(np.uint8)
    wv = np.repeat(padded_weights(th, oh, bh, obh)[None], nb, 0)
    wh = np.repeat(padded_weights(tw_, ow, bw, obw)[None], nb, 0)

    d = jax.device_put
    dx, dwv, dwh = d(imgs), d(wv.astype(np.float32)), d(wh.astype(np.float32))

    ref = None
    out = {}
    for mode in ("highest", "high", "split1", "split2"):
        kern = make_kernel(mode)

        @jax.jit
        def dstep(wv_dep, x_, wh_, _k=kern):
            o = _k(wv_dep, x_, wh_)
            dep = wv_dep + jnp.float32(0) * o.flatten()[0].astype(jnp.float32)
            return dep, o

        got = np.asarray(kern(dwv, dx, dwh))
        if ref is None:
            ref = got
        stats = chained_readback_rate(
            dstep, dwv, [dx, dwh], items_per_step=nb,
            readback=lambda o: np.asarray(o[:1, :1, :1]), windows=3,
        )
        dmax = int(np.abs(got.astype(np.int16) - ref.astype(np.int16)).max())
        nd = int((got != ref).sum())
        out[mode] = {
            "ips_median": round(stats["ips_median"], 1),
            "ms_per_batch": round(1000 * nb / stats["ips_median"], 3),
            "max_abs_vs_highest": dmax,
            "diff_ppm": round(1e6 * nd / got.size, 1),
        }
        print(mode, json.dumps(out[mode]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
