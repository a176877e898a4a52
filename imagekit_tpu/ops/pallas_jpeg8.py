"""Pallas variant of the FLAGSHIP folded split-int8 JPEG decode head.

Round-5 kernel lever, second front (VERDICT r4 next #5: "the folded
heads' per-image term <7 µs"). After the round-4 fold, the einsum head
(`dct._decode_resize_yuv_lowfreq_i8_kernel`) still makes XLA
materialize, per batch at the flagship geometry:

- the folded weight gathers ``wv_f[vidx]`` / ``wh_f[vidx]`` —
  (B, k, O, rows) + (B, k, P, nblk) f32, ~33 MB/batch at nb=32 — and
- the i8→f32 AC widen+scatter — 4× the wire bytes in HBM —

before any contraction runs. This module keeps the escape scatter in
XLA but on an **int16** widen (levels are 12-bit, residuals fit — 2×
the wire bytes instead of 4×), then runs ONE Pallas program per plane:
``vidx`` rides scalar prefetch (each grid step DMAs its weight slabs
straight from the (U, k, O, rows) stacks — the gathered tensors never
exist), the i16 planes convert to f32 in VMEM, the per-image dequant
scales come in as a tiny (B, k²) block, and the folded contraction,
+128 un-centre, studio-range remap, and u8 pack all happen in-register
with one u8 store per plane. Float op order matches the einsum head
exactly (same MATMUL_PRECISION contractions, same remap order), so
outputs agree within the standard ±1 bf16x3 band (bit-exact on CPU).

Per-plane VMEM at the flagship bucket (by=136, bx=240, k=2): under
2 MB — one grid step per image, no strip tiling needed.

Opt-in: ``IMAGEKIT_PALLAS_JPEG8=1`` (TPU) or ``=interpret`` (CPU
tests). Default OFF pending on-hardware measurement.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagekit_tpu.utils.precision import MATMUL_PRECISION


def _env_mode(var: str) -> str:
    v = os.environ.get(var, "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return ""


def _mode_enabled(m: str) -> bool:
    if not m:
        return False
    if m == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def mode() -> str:
    return _env_mode("IMAGEKIT_PALLAS_JPEG8")


def enabled() -> bool:
    return _mode_enabled(mode())


def jxc_mode() -> str:
    return _env_mode("IMAGEKIT_PALLAS_JXC")


def jxc_enabled() -> bool:
    return _mode_enabled(jxc_mode())


def _make_plane_kernel(k: int, nblk: int, p: int, scale: float,
                       offset: float, centered: bool = False):
    """Kernel body for one folded plane: C planes (i16, planar) ->
    dequant -> folded resize -> +128 -> epilogue. ``centered=False``
    (the jpeg8 decode head): studio remap -> u8. ``centered=True`` (the
    jxc transcode front): round to the u8 grid and centre for the fDCT
    tail (``u8c`` in dct._transcode_i8_kernel) -> int8."""

    def kernel(vidx_ref, dc_ref, ac_ref, qt_ref, wv_ref, wh_ref, out_ref):
        hp = MATMUL_PRECISION
        out = None
        for v in range(k):
            Pv = None
            for u in range(k):
                lin = u * k + v
                if lin == 0:
                    C = dc_ref[0][:, :nblk].astype(jnp.float32)
                else:
                    j = lin - 1
                    C = ac_ref[0][:, j * p:j * p + nblk].astype(
                        jnp.float32
                    )
                C = C * qt_ref[0, lin]
                t = jnp.dot(
                    wv_ref[0, u], C,
                    precision=hp, preferred_element_type=jnp.float32,
                )
                Pv = t if Pv is None else Pv + t
            t2 = jax.lax.dot_general(
                Pv, wh_ref[0, v],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=hp, preferred_element_type=jnp.float32,
            )
            out = t2 if out is None else out + t2
        if centered:
            out_ref[0] = (
                jnp.clip(jnp.floor(out + 128.0 + 0.5), 0.0, 255.0) - 128.0
            ).astype(jnp.int8)
        else:
            out = (out + 128.0) * scale + offset
            out_ref[0] = jnp.clip(
                jnp.floor(out + 0.5), 0.0, 255.0
            ).astype(jnp.uint8)

    return kernel


def _folded_plane_pallas(dc16, ac16, qt, wv_f, wh_f, vidx, k: int,
                         luma: bool, interpret: bool,
                         centered: bool = False):
    """dc16 (B, rows, pad128(nblk)) i16, ac16 (B, rows, (k²-1)·pad128(nblk))
    i16 (escapes already scattered in), qt (B, k²) f32 dequant scales,
    wv_f (U, k, O, rows) / wh_f (U, k, P, nblk) folded stacks ->
    (B, O, P) u8 studio-range plane (or i8 centred full-range plane for
    the transcode front, ``centered=True``)."""
    B, rows, pw = dc16.shape
    _, _, oh, _ = wv_f.shape
    _, _, ow, nblk = wh_f.shape
    p = ac16.shape[2] // (k * k - 1)
    if luma:
        scale, offset = 219.0 / 255.0, 16.0
    else:
        scale, offset = 224.0 / 255.0, 128.0 * (1.0 - 224.0 / 255.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, pw), lambda b, v: (b, 0, 0)),
            pl.BlockSpec(
                (1, rows, ac16.shape[2]), lambda b, v: (b, 0, 0)
            ),
            pl.BlockSpec((1, k * k), lambda b, v: (b, 0)),
            pl.BlockSpec((1, k, oh, rows), lambda b, v: (v[b], 0, 0, 0)),
            pl.BlockSpec((1, k, ow, nblk), lambda b, v: (v[b], 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, oh, ow), lambda b, v: (b, 0, 0)),
    )
    return pl.pallas_call(
        _make_plane_kernel(k, nblk, p, scale, offset, centered=centered),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, oh, ow), jnp.int8 if centered else jnp.uint8
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * k * (k * oh * rows * nblk + oh * ow * nblk),
            bytes_accessed=B * (
                2 * rows * (pw + ac16.shape[2]) + oh * ow
            ) + B * 4 * k * (oh * rows + ow * nblk),
            transcendentals=0,
        ),
    )(vidx, dc16, ac16, qt, wv_f, wh_f)


@functools.partial(
    jax.jit,
    static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k", "interpret"),
)
def _decode_resize_i8_pallas(
    y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
    ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
    qtabs, wv_y_f, wh_y_f, wv_c_f, wh_c_f, vidx,
    by_b: int, bx_b: int, cy_b: int, cx_b: int, k: int,
    interpret: bool = False,
):
    """Same wire contract as ``dct._decode_resize_yuv_lowfreq_i8_kernel``
    (packed u8 flat out); escape scatter stays in XLA on an int16 widen
    (exact: levels are 12-bit), everything after runs in Pallas."""
    from imagekit_tpu.ops.dct import _lowfreq_indices

    idx = jnp.asarray(_lowfreq_indices(k))
    qt_l = qtabs[:, :64][:, idx] * (k / 8.0)
    qt_c = qtabs[:, 64:][:, idx] * (k / 8.0)

    def widen_scatter(ac, eidx, evals):
        a = ac.astype(jnp.int16)
        return a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(
            evals.astype(jnp.int16)
        )

    planes = [
        _folded_plane_pallas(
            y_dc, widen_scatter(y_ac, ey_idx, ey_val), qt_l,
            wv_y_f, wh_y_f, vidx, k, luma=True, interpret=interpret,
        ),
        _folded_plane_pallas(
            cb_dc, widen_scatter(cb_ac, eb_idx, eb_val), qt_c,
            wv_c_f, wh_c_f, vidx, k, luma=False, interpret=interpret,
        ),
        _folded_plane_pallas(
            cr_dc, widen_scatter(cr_ac, er_idx, er_val), qt_c,
            wv_c_f, wh_c_f, vidx, k, luma=False, interpret=interpret,
        ),
    ]
    B = y_dc.shape[0]
    return jnp.concatenate([pl_.reshape(B, -1) for pl_ in planes], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k", "interpret"),
)
def _transcode_i8_pallas(
    y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
    ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
    qt_in, qt_out, wv_y_f, wh_y_f, wv_c_f, wh_c_f, vidx,
    by_b: int, bx_b: int, cy_b: int, cx_b: int, k: int,
    interpret: bool = False,
):
    """Pallas front for the fused JPEG->JPEG transcode (jxc) head, k<8
    truncated branch: same folded contraction front as the decode head
    but with the ``u8c`` epilogue (round to the u8 grid + centre) stored
    as int8; the fDCT + target quantisation tail stays the einsum
    ``dct._fdct_quant_flat`` UNCHANGED (bit-identical tail, it operates
    on the small output grid). k == 8 callers keep the einsum kernel
    (decoder-parity staged form)."""
    from imagekit_tpu.ops.dct import _fdct_quant_flat, _lowfreq_indices

    idx = jnp.asarray(_lowfreq_indices(k))
    qt_l = qt_in[:, :64][:, idx] * (k / 8.0)
    qt_c = qt_in[:, 64:][:, idx] * (k / 8.0)

    def widen_scatter(ac, eidx, evals):
        a = ac.astype(jnp.int16)
        return a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(
            evals.astype(jnp.int16)
        )

    def front(dc, ac, ei, ev, qt, wv, wh):
        p8 = _folded_plane_pallas(
            dc, widen_scatter(ac, ei, ev), qt, wv, wh, vidx, k,
            luma=True, interpret=interpret, centered=True,
        )
        return p8.astype(jnp.float32)

    y = front(y_dc, y_ac, ey_idx, ey_val, qt_l, wv_y_f, wh_y_f)
    cb = front(cb_dc, cb_ac, eb_idx, eb_val, qt_c, wv_c_f, wh_c_f)
    cr = front(cr_dc, cr_ac, er_idx, er_val, qt_c, wv_c_f, wh_c_f)
    return jnp.concatenate(
        [
            _fdct_quant_flat(y, qt_out[:, :64]),
            _fdct_quant_flat(cb, qt_out[:, 64:]),
            _fdct_quant_flat(cr, qt_out[:, 64:]),
        ],
        axis=1,
    )
