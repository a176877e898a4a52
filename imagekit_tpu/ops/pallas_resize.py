"""Pallas in-tile layout fusion for the YUV-domain resize head.

Round-5 kernel lever (VERDICT r4 next #5). The einsum `yuvsrc` head's
roofline (docs/ARCHITECTURE.md "Roofline") shows the residual per-image
cost is LAYOUT work, not MXU or HBM: XLA materializes (a) the per-image
gathered weight tensors ``wv_u[vidx]`` — (B, OH, IH) f32, ~33 MB/batch
at the flagship geometry — and (b) the u8->f32 input conversion as an
HBM-resident copy 4x the wire bytes, before the contractions run. This
module replaces that with ONE Pallas program per plane:

- ``vidx`` rides scalar prefetch; each grid step DMAs the RIGHT weight
  slab straight out of the (U, OH, IH) stack — the gathered per-batch
  weight tensor never exists.
- the u8 strip converts to f32 *in VMEM*, fused with the matmuls — the
  f32 input copy never exists in HBM.
- both resize contractions and the round/clip/u8 pack happen in one
  kernel; the only HBM traffic is u8 in, f32 weight slabs, u8 out.

The input plane is strip-tiled over its width (grid = (B, n_strips)),
with an (OH, OW) f32 VMEM accumulator carried across strips and the u8
store on the last strip — VMEM stays ~6 MB at the flagship bucket and
the kernel generalizes to every ladder bucket.

Opt-in: ``IMAGEKIT_PALLAS_YUV=1`` (TPU) or ``=interpret`` (CPU tests,
runs the Pallas interpreter). Default OFF so the einsum path and its
compile cache are untouched; flip after measuring on hardware. The
variant covers mix=False batches (BT.709-mix batches keep the einsum
head; they are a rare source class with extra weight stacks).
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

# largest f32 strip the kernel holds at once (input strip + tmp)
_STRIP_BUDGET_BYTES = 3 * 1024 * 1024


def mode() -> str:
    """'' (disabled), 'tpu' (compiled), or 'interpret' (CPU tests)."""
    v = os.environ.get("IMAGEKIT_PALLAS_YUV", "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return ""


def enabled() -> bool:
    m = mode()
    if not m:
        return False
    if m == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _pick_strip(iw: int, ih: int) -> int:
    """Strip width: prefer 128-multiple divisors of IW under the VMEM
    budget; fall back to the whole width (small planes)."""
    limit = max(128, _STRIP_BUDGET_BYTES // (4 * max(ih, 1)))
    best = iw
    for mult in range(iw // 128, 0, -1):
        s = mult * 128
        if iw % s == 0 and s <= limit:
            return s
    return best


def _make_resize_kernel(scale: float = 1.0, pre: float = 0.0,
                        post: float = 0.0, centered: bool = False):
    """Strip-accumulating resize kernel with a parametric epilogue:
    default = round/clip -> u8 (the yuvsrc/rgb hand-off);
    ``(v + pre) * scale + post`` applies an affine remap first in the
    einsum heads' exact float op order (the yuvjpg studio->JFIF remap),
    and ``centered`` subtracts 128 and stores int8 (the fDCT tail's
    u8c hand-off)."""

    def kernel(vidx_ref, hidx_ref, x_ref, wv_ref, wh_ref, out_ref, acc):
        del vidx_ref, hidx_ref  # consumed by the BlockSpec index maps
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            acc[...] = jnp.zeros_like(acc)

        xs = x_ref[0].astype(jnp.float32)  # (IH, S) u8 -> f32 in VMEM
        tmp = jnp.dot(
            wv_ref[0], xs,
            precision=MATMUL_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (OH, S)
        acc[...] += jax.lax.dot_general(
            tmp, wh_ref[0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=MATMUL_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (OH, OW)

        @pl.when(t == pl.num_programs(1) - 1)
        def _store():
            v = acc[...]
            if scale != 1.0 or pre != 0.0 or post != 0.0:
                v = (v + pre) * scale + post
            v = jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)
            if centered:
                out_ref[0] = (v - 128.0).astype(jnp.int8)
            else:
                out_ref[0] = v.astype(jnp.uint8)

    return kernel


def _plane_resize(x, wv, wh, vidx, interpret: bool, hidx=None,
                  scale: float = 1.0, pre: float = 0.0,
                  post: float = 0.0, centered: bool = False):
    """(B, IH, IW) u8 plane stack -> (B, OH, OW) u8 (or i8 centred,
    see _make_resize_kernel), weights selected per image from the
    (U, OH, IH)/(U, OW, IW) f32 stacks by ``vidx`` (and ``hidx`` for
    the horizontal stack — the rgb head keys the two axes separately;
    defaults to ``vidx``)."""
    B, ih, iw = x.shape
    _, oh, _ = wv.shape
    _, ow, _ = wh.shape
    s = _pick_strip(iw, ih)
    n_strips = iw // s
    if hidx is None:
        hidx = vidx

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_strips),
        in_specs=[
            pl.BlockSpec((1, ih, s), lambda b, t, v, hx: (b, 0, t)),
            pl.BlockSpec((1, oh, ih), lambda b, t, v, hx: (v[b], 0, 0)),
            pl.BlockSpec((1, ow, s), lambda b, t, v, hx: (hx[b], 0, t)),
        ],
        out_specs=pl.BlockSpec(
            (1, oh, ow), lambda b, t, v, hx: (b, 0, 0)
        ),
        scratch_shapes=[pltpu.VMEM((oh, ow), jnp.float32)],
    )
    return pl.pallas_call(
        _make_resize_kernel(scale, pre, post, centered),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, oh, ow), jnp.int8 if centered else jnp.uint8
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * (oh * ih * iw + oh * ow * iw),
            bytes_accessed=B * (ih * iw + oh * ow)
            + B * 4 * (oh * ih + ow * iw),
            transcendentals=0,
        ),
    )(vidx, hidx, x, wv, wh)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bh", "bw", "obh", "obw", "csy", "csx", "alpha", "interpret"
    ),
)
def _resize_yuv420_pallas(
    flat, wv_y, wh_y, wv_c, wh_c, vidx,
    bh: int, bw: int, obh: int, obw: int,
    csy: int = 2, csx: int = 2,
    alpha: bool = False, interpret: bool = False,
):
    """Same contract as ``dct._resize_yuv420_kernel`` (flat u8 packed
    planes in, concatenated u8 planes out) with the three/four plane
    resizes running as Pallas programs."""
    B = flat.shape[0]
    ny = bh * bw
    ch, cw = bh // csy, bw // csx
    nc = ch * cw
    y = flat[:, :ny].reshape(B, bh, bw)
    cb = flat[:, ny:ny + nc].reshape(B, ch, cw)
    cr = flat[:, ny + nc:ny + 2 * nc].reshape(B, ch, cw)

    outs = [
        _plane_resize(y, wv_y, wh_y, vidx, interpret),
        _plane_resize(cb, wv_c, wh_c, vidx, interpret),
        _plane_resize(cr, wv_c, wh_c, vidx, interpret),
    ]
    if alpha:
        a = flat[:, ny + 2 * nc:ny + 2 * nc + ny].reshape(B, bh, bw)
        outs.append(_plane_resize(a, wv_y, wh_y, vidx, interpret))
    return tuple(o.reshape(B, -1) for o in outs)


def rgb_mode() -> str:
    v = os.environ.get("IMAGEKIT_PALLAS_RGB", "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return ""


def rgb_enabled() -> bool:
    m = rgb_mode()
    if not m:
        return False
    if m == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(
    jax.jit, static_argnames=("interpret",)
)
def _resample_rgb_yuv_pallas(imgs_flat, wv_u, wh_u, vidx, hidx,
                             interpret: bool = False):
    """Pallas front for the fused RGB resample + studio YUV 4:2:0 head
    (`color._resample_rgb_yuv_kernel`): de-interleave to channel planes
    in XLA (u8 transpose — cheap), per-channel Pallas resize to ROUNDED
    u8 (bit-matching the einsum head's round-before-convert hand-off
    point), then the small affine mix + 2x2 subsample on the resized
    grid in XLA. What never exists in HBM anymore: the (B, H, W, 3) f32
    input copy (~25 MB/img at the flagship bucket) and the gathered
    per-batch weight tensors."""
    B, H, WC = imgs_flat.shape
    W = WC // 3
    x = imgs_flat.reshape(B, H, W, 3)
    planes = [
        _plane_resize(
            x[..., c], wv_u, wh_u, vidx,
            interpret, hidx=hidx,
        ).astype(jnp.float32)
        for c in range(3)
    ]
    r, g, b = planes
    y = 0.25678824 * r + 0.50412941 * g + 0.09790588 * b + 16.0
    u = -0.14822290 * r - 0.29099279 * g + 0.43921569 * b + 128.0
    v = 0.43921569 * r - 0.36778831 * g - 0.07142737 * b + 128.0
    OH = wv_u.shape[1]
    OW = wh_u.shape[1]

    def q8(p):
        return (
            jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)
            .astype(jnp.uint8)
            .reshape(B, -1)
        )

    def sub(p):
        return p.reshape(B, OH // 2, 2, OW // 2, 2).mean(axis=(2, 4))

    return jnp.concatenate([q8(y), q8(sub(u)), q8(sub(v))], axis=1)


def resize_yuv420_batch_pallas(
    flat, weights, vidx, in_shape, out_shape,
    chroma_sub=(2, 2), alpha=False,
):
    """Drop-in for the mix=False arm of ``dct.resize_yuv420_batch``:
    returns (Y, Cb, Cr[, A]) u8 planes at bucket output shapes."""
    wv_y, wh_y, wv_c, wh_c = weights[:4]
    bh, bw = in_shape
    obh, obw = out_shape
    csy, csx = chroma_sub
    outs = _resize_yuv420_pallas(
        jnp.asarray(flat), jnp.asarray(wv_y), jnp.asarray(wh_y),
        jnp.asarray(wv_c), jnp.asarray(wh_c), jnp.asarray(vidx),
        bh=bh, bw=bw, obh=obh, obw=obw, csy=csy, csx=csx,
        alpha=alpha, interpret=(mode() == "interpret"),
    )
    B = flat.shape[0]
    y = np.asarray(outs[0]).reshape(B, obh, obw)
    cb = np.asarray(outs[1]).reshape(B, obh // 2, obw // 2)
    cr = np.asarray(outs[2]).reshape(B, obh // 2, obw // 2)
    if alpha:
        return y, cb, cr, np.asarray(outs[3]).reshape(B, obh, obw)
    return y, cb, cr


def yuvjpg_mode() -> str:
    v = os.environ.get("IMAGEKIT_PALLAS_YUVJPG", "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return ""


def yuvjpg_enabled() -> bool:
    m = yuvjpg_mode()
    if not m:
        return False
    if m == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(
    jax.jit,
    static_argnames=("bh", "bw", "obh", "obw", "interpret"),
)
def _resize_yuv_jpeg_pallas(
    flat, wv_y, wh_y, wv_c, wh_c, qt_out, vidx,
    bh: int, bw: int, obh: int, obw: int, interpret: bool = False,
):
    """Pallas front for the fused YUV->JPEG head (4:2:0 sources, no
    mix): per-plane Pallas resize with the studio->JFIF remap + u8c
    epilogue fused in (the einsum head's exact hand-off point), then
    the unchanged einsum fDCT + target-quantisation tail on the small
    output grid."""
    from imagekit_tpu.ops.dct import _fdct_quant_flat

    B = flat.shape[0]
    ny = bh * bw
    ch, cw = bh // 2, bw // 2
    nc = ch * cw
    yp = flat[:, :ny].reshape(B, bh, bw)
    cbp = flat[:, ny:ny + nc].reshape(B, ch, cw)
    crp = flat[:, ny + nc:ny + 2 * nc].reshape(B, ch, cw)

    y = _plane_resize(yp, wv_y, wh_y, vidx, interpret,
                      scale=255.0 / 219.0, pre=-16.0, centered=True)
    cb = _plane_resize(cbp, wv_c, wh_c, vidx, interpret,
                       scale=255.0 / 224.0, pre=-128.0, post=128.0,
                       centered=True)
    cr = _plane_resize(crp, wv_c, wh_c, vidx, interpret,
                       scale=255.0 / 224.0, pre=-128.0, post=128.0,
                       centered=True)
    return jnp.concatenate(
        [
            _fdct_quant_flat(y.astype(jnp.float32), qt_out[:, :64]),
            _fdct_quant_flat(cb.astype(jnp.float32), qt_out[:, 64:]),
            _fdct_quant_flat(cr.astype(jnp.float32), qt_out[:, 64:]),
        ],
        axis=1,
    )


def rgbjpg_mode() -> str:
    v = os.environ.get("IMAGEKIT_PALLAS_RGBJPG", "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return ""


def rgbjpg_enabled() -> bool:
    m = rgbjpg_mode()
    if not m:
        return False
    if m == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resample_rgb_jpeg_pallas(imgs_flat, wv_u, wh_u, vidx, hidx, qt_out,
                              interpret: bool = False):
    """Pallas front for the fused RGB resample + JPEG encode head
    (`dct._resample_rgb_jpeg_kernel`): per-channel Pallas resize to the
    rounded u8 grid (the einsum head's exact hand-off), then the JFIF
    BT.601 mix, 4:2:0 box subsample, and einsum fDCT + quantisation
    tail on the small output grid."""
    from imagekit_tpu.ops.dct import _fdct_quant_flat

    B, H, WC = imgs_flat.shape
    W = WC // 3
    x = imgs_flat.reshape(B, H, W, 3)
    planes = [
        _plane_resize(
            x[..., c], wv_u, wh_u, vidx, interpret, hidx=hidx
        ).astype(jnp.float32)
        for c in range(3)
    ]
    r, g, b = planes
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    OH = wv_u.shape[1]
    OW = wh_u.shape[1]
    cb = cb.reshape(B, OH // 2, 2, OW // 2, 2).mean(axis=(2, 4))
    cr = cr.reshape(B, OH // 2, 2, OW // 2, 2).mean(axis=(2, 4))
    return jnp.concatenate(
        [
            _fdct_quant_flat(y, qt_out[:, :64]),
            _fdct_quant_flat(cb, qt_out[:, 64:]),
            _fdct_quant_flat(cr, qt_out[:, 64:]),
        ],
        axis=1,
    )
