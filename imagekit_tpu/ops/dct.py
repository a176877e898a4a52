"""Device-side JPEG transform math: dequant + IDCT, fDCT + quantise,
chroma resampling and colour conversion — the parallel stages of the codec
whose serial halves live in ``codecs/native/jpeg_entropy.cpp``
(BASELINE.json north star: "JPEG entropy decode stays on host but IDCT,
YCbCr<->RGB, resampling, chroma subsampling, and fDCT+quantise run as
fused kernels").

Key structural insight exploited throughout: every stage between entropy
coding and the final u8 conversion — chroma upsampling (triangle filter),
YCbCr->RGB (3x3 affine), Lanczos resampling — is LINEAR, so:

- chroma upsample ∘ resize collapses into one weight matrix per axis
  (chroma planes resample directly from half resolution), and
- the colour matrix applies at *output* resolution (e.g. 400x225 instead
  of 1920x1080), shrinking colour-conversion work by the resize ratio².

The IDCT itself is two 8x8 basis matmuls per block, batched over all
blocks — exactly the MXU's shape.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from imagekit_tpu.ops.resize import padded_weights, resample_weights
from imagekit_tpu.utils.precision import MATMUL_PRECISION

# ---------------------------------------------------------------------------
# Bases and fixed tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def idct_basis() -> np.ndarray:
    """A[u, x]: contribution of frequency u to pixel x (1-D, 8-point).
    pixels = A^T @ coeffs @ A for a 2-D block."""
    A = np.zeros((8, 8), np.float32)
    for u in range(8):
        cu = np.sqrt(0.25) if u else np.sqrt(0.125)
        for x in range(8):
            A[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return A


# Annex K base quantisation tables (natural order).
QTAB_LUMA_BASE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int32,
)
QTAB_CHROMA_BASE = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int32,
)


def quality_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """libjpeg quality->quantiser scaling (the mapping the reference's JPEG
    encoder family uses; quality clamped 1-100 like src/transform.rs:122)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def scaled(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.uint16)
    return scaled(QTAB_LUMA_BASE), scaled(QTAB_CHROMA_BASE)


from imagekit_tpu.utils.sized_cache import SizedArrayCache

# Chroma/upsample weight matrices run 0.1-7 MB each and are keyed by true
# dims — byte-budgeted LRU instead of entry caps (see utils/sized_cache.py).
_CHROMA_WEIGHTS = SizedArrayCache(64 * 1024 * 1024)


def _chroma_cached(key, build):
    return _CHROMA_WEIGHTS.get_or_build(key, build)


def _upsample_weights_impl(half: int, full: int) -> np.ndarray:
    """(full, half) matrix for libjpeg-style 'fancy' (triangle) 2x chroma
    upsampling along one axis: output 2i   = (3*c[i] + c[i-1]) / 4,
    output 2i+1 = (3*c[i] + c[i+1]) / 4, edges clamped. A non-subsampled
    axis (chroma == full, e.g. AVIF 4:4:4 both axes or 4:2:2 vertically)
    is the identity — the combined subsample∘resize∘upsample weight
    builders then fold 444/422 sources into the same yuvsrc head
    (VERDICT r3 #7)."""
    if half == full:
        return np.eye(full, dtype=np.float32)
    U = np.zeros((full, half), np.float32)
    for o in range(full):
        i = o // 2
        if o % 2 == 0:
            j = max(i - 1, 0)
            U[o, i] += 0.75
            U[o, j] += 0.25
        else:
            j = min(i + 1, half - 1)
            U[o, i] += 0.75
            U[o, j] += 0.25
    return U


def _combined_chroma_weights_impl(
    chroma_true: int,
    full_true: int,
    out_true: int,
    chroma_bucket: int,
    out_bucket: int,
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """One (out_bucket, chroma_bucket) matrix = resize(full->out) ∘
    upsample(chroma->full), zero-padded to bucket shape."""
    W = resample_weights(full_true, out_true, filter_name)  # (out, full)
    U = upsample_weights(chroma_true, full_true)  # (full, chroma)
    C = (W @ U).astype(np.float32)  # (out, chroma)
    out = np.zeros((out_bucket, chroma_bucket), np.float32)
    out[:out_true, :chroma_true] = C
    return out




def upsample_weights(half, full):
    return _chroma_cached(("up", half, full), lambda: _upsample_weights_impl(half, full))


def combined_chroma_weights(chroma_true, full_true, out_true, chroma_bucket,
                            out_bucket, filter_name="lanczos3"):
    key = ("cc", chroma_true, full_true, out_true, chroma_bucket, out_bucket, filter_name)
    return _chroma_cached(key, lambda: _combined_chroma_weights_impl(
        chroma_true, full_true, out_true, chroma_bucket, out_bucket, filter_name))


def combined_chroma_half_weights(chroma_true, full_true, out_true,
                                 chroma_bucket, out_half_bucket,
                                 filter_name="lanczos3"):
    key = ("cch", chroma_true, full_true, out_true, chroma_bucket,
           out_half_bucket, filter_name)
    return _chroma_cached(key, lambda: _combined_chroma_half_weights_impl(
        chroma_true, full_true, out_true, chroma_bucket, out_half_bucket,
        filter_name))


def lowfreq_chroma_half_weights(chroma_true, full_true, out_true,
                                chroma_inter_bucket, out_half_bucket, k):
    key = ("lch", chroma_true, full_true, out_true, chroma_inter_bucket,
           out_half_bucket, k)
    return _chroma_cached(key, lambda: _lowfreq_chroma_half_weights_impl(
        chroma_true, full_true, out_true, chroma_inter_bucket,
        out_half_bucket, k))


# ---------------------------------------------------------------------------
# Fused decode (coefficients -> resized RGB) kernel
# ---------------------------------------------------------------------------


def _blocks_to_plane(coef_flat, by, bx, qtab, A):
    """(B, by, bx*64) i16 + (B, 64) qtab -> (B, by*8, bx*8) f32 samples,
    rounded+clamped to the u8 grid like a host decoder would emit.

    The (B, by, bx*64) transfer shape matters: 3-D arrays with a
    128-multiple minor dimension take the fast host->device path on the
    tunnelled TPU link (bx is even for 16-aligned buckets, so bx*64 is a
    multiple of 128)."""
    B = coef_flat.shape[0]
    c = coef_flat.reshape(B, by, bx, 64).astype(jnp.float32)
    c = c * qtab[:, None, None, :]
    c = c.reshape(B, by, bx, 8, 8)
    # 2-D IDCT: pixels[x,y] = sum_uv A[u,x] A[v,y] c[u,v]
    p = jnp.einsum(
        "ux,vy,bijuv->bijxy", A, A, c, precision=MATMUL_PRECISION
    )
    p = p + 128.0
    # reassemble (B, by, 8, bx, 8) -> (B, H, W)
    p = p.transpose(0, 1, 3, 2, 4).reshape(B, by * 8, bx * 8)
    # decoder-parity: samples are u8 in the reference pipeline
    return jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)


@functools.partial(
    jax.jit, static_argnames=("by_y", "bx_y", "by_c", "bx_c")
)
def _decode_resize_kernel(
    y_flat,     # (B, by_y, bx_y*64) i16
    cb_flat,    # (B, by_c, bx_c*64) i16
    cr_flat,
    qtabs,      # (B, 128) f32: [0:64] luma, [64:128] chroma (natural order)
    wv_y_u,     # (Uy, OHb, by_y*8) f32 unique vertical luma weights
    wh_y_u,     # (Uy, OWb, bx_y*8)
    wv_c_u,     # (Uc, OHb, by_c*8) combined upsample∘resize chroma weights
    wh_c_u,
    vidx,       # (B,) i32 into the unique stacks (same index for v/h pairs)
    by_y: int,
    bx_y: int,
    by_c: int,
    bx_c: int,
):
    A = jnp.asarray(idct_basis())
    Y = _blocks_to_plane(y_flat, by_y, bx_y, qtabs[:, :64], A)
    Cb = _blocks_to_plane(cb_flat, by_c, bx_c, qtabs[:, 64:], A)
    Cr = _blocks_to_plane(cr_flat, by_c, bx_c, qtabs[:, 64:], A)
    return _rgb_tail(Y, Cb, Cr, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx)


def _rgb_tail(Y, Cb, Cr, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx):
    """Resize the three planes and convert BT.601 full-range YCbCr -> RGB;
    shared by both coefficient transports of the RGB kernel."""
    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        # Fused two-pass Pallas kernel when the working set fits VMEM.
        # The post-IDCT planes are integer-valued (rounded to the u8 grid
        # for decoder parity), so they pass through the u8 kernel exactly;
        # its clamp+round output is a no-op on the resized values' range.
        from imagekit_tpu.ops.pallas.resize_kernel import (
            _pallas_ok,
            fits_vmem,
            pallas_resize_u8,
        )

        _, H, W = P.shape
        OH = wv_u.shape[1]
        OW = wh_u.shape[1]
        Hp = (H + 127) // 128 * 128
        Wp = (W + 127) // 128 * 128
        if _pallas_ok() and fits_vmem(Hp, Wp, OH, OW):
            out = pallas_resize_u8(P.astype(jnp.uint8), wv_u, wh_u, vidx)
            return out.astype(jnp.float32)
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    y = plane_resize(Y, wv_y_u, wh_y_u)
    cb = plane_resize(Cb, wv_c_u, wh_c_u) - 128.0
    cr = plane_resize(Cr, wv_c_u, wh_c_u) - 128.0

    # BT.601 full-range YCbCr -> RGB (JFIF standard matrix)
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    rgb = jnp.clip(jnp.floor(rgb + 0.5), 0.0, 255.0).astype(jnp.uint8)
    B = rgb.shape[0]
    return rgb.reshape(B, -1)  # flat 2D out for fast D2H


def _combined_chroma_half_weights_impl(
    chroma_true: int,
    full_true: int,
    out_true: int,
    chroma_bucket: int,
    out_half_bucket: int,
    filter_name: str = "lanczos3",
) -> np.ndarray:
    """One (out_half_bucket, chroma_bucket) matrix = 2x box-subsample ∘
    resize(full->out) ∘ upsample(chroma->full): the chroma plane of a
    JPEG->WebP transform goes straight from source half-res to target
    half-res. An odd target dimension pairs the final row with itself
    (edge replication), matching the RGB path's edge-padded subsample."""
    W = resample_weights(full_true, out_true, filter_name)  # (out, full)
    U = upsample_weights(chroma_true, full_true)  # (full, chroma)
    half = (out_true + 1) // 2
    S = np.zeros((half, out_true), np.float32)
    for i in range(half):
        S[i, 2 * i] += 0.5
        S[i, min(2 * i + 1, out_true - 1)] += 0.5
    C = (S @ W @ U).astype(np.float32)  # (half, chroma)
    out = np.zeros((out_half_bucket, chroma_bucket), np.float32)
    out[:half, :chroma_true] = C
    return out


@functools.partial(
    jax.jit, static_argnames=("by_y", "bx_y", "by_c", "bx_c")
)
def _decode_resize_yuv_kernel(
    y_flat,     # (B, by_y, bx_y*64) i16
    cb_flat,    # (B, by_c, bx_c*64) i16
    cr_flat,
    qtabs,      # (B, 128) f32
    wv_y_u,     # (U, OHb, by_y*8) luma resize weights
    wh_y_u,     # (U, OWb, bx_y*8)
    wv_c_u,     # (U, OHb/2, by_c*8) combined subsample∘resize∘upsample
    wh_c_u,     # (U, OWb/2, bx_c*8)
    vidx,
    by_y: int,
    bx_y: int,
    by_c: int,
    bx_c: int,
):
    """JPEG coefficients -> resized VP8 studio-range YUV 4:2:0 planes, fully
    fused: no RGB round trip (the BT.601 matrix is shared between JFIF and
    VP8 up to the studio-range affine remap, which commutes with the linear
    resampler). Output is ONE flat (B, OH*OW + 2*(OH/2*OW/2)) u8 array —
    1.5 bytes/pixel on the wire, half the RGB path's device->host bytes."""
    A = jnp.asarray(idct_basis())
    Y = _blocks_to_plane(y_flat, by_y, bx_y, qtabs[:, :64], A)
    Cb = _blocks_to_plane(cb_flat, by_c, bx_c, qtabs[:, 64:], A)
    Cr = _blocks_to_plane(cr_flat, by_c, bx_c, qtabs[:, 64:], A)
    # full-range JFIF -> studio-range VP8 and the fused resize live in
    # _yuv_tail (shared with the truncated kernels and both transports)
    return _yuv_tail(Y, Cb, Cr, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx)


def decode_resize_yuv_batch(
    y_flat: np.ndarray,
    cb_flat: np.ndarray,
    cr_flat: np.ndarray,
    qtabs: np.ndarray,
    weights,
    vidx: np.ndarray,
    block_dims,
    out_shape,
):
    """Run the fused YUV kernel; returns (Y, Cb, Cr) u8 arrays of shapes
    (B, OHb, OWb) and (B, OHb/2, OWb/2) x2 (crop on host)."""
    wv_y, wh_y, wv_c, wh_c = weights
    by_y, bx_y, by_c, bx_c = block_dims
    obh, obw = out_shape
    flat = np.asarray(
        _decode_resize_yuv_kernel(
            jnp.asarray(y_flat),
            jnp.asarray(cb_flat),
            jnp.asarray(cr_flat),
            jnp.asarray(qtabs),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_y=by_y,
            bx_y=bx_y,
            by_c=by_c,
            bx_c=bx_c,
        )
    )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh, obw)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    cr = flat[:, ny + nc:].reshape(B, obh // 2, obw // 2)
    return y, cb, cr


@functools.lru_cache(maxsize=8)
def idct_basis_k(k: int) -> np.ndarray:
    """Orthonormal k-point IDCT basis A_k[u, x]."""
    A = np.zeros((k, k), np.float32)
    for u in range(k):
        cu = np.sqrt(2.0 / k) if u else np.sqrt(1.0 / k)
        for x in range(k):
            A[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / (2 * k))
    return A


def intermediate_dim(true_full: int, k: int) -> int:
    """True sample extent of the k/8-scale intermediate plane."""
    return (true_full * k + 7) // 8


def lowfreq_luma_weights(
    true_full: int, out_true: int, k: int, inter_bucket: int, out_bucket: int
) -> np.ndarray:
    """(out_bucket, inter_bucket) Lanczos weights resampling the k/8-scale
    intermediate plane to the target."""
    inter_true = intermediate_dim(true_full, k)
    W = resample_weights(inter_true, out_true)
    out = np.zeros((out_bucket, inter_bucket), np.float32)
    out[:out_true, :inter_true] = W
    return out


def _lowfreq_chroma_half_weights_impl(
    chroma_true: int,
    full_true: int,
    out_true: int,
    chroma_inter_bucket: int,
    out_half_bucket: int,
    k: int,
) -> np.ndarray:
    """Truncated-path chroma weights: 2x box-subsample ∘ resize ∘ 2x
    upsample on the k/8-scale grids, one matrix per axis."""
    ci = intermediate_dim(chroma_true, k)
    fi = intermediate_dim(full_true, k)
    W = resample_weights(fi, out_true)  # (out, inter-luma)
    U = upsample_weights(ci, fi)  # (inter-luma, inter-chroma)
    half = (out_true + 1) // 2
    S = np.zeros((half, out_true), np.float32)
    for i in range(half):
        S[i, 2 * i] += 0.5
        S[i, min(2 * i + 1, out_true - 1)] += 0.5
    C = (S @ W @ U).astype(np.float32)
    out = np.zeros((out_half_bucket, chroma_inter_bucket), np.float32)
    out[:half, :ci] = C
    return out


def pad128(n: int) -> int:
    return (n + 127) // 128 * 128


def lowfreq_ac_width(nblk: int, k: int) -> int:
    """Minor dim of the PLANAR split-int8 AC batch layout: k*k-1 coefficient
    planes, each 128-aligned, so plane j of block column b sits at
    ``j * pad128(nblk) + b``. Planar (not block-grouped) because the folded
    kernels read one whole coefficient plane per (u, v) term — a contiguous
    slice here, a stride-(k*k-1) gather in the old grouped layout."""
    return (k * k - 1) * pad128(nblk)


def fold_lowfreq_weights(W: np.ndarray, k: int) -> np.ndarray:
    """Fold the k-point IDCT basis into a truncated-path resize weight
    stack: (U, O, nblk*k) -> (U, k, O, nblk).

    Column ``k*i + x`` of W addresses phase x of block i on the k/8-scale
    intermediate plane. Both the per-block IDCT and the resize are linear,
    so the basis folds straight into the weights:

        out[:, u] = W @ E_u   with   E_u[k*i + x, i] = A_k[u, x]

    and the kernel becomes  sum_{u,v} (W_v@E_u) @ C_uv @ (W_h@E_v)^T  over
    the k*k coefficient PLANES — the per-block k-point IDCT einsum and the
    (B, by, k, bx, k) interleave transpose (minor dims of 2..4 at the
    flagship k=2, hostile to the 8x128 VPU tiling) disappear entirely.
    Measured 2.2x on the flagship head (docs/ARCHITECTURE.md "Roofline")."""
    A = idct_basis_k(k)
    U, O, L = W.shape
    nblk = L // k
    Wb = W.reshape(U, O, nblk, k)
    return np.ascontiguousarray(
        np.einsum("zoix,ux->zuoi", Wb, A).astype(np.float32)
    )


# natural-order indices of the KxK low-frequency coefficients
@functools.lru_cache(maxsize=8)
def _lowfreq_indices(k: int) -> np.ndarray:
    return np.array([u * 8 + v for u in range(k) for v in range(k)], np.int32)


def _folded_lowfreq_plane(getC, qt4, wv_f, wh_f, vidx, k):
    """Truncated-path dequant + IDCT + resize in ONE folded contraction:

        out = sum_{u,v} (Wv@E_u) @ (q_uv * C_uv) @ (Wh@E_v)^T + 128

    with C_uv the (B, rows, nblk) coefficient plane for frequency (u, v)
    (``getC(u*k+v)``) and the folded weight stacks from
    :func:`fold_lowfreq_weights`. Every op is MXU-shaped; no tensor has a
    minor dim under 128. The k/8-scale intermediate plane is never
    materialised — and therefore NOT clipped to [0, 255] before resampling
    (linearity requirement). Parity ledger: on real content the final u8
    planes are bit-identical to the old staged form (measured max delta 0
    on the 1080p bench corpus); blocks whose IDCT overshoots the u8 range
    (ringing at saturated edges) may differ by ±1 after resampling. The
    host mirrors skip the clip the same way."""
    hp = MATMUL_PRECISION
    wv = wv_f[vidx]  # (B, k, O, rows)
    wh = wh_f[vidx]  # (B, k, P, nblk)
    out = None
    for v in range(k):
        Pv = None
        for u in range(k):
            C = getC(u * k + v) * qt4[:, u * k + v][:, None, None]
            t = jnp.einsum("boh,bhw->bow", wv[:, u], C, precision=hp)
            Pv = t if Pv is None else Pv + t
        t2 = jnp.einsum("bpw,bow->bop", wh[:, v], Pv, precision=hp)
        out = t2 if out is None else out + t2
    return out + 128.0


def _folded_plane_i16(flat, nblk, qt4, wv_f, wh_f, vidx, k):
    """Folded plane from the int16 flat transport (block-grouped wire
    layout, coefficient split done on device via reshape+slice — this
    transport is the rare escape-overflow fallback, so it keeps its wire
    format; values are exact ints in f32, so output is bit-identical to
    the split-int8 kernel given the same levels)."""
    B, rows, _ = flat.shape
    nk = k * k
    lev = flat[:, :, : nblk * nk].reshape(B, rows, nblk, nk).astype(
        jnp.float32
    )
    return _folded_lowfreq_plane(
        lambda lin: lev[..., lin], qt4, wv_f, wh_f, vidx, k
    )


def _folded_plane_i8(dc, ac, eidx, evals, nblk, qt4, wv_f, wh_f, vidx, k):
    """Folded plane from the split-int8 transport: widen the PLANAR AC
    layout (:func:`lowfreq_ac_width`) to f32, scatter-add escape residuals
    (padding rows add 0 at (0,0,0)), then one contiguous slice per
    coefficient plane. All values are exact ints in f32 — reconstruction
    stays exact."""
    p = ac.shape[2] // (k * k - 1)
    a = ac.astype(jnp.float32)
    a = a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(
        evals.astype(jnp.float32)
    )

    def getC(lin):
        if lin == 0:
            return dc[:, :, :nblk].astype(jnp.float32)
        j = lin - 1
        return a[:, :, j * p : j * p + nblk]

    return _folded_lowfreq_plane(getC, qt4, wv_f, wh_f, vidx, k)


def _yuv_range_pack(y, cb, cr):
    """Full-range resized planes -> studio-range remap -> packed
    (B, obh*obw + 2*(obh//2*obw//2)) u8 for one bulk D2H. Shared by the
    full-resolution tail and the folded truncated kernels so the float op
    order (and therefore the bytes) match across paths."""
    y = y * (219.0 / 255.0) + 16.0
    c_off = 128.0 * (1.0 - 224.0 / 255.0)
    cb = cb * (224.0 / 255.0) + c_off
    cr = cr * (224.0 / 255.0) + c_off

    def q8(p):
        B = p.shape[0]
        return (
            jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)
            .astype(jnp.uint8)
            .reshape(B, -1)
        )

    return jnp.concatenate([q8(y), q8(cb), q8(cr)], axis=1)


def _yuv_tail(Y, Cb, Cr, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx):
    """Resize the three planes (per-image weight stacks), remap to studio
    range, and pack u8 for one bulk D2H."""
    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    return _yuv_range_pack(
        plane_resize(Y, wv_y_u, wh_y_u),
        plane_resize(Cb, wv_c_u, wh_c_u),
        plane_resize(Cr, wv_c_u, wh_c_u),
    )


@functools.partial(
    jax.jit, static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k")
)
def _decode_resize_yuv_lowfreq_kernel(
    y_flat,     # (B, by_b, pad128(bx_b*k*k)) i16, block-grouped
    cb_flat,    # (B, cy_b, pad128(cx_b*k*k)) i16
    cr_flat,
    qtabs,      # (B, 128) f32
    wv_y_f,     # (U, k, OHb, by_b) folded (fold_lowfreq_weights)
    wh_y_f,     # (U, k, OWb, bx_b)
    wv_c_f,     # (U, k, OHb/2, cy_b)
    wh_c_f,
    vidx,
    by_b: int,
    bx_b: int,
    cy_b: int,
    cx_b: int,
    k: int,
):
    """Truncated-coefficient fused decode, int16 transport (the rare
    escape-overflow fallback): KxK low-frequency blocks -> FOLDED
    dequant+IDCT+resize (:func:`_folded_lowfreq_plane` — the k-point IDCT
    basis lives inside the weight stacks) -> studio-range remap -> 4:2:0
    planes. The frequencies dropped are the ones the full-path Lanczos
    downsample would remove; >=55 dB vs the full path at k=2 on the bench
    shape. Upload and FLOP cost shrink by (8/k)^2 vs the full kernel."""
    idx = jnp.asarray(_lowfreq_indices(k))
    qt_l = qtabs[:, :64][:, idx] * (k / 8.0)
    qt_c = qtabs[:, 64:][:, idx] * (k / 8.0)
    Y = _folded_plane_i16(y_flat, bx_b, qt_l, wv_y_f, wh_y_f, vidx, k)
    Cb = _folded_plane_i16(cb_flat, cx_b, qt_c, wv_c_f, wh_c_f, vidx, k)
    Cr = _folded_plane_i16(cr_flat, cx_b, qt_c, wv_c_f, wh_c_f, vidx, k)
    return _yuv_range_pack(Y, Cb, Cr)


#: static escape capacities of the split-int8 batch kernel (part of the
#: compiled shape set: one luma + one per-chroma-plane scatter per batch).
#: Batches whose escape totals exceed them ride the int16 transport. Each
#: entry is 16 wire bytes, so these are cheap — sized so that only
#: pathological content (dense noise at q>=94) overflows.
LOWFREQ_ESC_Y = 4096
LOWFREQ_ESC_C = 1024


@functools.partial(
    jax.jit, static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k")
)
def _decode_resize_yuv_lowfreq_i8_kernel(
    y_dc,       # (B, by_b, pad128(bx_b)) i16
    y_ac,       # (B, by_b, lowfreq_ac_width(bx_b, k)) i8 PLANAR AC levels
    cb_dc,      # (B, cy_b, pad128(cx_b)) i16
    cb_ac,      # (B, cy_b, lowfreq_ac_width(cx_b, k)) i8
    cr_dc,
    cr_ac,
    ey_idx,     # (LOWFREQ_ESC_Y, 3) i32 (img, row, planar col) escape sites
    ey_val,     # (LOWFREQ_ESC_Y,) i32 residuals (level - clamped)
    eb_idx,     # (LOWFREQ_ESC_C, 3) i32
    eb_val,
    er_idx,
    er_val,
    qtabs,      # (B, 128) f32
    wv_y_f,     # (U, k, OHb, by_b) folded (fold_lowfreq_weights)
    wh_y_f,     # (U, k, OWb, bx_b)
    wv_c_f,     # (U, k, OHb/2, cy_b)
    wh_c_f,
    vidx,
    by_b: int,
    bx_b: int,
    cy_b: int,
    cx_b: int,
    k: int,
):
    """Split int8-transport truncated fused decode — the flagship serving
    head. AC levels arrive as int8 (halving the dominant host->device
    upload on bandwidth-limited links) in the PLANAR layout
    (:func:`lowfreq_ac_width`) plus a sparse escape list of residuals for
    the rare |level| > 127. Reconstruction is exact (widen + scatter-add);
    the dequant/IDCT/resize is the FOLDED contraction
    (:func:`_folded_lowfreq_plane`): measured 2.2x over the staged
    IDCT-then-resize form on the flagship 1080p->400 shape, which was
    ~80% bound by the tiny-minor-dim IDCT/interleave stages (see
    docs/ARCHITECTURE.md "Roofline")."""
    idx = jnp.asarray(_lowfreq_indices(k))
    qt_l = qtabs[:, :64][:, idx] * (k / 8.0)
    qt_c = qtabs[:, 64:][:, idx] * (k / 8.0)
    Y = _folded_plane_i8(
        y_dc, y_ac, ey_idx, ey_val, bx_b, qt_l, wv_y_f, wh_y_f, vidx, k
    )
    Cb = _folded_plane_i8(
        cb_dc, cb_ac, eb_idx, eb_val, cx_b, qt_c, wv_c_f, wh_c_f, vidx, k
    )
    Cr = _folded_plane_i8(
        cr_dc, cr_ac, er_idx, er_val, cx_b, qt_c, wv_c_f, wh_c_f, vidx, k
    )
    return _yuv_range_pack(Y, Cb, Cr)


def decode_resize_yuv_lowfreq_batch(
    y_flat: np.ndarray,
    cb_flat: np.ndarray,
    cr_flat: np.ndarray,
    qtabs: np.ndarray,
    weights,
    vidx: np.ndarray,
    block_dims,
    out_shape,
    k: int,
):
    """Run the truncated fused kernel; returns (Y, Cb, Cr) u8 planes."""
    wv_y, wh_y, wv_c, wh_c = weights
    by_b, bx_b, cy_b, cx_b = block_dims
    obh, obw = out_shape
    flat = np.asarray(
        _decode_resize_yuv_lowfreq_kernel(
            jnp.asarray(y_flat),
            jnp.asarray(cb_flat),
            jnp.asarray(cr_flat),
            jnp.asarray(qtabs),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_b=by_b,
            bx_b=bx_b,
            cy_b=cy_b,
            cx_b=cx_b,
            k=k,
        )
    )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh, obw)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    cr = flat[:, ny + nc:].reshape(B, obh // 2, obw // 2)
    return y, cb, cr


def decode_resize_yuv_lowfreq_i8_batch(
    dc_arrays,   # (y_dc, cb_dc, cr_dc) np i16 batch arrays
    ac_arrays,   # (y_ac, cb_ac, cr_ac) np i8 batch arrays
    escapes,     # ((ey_idx, ey_val), (eb_idx, eb_val), (er_idx, er_val))
    qtabs: np.ndarray,
    weights,
    vidx: np.ndarray,
    block_dims,
    out_shape,
    k: int,
):
    """Run the split int8-transport truncated kernel; returns (Y, Cb, Cr)
    u8 planes. Bit-identical to decode_resize_yuv_lowfreq_batch given the
    same underlying levels — only the wire format differs."""
    wv_y, wh_y, wv_c, wh_c = weights
    by_b, bx_b, cy_b, cx_b = block_dims
    obh, obw = out_shape
    (ey_idx, ey_val), (eb_idx, eb_val), (er_idx, er_val) = escapes
    # opt-in Pallas layout-fusion variant of the flagship head
    # (VERDICT r4 #5 second front): same wire contract + op order,
    # see ops/pallas_jpeg8.py
    from imagekit_tpu.ops import pallas_jpeg8

    kern = _decode_resize_yuv_lowfreq_i8_kernel
    kwargs = {}
    if pallas_jpeg8.enabled():
        kern = pallas_jpeg8._decode_resize_i8_pallas
        kwargs = {"interpret": pallas_jpeg8.mode() == "interpret"}
    flat = np.asarray(
        kern(
            jnp.asarray(dc_arrays[0]),
            jnp.asarray(ac_arrays[0]),
            jnp.asarray(dc_arrays[1]),
            jnp.asarray(ac_arrays[1]),
            jnp.asarray(dc_arrays[2]),
            jnp.asarray(ac_arrays[2]),
            jnp.asarray(ey_idx),
            jnp.asarray(ey_val),
            jnp.asarray(eb_idx),
            jnp.asarray(eb_val),
            jnp.asarray(er_idx),
            jnp.asarray(er_val),
            jnp.asarray(qtabs),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_b=by_b,
            bx_b=bx_b,
            cy_b=cy_b,
            cx_b=cx_b,
            k=k,
            **kwargs,
        )
    )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh, obw)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    cr = flat[:, ny + nc:].reshape(B, obh // 2, obw // 2)
    return y, cb, cr


def _fdct_quant_flat(plane, q):
    """(B, ph, pw) centred samples -> 8x8 fDCT -> quantise (round half away
    from zero, the JPEG convention) -> flat (B, ph/8 * pw/8 * 64) int16
    levels. Shared encode tail of the fused transcode kernels."""
    hp = MATMUL_PRECISION
    A8 = jnp.asarray(idct_basis())
    B, ph, pw = plane.shape
    blocks = plane.reshape(B, ph // 8, 8, pw // 8, 8).transpose(0, 1, 3, 2, 4)
    c = jnp.einsum("ux,vy,bijxy->bijuv", A8, A8, blocks, precision=hp)
    c = c.reshape(B, ph // 8, pw // 8, 64) / q[:, None, None, :]
    lv = jnp.sign(c) * jnp.floor(jnp.abs(c) + 0.5)
    return lv.astype(jnp.int16).reshape(B, -1)


def _widen_split_lowfreq(dc, ac, eidx, evals, by, bx, na):
    """Split int8 transport -> (B, by, bx, na+1) i32 levels: widen the AC
    planes, scatter-add the escape residuals (padding rows add 0 at
    (0,0,0)), prepend the int16 DC lane."""
    B = dc.shape[0]
    a = ac.astype(jnp.int32)
    a = a.at[eidx[:, 0], eidx[:, 1], eidx[:, 2]].add(evals)
    a = a[:, :, : bx * na].reshape(B, by, bx, na)
    d = dc[:, :, :bx].astype(jnp.int32)
    return jnp.concatenate([d[..., None], a], axis=-1)


def _widen_split_levels(dc, ac, eidx, evals, by, bx):
    """k=8 variant of :func:`_widen_split_lowfreq`, flattened to the
    (B, by, bx*64) natural-order layout _blocks_to_plane expects."""
    lev = _widen_split_lowfreq(dc, ac, eidx, evals, by, bx, 63)
    return lev.reshape(dc.shape[0], by, bx * 64)


@functools.partial(
    jax.jit, static_argnames=("by_y", "bx_y", "by_c", "bx_c", "rgb")
)
def _decode_resize_i8_kernel(
    y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
    ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
    qtabs, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx,
    by_y: int, bx_y: int, by_c: int, bx_c: int, rgb: bool,
):
    """Full-resolution (k=8) fused decode+resize on the split int8
    transport — identical output to _decode_resize_kernel (rgb=True) /
    _decode_resize_yuv_kernel (rgb=False); only the wire format differs.
    The upload is ~2x smaller (AC bytes halve; DC plus escapes are small)."""
    A = jnp.asarray(idct_basis())

    def plane(dc, ac, eidx, evals, by, bx, qt):
        lev = _widen_split_levels(dc, ac, eidx, evals, by, bx)
        return _blocks_to_plane(lev, by, bx, qt, A)

    Y = plane(y_dc, y_ac, ey_idx, ey_val, by_y, bx_y, qtabs[:, :64])
    Cb = plane(cb_dc, cb_ac, eb_idx, eb_val, by_c, bx_c, qtabs[:, 64:])
    Cr = plane(cr_dc, cr_ac, er_idx, er_val, by_c, bx_c, qtabs[:, 64:])
    tail = _rgb_tail if rgb else _yuv_tail
    return tail(Y, Cb, Cr, wv_y_u, wh_y_u, wv_c_u, wh_c_u, vidx)


def _run_i8_full(dc_arrays, ac_arrays, escapes, qtabs, weights, vidx,
                 block_dims, rgb: bool):
    wv_y, wh_y, wv_c, wh_c = weights
    by_y, bx_y, by_c, bx_c = block_dims
    (ey_idx, ey_val), (eb_idx, eb_val), (er_idx, er_val) = escapes
    return np.asarray(
        _decode_resize_i8_kernel(
            jnp.asarray(dc_arrays[0]),
            jnp.asarray(ac_arrays[0]),
            jnp.asarray(dc_arrays[1]),
            jnp.asarray(ac_arrays[1]),
            jnp.asarray(dc_arrays[2]),
            jnp.asarray(ac_arrays[2]),
            jnp.asarray(ey_idx),
            jnp.asarray(ey_val),
            jnp.asarray(eb_idx),
            jnp.asarray(eb_val),
            jnp.asarray(er_idx),
            jnp.asarray(er_val),
            jnp.asarray(qtabs),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_y=by_y,
            bx_y=bx_y,
            by_c=by_c,
            bx_c=bx_c,
            rgb=rgb,
        )
    )


def decode_resize_rgb_i8_batch(dc_arrays, ac_arrays, escapes, qtabs,
                               weights, vidx, block_dims, out_shape):
    """Split-transport variant of decode_resize_rgb_batch (bit-identical
    output): returns (B, OHb, OWb, 3) u8."""
    obh, obw = out_shape
    flat = _run_i8_full(
        dc_arrays, ac_arrays, escapes, qtabs, weights, vidx, block_dims,
        rgb=True,
    )
    return flat.reshape(flat.shape[0], obh, obw, 3)


@functools.partial(
    jax.jit, static_argnames=("by_b", "bx_b", "cy_b", "cx_b", "k")
)
def _transcode_i8_kernel(
    y_dc, y_ac, cb_dc, cb_ac, cr_dc, cr_ac,
    ey_idx, ey_val, eb_idx, eb_val, er_idx, er_val,
    qt_in,      # (B, 128) f32 source dequant tables
    qt_out,     # (B, 128) f32 target quant tables (output quality)
    wv_y_u, wh_y_u, wv_c_u, wh_c_u,  # yuv-kind weight stacks, edge-
    # replicated; FOLDED (U, k, O, nblk) form when k < 8
    vidx,
    by_b: int,
    bx_b: int,
    cy_b: int,
    cx_b: int,
    k: int,
):
    """Fused JPEG->JPEG transcode, one device round trip: split-int8
    coefficients in -> dequant + (truncated) IDCT -> Lanczos resize of the
    full-range Y/Cb/Cr planes (chroma stays half-res: subsample-resize-
    upsample folded into the weights) -> 8x8 fDCT + quantise at the target
    quality -> int16 level planes out. Replaces the staged path's THREE
    wire legs (coeffs up, RGB down, RGB up, coeffs down) with two, and
    batches the encode stage that previously dispatched per image.

    The resized planes are rounded to the u8 grid before the fDCT so the
    math matches the staged decode->resize->encode pipeline's integer
    hand-off points (same convention as the webp path). The truncated
    (k < 8) front is the FOLDED contraction — planar AC wire layout,
    IDCT basis folded into the weight stacks — like the lowfreq decode
    kernels; the k == 8 front keeps the decoder-parity staged form
    (its intermediate plane IS decoder-visible u8)."""
    hp = MATMUL_PRECISION

    def u8c(p):  # stage hand-off: round to the u8 grid, centre for fDCT
        return jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0) - 128.0

    if k == 8:
        A8 = jnp.asarray(idct_basis())

        def front(dc, ac, ei, ev, by, bx, qt):
            lev = _widen_split_levels(dc, ac, ei, ev, by, bx)
            return _blocks_to_plane(lev, by, bx, qt, A8)

        def plane_resize(P, wv_u, wh_u):
            wv = wv_u[vidx]
            wh = wh_u[vidx]
            x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
            return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

        Y = front(y_dc, y_ac, ey_idx, ey_val, by_b, bx_b, qt_in[:, :64])
        Cb = front(cb_dc, cb_ac, eb_idx, eb_val, cy_b, cx_b, qt_in[:, 64:])
        Cr = front(cr_dc, cr_ac, er_idx, er_val, cy_b, cx_b, qt_in[:, 64:])
        y = u8c(plane_resize(Y, wv_y_u, wh_y_u))
        cb = u8c(plane_resize(Cb, wv_c_u, wh_c_u))
        cr = u8c(plane_resize(Cr, wv_c_u, wh_c_u))
    else:
        idx = jnp.asarray(_lowfreq_indices(k))
        qt_l = qt_in[:, :64][:, idx] * (k / 8.0)
        qt_c = qt_in[:, 64:][:, idx] * (k / 8.0)
        y = u8c(_folded_plane_i8(
            y_dc, y_ac, ey_idx, ey_val, bx_b, qt_l, wv_y_u, wh_y_u, vidx, k
        ))
        cb = u8c(_folded_plane_i8(
            cb_dc, cb_ac, eb_idx, eb_val, cx_b, qt_c, wv_c_u, wh_c_u, vidx, k
        ))
        cr = u8c(_folded_plane_i8(
            cr_dc, cr_ac, er_idx, er_val, cx_b, qt_c, wv_c_u, wh_c_u, vidx, k
        ))
    return jnp.concatenate(
        [
            _fdct_quant_flat(y, qt_out[:, :64]),
            _fdct_quant_flat(cb, qt_out[:, 64:]),
            _fdct_quant_flat(cr, qt_out[:, 64:]),
        ],
        axis=1,
    )


@jax.jit
def _resample_rgb_jpeg_kernel(imgs_flat, wv_u, wh_u, vidx, hidx, qt_out):
    """Bucketed RGB resample FUSED with the JPEG encode front:
    (B, H, W*3) u8 -> resize -> u8 grid -> YCbCr + 4:2:0 box subsample ->
    8x8 fDCT -> quantise with the per-image target tables -> flat int16
    level planes (Y then Cb then Cr). Serves jpeg outputs from RGB
    sources in ONE batched dispatch (the staged path ran a per-image
    device fDCT call after shipping resized RGB to host and back)."""
    hp = MATMUL_PRECISION
    B, H, WC = imgs_flat.shape
    W = WC // 3
    x = imgs_flat.reshape(B, H, W, 3).astype(jnp.float32)
    wv = wv_u[vidx]
    wh = wh_u[hidx]
    x = jnp.einsum("boh,bhwc->bowc", wv, x, precision=hp)
    x = jnp.einsum("bpw,bowc->bopc", wh, x, precision=hp)
    x = jnp.floor(jnp.clip(x, 0.0, 255.0) + 0.5)  # staged u8 hand-off
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    # JPEG full-range BT.601 (the staged _encode_kernel's matrix)
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


def resample_rgb_jpeg_batch(imgs_flat, weights, vidx, hidx, qt_out,
                            out_shape):
    """Run the fused resample+encode kernel; returns (y, cb, cr) int16
    level arrays shaped (B, OHb/8, OWb/8, 64) / (B, OHb/16, OWb/16, 64) x2
    in natural order for the host Huffman encoder."""
    wv, wh = weights
    obh, obw = out_shape
    # opt-in Pallas front (VERDICT r4 #5 sixth front) — see
    # pallas_resize._resample_rgb_jpeg_pallas
    from imagekit_tpu.ops import pallas_resize as _plr

    if _plr.rgbjpg_enabled():
        flat = np.asarray(
            _plr._resample_rgb_jpeg_pallas(
                jnp.asarray(imgs_flat), jnp.asarray(wv),
                jnp.asarray(wh), jnp.asarray(vidx),
                jnp.asarray(hidx), jnp.asarray(qt_out),
                interpret=_plr.rgbjpg_mode() == "interpret",
            )
        )
    else:
        flat = np.asarray(
            _resample_rgb_jpeg_kernel(
                jnp.asarray(imgs_flat),
                jnp.asarray(wv),
                jnp.asarray(wh),
                jnp.asarray(vidx),
                jnp.asarray(hidx),
                jnp.asarray(qt_out),
            )
        )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh // 8, obw // 8, 64)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 16, obw // 16, 64)
    cr = flat[:, ny + nc:].reshape(B, obh // 16, obw // 16, 64)
    return y, cb, cr


def transcode_i8_batch(dc_arrays, ac_arrays, escapes, qt_in, qt_out,
                       weights, vidx, block_dims, out_shape, k: int):
    """Run the fused transcode kernel; returns (y, cb, cr) int16 level
    arrays of shapes (B, OHb/8, OWb/8, 64) and (B, OHb/16, OWb/16, 64) x2
    in natural order — slice to the true MCU grid and feed the host
    Huffman encoder."""
    wv_y, wh_y, wv_c, wh_c = weights
    by_b, bx_b, cy_b, cx_b = block_dims
    obh, obw = out_shape
    (ey_idx, ey_val), (eb_idx, eb_val), (er_idx, er_val) = escapes
    # opt-in Pallas front for the k<8 truncated branch (VERDICT r4 #5
    # fourth front; k==8 keeps the decoder-parity staged form) — see
    # ops/pallas_jpeg8._transcode_i8_pallas
    from imagekit_tpu.ops import pallas_jpeg8

    kern = _transcode_i8_kernel
    kwargs = {}
    if k < 8 and pallas_jpeg8.jxc_enabled():
        kern = pallas_jpeg8._transcode_i8_pallas
        kwargs = {"interpret": pallas_jpeg8.jxc_mode() == "interpret"}
    flat = np.asarray(
        kern(
            jnp.asarray(dc_arrays[0]),
            jnp.asarray(ac_arrays[0]),
            jnp.asarray(dc_arrays[1]),
            jnp.asarray(ac_arrays[1]),
            jnp.asarray(dc_arrays[2]),
            jnp.asarray(ac_arrays[2]),
            jnp.asarray(ey_idx),
            jnp.asarray(ey_val),
            jnp.asarray(eb_idx),
            jnp.asarray(eb_val),
            jnp.asarray(er_idx),
            jnp.asarray(er_val),
            jnp.asarray(qt_in),
            jnp.asarray(qt_out),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_b=by_b,
            bx_b=bx_b,
            cy_b=cy_b,
            cx_b=cx_b,
            k=k,
            **kwargs,
        )
    )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh // 8, obw // 8, 64)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 16, obw // 16, 64)
    cr = flat[:, ny + nc:].reshape(B, obh // 16, obw // 16, 64)
    return y, cb, cr


def decode_resize_yuv_i8_batch(dc_arrays, ac_arrays, escapes, qtabs,
                               weights, vidx, block_dims, out_shape):
    """Split-transport variant of decode_resize_yuv_batch (bit-identical
    output): returns (Y, Cb, Cr) u8 planes."""
    obh, obw = out_shape
    flat = _run_i8_full(
        dc_arrays, ac_arrays, escapes, qtabs, weights, vidx, block_dims,
        rgb=False,
    )
    B = flat.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = flat[:, :ny].reshape(B, obh, obw)
    cb = flat[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    cr = flat[:, ny + nc:].reshape(B, obh // 2, obw // 2)
    return y, cb, cr


# BT.709 -> BT.601 cross-plane mix, studio-range digital domain
# (M = A601 @ inv(A709) over the analog YCbCr matrices; the Y row keeps a
# unit luma coefficient and the chroma rows have zero luma coefficient, so
# the mix is 1 luma + 2 chroma-into-luma + a 2x2 chroma block. Y-row
# chroma terms carry the 219/224 studio excursion ratio). Folding this
# into the fused head is the same linearity trick as fold_lowfreq_weights
# (VERDICT r4 next #4): the mix commutes with the per-plane resizes, so
# 709 sources ride the SAME batched dispatch with three extra einsum
# terms instead of falling back to the generic RGB path.
MIX_709_YU = 0.09931166  # 0.10157905 * 219/224
MIX_709_YV = 0.19169955  # 0.19607625 * 219/224
MIX_709_UU = 0.98985381
MIX_709_UV = -0.11065251
MIX_709_VU = -0.07245296
MIX_709_VV = 0.98339782


def _yuv_mix_tail(plane_resize, Y, Cb, Cr, wv_y, wh_y, wv_c, wh_c,
                  wv_cf, wh_cf):
    """Shared 709->601 tail: resize luma to the output grid, chroma to
    BOTH the full grid (the luma-row contribution) and the half grid
    (the 2x2 chroma block), then apply the static mix. Offsets commute
    with the resizes because every weight row sums to 1."""
    Ry = plane_resize(Y, wv_y, wh_y)
    CbF = plane_resize(Cb, wv_cf, wh_cf) - 128.0
    CrF = plane_resize(Cr, wv_cf, wh_cf) - 128.0
    Cbh = plane_resize(Cb, wv_c, wh_c) - 128.0
    Crh = plane_resize(Cr, wv_c, wh_c) - 128.0
    y = Ry + MIX_709_YU * CbF + MIX_709_YV * CrF
    cb = 128.0 + MIX_709_UU * Cbh + MIX_709_UV * Crh
    cr = 128.0 + MIX_709_VU * Cbh + MIX_709_VV * Crh
    return y, cb, cr


@functools.partial(
    jax.jit,
    static_argnames=("bh", "bw", "obh", "obw", "csy", "csx", "alpha"),
)
def _resize_yuv420_kernel(
    flat,       # (B, pad128(bh*bw*(1+alpha) + 2*(bh/csy)*(bw/csx))) u8
    wv_y,       # (U, OHb, bh)
    wh_y,       # (U, OWb, bw)
    wv_c,       # (U, OHb/2, bh/csy) subsample∘resize∘upsample folded
    wh_c,       # (U, OWb/2, bw/csx)
    vidx,
    bh: int,
    bw: int,
    obh: int,
    obw: int,
    csy: int = 2,
    csx: int = 2,
    alpha: bool = False,
):
    """Pixel-domain YUV -> resized YUV 4:2:0 (the WebP->WebP path: the
    native VP8 decoder's planes feed this directly — no RGB and no range
    remap anywhere, both ends are studio range). ``csy``/``csx`` are the
    SOURCE chroma subsample factors: (2,2) for 4:2:0, (1,2) for AVIF
    4:2:2, (1,1) for 4:4:4 — the subsample∘resize∘upsample fold in the
    chroma weights lands every source class on 4:2:0 output (VERDICT r3
    #7; the reference decodes all of them through one path,
    src/transform.rs:27-43). ``alpha=True`` packs a full-range alpha
    plane after Cr (luma geometry) and resizes it with the luma weights
    — AVIF-with-alpha sources ride the fused head and hand the plane to
    the AVIF encoder's alpha arm (VERDICT r4 next #4)."""
    B = flat.shape[0]
    ny = bh * bw
    ch, cw = bh // csy, bw // csx
    nc = ch * cw
    Y = flat[:, :ny].reshape(B, bh, bw).astype(jnp.float32)
    Cb = flat[:, ny:ny + nc].reshape(B, ch, cw).astype(jnp.float32)
    Cr = flat[:, ny + nc:ny + 2 * nc].reshape(B, ch, cw).astype(
        jnp.float32
    )

    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    y = plane_resize(Y, wv_y, wh_y)
    cb = plane_resize(Cb, wv_c, wh_c)
    cr = plane_resize(Cr, wv_c, wh_c)

    def q8(p):
        return (
            jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)
            .astype(jnp.uint8)
            .reshape(B, -1)
        )

    parts = [q8(y), q8(cb), q8(cr)]
    if alpha:
        A = flat[:, ny + 2 * nc:ny + 2 * nc + ny].reshape(
            B, bh, bw
        ).astype(jnp.float32)
        parts.append(q8(plane_resize(A, wv_y, wh_y)))
    return jnp.concatenate(parts, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("bh", "bw", "obh", "obw", "csy", "csx", "alpha"),
)
def _resize_yuv420_mix_kernel(
    flat,       # same packing as _resize_yuv420_kernel
    wv_y, wh_y,
    wv_c,       # (U, OHb/2, bh/csy) chroma -> HALF output grid
    wh_c,
    wv_cf,      # (U, OHb, bh/csy)  chroma -> FULL output grid (mix row)
    wh_cf,
    vidx,
    bh: int,
    bw: int,
    obh: int,
    obw: int,
    csy: int = 2,
    csx: int = 2,
    alpha: bool = False,
):
    """BT.709-source variant of the YUV head: same packing and output
    contract, plus the static 709->601 cross-plane mix folded in (see
    ``_yuv_mix_tail``). Kept as a separate compiled program so 601
    batches never pay the three extra einsums; the batcher keys batches
    by the mix flag exactly like it keys chroma geometry."""
    B = flat.shape[0]
    ny = bh * bw
    ch, cw = bh // csy, bw // csx
    nc = ch * cw
    Y = flat[:, :ny].reshape(B, bh, bw).astype(jnp.float32)
    Cb = flat[:, ny:ny + nc].reshape(B, ch, cw).astype(jnp.float32)
    Cr = flat[:, ny + nc:ny + 2 * nc].reshape(B, ch, cw).astype(
        jnp.float32
    )

    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    y, cb, cr = _yuv_mix_tail(
        plane_resize, Y, Cb, Cr, wv_y, wh_y, wv_c, wh_c, wv_cf, wh_cf
    )

    def q8(p):
        return (
            jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0)
            .astype(jnp.uint8)
            .reshape(B, -1)
        )

    parts = [q8(y), q8(cb), q8(cr)]
    if alpha:
        A = flat[:, ny + 2 * nc:ny + 2 * nc + ny].reshape(
            B, bh, bw
        ).astype(jnp.float32)
        parts.append(q8(plane_resize(A, wv_y, wh_y)))
    return jnp.concatenate(parts, axis=1)


@functools.partial(
    jax.jit, static_argnames=("bh", "bw", "obh", "obw")
)
def _resize_yuv_jpeg_kernel(
    flat,       # (B, pad128(bh*bw*3/2)) u8 studio-range YUV 4:2:0
    wv_y, wh_y, wv_c, wh_c,
    qt_out,     # (B, 128) f32 target quant tables
    vidx,
    bh: int,
    bw: int,
    obh: int,
    obw: int,
):
    """YUV-source -> JPEG output in one dispatch: resize the studio-range
    planes (yuvsrc weights), remap to full-range JFIF, round to the u8
    grid, 8x8 fDCT + quantise -> int16 level planes for the host Huffman
    encoder. Serves jpeg outputs from native WebP/AVIF sources without an
    RGB round trip (the affine range remap commutes with the resize)."""
    B = flat.shape[0]
    ny = bh * bw
    nc = (bh // 2) * (bw // 2)
    Y = flat[:, :ny].reshape(B, bh, bw).astype(jnp.float32)
    Cb = flat[:, ny:ny + nc].reshape(B, bh // 2, bw // 2).astype(jnp.float32)
    Cr = flat[:, ny + nc:ny + 2 * nc].reshape(B, bh // 2, bw // 2).astype(
        jnp.float32
    )
    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    def u8c(p):  # full-range u8 grid hand-off, centred for the fDCT
        return jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0) - 128.0

    y = u8c((plane_resize(Y, wv_y, wh_y) - 16.0) * (255.0 / 219.0))
    cb = u8c(
        (plane_resize(Cb, wv_c, wh_c) - 128.0) * (255.0 / 224.0) + 128.0
    )
    cr = u8c(
        (plane_resize(Cr, wv_c, wh_c) - 128.0) * (255.0 / 224.0) + 128.0
    )
    return jnp.concatenate(
        [
            _fdct_quant_flat(y, qt_out[:, :64]),
            _fdct_quant_flat(cb, qt_out[:, 64:]),
            _fdct_quant_flat(cr, qt_out[:, 64:]),
        ],
        axis=1,
    )


@functools.partial(
    jax.jit, static_argnames=("bh", "bw", "obh", "obw")
)
def _resize_yuv_jpeg_mix_kernel(
    flat, wv_y, wh_y, wv_c, wh_c, wv_cf, wh_cf, qt_out, vidx,
    bh: int, bw: int, obh: int, obw: int,
):
    """BT.709-source variant of the fused YUV->JPEG head: the static
    709->601 mix (``_yuv_mix_tail``) runs between the resizes and the
    studio->JFIF range remap. 4:2:0 sources only, like the base head."""
    B = flat.shape[0]
    ny = bh * bw
    nc = (bh // 2) * (bw // 2)
    Y = flat[:, :ny].reshape(B, bh, bw).astype(jnp.float32)
    Cb = flat[:, ny:ny + nc].reshape(B, bh // 2, bw // 2).astype(jnp.float32)
    Cr = flat[:, ny + nc:ny + 2 * nc].reshape(B, bh // 2, bw // 2).astype(
        jnp.float32
    )
    hp = MATMUL_PRECISION

    def plane_resize(P, wv_u, wh_u):
        wv = wv_u[vidx]
        wh = wh_u[vidx]
        x = jnp.einsum("boh,bhw->bow", wv, P, precision=hp)
        return jnp.einsum("bpw,bow->bop", wh, x, precision=hp)

    ym, cbm, crm = _yuv_mix_tail(
        plane_resize, Y, Cb, Cr, wv_y, wh_y, wv_c, wh_c, wv_cf, wh_cf
    )

    def u8c(p):  # full-range u8 grid hand-off, centred for the fDCT
        return jnp.clip(jnp.floor(p + 0.5), 0.0, 255.0) - 128.0

    y = u8c((ym - 16.0) * (255.0 / 219.0))
    cb = u8c((cbm - 128.0) * (255.0 / 224.0) + 128.0)
    cr = u8c((crm - 128.0) * (255.0 / 224.0) + 128.0)
    return jnp.concatenate(
        [
            _fdct_quant_flat(y, qt_out[:, :64]),
            _fdct_quant_flat(cb, qt_out[:, 64:]),
            _fdct_quant_flat(cr, qt_out[:, 64:]),
        ],
        axis=1,
    )


def resize_yuv_jpeg_batch(flat, weights, qt_out, vidx, in_shape, out_shape,
                          mix=False):
    """Run the fused YUV->JPEG kernel; returns (y, cb, cr) int16 level
    arrays ((B, OHb/8, OWb/8, 64) / (B, OHb/16, OWb/16, 64) x2) for the
    host Huffman encoder. ``mix=True`` selects the BT.709-source variant
    (weights then carries the two extra full-grid chroma stacks)."""
    bh, bw = in_shape
    obh, obw = out_shape
    if mix:
        wv_y, wh_y, wv_c, wh_c, wv_cf, wh_cf = weights
        out = np.asarray(
            _resize_yuv_jpeg_mix_kernel(
                jnp.asarray(flat), jnp.asarray(wv_y), jnp.asarray(wh_y),
                jnp.asarray(wv_c), jnp.asarray(wh_c), jnp.asarray(wv_cf),
                jnp.asarray(wh_cf), jnp.asarray(qt_out),
                jnp.asarray(vidx), bh=bh, bw=bw, obh=obh, obw=obw,
            )
        )
    else:
        wv_y, wh_y, wv_c, wh_c = weights[:4]
        # opt-in Pallas front (VERDICT r4 #5 fifth front): fused remap
        # epilogue, einsum fDCT tail — see pallas_resize
        from imagekit_tpu.ops import pallas_resize as _plr

        if _plr.yuvjpg_enabled():
            out = np.asarray(
                _plr._resize_yuv_jpeg_pallas(
                    jnp.asarray(flat), jnp.asarray(wv_y),
                    jnp.asarray(wh_y), jnp.asarray(wv_c),
                    jnp.asarray(wh_c), jnp.asarray(qt_out),
                    jnp.asarray(vidx), bh=bh, bw=bw, obh=obh, obw=obw,
                    interpret=_plr.yuvjpg_mode() == "interpret",
                )
            )
        else:
            out = np.asarray(
                _resize_yuv_jpeg_kernel(
                    jnp.asarray(flat),
                    jnp.asarray(wv_y),
                    jnp.asarray(wh_y),
                    jnp.asarray(wv_c),
                    jnp.asarray(wh_c),
                    jnp.asarray(qt_out),
                    jnp.asarray(vidx),
                    bh=bh,
                    bw=bw,
                    obh=obh,
                    obw=obw,
                )
            )
    B = out.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = out[:, :ny].reshape(B, obh // 8, obw // 8, 64)
    cb = out[:, ny:ny + nc].reshape(B, obh // 16, obw // 16, 64)
    cr = out[:, ny + nc:].reshape(B, obh // 16, obw // 16, 64)
    return y, cb, cr


def resize_yuv420_batch(flat, weights, vidx, in_shape, out_shape,
                        chroma_sub=(2, 2), mix=False, alpha=False):
    """Run the YUV-domain resize; returns (Y, Cb, Cr[, A]) u8 planes at
    bucket output shapes (crop on host). ``chroma_sub`` = source
    (csy, csx); ``mix`` selects the BT.709-source variant (weights then
    carries two extra full-grid chroma stacks); ``alpha`` resizes a
    packed 4th plane with the luma weights."""
    bh, bw = in_shape
    obh, obw = out_shape
    csy, csx = chroma_sub
    if not mix:
        # opt-in Pallas in-tile layout fusion (VERDICT r4 #5): the
        # per-image weight gather and the u8->f32 input copy never
        # reach HBM — see ops/pallas_resize.py. Same output contract.
        from imagekit_tpu.ops import pallas_resize

        if pallas_resize.enabled():
            return pallas_resize.resize_yuv420_batch_pallas(
                flat, weights, vidx, in_shape, out_shape,
                chroma_sub=chroma_sub, alpha=alpha,
            )
    if mix:
        wv_y, wh_y, wv_c, wh_c, wv_cf, wh_cf = weights
        out = np.asarray(
            _resize_yuv420_mix_kernel(
                jnp.asarray(flat), jnp.asarray(wv_y), jnp.asarray(wh_y),
                jnp.asarray(wv_c), jnp.asarray(wh_c), jnp.asarray(wv_cf),
                jnp.asarray(wh_cf), jnp.asarray(vidx),
                bh=bh, bw=bw, obh=obh, obw=obw, csy=csy, csx=csx,
                alpha=alpha,
            )
        )
    else:
        wv_y, wh_y, wv_c, wh_c = weights[:4]
        out = np.asarray(
            _resize_yuv420_kernel(
                jnp.asarray(flat),
                jnp.asarray(wv_y),
                jnp.asarray(wh_y),
                jnp.asarray(wv_c),
                jnp.asarray(wh_c),
                jnp.asarray(vidx),
                bh=bh,
                bw=bw,
                obh=obh,
                obw=obw,
                csy=csy,
                csx=csx,
                alpha=alpha,
            )
        )
    B = out.shape[0]
    ny = obh * obw
    nc = (obh // 2) * (obw // 2)
    y = out[:, :ny].reshape(B, obh, obw)
    cb = out[:, ny:ny + nc].reshape(B, obh // 2, obw // 2)
    cr = out[:, ny + nc:ny + 2 * nc].reshape(B, obh // 2, obw // 2)
    if alpha:
        a = out[:, ny + 2 * nc:].reshape(B, obh, obw)
        return y, cb, cr, a
    return y, cb, cr


def host_resize_yuv420_single(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, out_h: int, out_w: int,
    alpha: np.ndarray | None = None, mix: bool = False,
):
    """Numpy mirror of the YUV-domain resize for ONE image (host fallback
    while the batched shape compiles). ``mix`` applies the same static
    709->601 cross-plane mix as the device kernel; ``alpha`` resizes a
    full-range alpha plane with the luma weights (returned 4th)."""
    h, w = y.shape
    wv = resample_weights(h, out_h)
    wh = resample_weights(w, out_w)
    cv = combined_chroma_half_weights(
        cb.shape[0], h, out_h, cb.shape[0], (out_h + 1) // 2
    )
    ch = combined_chroma_half_weights(
        cb.shape[1], w, out_w, cb.shape[1], (out_w + 1) // 2
    )

    def q8(p):
        return np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)

    ry = wv @ y.astype(np.float32) @ wh.T
    cbh = cv @ cb.astype(np.float32) @ ch.T
    crh = cv @ cr.astype(np.float32) @ ch.T
    if mix:
        cvf = combined_chroma_weights(
            cb.shape[0], h, out_h, cb.shape[0], out_h
        )
        chf = combined_chroma_weights(
            cb.shape[1], w, out_w, cb.shape[1], out_w
        )
        cbf = cvf @ cb.astype(np.float32) @ chf.T - 128.0
        crf = cvf @ cr.astype(np.float32) @ chf.T - 128.0
        ry = ry + MIX_709_YU * cbf + MIX_709_YV * crf
        cbh, crh = (
            128.0 + MIX_709_UU * (cbh - 128.0) + MIX_709_UV * (crh - 128.0),
            128.0 + MIX_709_VU * (cbh - 128.0) + MIX_709_VV * (crh - 128.0),
        )
    out = (q8(ry), q8(cbh), q8(crh))
    if alpha is not None:
        out = out + (q8(wv @ alpha.astype(np.float32) @ wh.T),)
    return out


def host_decode_resize_yuv_lowfreq_single(
    coeffs, qtabs, width: int, height: int,
    chroma_w: int, chroma_h: int, out_h: int, out_w: int, k: int,
):
    """Numpy mirror of the truncated kernel for ONE image (host fallback
    while the shape compiles; same math -> matching results). Returns
    studio-range (Y, Cb, Cr) u8 planes at 4:2:0 geometry. Like the folded
    device kernel, the k/8-scale intermediate plane is NOT clipped before
    resampling (parity-ledger'd in docs/ARCHITECTURE.md)."""
    A = idct_basis_k(k)
    idx = _lowfreq_indices(k)
    scale = k / 8.0

    def plane(cpl, q):
        by, bx = cpl.shape[:2]
        c = cpl.astype(np.float32) * q[idx][None, None, :] * scale
        c = c.reshape(by, bx, k, k)
        p = np.einsum("ux,vy,ijuv->ijxy", A, A, c) + 128.0
        return p.transpose(0, 2, 1, 3).reshape(by * k, bx * k)

    Y = plane(coeffs[0], qtabs[0].astype(np.float32))
    Cb = plane(coeffs[1], qtabs[1].astype(np.float32))
    Cr = plane(coeffs[2], qtabs[1].astype(np.float32))

    yi_h, yi_w = intermediate_dim(height, k), intermediate_dim(width, k)
    wv = lowfreq_luma_weights(height, out_h, k, Y.shape[0], out_h)
    wh = lowfreq_luma_weights(width, out_w, k, Y.shape[1], out_w)
    cv = lowfreq_chroma_half_weights(
        chroma_h, height, out_h, Cb.shape[0], (out_h + 1) // 2, k
    )
    ch = lowfreq_chroma_half_weights(
        chroma_w, width, out_w, Cb.shape[1], (out_w + 1) // 2, k
    )
    del yi_h, yi_w

    def q8(p):
        return np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)

    y = q8(wv @ Y @ wh.T * (219.0 / 255.0) + 16.0)
    c_off = 128.0 * (1.0 - 224.0 / 255.0)
    cb = q8(cv @ Cb @ ch.T * (224.0 / 255.0) + c_off)
    cr = q8(cv @ Cr @ ch.T * (224.0 / 255.0) + c_off)
    return y, cb, cr


def host_transcode_single(
    coeffs, qtabs, width: int, height: int,
    chroma_w: int, chroma_h: int, out_h: int, out_w: int, k: int,
    quality: int,
):
    """Numpy mirror of the fused transcode kernel for ONE image (host
    fallback while the shape compiles; same math -> matching results).
    Returns (coefficient planes, (qy, qc)) for the host Huffman encoder."""
    A = idct_basis_k(k)
    idx = _lowfreq_indices(k)
    scale = k / 8.0

    def plane(cpl, q):
        by, bx = cpl.shape[:2]
        c = cpl.astype(np.float32) * q[idx][None, None, :] * scale
        c = c.reshape(by, bx, k, k)
        p = np.einsum("ux,vy,ijuv->ijxy", A, A, c) + 128.0
        p = p.transpose(0, 2, 1, 3).reshape(by * k, bx * k)
        if k == 8:
            # full-resolution front rounds post-IDCT samples to the u8
            # grid (_blocks_to_plane's decoder-parity convention); the
            # truncated front keeps the k/8-scale plane unrounded AND
            # unclipped (folded-kernel parity, docs/ARCHITECTURE.md)
            return np.clip(np.floor(p + 0.5), 0.0, 255.0)
        return p

    Y = plane(coeffs[0], qtabs[0].astype(np.float32))
    Cb = plane(coeffs[1], qtabs[1].astype(np.float32))
    Cr = plane(coeffs[2], qtabs[1].astype(np.float32))
    wv = lowfreq_luma_weights(height, out_h, k, Y.shape[0], out_h)
    wh = lowfreq_luma_weights(width, out_w, k, Y.shape[1], out_w)
    cv = lowfreq_chroma_half_weights(
        chroma_h, height, out_h, Cb.shape[0], (out_h + 1) // 2, k
    )
    ch = lowfreq_chroma_half_weights(
        chroma_w, width, out_w, Cb.shape[1], (out_w + 1) // 2, k
    )

    def u8(p):  # stage hand-off: the u8 grid, like the staged pipeline
        return np.clip(np.floor(p + 0.5), 0, 255)

    y = u8(wv @ Y @ wh.T)
    cb = u8(cv @ Cb @ ch.T)
    cr = u8(cv @ Cr @ ch.T)
    # MCU-grid edge padding + fDCT live in the shared tail (device:
    # replicated weight rows produce identical values)
    return _host_fdct_planes(y, cb, cr, out_h, out_w, quality)


def _host_fdct_planes(y, cb, cr, out_h: int, out_w: int, quality: int):
    """Full-range u8-grid planes (luma at true dims, chroma at ceil-half
    dims) -> MCU-edge-padded fDCT+quant level planes + quant tables, for
    the host Huffman encoder (numpy mirror of the fused encode tails)."""
    mh, mw = (out_h + 15) // 16 * 16, (out_w + 15) // 16 * 16
    y = np.pad(
        y, ((0, mh - y.shape[0]), (0, mw - y.shape[1])), mode="edge"
    )
    cb = np.pad(
        cb,
        ((0, mh // 2 - cb.shape[0]), (0, mw // 2 - cb.shape[1])),
        mode="edge",
    )
    cr = np.pad(
        cr,
        ((0, mh // 2 - cr.shape[0]), (0, mw // 2 - cr.shape[1])),
        mode="edge",
    )
    qy, qc = quality_tables(quality)
    A8 = idct_basis()

    def fq(p, q):
        ph, pw = p.shape
        blocks = (p - 128.0).reshape(ph // 8, 8, pw // 8, 8).transpose(
            0, 2, 1, 3
        )
        c = np.einsum("ux,vy,ijxy->ijuv", A8, A8, blocks)
        c = c.reshape(ph // 8, pw // 8, 64) / q[None, None, :]
        return (np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int16)

    return [fq(y, qy), fq(cb, qc), fq(cr, qc)], (qy, qc)


def host_yuv_jpeg_single(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
    out_h: int, out_w: int, quality: int, mix: bool = False,
):
    """Numpy mirror of the fused YUV->JPEG kernel for ONE image: resize
    the studio-range 4:2:0 planes (UNROUNDED float, exactly like the
    kernel — an intermediate u8 rounding would shift quantised levels by
    ±1 vs the device path), remap to full-range JFIF, round once on the
    u8 grid, fDCT+quantise. ``mix`` applies the 709->601 cross-plane mix
    before the remap (the BT.709-source head). Returns
    (level planes, (qy, qc))."""
    h, w = y.shape
    wv = resample_weights(h, out_h)
    wh = resample_weights(w, out_w)
    cv = combined_chroma_half_weights(
        cb.shape[0], h, out_h, cb.shape[0], (out_h + 1) // 2
    )
    ch = combined_chroma_half_weights(
        cb.shape[1], w, out_w, cb.shape[1], (out_w + 1) // 2
    )
    ys = wv @ y.astype(np.float32) @ wh.T
    cbs = cv @ cb.astype(np.float32) @ ch.T
    crs = cv @ cr.astype(np.float32) @ ch.T
    if mix:
        cvf = combined_chroma_weights(
            cb.shape[0], h, out_h, cb.shape[0], out_h
        )
        chf = combined_chroma_weights(
            cb.shape[1], w, out_w, cb.shape[1], out_w
        )
        cbf = cvf @ cb.astype(np.float32) @ chf.T - 128.0
        crf = cvf @ cr.astype(np.float32) @ chf.T - 128.0
        ys = ys + MIX_709_YU * cbf + MIX_709_YV * crf
        cbs, crs = (
            128.0 + MIX_709_UU * (cbs - 128.0) + MIX_709_UV * (crs - 128.0),
            128.0 + MIX_709_VU * (cbs - 128.0) + MIX_709_VV * (crs - 128.0),
        )

    def u8(p):
        return np.clip(np.floor(p + 0.5), 0, 255)

    yf = u8((ys - 16.0) * (255.0 / 219.0))
    cbf = u8((cbs - 128.0) * (255.0 / 224.0) + 128.0)
    crf = u8((crs - 128.0) * (255.0 / 224.0) + 128.0)
    return _host_fdct_planes(yf, cbf, crf, out_h, out_w, quality)


def decode_resize_rgb_batch(
    y_flat: np.ndarray,
    cb_flat: np.ndarray,
    cr_flat: np.ndarray,
    qtabs: np.ndarray,
    weights: Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray],
    vidx: np.ndarray,
    block_dims: Tuple[int, int, int, int],
    out_shape: Tuple[int, int],
) -> np.ndarray:
    """Run the fused kernel; returns (B, OHb, OWb, 3) u8 (crop on host)."""
    wv_y, wh_y, wv_c, wh_c = weights
    by_y, bx_y, by_c, bx_c = block_dims
    flat = np.asarray(
        _decode_resize_kernel(
            jnp.asarray(y_flat),
            jnp.asarray(cb_flat),
            jnp.asarray(cr_flat),
            jnp.asarray(qtabs),
            jnp.asarray(wv_y),
            jnp.asarray(wh_y),
            jnp.asarray(wv_c),
            jnp.asarray(wh_c),
            jnp.asarray(vidx),
            by_y=by_y,
            bx_y=bx_y,
            by_c=by_c,
            bx_c=bx_c,
        )
    )
    B = flat.shape[0]
    obh, obw = out_shape
    return flat.reshape(B, obh, obw, 3)


# ---------------------------------------------------------------------------
# Encode direction: RGB -> quantised 4:2:0 coefficients
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _encode_kernel(rgb_flat, qy, qc, h: int, w: int):
    """(1, H*W*3) u8 -> quantised Y (4:2:0) coefficient planes.

    H and W must be multiples of 16 (caller pads with edge replication,
    the standard JPEG encoder convention)."""
    x = rgb_flat.reshape(h, w, 3).astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    # 4:2:0 chroma: 2x2 box average (libjpeg h2v2 downsample)
    def down(p):
        return (
            p.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        )
    cb_d, cr_d = down(cb), down(cr)

    A = jnp.asarray(idct_basis())
    hp = MATMUL_PRECISION

    def fdct_quant(plane, q):
        ph, pw = plane.shape
        blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        # forward DCT: coeffs[u,v] = sum_xy A[u,x] A[v,y] p[x,y]
        c = jnp.einsum("ux,vy,ijxy->ijuv", A, A, blocks, precision=hp)
        c = c.reshape(ph // 8, pw // 8, 64) / q[None, None, :]
        # round half away from zero (JPEG quantisation convention)
        return jnp.sign(c) * jnp.floor(jnp.abs(c) + 0.5)

    yq = fdct_quant(y, qy).astype(jnp.int16)
    cbq = fdct_quant(cb_d, qc).astype(jnp.int16)
    crq = fdct_quant(cr_d, qc).astype(jnp.int16)
    return yq, cbq, crq


def encode_rgb_to_coefficients(
    img: np.ndarray, quality: int
) -> Tuple[List[np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Device: colour + subsample + fDCT + quantise. Returns coefficient
    planes [(byY,bxY,64), (byC,bxC,64), ...] i16 and the quant tables.

    The image is edge-padded to BUCKET dims before the jitted kernel runs —
    per-exact-shape jits would mean one 30s-7min remote compile per novel
    output size (compiled-shape discipline); the padded extra blocks are
    sliced off on host (a JPEG stream's MCU count comes from the SOF dims,
    so only ceil(h/16) x ceil(w/16) blocks are ever emitted). Shapes
    outside the bucket ladder fall back to the numpy mirror."""
    from imagekit_tpu.utils.bucketing import bucket_for

    h, w = img.shape[:2]
    ph = (h + 15) // 16 * 16
    pw = (w + 15) // 16 * 16
    qy, qc = quality_tables(quality)
    try:
        bh, bw = bucket_for(ph), bucket_for(pw)
    except ValueError:
        # beyond the bucket ladder (e.g. extreme upscales): the float
        # mirror would allocate gigabytes of temporaries — let the caller
        # fall back to the host library encoder instead
        raise ValueError(
            f"image {w}x{h} exceeds the native encode ladder"
        ) from None
    # cold shapes are served by the numpy mirror (level-identical math,
    # proven in tests) — an inline remote compile would stall a request
    # 30s-7min on the tunnelled TPU. Shapes become device-eligible via
    # warm_encode_shape (the engine warms its target buckets).
    if (bh, bw) not in _encode_shapes_ready:
        return host_encode_rgb_to_coefficients(img, quality)
    padded = np.pad(
        img[:, :, :3], ((0, bh - h), (0, bw - w), (0, 0)), mode="edge"
    )
    yq, cbq, crq = _encode_kernel(
        jnp.asarray(padded.reshape(1, -1)),
        jnp.asarray(qy.astype(np.float32)),
        jnp.asarray(qc.astype(np.float32)),
        h=bh,
        w=bw,
    )
    # slice to the true MCU grid
    by, bx = ph // 8, pw // 8
    cy, cx = ph // 16, pw // 16
    return (
        [
            np.asarray(yq)[:by, :bx],
            np.asarray(cbq)[:cy, :cx],
            np.asarray(crq)[:cy, :cx],
        ],
        (qy, qc),
    )


_encode_shapes_ready: set = set()


def warm_encode_shape(bh: int, bw: int) -> None:
    """Blocking compile of the fDCT/quant kernel for one bucket shape;
    afterwards encode_rgb_to_coefficients uses the device for images whose
    MCU-padded dims bucket to (bh, bw). Called from the engine's warmup on
    its worker pool."""
    zeros = jnp.zeros((1, bh * bw * 3), jnp.uint8)
    q = jnp.ones(64, jnp.float32)
    r = _encode_kernel(zeros, q, q, h=bh, w=bw)
    np.asarray(r[0])
    _encode_shapes_ready.add((bh, bw))


def host_encode_rgb_to_coefficients(
    img: np.ndarray, quality: int
) -> Tuple[List[np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Numpy mirror of the encode kernel for shapes outside the bucket
    ladder (same math; exact-shape device jits are forbidden by the
    compiled-shape discipline)."""
    h, w = img.shape[:2]
    ph = (h + 15) // 16 * 16
    pw = (w + 15) // 16 * 16
    x = np.pad(
        img[:, :, :3], ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    ).astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    cb_d = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    cr_d = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    A = idct_basis()
    qy, qc = quality_tables(quality)

    def fdct_quant(plane, q):
        hh, ww = plane.shape
        blocks = np.ascontiguousarray(
            plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        ).reshape(-1, 8, 8)
        # c[u,v] = A @ p @ A^T per block, as broadcast BLAS matmuls
        c = A[None] @ blocks @ A.T[None]
        c = c.reshape(hh // 8, ww // 8, 64) / q.astype(np.float32)[None, None]
        return (np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int16)

    return (
        [fdct_quant(y, qy), fdct_quant(cb_d, qc), fdct_quant(cr_d, qc)],
        (qy, qc),
    )


def host_decode_resize_single(
    coeffs, qtabs, width: int, height: int,
    chroma_w: int, chroma_h: int, out_h: int, out_w: int,
) -> np.ndarray:
    """Numpy mirror of the fused device kernel for ONE image — the host
    fallback used when a bucket shape hasn't compiled yet (SURVEY.md §5.3:
    per-request fallback from device pipeline to host path). Same math,
    same weights, so results match the device path."""
    A = idct_basis()

    def plane(cplane, q):
        by, bx = cplane.shape[:2]
        c = cplane.astype(np.float32) * q[None, None, :]
        c = c.reshape(by, bx, 8, 8)
        p = np.einsum("ux,vy,ijuv->ijxy", A, A, c)
        p = p.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        return np.clip(np.floor(p + 0.5), 0.0, 255.0).astype(np.float32)

    Y = plane(coeffs[0], qtabs[0].astype(np.float32))[:height, :width]
    Cb = plane(coeffs[1], qtabs[1].astype(np.float32))[:chroma_h, :chroma_w]
    Cr = plane(coeffs[2], qtabs[1].astype(np.float32))[:chroma_h, :chroma_w]

    wy_v = resample_weights(height, out_h)
    wy_h = resample_weights(width, out_w)
    cw_v = combined_chroma_weights(chroma_h, height, out_h, chroma_h, out_h)
    cw_h = combined_chroma_weights(chroma_w, width, out_w, chroma_w, out_w)

    y = wy_v @ Y @ wy_h.T
    cb = cw_v @ Cb @ cw_h.T - 128.0
    cr = cw_v @ Cr @ cw_h.T - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def decode_components_to_rgb(decoded) -> np.ndarray:
    """Single-image host entry for the TPU-native JPEG decode: entropy
    output -> device IDCT/colour -> full-resolution RGB (no resize).
    ``decoded`` is the (header, coeff_planes, qtabs) tuple from
    ``jpeg_abi.decode``."""
    hdr, coeffs, qtabs = decoded
    if hdr.ncomp != 3 or tuple(hdr.comp_h) != (2, 1, 1) or tuple(
        hdr.comp_v
    ) != (2, 1, 1) or hdr.comp_tq[1] != hdr.comp_tq[2]:
        raise ValueError("device decode path supports 4:2:0 3-component")
    # select per-component tables by the actual SOF Tq indices
    qtabs = np.stack([qtabs[hdr.comp_tq[0]], qtabs[hdr.comp_tq[1]]])
    by_y, bx_y = coeffs[0].shape[:2]
    by_c, bx_c = coeffs[1].shape[:2]
    H, W = hdr.height, hdr.width
    # "resize" to identity: full-size output, upsample folded for chroma
    wv_y = padded_weights(by_y * 8, by_y * 8, by_y * 8, by_y * 8, "nearest")[
        None
    ]
    wh_y = padded_weights(bx_y * 8, bx_y * 8, bx_y * 8, bx_y * 8, "nearest")[
        None
    ]
    wv_c = np.zeros((1, by_y * 8, by_c * 8), np.float32)
    wv_c[0, : by_y * 8, : by_c * 8] = upsample_weights(by_c * 8, by_y * 8)
    wh_c = np.zeros((1, bx_y * 8, bx_c * 8), np.float32)
    wh_c[0, : bx_y * 8, : bx_c * 8] = upsample_weights(bx_c * 8, bx_y * 8)
    qt = np.concatenate(
        [qtabs[0].astype(np.float32), qtabs[1].astype(np.float32)]
    )[None]
    out = decode_resize_rgb_batch(
        coeffs[0].reshape(1, by_y, -1),
        coeffs[1].reshape(1, by_c, -1),
        coeffs[2].reshape(1, by_c, -1),
        qt,
        (wv_y, wh_y, wv_c, wh_c),
        np.zeros(1, np.int32),
        (by_y, bx_y, by_c, bx_c),
        (by_y * 8, bx_y * 8),
    )
    return out[0, :H, :W]
