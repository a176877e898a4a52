"""Device DCT pipeline tests: IDCT/fDCT parity, the fused decode+resize
kernel vs the host-library pipeline, and the TPU-native JPEG encode
roundtrip."""

import io

import numpy as np
import pytest
from PIL import Image

from imagekit_tpu.ops import dct as dct_ops
from tests.conftest import make_test_image, psnr

native = pytest.importorskip("imagekit_tpu.codecs.native.loader")
lib = native.load()
pytestmark = pytest.mark.skipif(lib is None, reason="native codec unavailable")

from imagekit_tpu.codecs.native import jpeg_abi  # noqa: E402


def _jpeg(img, q=90):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=q)
    return buf.getvalue()


def test_idct_basis_orthonormal():
    A = dct_ops.idct_basis()
    np.testing.assert_allclose(A @ A.T, np.eye(8), atol=1e-6)


def test_quality_tables_match_libjpeg_scaling():
    qy50, qc50 = dct_ops.quality_tables(50)
    np.testing.assert_array_equal(qy50, dct_ops.QTAB_LUMA_BASE)
    qy100, _ = dct_ops.quality_tables(100)
    assert qy100.min() >= 1 and qy100.max() <= 16
    qy10, _ = dct_ops.quality_tables(10)
    assert (qy10 >= qy50).all()


def test_native_decode_device_idct_matches_pil():
    """Full TPU-native decode (host Huffman + device IDCT/upsample/colour)
    vs the host library decoder: should agree to high PSNR (both implement
    the same standard; differences are rounding + upsample filter edges)."""
    img = make_test_image(320, 240)
    data = _jpeg(img, 90)
    decoded = jpeg_abi.decode(lib, data)
    ours = dct_ops.decode_components_to_rgb(decoded)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == ref.shape
    assert psnr(ours, ref) >= 40.0


def test_tpu_native_jpeg_encode_roundtrip():
    """Device fDCT+quant -> host Huffman encode -> decodable by the host
    library with quality consistent with the requested q."""
    img = make_test_image(160, 120)
    planes, qtabs = dct_ops.encode_rgb_to_coefficients(img, 85)
    out = jpeg_abi.encode(lib, planes, qtabs, 160, 120)
    assert out[:2] == b"\xff\xd8"
    dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
    assert dec.shape == img.shape
    # parity check against the host-library encoder at the same quality:
    # same rate-distortion within 1 dB (measured: 27.17 vs 27.2 dB here)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=85)
    ref_psnr = psnr(
        np.asarray(Image.open(buf).convert("RGB")), img
    )
    assert psnr(dec, img) >= ref_psnr - 1.0


def test_tpu_native_jpeg_quality_monotonic():
    img = make_test_image(160, 120)
    sizes = []
    for q in (20, 60, 95):
        planes, qtabs = dct_ops.encode_rgb_to_coefficients(img, q)
        sizes.append(len(jpeg_abi.encode(lib, planes, qtabs, 160, 120)))
    assert sizes[0] < sizes[1] < sizes[2]


def test_fused_decode_resize_kernel():
    """Fused coeffs->resized-RGB vs decode-then-resize golden path."""
    from imagekit_tpu.ops.resize import padded_weights, resample_reference
    from imagekit_tpu.utils.bucketing import bucket_for

    img = make_test_image(640, 480)
    data = _jpeg(img, 92)
    hdr, coeffs, qtabs = jpeg_abi.decode(lib, data)
    by_y, bx_y = coeffs[0].shape[:2]
    by_c, bx_c = coeffs[1].shape[:2]
    out_w, out_h = 200, 150

    obh, obw = bucket_for(out_h), bucket_for(out_w)
    wv_y = padded_weights(hdr.height, out_h, by_y * 8, obh)[None]
    wh_y = padded_weights(hdr.width, out_w, bx_y * 8, obw)[None]
    wv_c = dct_ops.combined_chroma_weights(
        hdr.comp_height[1], hdr.height, out_h, by_c * 8, obh
    )[None]
    wh_c = dct_ops.combined_chroma_weights(
        hdr.comp_width[1], hdr.width, out_w, bx_c * 8, obw
    )[None]
    qt = np.concatenate(
        [qtabs[0].astype(np.float32), qtabs[1].astype(np.float32)]
    )[None]
    out = dct_ops.decode_resize_rgb_batch(
        coeffs[0].reshape(1, coeffs[0].shape[0], -1),
        coeffs[1].reshape(1, coeffs[1].shape[0], -1),
        coeffs[2].reshape(1, coeffs[2].shape[0], -1),
        qt,
        (wv_y, wh_y, wv_c, wh_c),
        np.zeros(1, np.int32),
        (by_y, bx_y, by_c, bx_c),
        (obh, obw),
    )[0, :out_h, :out_w]

    # golden: host-library decode then reference resample
    ref_full = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    golden = resample_reference(ref_full, out_h, out_w)
    assert psnr(out, golden) >= 40.0


def test_lowfreq_decode_matches_full_path():
    """K-truncated coefficient decode (scaled IDCT) vs the full path at the
    target resolution: the dropped frequencies are the ones Lanczos
    removes, so the two pipelines agree to high PSNR."""
    from imagekit_tpu.ops.dct import (
        host_decode_resize_yuv_lowfreq_single,
    )

    img = make_test_image(1280, 720)
    data = _jpeg(img, 85)
    out_h, out_w = 150, 267

    # full path -> RGB golden at target res
    hdr, coeffs, qtabs = jpeg_abi.decode(lib, data)
    qt2 = np.stack([qtabs[hdr.comp_tq[0]], qtabs[hdr.comp_tq[1]]])
    full_rgb = dct_ops.host_decode_resize_single(
        coeffs, qt2, hdr.width, hdr.height,
        hdr.comp_width[1], hdr.comp_height[1], out_h, out_w,
    )

    for k in (2, 4):
        hdr2, ck, qk = jpeg_abi.decode_lowfreq(lib, data, k)
        assert ck[0].shape == (hdr.blocks_h[0], hdr.blocks_w[0], k * k)
        qk2 = np.stack([qk[hdr2.comp_tq[0]], qk[hdr2.comp_tq[1]]])
        y, cb, cr = host_decode_resize_yuv_lowfreq_single(
            ck, qk2, hdr.width, hdr.height,
            hdr.comp_width[1], hdr.comp_height[1], out_h, out_w, k,
        )
        # compare in luma space: full path's Y (BT.601 from RGB) remapped
        r, g, b = [full_rgb[..., i].astype(np.float32) for i in range(3)]
        y_full = (0.299 * r + 0.587 * g + 0.114 * b) * (219 / 255) + 16
        assert psnr(y.astype(np.float32), y_full) >= 40.0, k


def test_lowfreq_device_kernel_matches_host_mirror():
    from imagekit_tpu.ops.dct import (
        decode_resize_yuv_lowfreq_batch,
        fold_lowfreq_weights,
        host_decode_resize_yuv_lowfreq_single,
        lowfreq_chroma_half_weights,
        lowfreq_luma_weights,
        pad128,
    )
    from imagekit_tpu.utils.bucketing import bucket_for

    img = make_test_image(640, 480)
    data = _jpeg(img, 88)
    k = 2
    hdr, ck, qk = jpeg_abi.decode_lowfreq(lib, data, k)
    qt2 = np.stack([qk[hdr.comp_tq[0]], qk[hdr.comp_tq[1]]])
    out_h, out_w = 120, 160

    by, bx = ck[0].shape[:2]
    cy, cx = ck[1].shape[:2]
    yb_h, yb_w = bucket_for(by * 8), bucket_for(bx * 8)
    obh, obw = bucket_for(out_h), bucket_for(out_w)
    nk = k * k
    y = np.zeros((1, yb_h // 8, pad128((yb_w // 8) * nk)), np.int16)
    cb = np.zeros((1, yb_h // 16, pad128((yb_w // 16) * nk)), np.int16)
    cr = np.zeros_like(cb)
    y[0, :by, : bx * nk] = ck[0].reshape(by, -1)
    cb[0, :cy, : cx * nk] = ck[1].reshape(cy, -1)
    cr[0, :cy, : cx * nk] = ck[2].reshape(cy, -1)
    qt = np.zeros((1, 128), np.float32)
    qt[0, :64] = qt2[0]
    qt[0, 64:] = qt2[1]
    wv = np.zeros((1, obh, yb_h * k // 8), np.float32)
    wh = np.zeros((1, obw, yb_w * k // 8), np.float32)
    wvc = np.zeros((1, obh // 2, yb_h * k // 16), np.float32)
    whc = np.zeros((1, obw // 2, yb_w * k // 16), np.float32)
    wv[0] = lowfreq_luma_weights(hdr.height, out_h, k, yb_h * k // 8, obh)
    wh[0] = lowfreq_luma_weights(hdr.width, out_w, k, yb_w * k // 8, obw)
    wvc[0] = lowfreq_chroma_half_weights(
        hdr.comp_height[1], hdr.height, out_h, yb_h * k // 16, obh // 2, k
    )
    whc[0] = lowfreq_chroma_half_weights(
        hdr.comp_width[1], hdr.width, out_w, yb_w * k // 16, obw // 2, k
    )
    folded = tuple(fold_lowfreq_weights(w, k) for w in (wv, wh, wvc, whc))
    yd, cbd, crd = decode_resize_yuv_lowfreq_batch(
        y, cb, cr, qt, folded, np.zeros(1, np.int32),
        (yb_h // 8, yb_w // 8, yb_h // 16, yb_w // 16), (obh, obw), k,
    )
    yh, cbh, crh = host_decode_resize_yuv_lowfreq_single(
        ck, qt2, hdr.width, hdr.height,
        hdr.comp_width[1], hdr.comp_height[1], out_h, out_w, k,
    )
    assert np.abs(
        yd[0, :out_h, :out_w].astype(int) - yh.astype(int)
    ).max() <= 1
    ch, cw = (out_h + 1) // 2, (out_w + 1) // 2
    assert np.abs(
        cbd[0, :ch, :cw].astype(int) - cbh.astype(int)
    ).max() <= 1


# -- split int8 coefficient transport (decode_lowfreq_i8) ---------------------


def _noisy_image(w, h, seed=7):
    """High-entropy content with hard edges: at q>=90 some AC levels exceed
    int8, exercising the escape list."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) % 256,
        ],
        axis=-1,
    ).astype(np.float32)
    base = np.clip(base + rng.normal(0, 90, base.shape), 0, 255)
    base[::7] = 255.0
    base[:, ::5] = 0.0
    return base.astype(np.uint8)


@pytest.mark.skipif(
    lib is None or not hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8"),
    reason="i8 transport symbol unavailable",
)
def test_lowfreq_i8_transport_reconstructs_exact_levels():
    """dc(int16) + ac(int8) + escape residuals rebuild the int16 levels
    bit-exactly — baseline, progressive, and escape-dense content."""
    total_esc = 0
    for q, noisy, prog in [(85, False, False), (92, True, False), (90, True, True)]:
        img = _noisy_image(644, 482) if noisy else make_test_image(644, 482)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=q, progressive=prog)
        data = buf.getvalue()
        for k in (2, 4):
            hdr, ck, qk = jpeg_abi.decode_lowfreq(lib, data, k)
            hdr2, dc, ac, esc, qk2, ovf = jpeg_abi.decode_lowfreq_i8(
                lib, data, k
            )
            assert not ovf
            np.testing.assert_array_equal(qk, qk2)
            total_esc += len(esc)
            lev = jpeg_abi.reconstruct_lowfreq_levels(dc, ac, esc, k)
            for c in range(3):
                np.testing.assert_array_equal(lev[c], ck[c])
    assert total_esc > 0, "escape path never exercised"


@pytest.mark.skipif(
    lib is None or not hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8"),
    reason="i8 transport symbol unavailable",
)
def test_lowfreq_i8_overflow_flag():
    """Truncated escape lists are reported, not silently dropped."""
    data = _jpeg(_noisy_image(324, 242), 96)
    _, _, _, esc, _, ovf = jpeg_abi.decode_lowfreq_i8(lib, data, 4, esc_cap=2)
    assert ovf and len(esc) == 2


@pytest.mark.skipif(
    lib is None or not hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8"),
    reason="i8 transport symbol unavailable",
)
def test_lowfreq_i8_device_kernel_bit_parity():
    """The split-transport kernel is bit-identical to the int16 lowfreq
    kernel on a batch mixing escape-free and escape-dense images."""
    from imagekit_tpu.ops.dct import (
        LOWFREQ_ESC_C,
        LOWFREQ_ESC_Y,
        decode_resize_yuv_lowfreq_batch,
        decode_resize_yuv_lowfreq_i8_batch,
        fold_lowfreq_weights,
        lowfreq_chroma_half_weights,
        lowfreq_luma_weights,
        pad128,
    )
    from imagekit_tpu.serving.batcher import _esc_batch_rows, _pad_esc
    from imagekit_tpu.utils.bucketing import bucket_for

    k = 4
    nk, na = k * k, k * k - 1
    datas = [
        _jpeg(make_test_image(640, 480), 85),
        _jpeg(_noisy_image(640, 480), 92),
    ]
    out_h, out_w = 120, 160
    dec16 = [jpeg_abi.decode_lowfreq(lib, d, k) for d in datas]
    dec8 = [jpeg_abi.decode_lowfreq_i8(lib, d, k) for d in datas]
    assert any(len(d[3]) for d in dec8), "no escapes in batch"

    hdr = dec16[0][0]
    by, bx = dec16[0][1][0].shape[:2]
    cy, cx = dec16[0][1][1].shape[:2]
    yb_h, yb_w = bucket_for(by * 8), bucket_for(bx * 8)
    obh, obw = bucket_for(out_h), bucket_for(out_w)
    by_b, bx_b, cy_b, cx_b = yb_h // 8, yb_w // 8, yb_h // 16, yb_w // 16
    nb = 2

    qt = np.zeros((nb, 128), np.float32)
    y16 = np.zeros((nb, by_b, pad128(bx_b * nk)), np.int16)
    cb16 = np.zeros((nb, cy_b, pad128(cx_b * nk)), np.int16)
    cr16 = np.zeros_like(cb16)
    for i, (h, ck, qk) in enumerate(dec16):
        y16[i, :by, : bx * nk] = ck[0].reshape(by, -1)
        cb16[i, :cy, : cx * nk] = ck[1].reshape(cy, -1)
        cr16[i, :cy, : cx * nk] = ck[2].reshape(cy, -1)
        qt[i, :64] = qk[h.comp_tq[0]]
        qt[i, 64:] = qk[h.comp_tq[1]]

    wv = np.zeros((1, obh, yb_h * k // 8), np.float32)
    wh = np.zeros((1, obw, yb_w * k // 8), np.float32)
    wvc = np.zeros((1, obh // 2, yb_h * k // 16), np.float32)
    whc = np.zeros((1, obw // 2, yb_w * k // 16), np.float32)
    wv[0] = lowfreq_luma_weights(hdr.height, out_h, k, yb_h * k // 8, obh)
    wh[0] = lowfreq_luma_weights(hdr.width, out_w, k, yb_w * k // 8, obw)
    wvc[0] = lowfreq_chroma_half_weights(
        hdr.comp_height[1], hdr.height, out_h, yb_h * k // 16, obh // 2, k
    )
    whc[0] = lowfreq_chroma_half_weights(
        hdr.comp_width[1], hdr.width, out_w, yb_w * k // 16, obw // 2, k
    )
    vidx = np.zeros(nb, np.int32)
    dims = (by_b, bx_b, cy_b, cx_b)
    folded = tuple(fold_lowfreq_weights(w, k) for w in (wv, wh, wvc, whc))

    ref = decode_resize_yuv_lowfreq_batch(
        y16, cb16, cr16, qt, folded, vidx, dims, (obh, obw), k
    )

    pads = (pad128(bx_b), pad128(cx_b))  # planar AC layout
    y_dc = np.zeros((nb, by_b, pad128(bx_b)), np.int16)
    y_ac = np.zeros((nb, by_b, na * pads[0]), np.int8)
    cb_dc = np.zeros((nb, cy_b, pad128(cx_b)), np.int16)
    cb_ac = np.zeros((nb, cy_b, na * pads[1]), np.int8)
    cr_dc = np.zeros_like(cb_dc)
    cr_ac = np.zeros_like(cb_ac)
    eidx = [[], [], []]
    evals = [[], [], []]
    for i, (h, dc, ac, esc, qk, ovf) in enumerate(dec8):
        assert not ovf
        y_dc[i, :by, :bx] = dc[0]
        cb_dc[i, :cy, :cx] = dc[1]
        cr_dc[i, :cy, :cx] = dc[2]
        for j in range(na):
            y_ac[i, :by, j * pads[0] : j * pads[0] + bx] = ac[0][:, :, j]
            cb_ac[i, :cy, j * pads[1] : j * pads[1] + cx] = ac[1][:, :, j]
            cr_ac[i, :cy, j * pads[1] : j * pads[1] + cx] = ac[2][:, :, j]
        for c, (ei, ev) in enumerate(
            _esc_batch_rows(esc, i, bx, cx, na, pads)
        ):
            eidx[c].append(ei)
            evals[c].append(ev)
    escs = (
        _pad_esc(eidx[0], evals[0], LOWFREQ_ESC_Y),
        _pad_esc(eidx[1], evals[1], LOWFREQ_ESC_C),
        _pad_esc(eidx[2], evals[2], LOWFREQ_ESC_C),
    )
    out = decode_resize_yuv_lowfreq_i8_batch(
        (y_dc, cb_dc, cr_dc), (y_ac, cb_ac, cr_ac), escs, qt,
        folded, vidx, dims, (obh, obw), k,
    )
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    lib is None or not hasattr(lib, "ik_jpeg_decode_coeffs_lowfreq_i8"),
    reason="i8 transport symbol unavailable",
)
def test_fullk_i8_device_kernels_bit_parity():
    """k=8 split transport: the full-resolution YUV and RGB fused kernels
    are bit-identical to their int16-transport counterparts."""
    from imagekit_tpu.ops.dct import (
        LOWFREQ_ESC_C,
        LOWFREQ_ESC_Y,
        combined_chroma_half_weights,
        combined_chroma_weights,
        decode_resize_rgb_batch,
        decode_resize_rgb_i8_batch,
        decode_resize_yuv_batch,
        decode_resize_yuv_i8_batch,
        pad128,
    )
    from imagekit_tpu.ops.resize import padded_weights
    from imagekit_tpu.serving.batcher import _esc_batch_rows, _pad_esc
    from imagekit_tpu.utils.bucketing import bucket_for

    na = 63
    datas = [
        _jpeg(make_test_image(320, 240), 85),
        _jpeg(_noisy_image(320, 240), 92),
    ]
    out_h, out_w = 150, 200  # <2x: the full-resolution path

    dec16 = [jpeg_abi.decode(lib, d) for d in datas]
    dec8 = [jpeg_abi.decode_lowfreq_i8(lib, d, 8) for d in datas]
    assert any(len(d[3]) for d in dec8), "no escapes in batch"

    hdr = dec16[0][0]
    by, bx = dec16[0][1][0].shape[:2]
    cy, cx = dec16[0][1][1].shape[:2]
    yb_h, yb_w = bucket_for(by * 8), bucket_for(bx * 8)
    obh, obw = bucket_for(out_h), bucket_for(out_w)
    by_b, bx_b, cy_b, cx_b = yb_h // 8, yb_w // 8, yb_h // 16, yb_w // 16
    nb = 2

    qt = np.zeros((nb, 128), np.float32)
    y16 = np.zeros((nb, by_b, bx_b * 64), np.int16)
    cb16 = np.zeros((nb, cy_b, cx_b * 64), np.int16)
    cr16 = np.zeros_like(cb16)
    for i, (h, ck, qk) in enumerate(dec16):
        y16[i, :by, : bx * 64] = ck[0].reshape(by, -1)
        cb16[i, :cy, : cx * 64] = ck[1].reshape(cy, -1)
        cr16[i, :cy, : cx * 64] = ck[2].reshape(cy, -1)
        qt[i, :64] = qk[h.comp_tq[0]]
        qt[i, 64:] = qk[h.comp_tq[1]]

    y_dc = np.zeros((nb, by_b, pad128(bx_b)), np.int16)
    y_ac = np.zeros((nb, by_b, pad128(bx_b * na)), np.int8)
    cb_dc = np.zeros((nb, cy_b, pad128(cx_b)), np.int16)
    cb_ac = np.zeros((nb, cy_b, pad128(cx_b * na)), np.int8)
    cr_dc = np.zeros_like(cb_dc)
    cr_ac = np.zeros_like(cb_ac)
    eidx = [[], [], []]
    evals = [[], [], []]
    for i, (h, dc, ac, esc, qk, ovf) in enumerate(dec8):
        assert not ovf
        y_dc[i, :by, :bx] = dc[0]
        y_ac[i, :by, : bx * na] = ac[0].reshape(by, -1)
        cb_dc[i, :cy, :cx] = dc[1]
        cb_ac[i, :cy, : cx * na] = ac[1].reshape(cy, -1)
        cr_dc[i, :cy, :cx] = dc[2]
        cr_ac[i, :cy, : cx * na] = ac[2].reshape(cy, -1)
        for c, (ei, ev) in enumerate(_esc_batch_rows(esc, i, bx, cx, na)):
            eidx[c].append(ei)
            evals[c].append(ev)
    escs = (
        _pad_esc(eidx[0], evals[0], LOWFREQ_ESC_Y),
        _pad_esc(eidx[1], evals[1], LOWFREQ_ESC_C),
        _pad_esc(eidx[2], evals[2], LOWFREQ_ESC_C),
    )
    vidx = np.zeros(nb, np.int32)
    dims = (by_b, bx_b, cy_b, cx_b)

    # --- YUV (webp) variant
    wv_y = np.zeros((1, obh, yb_h), np.float32)
    wh_y = np.zeros((1, obw, yb_w), np.float32)
    wv_c = np.zeros((1, obh // 2, yb_h // 2), np.float32)
    wh_c = np.zeros((1, obw // 2, yb_w // 2), np.float32)
    wv_y[0] = padded_weights(hdr.height, out_h, yb_h, obh)
    wh_y[0] = padded_weights(hdr.width, out_w, yb_w, obw)
    wv_c[0] = combined_chroma_half_weights(
        hdr.comp_height[1], hdr.height, out_h, yb_h // 2, obh // 2
    )
    wh_c[0] = combined_chroma_half_weights(
        hdr.comp_width[1], hdr.width, out_w, yb_w // 2, obw // 2
    )
    w_yuv = (wv_y, wh_y, wv_c, wh_c)
    ref = decode_resize_yuv_batch(
        y16, cb16, cr16, qt, w_yuv, vidx, dims, (obh, obw)
    )
    out = decode_resize_yuv_i8_batch(
        (y_dc, cb_dc, cr_dc), (y_ac, cb_ac, cr_ac), escs, qt, w_yuv, vidx,
        dims, (obh, obw),
    )
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --- RGB (jpeg/avif output) variant
    wv_cf = np.zeros((1, obh, yb_h // 2), np.float32)
    wh_cf = np.zeros((1, obw, yb_w // 2), np.float32)
    wv_cf[0] = combined_chroma_weights(
        hdr.comp_height[1], hdr.height, out_h, yb_h // 2, obh
    )
    wh_cf[0] = combined_chroma_weights(
        hdr.comp_width[1], hdr.width, out_w, yb_w // 2, obw
    )
    w_rgb = (wv_y, wh_y, wv_cf, wh_cf)
    ref_rgb = decode_resize_rgb_batch(
        y16, cb16, cr16, qt, w_rgb, vidx, dims, (obh, obw)
    )
    out_rgb = decode_resize_rgb_i8_batch(
        (y_dc, cb_dc, cr_dc), (y_ac, cb_ac, cr_ac), escs, qt, w_rgb, vidx,
        dims, (obh, obw),
    )
    np.testing.assert_array_equal(np.asarray(ref_rgb), np.asarray(out_rgb))
