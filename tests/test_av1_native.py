"""First-party AV1 intra encoder: MSAC + gray-frame conformance.

The dav1d-oracle tests decode this module's streams with the system
libdav1d (the same library the production AVIF decode path uses) and
require bit-exact reconstruction.  They skip when dav1d is unavailable.

Scope pins (keep in sync with imagekit_tpu/codecs/av1_intra.py):
ANY frame dims 1..4096 are certified (round 5 closed the sub-64
edge-tile corner: the spec 8-px mi grid + the forced-split partition
syntax, whose split_or_horz/vert gather sets only edge geometries can
pin — see tools/av1_validate.py's sweep).
"""

import numpy as np
import pytest

from imagekit_tpu.codecs.av1_entropy import (
    MsacDecoder, MsacEncoder, leb128, obu, tables,
)
from imagekit_tpu.codecs.av1_intra import encode_gray_frame
from imagekit_tpu.codecs import avif_native


def test_tables_present_and_shaped():
    T = tables()
    assert T["partition"].shape == (20, 11)
    assert T["kf_y_mode"].shape == (5, 5, 14)
    assert T["uv_mode"].shape == (2, 13, 15)
    assert T["skip"].shape == (3, 3)
    assert T["filter_intra"].shape == (22, 3)
    # true default skip CDF (icdf of {31671, 16515, 4576})
    assert [int(r[0]) for r in T["skip"]] == [1097, 16253, 28192]


def test_msac_roundtrip_mixed_symbols():
    T = tables()
    chains = [
        (T["partition"][12], 10, 3),
        (T["partition"][8], 10, 0),
        (T["skip"][0], 2, 0),
        (T["kf_y_mode"][0][0], 13, 0),
        (T["uv_mode"][0][0], 13, 0),
        (T["filter_intra"][9], 2, 0),
        (T["kf_y_mode"][2][3], 13, 7),
        (T["partition"][4], 10, 2),
        (T["skip"][2], 2, 1),
    ]
    m = MsacEncoder()
    for icdf, n, s in chains:
        m.encode_symbol(s, icdf, n)
    m.encode_literal(0x2B5, 10)
    data = m.done()
    d = MsacDecoder(data)
    for icdf, n, s in chains:
        assert d.decode_symbol(icdf, n) == s
    got = 0
    for _ in range(10):
        got = (got << 1) | d.decode_symbol((1 << 14,), 2)
    assert got == 0x2B5


def test_leb128():
    assert leb128(0) == b"\x00"
    assert leb128(127) == b"\x7f"
    assert leb128(128) == b"\x80\x01"


def test_obu_framing():
    payload = b"\x12\x34"
    out = obu(1, payload)
    assert out[0] == (1 << 3) | 0x02
    assert out[1] == 2
    assert out[2:] == payload


needs_dav1d = pytest.mark.skipif(
    not avif_native.decode_available(), reason="libdav1d unavailable")


@needs_dav1d
@pytest.mark.parametrize("dims", [
    (64, 64), (128, 64), (64, 128), (128, 128),
    (256, 256), (192, 128), (512, 384), (1024, 768),
])
def test_gray_frame_bit_exact_via_dav1d(dims):
    w, h = dims
    stream = encode_gray_frame(w, h)
    r = avif_native._decode_obu(stream, w, h)
    assert r is not None, "dav1d rejected the stream"
    y, u, v, _, _ = r
    assert (y == 128).all()
    assert (u == 128).all()
    assert (v == 128).all()


@needs_dav1d
def test_tile_per_superblock_framing():
    # 256x192: 4x3 tiles; every tile but the last carries a 4-byte size
    stream = encode_gray_frame(256, 192)
    r = avif_native._decode_obu(stream, 256, 192)
    assert r is not None
    assert (r[0] == 128).all()


# ---------------------------------------------------------------------------
# Real-content image encoding (prediction + residual coefficients)


needs_dav1d = pytest.mark.skipif(
    not avif_native.decode_available(), reason="libdav1d unavailable")


def _contents(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return {
        "gradient": (xx * 2 + yy + 40).astype(np.uint8),
        "noise": rng.integers(0, 256, (h, w)).astype(np.uint8),
        "waves": np.clip(
            128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
            + rng.normal(0, 6, (h, w)), 0, 255).astype(np.uint8),
    }


@needs_dav1d
@pytest.mark.parametrize("content", ["gradient", "noise", "waves"])
@pytest.mark.parametrize("qindex", [20, 80, 160])
def test_image_encode_bit_exact_via_dav1d(content, qindex):
    """Real coefficients (AC chains, golomb tails, sign runs, entropy-
    context propagation) must reconstruct through libdav1d EXACTLY as
    the encoder's oracle-tracked recon predicts."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    y = _contents(64, 64)[content]
    u = _contents(32, 32, seed=5)[content]
    v = _contents(32, 32, seed=7)[content]
    stream, ry, ru, rv = encode_frame(y, u, v, qindex=qindex)
    dec = avif_native._decode_obu(stream, 64, 64)
    assert dec is not None, "dav1d rejected the stream"
    dy, du, dv = (np.asarray(p) for p in dec[:3])
    assert (dy == ry).all() and (du == ru).all() and (dv == rv).all()
    # quality sanity: recon must beat a flat-DC approximation at low q
    if qindex <= 80 and content != "noise":
        mse = ((dy.astype(float) - y) ** 2).mean()
        assert 10 * np.log10(255 ** 2 / mse) > 34.0


@needs_dav1d
def test_image_encode_multi_superblock_contexts():
    """Multi-SB frames: per-tile entropy/prediction isolation must hold
    (each 64x64 tile decodes independently, recon bit-exact)."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    c = _contents(128, 192)
    y = c["waves"]
    u = _contents(64, 96, seed=5)["gradient"]
    v = np.full((64, 96), 110, np.uint8)
    stream, ry, ru, rv = encode_frame(y, u, v, qindex=60)
    dec = avif_native._decode_obu(stream, 192, 128)
    assert dec is not None
    dy, du, dv = (np.asarray(p) for p in dec[:3])
    assert (dy == ry).all() and (du == ru).all() and (dv == rv).all()


def test_image_encode_rejects_bad_geometry():
    from imagekit_tpu.codecs.av1_image import encode_frame

    # fixed-tree path stays multiple-of-64 only
    y = np.zeros((60, 64), np.uint8)
    u = v = np.zeros((30, 32), np.uint8)
    with pytest.raises(ValueError):
        encode_frame(y, u, v, rd=False)
    # mismatched chroma geometry
    with pytest.raises(ValueError):
        encode_frame(np.zeros((64, 64), np.uint8), u, np.zeros(
            (31, 32), np.uint8))
    # > 4096 needs multi-level tile_info
    with pytest.raises(ValueError):
        encode_frame(np.zeros((8, 4104), np.uint8),
                     np.zeros((4, 2052), np.uint8),
                     np.zeros((4, 2052), np.uint8))


@needs_dav1d
@pytest.mark.parametrize("dims", [
    (150, 100), (65, 65), (20, 12), (5, 3), (1, 1), (63, 63),
])
def test_image_encode_arbitrary_dims_bit_exact(dims):
    """Edge superblocks (forced-split syntax, 8-px grid padding) must
    reconstruct through dav1d bit-exactly at the VISIBLE dims — round 5
    closed ROADMAP 1b, so arbitrary dims are now pinned."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    w, h = dims
    rng = np.random.default_rng(w * 1000 + h)
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 3 + yy * 2) % 256
         + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    u = np.full((ch, cw), 120, np.uint8)
    v = np.full((ch, cw), 135, np.uint8)
    stream, ry, ru, rv = encode_frame(y, u, v, qindex=60)
    dec = avif_native._decode_obu(stream, w, h)
    assert dec is not None, "dav1d rejected the stream"
    dy, du, dv = (np.asarray(p) for p in dec[:3])
    assert dy.shape == (h, w)
    assert (dy == ry).all() and (du == ru).all() and (dv == rv).all()


@needs_dav1d
def test_itx_recon_matches_dav1d_oracle_in_full_tiles():
    """encode_superblock's in-process av1_itx reconstruction must equal
    the dav1d decode-oracle reconstruction of the same tile bytes."""
    from imagekit_tpu.codecs.av1_image import (
        _OracleRecon, encode_superblock,
    )

    rng = np.random.default_rng(17)
    y = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    for q in (20, 120, 220):
        t1, y1, u1, v1 = encode_superblock(y, u, v, q)
        t2, y2, u2, v2 = encode_superblock(y, u, v, q,
                                           oracle=_OracleRecon(q))
        assert t1 == t2  # identical recon -> identical predictions/bits
        assert (y1 == y2).all() and (u1 == u2).all() and (v1 == v2).all()


# ---------------------------------------------------------------------------
# First-party AVIF wiring (container + production funnel)


@needs_dav1d
def test_firstparty_avif_alpha_odd_dims_roundtrip():
    """encode_avif with alpha + non-multiple-of-64 dims: container
    carries a 4:2:0 alpha aux item (rav1e-family layout) and the native
    parser/decoder round-trips at display dims with near-lossless
    alpha."""
    from imagekit_tpu.codecs.av1_image import encode_avif

    rng = np.random.default_rng(3)
    h, w = 100, 150
    y = (np.linspace(40, 200, w)[None, :]
         + rng.normal(0, 6, (h, w))).clip(16, 235).astype(np.uint8)
    cb = np.full(((h + 1) // 2, (w + 1) // 2), 110, np.uint8)
    cr = np.full(((h + 1) // 2, (w + 1) // 2), 140, np.uint8)
    alpha = np.zeros((h, w), np.uint8)
    alpha[20:80, 30:120] = 255
    alpha[50:, :] = 128
    data = encode_avif(y, cb, cr, qindex=60, alpha=alpha)
    info = avif_native.parse_container(data)
    assert info.has_alpha and info.alpha_obu
    rgb = avif_native.decode_rgb(data)
    assert rgb is not None and rgb.shape == (h, w, 4)
    assert int(np.abs(rgb[..., 3].astype(int)
                      - alpha.astype(int)).max()) <= 4


@needs_dav1d
def test_encode_yuv420_studio_firstparty_env(monkeypatch):
    """IMAGEKIT_AVIF_FIRSTPARTY routes the production YUV funnel through
    the in-process encoder; output decodes through the native parser."""
    from imagekit_tpu.codecs import avif_encode

    monkeypatch.setenv("IMAGEKIT_AVIF_FIRSTPARTY", "1")
    h, w = 64, 96
    y = np.full((h, w), 90, np.uint8)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 136, np.uint8)
    data = avif_encode.encode_yuv420_studio(y, cb, cr, 70)
    info = avif_native.parse_container(data)
    assert not info.has_alpha
    rgb = avif_native.decode_rgb(data)   # clap-cropped to display dims
    assert rgb is not None and rgb.shape == (h, w, 3)


@needs_dav1d
def test_encode_yuv420_studio_no_libavif_falls_firstparty(monkeypatch):
    """With no libavif at all the YUV funnel serves first-party AVIF
    instead of raising (AVIF output never depends on a system AV1
    encoder)."""
    from imagekit_tpu.codecs import avif_encode

    monkeypatch.delenv("IMAGEKIT_AVIF_FIRSTPARTY", raising=False)
    monkeypatch.setattr(avif_encode, "_load", lambda: None)
    h, w = 64, 64
    y = np.full((h, w), 90, np.uint8)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 136, np.uint8)
    data = avif_encode.encode_yuv420_studio(y, cb, cr, 70)
    assert avif_native.parse_container(data).width == w


@needs_dav1d
def test_pil_backend_last_resort_firstparty(monkeypatch):
    """pil_backend AVIF encode: when both the libavif ABI and the PIL
    plugin are gone, the first-party encoder still serves."""
    from imagekit_tpu.codecs import ImageFormat, avif_encode, pil_backend

    monkeypatch.setattr(avif_encode, "available", lambda: False)

    class _NoAvif:
        def __init__(self, *a, **k):
            raise OSError("no AVIF plugin")

    monkeypatch.setattr(pil_backend.Image, "fromarray",
                        _NoAvif, raising=True)
    img = np.full((50, 70, 3), 120, np.uint8)
    data = pil_backend.encode(img, ImageFormat.avif, 60)
    rgb = avif_native.decode_rgb(data)
    assert rgb is not None and rgb.shape[:2] == (50, 70)


def test_quantizer_to_qindex_map():
    from imagekit_tpu.codecs.avif_encode import (
        quality_to_quantizer, quantizer_to_qindex,
    )

    assert quantizer_to_qindex(0) == 1      # no lossless mode
    assert quantizer_to_qindex(63) == 252
    assert quantizer_to_qindex(quality_to_quantizer(60)) == 100


@needs_dav1d
@pytest.mark.parametrize("content", ["gradient", "waves"])
def test_rd_encode_bit_exact_via_dav1d(content):
    """The RD-adaptive tree (partition 32/16/8 + DC/V/H/PAETH modes +
    coded-vs-skip) must stay dav1d-bit-exact — every new syntax element
    (angle_delta, kf_y mode rows, sub-32 tx types) rides through the
    conformance gate."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    c = _contents(128, 192)
    y = c[content]
    u = _contents(64, 96, seed=5)["gradient"]
    v = np.full((64, 96), 110, np.uint8)
    for q in (40, 120):
        stream, ry, ru, rv = encode_frame(y, u, v, qindex=q, rd=True)
        dec = avif_native._decode_obu(stream, 192, 128)
        assert dec is not None
        dy, du, dv = (np.asarray(p) for p in dec[:3])
        assert (dy == ry).all() and (du == ru).all() and (dv == rv).all()


@needs_dav1d
def test_rd_directional_modes_win_on_stripes():
    """V_PRED must be chosen (and shrink the stream) on vertical
    stripes — the content class DC-only provably cannot predict."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    xx = np.tile(np.arange(192)[None, :], (128, 1))
    vstripe = np.where((xx // 4) % 2 == 0, 30, 220).astype(np.uint8)
    u = np.full((64, 96), 128, np.uint8)
    fixed, *_ = encode_frame(vstripe, u, u, qindex=60, rd=False)
    rd, ry, _, _ = encode_frame(vstripe, u, u, qindex=60, rd=True)
    assert len(rd) < 0.7 * len(fixed)
    dec = avif_native._decode_obu(rd, 192, 128)
    assert dec is not None and (np.asarray(dec[0]) == ry).all()


def test_native_engine_byte_equals_python(monkeypatch):
    """The C entropy engine (native/av1_enc.cpp) must produce the SAME
    BYTES as the pure-Python MsacEncoder for full RD frames — the
    contract that lets the dav1d conformance gates certify both."""
    from imagekit_tpu.codecs.native import av1_abi

    if not av1_abi.available():
        pytest.skip("native AV1 engine unavailable")
    from imagekit_tpu.codecs.av1_image import encode_frame

    y = _contents(128, 64)["waves"]
    u = _contents(64, 32, seed=5)["gradient"]
    v = np.full((64, 32), 110, np.uint8)
    nat, ry1, ru1, rv1 = encode_frame(y, u, v, qindex=60, rd=True)

    monkeypatch.setenv("IMAGEKIT_AV1_NATIVE", "0")
    av1_abi._state.update({"attempted": False, "lib": None})
    try:
        py, ry2, ru2, rv2 = encode_frame(y, u, v, qindex=60, rd=True)
    finally:
        monkeypatch.delenv("IMAGEKIT_AV1_NATIVE")
        av1_abi._state.update({"attempted": False, "lib": None})
    assert nat == py
    assert (ry1 == ry2).all() and (ru1 == ru2).all() and (rv1 == rv2).all()


@needs_dav1d
def test_idtx_wins_on_sparse_screen_content():
    """IDTX (identity transform, TX_SET_INTRA_2 symbol 0) must be
    chosen — and dominate both size and PSNR — on sparse-residual
    screen content (flat background + thin glyph strokes), staying
    dav1d-bit-exact.  A/B vs DCT-only measured 2.0-2.3x smaller at
    +6.6..+9.7 dB on this corpus."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    h, w = 128, 192
    scr = np.full((h, w), 240, np.uint8)
    rng = np.random.default_rng(3)
    for _ in range(60):
        r, c = rng.integers(0, h - 8), rng.integers(0, w - 8)
        scr[r:r + 6, c] = 16
        scr[r, c:c + 5] = 16
    u = np.full((h // 2, w // 2), 120, np.uint8)
    v = np.full((h // 2, w // 2), 135, np.uint8)
    obu, ry, ru, rv = encode_frame(scr, u, v, qindex=30)
    dec = avif_native._decode_obu(obu, w, h)
    assert dec is not None and (np.asarray(dec[0]) == ry).all()
    mse = ((ry.astype(np.int64) - scr.astype(np.int64)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 55.0   # DCT-only gets ~51.5
    assert len(obu) < 3500                        # DCT-only needs ~5800


@needs_dav1d
def test_cdf_adaptation_smaller_and_bit_exact():
    """disable_cdf_update=0: per-tile CDF adaptation must shrink dense
    content at identical reconstruction quality and stay dav1d-bit-exact
    (the spec 8.3.2 update: floor shifts on BOTH sides, rate
    3+(c>15)+(c>31)+(1 if n<=3 else 2) — a ceil on the decay side or a
    +1 speed at n=3 desyncs within a handful of repeated symbols)."""
    from imagekit_tpu.codecs.av1_image import encode_frame

    y = _contents(128, 64)["waves"]
    u = _contents(64, 32, seed=5)["gradient"]
    v = np.full((64, 32), 110, np.uint8)
    static, rs, *_ = encode_frame(y, u, v, qindex=60, adapt=False)
    adapt, ra, *_ = encode_frame(y, u, v, qindex=60, adapt=True)
    assert len(adapt) < len(static)          # rate win on dense content
    dec = avif_native._decode_obu(adapt, 64, 128)
    assert dec is not None and (np.asarray(dec[0]) == ra).all()


@needs_dav1d
def test_smooth_modes_bit_exact():
    """SMOOTH/SMOOTH_V/SMOOTH_H (spec 7.11.2.6, sm_weights carved from
    libaom via tools/extract_sm_weights.py) must ride the conformance
    gate — encode gradient content where the smooth family wins and
    require dav1d-bit-exact recon; also pin the weights' structure."""
    from imagekit_tpu.codecs.av1_entropy import tables
    from imagekit_tpu.codecs.av1_image import encode_frame

    w = tables()["sm_weights"]
    assert w.shape == (124,)
    assert [int(w[o]) for o in (0, 4, 12, 28, 60)] == [255] * 5
    assert int(w[123]) == 4                      # size-64 tail
    yy, xx = np.mgrid[0:128, 0:192]
    grad = ((xx + yy) * 1.1 % 256).astype(np.uint8)
    u = np.full((64, 96), 120, np.uint8)
    v = np.full((64, 96), 135, np.uint8)
    stream, ry, ru, rv = encode_frame(grad, u, v, qindex=60)
    dec = avif_native._decode_obu(stream, 192, 128)
    assert dec is not None
    assert (np.asarray(dec[0]) == ry).all()
    mse = ((ry.astype(np.int64) - grad.astype(np.int64)) ** 2).mean()
    assert 10 * np.log10(255 ** 2 / mse) > 45.0


@needs_dav1d
def test_pure_python_path_conformant(monkeypatch):
    """With NO native library at all (no C entropy engine, no C
    leaf-eval — e.g. a box without a compiler), the pure-Python encoder
    must still produce dav1d-bit-exact streams."""
    import imagekit_tpu.codecs.av1_image as A
    from imagekit_tpu.codecs.native import av1_abi

    monkeypatch.setenv("IMAGEKIT_AV1_NATIVE", "0")
    av1_abi._state.update({"attempted": False, "lib": None})
    monkeypatch.setattr(A, "_LEAF_LIB", [None])
    try:
        y = _contents(64, 128)["waves"]
        u = _contents(32, 64, seed=5)["gradient"]
        v = np.full((32, 64), 110, np.uint8)
        stream, ry, ru, rv = A.encode_frame(y, u, v, qindex=60)
        dec = avif_native._decode_obu(stream, 128, 64)
        assert dec is not None
        assert (np.asarray(dec[0]) == ry).all()
    finally:
        av1_abi._state.update({"attempted": False, "lib": None})
