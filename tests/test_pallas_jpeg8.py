"""Pallas variant of the flagship folded split-int8 JPEG head (round 5,
VERDICT r4 next #5 second front): interpret-mode equivalence against
the einsum kernel, escapes included. Exact on CPU (HIGH resolves to
f32); the TPU acceptance contract is the standard ±1 bf16x3 band."""

import numpy as np
import pytest

from imagekit_tpu.ops import pallas_jpeg8
from imagekit_tpu.ops.dct import (
    LOWFREQ_ESC_C,
    LOWFREQ_ESC_Y,
    decode_resize_yuv_lowfreq_i8_batch,
    fold_lowfreq_weights,
    lowfreq_ac_width,
    pad128,
)


def _mk(k, B=3, U=4, by=16, bx=32, cy=8, cx=16, obh=64, obw=128, seed=0):
    rng = np.random.default_rng(seed)
    y_dc = rng.integers(-800, 800, (B, by, pad128(bx))).astype(np.int16)
    y_ac = rng.integers(
        -100, 100, (B, by, lowfreq_ac_width(bx, k))
    ).astype(np.int8)
    c_dc = rng.integers(-800, 800, (B, cy, pad128(cx))).astype(np.int16)
    cb_ac = rng.integers(
        -100, 100, (B, cy, lowfreq_ac_width(cx, k))
    ).astype(np.int8)
    cr_ac = rng.integers(
        -100, 100, (B, cy, lowfreq_ac_width(cx, k))
    ).astype(np.int8)
    ey_idx = np.zeros((LOWFREQ_ESC_Y, 3), np.int32)
    ey_val = np.zeros(LOWFREQ_ESC_Y, np.int32)
    ey_idx[:4] = [[0, 2, 3], [1, 5, bx + 7], [2, 0, 0], [0, by - 1, 2 * bx]]
    ey_val[:4] = [300, -250, 128, -512]
    eb_idx = np.zeros((LOWFREQ_ESC_C, 3), np.int32)
    eb_val = np.zeros(LOWFREQ_ESC_C, np.int32)
    eb_idx[:2] = [[0, 1, 2], [2, cy - 1, cx + 1]]
    eb_val[:2] = [212, -300]
    er_idx = np.zeros((LOWFREQ_ESC_C, 3), np.int32)
    er_val = np.zeros(LOWFREQ_ESC_C, np.int32)
    qt = rng.random((B, 128)).astype(np.float32) * 30 + 1
    wv_y = fold_lowfreq_weights(
        rng.random((U, obh, by * k)).astype(np.float32), k)
    wh_y = fold_lowfreq_weights(
        rng.random((U, obw, bx * k)).astype(np.float32), k)
    wv_c = fold_lowfreq_weights(
        rng.random((U, obh // 2, cy * k)).astype(np.float32), k)
    wh_c = fold_lowfreq_weights(
        rng.random((U, obw // 2, cx * k)).astype(np.float32), k)
    vidx = (np.arange(B) % U).astype(np.int32)
    return (
        (y_dc, c_dc, c_dc), (y_ac, cb_ac, cr_ac),
        ((ey_idx, ey_val), (eb_idx, eb_val), (er_idx, er_val)),
        qt, (wv_y, wh_y, wv_c, wh_c), vidx,
        (by, bx, cy, cx), (obh, obw), k,
    )


@pytest.mark.parametrize("k", [2, 4])
def test_pallas_jpeg8_matches_einsum(monkeypatch, k):
    args = _mk(k, seed=k)
    monkeypatch.setenv("IMAGEKIT_PALLAS_JPEG8", "")
    ref = decode_resize_yuv_lowfreq_i8_batch(*args)
    monkeypatch.setenv("IMAGEKIT_PALLAS_JPEG8", "interpret")
    assert pallas_jpeg8.enabled()
    got = decode_resize_yuv_lowfreq_i8_batch(*args)
    for name, a, b in zip(("y", "cb", "cr"), ref, got):
        assert a.shape == b.shape
        d = int(np.abs(a.astype(int) - b.astype(int)).max())
        assert d <= 1, (name, d)  # exact on CPU; ±1 allowed on TPU


def test_pallas_jpeg8_escape_residuals_exact(monkeypatch):
    """The int16 widen+scatter reconstructs the exact same levels as the
    einsum path's f32 widen+scatter: zero the escapes and the outputs
    must CHANGE (proving the residuals are live), with them the two
    paths agree."""
    args = _mk(2, seed=9)
    monkeypatch.setenv("IMAGEKIT_PALLAS_JPEG8", "interpret")
    with_esc = decode_resize_yuv_lowfreq_i8_batch(*args)
    no_esc = list(args)
    z = args[2]
    no_esc[2] = tuple((np.zeros_like(i), np.zeros_like(v)) for i, v in z)
    without = decode_resize_yuv_lowfreq_i8_batch(*no_esc)
    assert any(
        (a != b).any() for a, b in zip(with_esc, without)
    )


def test_pallas_jpeg8_gating(monkeypatch):
    monkeypatch.delenv("IMAGEKIT_PALLAS_JPEG8", raising=False)
    assert not pallas_jpeg8.enabled()
    monkeypatch.setenv("IMAGEKIT_PALLAS_JPEG8", "interpret")
    assert pallas_jpeg8.enabled()


def test_pallas_jxc_matches_einsum(monkeypatch):
    """Fourth Pallas front: the jxc transcode's k<8 branch — Pallas
    folded front with the u8c epilogue (int8), einsum fDCT tail
    unchanged. Output int16 LEVELS match exactly on CPU (escapes
    included)."""
    from imagekit_tpu.ops.dct import transcode_i8_batch

    (dc, ac, esc, qt, w, vidx, bd, os_, k) = _mk(2, seed=5)
    rng = np.random.default_rng(6)
    qt_out = rng.random((3, 128)).astype(np.float32) * 20 + 1
    args = (dc, ac, esc, qt, qt_out, w, vidx, bd, os_, k)
    monkeypatch.setenv("IMAGEKIT_PALLAS_JXC", "")
    ref = transcode_i8_batch(*args)
    monkeypatch.setenv("IMAGEKIT_PALLAS_JXC", "interpret")
    assert pallas_jpeg8.jxc_enabled()
    got = transcode_i8_batch(*args)
    for name, a, b in zip(("y", "cb", "cr"), ref, got):
        assert a.shape == b.shape
        assert (a == b).all(), name  # int16 levels: exact on CPU
