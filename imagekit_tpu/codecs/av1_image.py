"""First-party AV1 intra image encoder: prediction + transform layer.

Sits on top of the Rosetta-certified entropy/syntax layer
(av1_entropy.py + av1_intra.py) and turns real 4:2:0 pixel planes into
a spec-conformant AV1 keyframe OBU stream — the capability the
reference obtains by compiling rav1e into its binary (reference
src/transform.rs:138-146); here it is a first-party encoder whose
every symbol is certified against libaom/dav1d behavior.

Design (final round-5 state):
  - geometry: ANY frame dims 1..4096.  Planes edge-replicate onto the
    spec 8-px mi grid; edge superblocks use the forced-split partition
    syntax; the bitstream signals the true size (no container
    CleanAperture).  RD-adaptive partition tree with 32/16/8 leaves.
  - prediction: DC/V/H/PAETH/SMOOTH/SMOOTH_V/SMOOTH_H luma modes
    (prediction-SSE top-2 shortlist per leaf), DC chroma; tiles are
    one superblock, so prediction never crosses an SB.
  - transforms: DCT always; IDTX joins the search for luma tx <= 16
    on sparse residuals (TX_SET_INTRA_2 symbol 0).
  - RD: exact-MSAC-bit trial costing via TileEncoder snapshot/restore
    (coded vs forced-skip vs eob-trimmed candidates; early-abandon
    splits; lambda = RD_LAMBDA_C * qstep^2).  The hot distortion
    pipeline (forward tx + quantize + recon + SSE) runs in C when the
    native library is present (_eval_candidate), with a numpy fallback.
  - entropy: per-tile CDF adaptation by default (disable_cdf_update=0,
    IMAGEKIT_AV1_ADAPT=0 reverts).
  - reconstruction: EXACT, via the in-process integer inverse
    transforms (av1_itx.py + the C port), certified bit-exact against
    libdav1d over every basis vector + dense random coefficient sets
    (tools/av1_itx_probe.py) and 2700+ randomized full streams
    (tools/av1_soak.py), so the encoder predicts from byte-true
    decoder output.  A dav1d decode oracle remains for cross-checks.
  - quantization: orthonormal float DCT-II (or identity) + dead-zone
    round(c / step); step = qlookup/8 in the orthonormal domain for
    every size (AV1's integer transforms are uniform-gain).
    Reconstruction exactness never depends on the scale — recon comes
    from the certified inverse.
"""

from __future__ import annotations

import numpy as np

from . import avif_native
from .av1_entropy import OBU_FRAME, OBU_SEQUENCE_HEADER, obu, tables
from .av1_intra import (
    PARTITION_NONE, PARTITION_SPLIT, TileEncoder, frame_header_bits,
    sequence_header,
)
from .av1_itx import recon_block

import os as _os

# CDF adaptation (disable_cdf_update=0): per-tile adaptive CDFs — the
# rate win of matching the symbol statistics, paid for with per-trial
# CDF snapshots in the RD search.  IMAGEKIT_AV1_ADAPT=0 forces the
# static-CDF regime.
ADAPT_DEFAULT = _os.environ.get("IMAGEKIT_AV1_ADAPT", "1") not in (
    "0", "off", "false")


def q_ctx(base_q_idx: int) -> int:
    """Coefficient-CDF quantizer context bucket (spec get_q_ctx)."""
    if base_q_idx <= 20:
        return 0
    if base_q_idx <= 60:
        return 1
    if base_q_idx <= 120:
        return 2
    return 3


# ---------------------------------------------------------------------------
# Transforms + quantization


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (rows = basis functions)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * k * (2 * x + 1) / (2 * n)) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


_DCT = {n: _dct_matrix(n) for n in (4, 8, 16, 32)}


def fdct2(res: np.ndarray) -> np.ndarray:
    """2-D orthonormal DCT-II of a square residual block."""
    m = _DCT[res.shape[0]]
    return m @ res.astype(np.float64) @ m.T


# Transform-domain quantizer step per unit qlookup value, measured
# against libdav1d reconstructions (tools/av1_calibrate.py): a level L
# at quantizer q reconstructs an orthonormal-domain amplitude of
# L * q * _STEP_SCALE[tx_log2].  (AV1's integer transforms are
# uniform-gain by design, so one scale per size covers all positions.)
_STEP_SCALE = {5: 1.0 / 8.0, 4: 1.0 / 8.0, 3: 1.0 / 8.0, 2: 1.0 / 8.0}


def quantize(coefs: np.ndarray, dc_q: int, ac_q: int,
             tx_log2: int, bias: float = 0.5) -> np.ndarray:
    """Round transform coefficients to levels; returns an int32 (n, n)
    level array (raster layout — the txb coder's native input)."""
    scale = _STEP_SCALE[tx_log2]
    n = coefs.shape[0]
    steps = np.full((n, n), ac_q * scale)
    steps[0, 0] = dc_q * scale
    lv = np.sign(coefs) * np.floor(np.abs(coefs) / steps + bias)
    return np.clip(lv, -4096, 4096).astype(np.int32)


def dc_pred(recon: np.ndarray, r0: int, c0: int, bh: int, bw: int,
            have_above: bool, have_left: bool) -> int:
    """DC_PRED (spec 7.11.2.5) from reconstructed neighbors."""
    if have_above and have_left:
        s = int(recon[r0 - 1, c0:c0 + bw].sum()) \
            + int(recon[r0:r0 + bh, c0 - 1].sum())
        return (s + (bw + bh) // 2) // (bw + bh)
    if have_above:
        return (int(recon[r0 - 1, c0:c0 + bw].sum()) + bw // 2) // bw
    if have_left:
        return (int(recon[r0:r0 + bh, c0 - 1].sum()) + bh // 2) // bh
    return 128


# Intra mode indices (spec): the subset this encoder searches for luma.
MODE_DC, MODE_V, MODE_H, MODE_PAETH = 0, 1, 2, 12
MODE_SMOOTH, MODE_SMOOTH_V, MODE_SMOOTH_H = 9, 10, 11


def _sm_weights(b: int) -> np.ndarray:
    """Per-size SMOOTH weights (spec 7.11.2.6), carved from libaom's
    .rodata (tools/extract_sm_weights.py) and certified behaviorally by
    the dav1d conformance gate."""
    w = tables()["sm_weights"]
    off = {4: 0, 8: 4, 16: 12, 32: 28, 64: 60}[b]
    return w[off:off + b].astype(np.int64)


def intra_pred(mode: int, recon: np.ndarray, r0: int, c0: int, b: int,
               have_above: bool, have_left: bool) -> np.ndarray:
    """Predict a b x b block (spec 7.11.2) from reconstructed
    neighbors.  The encoder only offers a mode when its references
    exist (V needs above, H needs left, PAETH/SMOOTH* need both), so
    the unavailable-edge substitutions never arise; the sequence header
    disables the intra edge filter, so directional prediction is the
    unfiltered copy."""
    if mode == MODE_DC:
        return np.full((b, b), dc_pred(recon, r0, c0, b, b,
                                       have_above, have_left), np.uint8)
    if mode == MODE_V:
        return np.broadcast_to(recon[r0 - 1, c0:c0 + b],
                               (b, b)).astype(np.uint8)
    if mode == MODE_H:
        return np.broadcast_to(recon[r0:r0 + b, c0 - 1][:, None],
                               (b, b)).astype(np.uint8)
    if mode == MODE_PAETH:
        top = recon[r0 - 1, c0:c0 + b].astype(np.int32)[None, :]
        left = recon[r0:r0 + b, c0 - 1].astype(np.int32)[:, None]
        tl = int(recon[r0 - 1, c0 - 1])
        base = top + left - tl
        p_left = np.abs(base - left)
        p_top = np.abs(base - top)
        p_tl = np.abs(base - tl)
        out = np.where(
            (p_left <= p_top) & (p_left <= p_tl),
            np.broadcast_to(left, (b, b)),
            np.where(p_top <= p_tl, np.broadcast_to(top, (b, b)), tl))
        return out.astype(np.uint8)
    if mode in (MODE_SMOOTH, MODE_SMOOTH_V, MODE_SMOOTH_H):
        above = recon[r0 - 1, c0:c0 + b].astype(np.int64)[None, :]
        left = recon[r0:r0 + b, c0 - 1].astype(np.int64)[:, None]
        below = int(recon[r0 + b - 1, c0 - 1])   # LeftCol[b-1]
        right = int(recon[r0 - 1, c0 + b - 1])   # AboveRow[b-1]
        w = _sm_weights(b)
        wv = w[:, None]
        wh = w[None, :]
        if mode == MODE_SMOOTH:
            s = (wv * above + (256 - wv) * below
                 + wh * left + (256 - wh) * right)
            return ((s + 256) >> 9).astype(np.uint8)
        if mode == MODE_SMOOTH_V:
            s = wv * above + (256 - wv) * below
        else:
            s = wh * left + (256 - wh) * right
        return ((s + 128) >> 8).astype(np.uint8)
    raise ValueError(f"unsupported intra mode {mode}")


# ---------------------------------------------------------------------------
# Superblock (= tile) encoder


def _tile_to_frame(tile: bytes, qindex: int,
                   adapt: bool = False) -> bytes:
    """Wrap one 64x64 tile as a complete single-SB frame stream."""
    seq = obu(OBU_SEQUENCE_HEADER, sequence_header(64, 64))
    hdr = frame_header_bits(qindex, 64, 64, adapt=adapt)
    hdr.byte_align()
    return seq + obu(OBU_FRAME, hdr.bytes() + tile)


class _OracleRecon:
    """Byte-true reconstruction of a partially coded tile: finalize a
    snapshot with skip blocks and decode through libdav1d."""

    def __init__(self, qindex: int):
        self.qindex = qindex

    def __call__(self, te: TileEncoder, coded: int, blocks) -> tuple:
        snap = te.snapshot()
        for j in range(coded, 4):
            r, c = blocks[j]
            te._encode_partition_symbol(te._part_ctx(r, c, 32),
                                        PARTITION_NONE, 32)
            te.encode_block(r, c, 32)
            te._update_part_ctx(r, c, 32, 32)
        tile = te.msac.done()
        te.restore(snap)
        dec = avif_native._decode_obu(_tile_to_frame(tile, self.qindex),
                                      64, 64)
        if dec is None:
            raise RuntimeError("oracle decode failed (entropy desync?)")
        y, u, v = dec[0], dec[1], dec[2]
        return (np.asarray(y, np.uint8), np.asarray(u, np.uint8),
                np.asarray(v, np.uint8))


def encode_superblock(sb_y: np.ndarray, sb_u: np.ndarray, sb_v: np.ndarray,
                      qindex: int, oracle: _OracleRecon | None = None
                      ) -> tuple:
    """Encode one 64x64 superblock as its own tile.

    Reconstruction uses the in-process integer inverse transform
    (av1_itx, probe-certified bit-exact against libdav1d); pass an
    `oracle` to reconstruct through an actual dav1d decode instead
    (slower; used by tests to cross-check av1_itx inside full tiles).

    Returns (tile_bytes, recon_y 64x64, recon_u 32x32, recon_v 32x32).
    """
    T = tables()
    dcq = int(T["dc_qlookup"][qindex])
    acq = int(T["ac_qlookup"][qindex])
    qc = q_ctx(qindex)
    te = TileEncoder(64, 64, qctx=qc)
    te._encode_partition_symbol(te._part_ctx(0, 0, 64), PARTITION_SPLIT, 64)
    blocks = [(0, 0), (0, 8), (8, 0), (8, 8)]  # mi coords (4px units)
    ry = np.zeros((64, 64), np.uint8)
    ru = np.zeros((32, 32), np.uint8)
    rv = np.zeros((32, 32), np.uint8)
    for i, (mr, mc) in enumerate(blocks):
        pr, pc = mr * 4, mc * 4          # luma pixel coords
        cr, cc = pr // 2, pc // 2        # chroma pixel coords
        ha, hl = pr > 0, pc > 0
        preds = []
        quants = []
        for plane, (src, rec, r0, c0, bs) in enumerate((
                (sb_y, ry, pr, pc, 32),
                (sb_u, ru, cr, cc, 16),
                (sb_v, rv, cr, cc, 16))):
            p = dc_pred(rec, r0, c0, bs, bs, ha, hl)
            res = src[r0:r0 + bs, c0:c0 + bs].astype(np.int32) - p
            q = quantize(fdct2(res), dcq, acq, bs.bit_length() - 1)
            preds.append(p)
            quants.append(q)
        te._encode_partition_symbol(te._part_ctx(mr, mc, 32),
                                    PARTITION_NONE, 32)
        any_q = any(bool(q.any()) for q in quants)
        if any_q:
            te.encode_block(mr, mc, 32, txbs=quants)
        else:
            te.encode_block(mr, mc, 32)   # skip: recon == flat prediction
        te._update_part_ctx(mr, mc, 32, 32)
        if not any_q:
            ry[pr:pr + 32, pc:pc + 32] = preds[0]
            ru[cr:cr + 16, cc:cc + 16] = preds[1]
            rv[cr:cr + 16, cc:cc + 16] = preds[2]
        elif oracle is not None:
            dy, du, dv = oracle(te, i + 1, blocks)
            ry[pr:pr + 32, pc:pc + 32] = dy[pr:pr + 32, pc:pc + 32]
            ru[cr:cr + 16, cc:cc + 16] = du[cr:cr + 16, cc:cc + 16]
            rv[cr:cr + 16, cc:cc + 16] = dv[cr:cr + 16, cc:cc + 16]
        else:
            for plane, (rec, r0, c0, bs) in enumerate((
                    (ry, pr, pc, 32), (ru, cr, cc, 16), (rv, cr, cc, 16))):
                pred = np.full((bs, bs), preds[plane], np.uint8)
                rec[r0:r0 + bs, c0:c0 + bs] = recon_block(
                    pred, quants[plane], dcq, acq)
    return te.msac.done(), ry, ru, rv


# ---------------------------------------------------------------------------
# RD-adaptive partition tree (32 -> 16 -> 8 leaves)

# lambda = RD_LAMBDA_C * qstep^2 in the orthonormal transform domain
# (qstep = acq/8, _STEP_SCALE); calibrated by RD dominance against the
# encoder's own qindex ladder WITH the eob-trim trials active: 0.30
# over-prunes (the trim trials exposed it — accepted trades far below
# the ladder's dB-per-byte slope), 0.08 under-prunes; 0.15 dominates
# both at matched PSNR on the detail/waves corpus.
RD_LAMBDA_C = 0.15

# a SPLIT adds ~4 partition symbols + 3 skip/mode sets over NONE; if
# NONE's distortion is already below lam * this, SPLIT is pruned.  With
# static CDFs the 16-bit floor makes this an (almost) safe prune; under
# CDF adaptation heavily-adapted symbols can undercut it, so it is a
# HEURISTIC there — the cost is only RD optimality on near-flat nodes,
# never conformance.
_SPLIT_MIN_BITS = 16


def _sse(a: np.ndarray, b: np.ndarray) -> float:
    return float(((a.astype(np.int64) - b.astype(np.int64)) ** 2).sum())


_LEAF_LIB: list = []   # [lib-or-None], resolved lazily


def _leaf_lib():
    """Native leaf-eval functions (forward tx + quantize + certified
    integer recon + SSE in one call).  Independent of the entropy-engine
    toggle: ik_av1_leaf_eval/ik_av1_recon touch no CDF state, and the
    Python-vs-native byte-equality tests need both entropy engines to
    make IDENTICAL RD decisions — which requires a single forward-
    transform implementation."""
    if not _LEAF_LIB:
        try:
            import ctypes

            from .native import loader

            lib = loader.load()
            if lib is not None and hasattr(lib, "ik_av1_leaf_eval"):
                lib.ik_av1_recon.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p]
                lib.ik_av1_leaf_eval.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
                lib.ik_av1_leaf_eval.restype = ctypes.c_longlong
                _LEAF_LIB.append(lib)
            else:
                _LEAF_LIB.append(None)
        except Exception:
            _LEAF_LIB.append(None)
    return _LEAF_LIB[0]


def _eval_candidate(src: np.ndarray, pred: np.ndarray, dcq: int, acq: int,
                    tx: str) -> tuple:
    """(quant levels, recon, coded SSE, any-nonzero) for one transform
    candidate — the C pipeline when available, numpy otherwise."""
    lib = _leaf_lib()
    n = src.shape[0]
    if lib is not None:
        import ctypes

        src_c = np.ascontiguousarray(src)
        pred_c = np.ascontiguousarray(pred)
        q = np.empty((n, n), np.int32)
        rec = np.empty((n, n), np.uint8)
        nnz = ctypes.c_int()
        sse = lib.ik_av1_leaf_eval(
            src_c.ctypes.data, pred_c.ctypes.data, n, dcq, acq,
            1 if tx == "IDTX" else 0, q.ctypes.data, rec.ctypes.data,
            ctypes.byref(nnz))
        return q, rec, float(sse), bool(nnz.value)
    res = src.astype(np.int32) - pred.astype(np.int32)
    coefs = res.astype(np.float64) if tx == "IDTX" else fdct2(res)
    q = quantize(coefs, dcq, acq, n.bit_length() - 1)
    nz = bool(q.any())
    rec = recon_block(pred, q, dcq, acq, tx_type=tx) if nz \
        else pred.astype(np.uint8)
    return q, rec, _sse(src, rec), nz


def _recon_candidate(quant: np.ndarray, pred: np.ndarray, dcq: int,
                     acq: int, tx: str = "DCT") -> np.ndarray:
    lib = _leaf_lib()
    n = pred.shape[0]
    if lib is not None and quant.flags["C_CONTIGUOUS"]:
        pred_c = np.ascontiguousarray(pred)
        out = np.empty((n, n), np.uint8)
        lib.ik_av1_recon(quant.ctypes.data, pred_c.ctypes.data, n,
                         dcq, acq, 1 if tx == "IDTX" else 0,
                         out.ctypes.data)
        return out
    return recon_block(pred, quant, dcq, acq, tx_type=tx)


def _rd_block(te: TileEncoder, planes, recs, mi_r: int, mi_c: int,
              size: int, dcq: int, acq: int, lam: float) -> float:
    """Encode the RD-best partition tree for the block at (mi_r, mi_c)
    into `te`, writing its reconstruction into `recs`.  Returns the
    block's cost D + lam*R (R in exact MSAC bits via the encoder's
    renormalization counter; D = SSE over Y+U+V).  Candidates at each
    node: NONE-coded, NONE-forced-skip, SPLIT (recursive); leaves stop
    at 8 (4:2:0 chroma pairing keeps luma >= 8)."""
    entry = te.snapshot()
    nb0 = te.msac.nbits
    pr, pc = mi_r * 4, mi_c * 4
    cr, cc = pr // 2, pc // 2
    ha, hl = pr > 0, pc > 0
    cb = size // 2
    txl_y = size.bit_length() - 1
    # chroma: DC-pred only (shared by every luma mode candidate)
    c_preds, c_quants, c_rbs = [], [], []
    dc_skip = dc_coded = 0.0
    for plane, src_p, rec_p in ((1, planes[1], recs[1]),
                                (2, planes[2], recs[2])):
        p = dc_pred(rec_p, cr, cc, cb, cb, ha, hl)
        src = src_p[cr:cr + cb, cc:cc + cb]
        pa = np.full((cb, cb), p, np.uint8)
        qd, rb, sse_c, _nz = _eval_candidate(src, pa, dcq, acq, "DCT")
        dc_skip += _sse(src, pa)
        dc_coded += sse_c
        c_preds.append(pa)
        c_quants.append(qd)
        c_rbs.append(rb)
    c_nz = any(bool(q.any()) for q in c_quants)
    # luma: search the mode subset whose references exist
    modes = [MODE_DC]
    if ha:
        modes.append(MODE_V)
    if hl:
        modes.append(MODE_H)
    if ha and hl:
        modes += [MODE_PAETH, MODE_SMOOTH, MODE_SMOOTH_V, MODE_SMOOTH_H]
    src_y = planes[0][pr:pr + size, pc:pc + size]
    te._encode_partition_symbol(te._part_ctx(mi_r, mi_c, size),
                                PARTITION_NONE, size)
    part_state = te.snapshot()
    # rank modes by prediction SSE and keep the top 2 (entropy trials
    # and transform recon are the expensive part; prediction-domain
    # ranking picks the same winner in practice)
    ranked = []
    for mode in modes:
        pa = intra_pred(mode, recs[0], pr, pc, size, ha, hl)
        ranked.append((_sse(src_y, pa), mode, pa))
    ranked.sort(key=lambda t: t[0])
    scan = tables()["scan_%dx%d" % (size, size)]
    trials = []
    for dy_skip, mode, pa in ranked[:2]:
        res = src_y.astype(np.int32) - pa.astype(np.int32)
        qd, rb, sse_c, qd_nz = _eval_candidate(src_y, pa, dcq, acq, "DCT")
        if qd_nz or c_nz:
            trials.append((sse_c + dc_coded, mode,
                           (qd, c_quants[0], c_quants[1]),
                           [rb, c_rbs[0], c_rbs[1]], 1))
            # eob-trim candidate: trailing |level|==1 runs extend the
            # eob, which is the most expensive way to spend half-step
            # distortion — offer the truncated block and let the exact
            # bit-cost trial decide (RDOQ-lite)
            in_scan = qd.reshape(-1)[scan]
            nz = np.nonzero(in_scan)[0]
            big = np.nonzero(np.abs(in_scan) >= 2)[0]
            cut = int(big[-1]) + 1 if len(big) else 0
            if len(nz) and nz[-1] + 1 > cut:
                qd_t = qd.copy().reshape(-1)
                qd_t[scan[cut:]] = 0
                qd_t = np.ascontiguousarray(qd_t.reshape(qd.shape))
                if bool(qd_t.any()) or c_nz:
                    rb_t = (_recon_candidate(qd_t, pa, dcq, acq)
                            if qd_t.any() else pa)
                    trials.append((_sse(src_y, rb_t) + dc_coded, mode,
                                   (qd_t, c_quants[0], c_quants[1]),
                                   [rb_t, c_rbs[0], c_rbs[1]], 1))
        trials.append((dy_skip + dc_skip, mode, None,
                       [pa, c_preds[0], c_preds[1]], 1))
        if size <= 16 and (np.abs(res) <= 2).mean() >= 0.5:
            # IDTX (identity transform, TX_SET_INTRA_2 symbol 0): the
            # forward transform IS the residual — the per-pass identity
            # gains make the level step the same q/8 as the DCT path
            # (inverse certified vs dav1d in tools/av1_itx_probe.py).
            # The screen-content lever: sharp sparse residuals (mostly-
            # predicted blocks with a few hard edges) code without
            # ringing.  Gated on residual sparsity — dense residuals
            # always prefer the energy-compacting DCT, so the extra
            # quantize/recon would be pure trial overhead.  Only luma
            # tx < 32 carries a tx_type.
            qd_i, rb_i, sse_i, qi_nz = _eval_candidate(
                src_y, pa, dcq, acq, "IDTX")
            if qi_nz:
                trials.append((sse_i + dc_coded, mode,
                               (qd_i, c_quants[0], c_quants[1]),
                               [rb_i, c_rbs[0], c_rbs[1]], 0))
    # entropy-code trials best-distortion-first; cost >= dist, so once a
    # trial's dist exceeds the best full cost it cannot win (admissible
    # prune — bits are nonnegative)
    trials.sort(key=lambda t: t[0])
    none_cost = none_state = none_rec = none_dist = None
    for dist, mode, txbs, rec3, txsym in trials:
        if none_cost is not None and dist >= none_cost:
            break
        te.restore(part_state)
        te.encode_block(mi_r, mi_c, size, txbs=txbs, ymode=mode,
                        txtype_sym=txsym)
        cost = dist + lam * (te.msac.nbits - nb0)
        if none_cost is None or cost < none_cost:
            none_cost, none_dist = cost, dist
            none_state, none_rec = te.snapshot(), rec3
    if size > 8 and none_dist > lam * _SPLIT_MIN_BITS:
        te.restore(entry)
        te._encode_partition_symbol(te._part_ctx(mi_r, mi_c, size),
                                    PARTITION_SPLIT, size)
        rec_try = [r.copy() for r in recs]
        cost_split = lam * (te.msac.nbits - nb0)
        h4 = size >> 3                       # half the block in mi units
        for dr, dc2 in ((0, 0), (0, h4), (h4, 0), (h4, h4)):
            cost_split += _rd_block(te, planes, rec_try, mi_r + dr,
                                    mi_c + dc2, size >> 1, dcq, acq, lam)
            if cost_split >= none_cost:      # early abandon
                break
        if cost_split < none_cost:
            for dst, src2 in zip(recs, rec_try):
                dst[:] = src2
            return cost_split
    te.restore(none_state)
    te._update_part_ctx(mi_r, mi_c, size, size)
    for (plane, r0, c0, b), rb in zip(
            ((0, pr, pc, size), (1, cr, cc, cb), (2, cr, cc, cb)),
            none_rec):
        recs[plane][r0:r0 + b, c0:c0 + b] = rb
    return none_cost


def _rd_partition(te: TileEncoder, planes, recs, mi_r: int, mi_c: int,
                  size: int, dcq: int, acq: int, lam: float) -> float:
    """Mirror of TileEncoder.encode_partition with RD at full nodes:
    nodes fully inside the mi grid (<= 32) run the NONE/SPLIT mode
    search (_rd_block); partial nodes emit the spec's forced-split
    syntax (SPLIT symbol when both halves visible, split_or_horz/vert
    bool otherwise, nothing when both halves are out) and recurse —
    exactly the edge-geometry chain the gray validator certifies."""
    if mi_r >= te.mi_rows or mi_c >= te.mi_cols:
        return 0.0
    n4 = size >> 2
    half = n4 >> 1
    full = (mi_r + n4) <= te.mi_rows and (mi_c + n4) <= te.mi_cols
    if full and size <= 32:
        return _rd_block(te, planes, recs, mi_r, mi_c, size, dcq, acq, lam)
    has_rows = (mi_r + half) < te.mi_rows
    has_cols = (mi_c + half) < te.mi_cols
    ctx_row = te._part_ctx(mi_r, mi_c, size)
    if full or (has_rows and has_cols):
        te._encode_partition_symbol(ctx_row, PARTITION_SPLIT, size)
    elif has_cols:
        te.msac.encode_symbol(
            1, te._split_bool_icdf(ctx_row, size, horz=True), 2)
    elif has_rows:
        te.msac.encode_symbol(
            1, te._split_bool_icdf(ctx_row, size, horz=False), 2)
    cost = 0.0
    sub = size >> 1
    for dr, dc2 in ((0, 0), (0, half), (half, 0), (half, half)):
        cost += _rd_partition(te, planes, recs, mi_r + dr, mi_c + dc2,
                              sub, dcq, acq, lam)
    return cost


def encode_superblock_rd(sb_y: np.ndarray, sb_u: np.ndarray,
                         sb_v: np.ndarray, qindex: int,
                         lam: float | None = None,
                         tw: int = 64, th: int = 64,
                         adapt: bool = False) -> tuple:
    """RD-adaptive version of encode_superblock: the partition tree
    (32/16/8 leaves, DC/V/H/PAETH modes, coded-vs-skip per leaf)
    minimizes D + lam*R with exact MSAC bit counts and av1_itx
    reconstructions.  ``tw``/``th`` are the tile's VISIBLE pixel dims
    (any size >= 1); the sb_* planes carry the 8-px coding grid
    (edge-replicated by the caller).

    Returns (tile_bytes, recon planes at the grid geometry).
    """
    T = tables()
    dcq = int(T["dc_qlookup"][qindex])
    acq = int(T["ac_qlookup"][qindex])
    if lam is None:
        lam = RD_LAMBDA_C * (acq / 8.0) ** 2
    te = TileEncoder(tw, th, qctx=q_ctx(qindex), adapt=adapt)
    ry = np.zeros_like(sb_y)
    ru = np.zeros_like(sb_u)
    rv = np.zeros_like(sb_v)
    recs = [ry, ru, rv]
    _rd_partition(te, (sb_y, sb_u, sb_v), recs, 0, 0, 64, dcq, acq, lam)
    return te.msac.done(), ry, ru, rv


# ---------------------------------------------------------------------------
# Frame encoder


def encode_frame(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 qindex: int = 60, full_range: bool = False,
                 rd: bool = True, adapt: bool | None = None) -> tuple:
    """Encode 4:2:0 planes (ANY dims >= 1, <= 4096) to a full OBU
    stream.  Non-multiple-of-8 dims are edge-replicated onto the spec's
    8-px mi grid and the bitstream signals the true frame size (the
    decoder crops — no container CleanAperture needed); edge
    superblocks use the forced-split partition syntax certified by
    tools/av1_validate.py's edge-geometry sweep.  The fixed-tree path
    (rd=False) remains multiple-of-64 only.

    Returns (obu_bytes, recon_y, recon_u, recon_v) at the VISIBLE dims —
    the byte-true decoder output (av1_itx model), usable for PSNR and
    for the conformance gate (dav1d must reproduce it bit-exactly).
    """
    h, w = y.shape
    ch, cw = (h + 1) // 2, (w + 1) // 2
    if u.shape != (ch, cw) or v.shape != (ch, cw):
        raise ValueError("u/v must be 4:2:0 planes of the luma geometry")
    if not 1 <= qindex <= 255:
        raise ValueError("qindex must be in 1..255")
    if w > 4096 or h > 4096:
        raise ValueError("dims above 4096 need multi-level tile_info")
    if not rd and (w % 64 or h % 64):
        raise ValueError("the fixed-tree path needs multiples of 64")
    adapt = (ADAPT_DEFAULT if adapt is None else adapt) and rd
    gw, gh = ((w + 7) >> 3) << 3, ((h + 7) >> 3) << 3
    yp = _pad_grid(y, gh, gw)
    up = _pad_grid(u, gh // 2, gw // 2)
    vp = _pad_grid(v, gh // 2, gw // 2)
    sb_cols, sb_rows = (w + 63) // 64, (h + 63) // 64
    recon_y = np.zeros_like(yp)
    recon_u = np.zeros_like(up)
    recon_v = np.zeros_like(vp)
    tiles = []
    for tr in range(sb_rows):
        for tc in range(sb_cols):
            py, px = tr * 64, tc * 64
            cy, cx = py // 2, px // 2
            tw, th = min(64, w - px), min(64, h - py)
            tgw, tgh = ((tw + 7) >> 3) << 3, ((th + 7) >> 3) << 3
            if rd:
                tile, ty, tu, tv = encode_superblock_rd(
                    yp[py:py + tgh, px:px + tgw],
                    up[cy:cy + tgh // 2, cx:cx + tgw // 2],
                    vp[cy:cy + tgh // 2, cx:cx + tgw // 2],
                    qindex, tw=tw, th=th, adapt=adapt)
            else:
                tile, ty, tu, tv = encode_superblock(
                    yp[py:py + 64, px:px + 64],
                    up[cy:cy + 32, cx:cx + 32],
                    vp[cy:cy + 32, cx:cx + 32], qindex)
            recon_y[py:py + tgh, px:px + tgw] = ty
            recon_u[cy:cy + tgh // 2, cx:cx + tgw // 2] = tu
            recon_v[cy:cy + tgh // 2, cx:cx + tgw // 2] = tv
            tiles.append(tile)
    recon_y = recon_y[:h, :w]
    recon_u = recon_u[:ch, :cw]
    recon_v = recon_v[:ch, :cw]
    tg = bytearray()
    if len(tiles) > 1:
        tg.append(0x00)  # tile_start_and_end_present_flag=0 + alignment
    for i, t in enumerate(tiles):
        if i < len(tiles) - 1:
            tg += (len(t) - 1).to_bytes(4, "little")
        tg += t
    seq = obu(OBU_SEQUENCE_HEADER, sequence_header(w, h, full_range))
    hdr = frame_header_bits(qindex, w, h, adapt=adapt)
    hdr.byte_align()
    stream = seq + obu(OBU_FRAME, hdr.bytes() + bytes(tg))
    return stream, recon_y, recon_u, recon_v


def _pad_grid(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane to the coding-grid geometry (cheap bits:
    the replicated band is flat along one axis, so its AC mostly
    quantizes away, and the decoder crops it off anyway)."""
    h, w = plane.shape
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_avif(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                qindex: int = 60, alpha: np.ndarray | None = None,
                alpha_qindex: int | None = None) -> bytes:
    """Complete first-party AVIF: arbitrary-dimension studio-range
    BT.601 4:2:0 planes -> .avif bytes (container + OBU stream).

    The AV1 bitstream signals the true frame size at ANY dims (edge
    superblocks use the certified forced-split syntax; encode_frame
    pads onto the 8-px mi grid internally), so the container carries no
    CleanAperture box and every consumer — including ones that ignore
    clap, like PIL's AVIF plugin — sees the exact dimensions.

    ``alpha`` (full-range u8, luma geometry) rides as an auxiliary AV1
    item: a second 4:2:0 stream with neutral chroma — the same layout
    rav1e-family encoders write (their cores lack a mono path too) —
    whose sequence header signals full range, near-lossless by default
    (``alpha_qindex``, default min(qindex, 16) — tighter than the
    libavif arm's quantizer-16 cap (avif_encode.py:304) because the
    simple-toolset coder pays more error at equal qindex)."""
    from .av1_container import write_avif

    h, w = y.shape
    if u.shape != ((h + 1) // 2, (w + 1) // 2) or v.shape != u.shape:
        raise ValueError("u/v must be 4:2:0 planes of the luma geometry")
    if alpha is not None and alpha.shape != (h, w):
        raise ValueError("alpha plane must match luma geometry")
    stream, _, _, _ = encode_frame(y, u, v, qindex=qindex)
    seq_obu = obu(OBU_SEQUENCE_HEADER, sequence_header(w, h))
    a_stream = None
    a_seq = b""
    if alpha is not None:
        aq = min(qindex, 16) if alpha_qindex is None else alpha_qindex
        ch, cw = (h + 1) // 2, (w + 1) // 2
        neutral = np.full((ch, cw), 128, np.uint8)
        a_stream, _, _, _ = encode_frame(alpha, neutral, neutral,
                                         qindex=aq, full_range=True)
        a_seq = obu(OBU_SEQUENCE_HEADER,
                    sequence_header(w, h, full_range=True))
    return write_avif(stream, w, h, seq_obu=seq_obu,
                      alpha_obu_stream=a_stream, alpha_seq_obu=a_seq)
