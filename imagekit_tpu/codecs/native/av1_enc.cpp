// First-party AV1 entropy engine — native twin of av1_entropy.py's
// MsacEncoder + av1_intra.py's encode_txb hot loop.
//
// Byte-exactness contract: this implements EXACTLY the Python model
// (arbitrary-precision `low`, libaom od_ec direct-domain intervals,
// od_ec_enc_done termination). The Python encoder keeps `low` as a big
// int; here `low` is a 64-bit window plus a pre-carry chunk list: each
// emitted chunk holds 9 bits (8 payload + a possible carry out of the
// window, bounded by the per-renorm-epoch growth argument: between two
// renormalizations low grows by < 2^15 total, so low < 2^(wbits+1)
// always and a chunk never exceeds 0x1FF). Carries resolve right-to-
// left in done(), reproducing big-int addition bit-for-bit.
// tests/test_av1_native.py pins byte equality against the Python
// encoder over random symbol streams and full frames; the dav1d
// conformance gates run on top.
//
// snapshot/restore — the RD search's trial mechanism — is a full
// clone/assign of the encoder (struct + chunk vector): the search
// restores FORWARD to sibling-trial states whose chunk prefixes
// diverge, so truncation tricks are not sound; the vectors are a few
// KB, so clones are microseconds.

#include <cstdint>
#include <cstring>
#include <vector>

#define IK_EXPORT extern "C" __attribute__((visibility("default")))

namespace {

constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;

inline uint32_t interval(uint32_t rng, uint32_t f, int pos_from_end) {
    return (((rng >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT))
        + EC_MIN_PROB * pos_from_end;
}

struct MsacEnc {
    uint64_t low = 0;
    int wbits = 15;          // bits of the conceptual big `low` in-window
    uint32_t rng = 0x8000;
    int64_t nbits = 15;      // total conceptual bits (Python `nbits`)
    std::vector<uint16_t> chunks;  // 9-bit pre-carry chunks, oldest first

    void reset() {
        low = 0; wbits = 15; rng = 0x8000; nbits = 15; chunks.clear();
    }

    inline void renorm_and_flush() {
        while (rng < 0x8000) { rng <<= 1; low <<= 1; ++wbits; ++nbits; }
        while (wbits >= 48) {
            chunks.push_back((uint16_t)(low >> (wbits - 8)));
            low &= (1ULL << (wbits - 8)) - 1;
            wbits -= 8;
        }
    }

    inline void symbol(int sym, const uint16_t* icdf, int n) {
        uint32_t r = rng;
        uint32_t u = (sym == 0) ? r : interval(r, icdf[sym - 1], n - sym);
        uint32_t f = (sym == n - 1) ? 0 : icdf[sym];
        uint32_t v = interval(r, f, n - 1 - sym);
        low += r - u;
        rng = u - v;
        renorm_and_flush();
    }

    inline void boolbit(int b) {       // equiprobable bypass bit
        static const uint16_t half[1] = {1 << 14};
        symbol(b, half, 2);
    }

    inline void literal(uint32_t value, int bits) {
        for (int i = bits - 1; i >= 0; --i) boolbit((value >> i) & 1);
    }

    inline void golomb(uint32_t value) {   // spec read_golomb inverse
        uint32_t x = value + 1;
        int length = 32 - __builtin_clz(x);
        literal(0, length - 1);
        literal(x, length);
    }

    int done(uint8_t* out, int cap) const {
        int64_t keep = nbits - 14;
        if (keep <= 0) {
            if (cap < 1) return -1;
            out[0] = 0x40;
            return 1;
        }
        uint64_t e = ((low + 0x3FFF) & ~0x3FFFULL) | 0x4000;
        int pad = (int)((8 - (keep % 8)) % 8);
        uint64_t ew = (e >> 14) << pad;
        int wb = wbits - 14 + pad;                // window bits, mult of 8
        size_t nch = chunks.size();
        size_t n = nch + (size_t)(wb / 8);
        if ((int64_t)n * 8 != keep + pad) return -2;  // invariant breach
        if ((size_t)cap < n) return -1;
        std::vector<uint32_t> tmp(n);
        for (size_t i = 0; i < nch; ++i) tmp[i] = chunks[i];
        for (int i = 0; i < wb / 8; ++i)
            tmp[nch + i] = (uint32_t)((ew >> (wb - 8 * (i + 1)))
                                      & (i == 0 ? 0x3FFu : 0xFFu));
        for (size_t i = n - 1; i >= 1; --i) {
            tmp[i - 1] += tmp[i] >> 8;
            tmp[i] &= 0xFF;
        }
        if (tmp[0] > 0xFF) return -3;             // invariant breach
        for (size_t i = 0; i < n; ++i) out[i] = (uint8_t)tmp[i];
        return (int)n;
    }
};

// ---------------------------------------------------------------------------
// Bound default-CDF tables (shapes asserted by the Python binding layer)

struct Av1Tables {
    const uint16_t* txb_skip;      // (4,5,13,3)
    const uint16_t* ext_tx2;       // (4,13,6)
    const uint16_t* eob_pt[4];     // 16/64/256/1024: (4,2,2,nsyms+1)
    const uint16_t* eob_extra;     // (4,5,2,9,3)
    const uint16_t* base_eob;      // (4,5,2,4,4)
    const uint16_t* base;          // (4,5,2,42,5)
    const uint16_t* br;            // (4,5,2,21,5)
    const uint16_t* dc_sign;       // (4,2,3,3)
    const int16_t* scan[4];        // 4x4/8x8/16x16/32x32
};

Av1Tables g_tab;
bool g_bound = false;

constexpr int EOB_NSYMS[4] = {5, 7, 9, 11};   // last dim - 1

// spec 8.3.2 / aom update_cdf: rows are [icdf 0..n-2, 0, count].
// Entries below the coded symbol move toward 32768, entries at/above
// it decay toward 0 — BOTH via floor shifts of the positive quantity.
// speed term: 1 for n<=3, 2 above (dav1d's 4+(count>>4)+(nsym>2)
// under its size = n-1 convention); certified by the dav1d gate —
// a wrong rate or rounding desyncs within a few repeated symbols.
constexpr int NSYMBS2SPEED[17] = {0, 0, 1, 1, 2, 2, 2, 2, 2,
                                  2, 2, 2, 2, 2, 2, 2, 2};

inline void update_cdf(uint16_t* cdf, int val, int n) {
    const int count = cdf[n];
    const int rate = 3 + (count > 15) + (count > 31) + NSYMBS2SPEED[n];
    for (int i = 0; i < n - 1; ++i) {
        // BOTH sides floor-shift the positive quantity (the arithmetic
        // shift of (0 - cdf) rounds the decay up and desyncs dav1d)
        if (i < val)
            cdf[i] = (uint16_t)(cdf[i] + ((32768 - cdf[i]) >> rate));
        else
            cdf[i] = (uint16_t)(cdf[i] - (cdf[i] >> rate));
    }
    cdf[n] = (uint16_t)(count + (count < 32));
}

}  // namespace

IK_EXPORT MsacEnc* ik_msac_new() { return new MsacEnc(); }
IK_EXPORT void ik_msac_free(MsacEnc* e) { delete e; }
IK_EXPORT void ik_msac_reset(MsacEnc* e) { e->reset(); }

IK_EXPORT void ik_msac_symbol(MsacEnc* e, const uint16_t* icdf, int n,
                              int sym) {
    e->symbol(sym, icdf, n);
}
IK_EXPORT void ik_msac_symbol_adapt(MsacEnc* e, uint16_t* cdf, int n,
                                    int sym) {
    e->symbol(sym, cdf, n);
    update_cdf(cdf, sym, n);
}
IK_EXPORT void ik_msac_literal(MsacEnc* e, uint32_t value, int bits) {
    e->literal(value, bits);
}
IK_EXPORT void ik_msac_golomb(MsacEnc* e, uint32_t value) {
    e->golomb(value);
}
IK_EXPORT long long ik_msac_nbits(const MsacEnc* e) { return e->nbits; }
IK_EXPORT int ik_msac_done(const MsacEnc* e, uint8_t* out, int cap) {
    return e->done(out, cap);
}
IK_EXPORT MsacEnc* ik_msac_clone(const MsacEnc* e) {
    return new MsacEnc(*e);
}
IK_EXPORT void ik_msac_assign(MsacEnc* dst, const MsacEnc* src) {
    *dst = *src;
}

IK_EXPORT void ik_av1_bind_tables(
        const uint16_t* txb_skip, const uint16_t* ext_tx2,
        const uint16_t* eob16, const uint16_t* eob64,
        const uint16_t* eob256, const uint16_t* eob1024,
        const uint16_t* eob_extra, const uint16_t* base_eob,
        const uint16_t* base, const uint16_t* br, const uint16_t* dc_sign,
        const int16_t* scan4, const int16_t* scan8,
        const int16_t* scan16, const int16_t* scan32) {
    g_tab.txb_skip = txb_skip;
    g_tab.ext_tx2 = ext_tx2;
    g_tab.eob_pt[0] = eob16; g_tab.eob_pt[1] = eob64;
    g_tab.eob_pt[2] = eob256; g_tab.eob_pt[3] = eob1024;
    g_tab.eob_extra = eob_extra;
    g_tab.base_eob = base_eob;
    g_tab.base = base;
    g_tab.br = br;
    g_tab.dc_sign = dc_sign;
    g_tab.scan[0] = scan4; g_tab.scan[1] = scan8;
    g_tab.scan[2] = scan16; g_tab.scan[3] = scan32;
    g_bound = true;
}

// One transform block (mirror of av1_intra.TileEncoder.encode_txb).
// quant: side*side int32 raster levels (side = 1 << txsz_log2 <= 32).
// skip_ctx / dc_sign_ctx are derived from the per-plane entropy context
// rows by the Python caller (they live in TileEncoder state).
// Returns the new entropy-context value (cul_level | dc_cat << 6),
// or -100 on misuse.
IK_EXPORT int ik_av1_txb(MsacEnc* e, int plane, int qctx, int txsz_log2,
                         const int32_t* quant, int skip_ctx,
                         int dc_sign_ctx, int ymode, int txtype_sym,
                         uint16_t* const* tabs, int adapt) {
    if (!g_bound || txsz_log2 < 2 || txsz_log2 > 5) return -100;
    const int q = qctx;
    const int ptype = plane ? 1 : 0;
    const int txs_ctx = txsz_log2 - 2;
    const int side = 1 << txsz_log2;
    const int nc = side * side;            // side <= 32 always
    const int log_idx = txsz_log2 - 2;     // scan + eob table index

    // per-tile mutable tables (CDF adaptation) or the bound defaults;
    // order mirrors ik_av1_bind_tables (minus the scans)
    const uint16_t* t_txb_skip = tabs ? tabs[0] : g_tab.txb_skip;
    const uint16_t* t_ext = tabs ? tabs[1] : g_tab.ext_tx2;
    const uint16_t* t_eob = tabs ? tabs[2 + log_idx] : g_tab.eob_pt[log_idx];
    const uint16_t* t_eob_extra = tabs ? tabs[6] : g_tab.eob_extra;
    const uint16_t* t_base_eob = tabs ? tabs[7] : g_tab.base_eob;
    const uint16_t* t_base = tabs ? tabs[8] : g_tab.base;
    const uint16_t* t_br = tabs ? tabs[9] : g_tab.br;
    const uint16_t* t_dc = tabs ? tabs[10] : g_tab.dc_sign;
    auto code = [&](const uint16_t* row, int n_, int s) {
        e->symbol(s, row, n_);
        if (adapt) update_cdf(const_cast<uint16_t*>(row), s, n_);
    };

    // txb_skip (all_zero): (4,5,13,3) -> row stride 3
    const uint16_t* skip_row =
        t_txb_skip + ((q * 5 + txs_ctx) * 13 + skip_ctx) * 3;
    bool any = false;
    for (int i = 0; i < nc; ++i) if (quant[i]) { any = true; break; }
    if (!any) {
        code(skip_row, 2, 1);
        return 0;
    }
    code(skip_row, 2, 0);
    if (plane == 0 && txsz_log2 < 5) {
        // tx_type in TX_SET_INTRA_2 {IDTX=0, DCT_DCT=1, ADST_ADST=2,
        // ADST_DCT=3, DCT_ADST=4}: (4,13,6) -> row stride 6
        code(t_ext + (txs_ctx * 13 + ymode) * 6, 5, txtype_sym);
    }
    const int16_t* scan = g_tab.scan[log_idx];
    int eob = 0;
    for (int c = nc - 1; c >= 0; --c) {
        if (quant[scan[c]]) { eob = c + 1; break; }
    }
    // eob_pt + extra bits
    int eob_pt;
    if (eob <= 2) eob_pt = eob;
    else eob_pt = (32 - __builtin_clz((unsigned)(eob - 1))) + 1;
    const int nsyms = EOB_NSYMS[log_idx];
    const uint16_t* eob_row =
        t_eob + ((q * 2 + ptype) * 2 + 0) * (nsyms + 1);
    code(eob_row, nsyms, eob_pt - 1);
    if (eob_pt >= 3) {
        int rem = eob - 1 - (1 << (eob_pt - 2));
        const uint16_t* ex_row = t_eob_extra
            + (((q * 5 + txs_ctx) * 2 + ptype) * 9 + (eob_pt - 3)) * 3;
        code(ex_row, 2, (rem >> (eob_pt - 3)) & 1);
        for (int i = eob_pt - 4; i >= 0; --i) e->boolbit((rem >> i) & 1);
    }
    // reverse scan: base magnitudes + br increments
    const int bwl = txsz_log2;             // side <= 32 -> min(.,5) == txsz
    const int stride = (1 << bwl) + 4;     // TX_PAD_HOR
    int32_t levels[(32 + 4) * (32 + 4) + 16];
    std::memset(levels, 0, sizeof(int32_t) * ((side + 4) * stride + 16));
    const uint16_t* base_eob_tab = t_base_eob
        + ((q * 5 + txs_ctx) * 2 + ptype) * 4 * 4;
    const uint16_t* base_tab = t_base
        + ((q * 5 + txs_ctx) * 2 + ptype) * 42 * 5;
    const uint16_t* br_tab = t_br
        + ((q * 5 + (txs_ctx < 3 ? txs_ctx : 3)) * 2 + ptype) * 21 * 5;
    for (int c = eob - 1; c >= 0; --c) {
        const int pos = scan[c];
        const int32_t qv = quant[pos];
        const int alevel = qv < 0 ? -qv : qv;
        const int level = alevel < 15 ? alevel : 15;
        const int row = pos >> bwl, col = pos & ((1 << bwl) - 1);
        const int lp = row * stride + col;
        if (c == eob - 1) {
            int bctx;
            if (c == 0) bctx = 0;
            else if (c <= nc / 8) bctx = 1;
            else if (c <= nc / 4) bctx = 2;
            else bctx = 3;
            code(base_eob_tab + bctx * 4, 3, (level < 3 ? level : 3) - 1);
        } else {
            auto cap3 = [&](int v) { return v < 3 ? v : 3; };
            int mag = cap3(levels[lp + 1]) + cap3(levels[lp + stride])
                + cap3(levels[lp + stride + 1]) + cap3(levels[lp + 2])
                + cap3(levels[lp + 2 * stride]);
            int bctx = (mag + 1) >> 1;
            if (bctx > 4) bctx = 4;
            if (pos == 0) bctx = 0;
            else if (row + col < 2) bctx += 1;
            else if (row + col < 4) bctx += 6;
            else bctx += 21;
            code(base_tab + bctx * 5, 4, level < 3 ? level : 3);
        }
        if (level > 2) {
            auto cap15 = [&](int v) { return v < 15 ? v : 15; };
            int mag = cap15(levels[lp + 1]) + cap15(levels[lp + stride])
                + cap15(levels[lp + stride + 1]);
            int brctx = (mag + 1) >> 1;
            if (brctx > 6) brctx = 6;
            if (pos != 0) brctx += (row < 2 && col < 2) ? 7 : 14;
            int remaining = level - 3;
            for (int k = 0; k < 4; ++k) {
                int sym = remaining < 3 ? remaining : 3;
                code(br_tab + brctx * 5, 4, sym);
                remaining -= sym;
                if (sym < 3) break;
            }
        }
        levels[lp] = level;
    }
    // forward pass: signs + exp-Golomb residues, then context value
    int64_t cul = 0;
    for (int c = 0; c < eob; ++c) {
        const int pos = scan[c];
        const int32_t v = quant[pos];
        if (!v) continue;
        const int sign = v < 0 ? 1 : 0;
        const int av = v < 0 ? -v : v;
        cul += av;
        if (c == 0) {
            const uint16_t* ds_row = t_dc
                + ((q * 2 + ptype) * 3 + dc_sign_ctx) * 3;
            code(ds_row, 2, sign);
        } else {
            e->boolbit(sign);
        }
        if (av > 14) e->golomb((uint32_t)(av - 15));
    }
    if (cul > 63) cul = 63;
    const int32_t dc = quant[0];
    const int cat = dc ? (dc < 0 ? 1 : 2) : 0;
    return (int)(cul | (cat << 6));
}
