// Concurrency sanitizer harness for the native codecs (SURVEY.md §5.2: the
// reference leans on Rust's ownership model for data-race freedom; this C++
// is exercised under TSan/ASan instead). The serving engine calls these
// entry points concurrently from the codec thread pool, so this harness
// replicates exactly that pattern — N threads hammering every exported
// decode/encode path on shared input buffers — as a standalone binary so
// the sanitizers see only instrumented code (no CPython noise).
//
// Build + run: make sanitize  (see Makefile; results recorded in
// docs/ARCHITECTURE.md §sanitizers).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {
struct IkJpegInfo {
  int32_t width, height, ncomp, hmax, vmax;
  int32_t comp_h[4], comp_v[4], comp_width[4], comp_height[4];
  int32_t blocks_w[4], blocks_h[4], comp_tq[4];
  int32_t progressive;
};
int ik_jpeg_parse(const uint8_t*, size_t, IkJpegInfo*);
int ik_jpeg_decode_planes(const uint8_t*, size_t, uint8_t**);
int ik_jpeg_decode_coeffs(const uint8_t*, size_t, int16_t**, uint16_t*);
int ik_jpeg_decode_coeffs_lowfreq(const uint8_t*, size_t, int, int16_t**,
                                  uint16_t*);
int64_t ik_jpeg_encode(const int16_t**, int, int, int, const int32_t*,
                       const int32_t*, const uint16_t*, const uint16_t*,
                       uint8_t*, size_t);
int64_t ik_vp8_encode(const uint8_t*, const uint8_t*, const uint8_t*, int,
                      int, int, int, int, uint8_t*, size_t);
struct IkVp8Info {
  int32_t width, height;
};
int ik_webp_parse(const uint8_t*, size_t, IkVp8Info*);
int ik_webp_decode_yuv(const uint8_t*, size_t, uint8_t*, int, uint8_t*,
                       uint8_t*, int);
int ik_gif_parse(const uint8_t*, size_t, void*);
int ik_bmp_parse(const uint8_t*, size_t, void*);
struct IkPngInfo {
  int32_t width, height, channels, color_type, bit_depth, interlaced;
};
int ik_png_parse(const uint8_t*, size_t, IkPngInfo*);
int ik_png_decode(const uint8_t*, size_t, uint8_t*, size_t);
struct IkVp8lInfo {
  int32_t width, height, has_alpha;
};
int ik_vp8l_parse(const uint8_t*, size_t, IkVp8lInfo*);
int ik_vp8l_decode(const uint8_t*, size_t, uint8_t*, size_t);
int ik_webp_decode_alph(const uint8_t*, size_t, int, int, uint8_t*);
struct IkTiffInfo {
  int32_t width, height, channels;
};
int ik_tiff_parse(const uint8_t*, size_t, IkTiffInfo*);
// AV1 entropy engine (av1_enc.cpp)
void* ik_msac_new();
void ik_msac_free(void*);
void ik_msac_symbol(void*, const uint16_t*, int, int);
void ik_msac_literal(void*, uint32_t, int);
void ik_msac_golomb(void*, uint32_t);
void ik_msac_symbol_adapt(void*, uint16_t*, int, int);
long long ik_msac_nbits(const void*);
int ik_msac_done(const void*, uint8_t*, int);
void* ik_msac_clone(const void*);
void ik_msac_assign(void*, const void*);
void ik_av1_bind_tables(const uint16_t*, const uint16_t*, const uint16_t*,
                        const uint16_t*, const uint16_t*, const uint16_t*,
                        const uint16_t*, const uint16_t*, const uint16_t*,
                        const uint16_t*, const uint16_t*, const int16_t*,
                        const int16_t*, const int16_t*, const int16_t*);
int ik_av1_txb(void*, int, int, int, const int32_t*, int, int, int, int,
               uint16_t* const*, int);
int ik_tiff_decode(const uint8_t*, size_t, uint8_t*, size_t);
}

namespace {

std::atomic<int> failures{0};

void Require(bool ok, const char* what) {
  if (!ok) {
    std::fprintf(stderr, "FAIL: %s\n", what);
    failures.fetch_add(1);
  }
}

// Build a real baseline JPEG via the encoder itself (synthetic coefficients).
std::vector<uint8_t> MakeJpeg(int w, int h) {
  const int bw = (w + 15) / 16 * 2, bh = (h + 15) / 16 * 2;
  const int cbw = bw / 2, cbh = bh / 2;
  std::vector<int16_t> y(static_cast<size_t>(bw) * bh * 64, 0);
  std::vector<int16_t> cb(static_cast<size_t>(cbw) * cbh * 64, 0);
  std::vector<int16_t> cr = cb;
  for (size_t i = 0; i < y.size(); i += 64) {
    y[i] = static_cast<int16_t>((i / 64) % 120) - 60;  // varying DC
    y[i + 1] = 5;                                      // some AC
  }
  const int16_t* planes[3] = {y.data(), cb.data(), cr.data()};
  int32_t sh[3] = {2, 1, 1}, sv[3] = {2, 1, 1};
  uint16_t ql[64], qc[64];
  for (int i = 0; i < 64; ++i) {
    ql[i] = 16;
    qc[i] = 17;
  }
  std::vector<uint8_t> out(1 << 20);
  int64_t n = ik_jpeg_encode(planes, 3, w, h, sh, sv, ql, qc, out.data(),
                             out.size());
  Require(n > 0, "jpeg encode");
  out.resize(n > 0 ? static_cast<size_t>(n) : 0);
  return out;
}

// Minimal valid PNG (RGB8, filter 0) assembled with zlib.
std::vector<uint8_t> MakePng(int w, int h) {
  std::vector<uint8_t> raw((static_cast<size_t>(w) * 3 + 1) * h);
  for (int yy = 0; yy < h; ++yy) {
    uint8_t* line = raw.data() + static_cast<size_t>(yy) * (w * 3 + 1);
    line[0] = 0;
    for (int x = 0; x < w * 3; ++x) line[1 + x] = (x * 7 + yy * 13) & 0xff;
  }
  uLongf zcap = compressBound(raw.size());
  std::vector<uint8_t> z(zcap);
  Require(compress(z.data(), &zcap, raw.data(), raw.size()) == Z_OK,
          "png deflate");
  z.resize(zcap);

  std::vector<uint8_t> png;
  const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), magic, magic + 8);
  auto chunk = [&png](const char* type, const uint8_t* body, size_t n) {
    uint8_t hdr[8] = {static_cast<uint8_t>(n >> 24),
                      static_cast<uint8_t>(n >> 16),
                      static_cast<uint8_t>(n >> 8), static_cast<uint8_t>(n),
                      0, 0, 0, 0};
    std::memcpy(hdr + 4, type, 4);
    png.insert(png.end(), hdr, hdr + 8);
    if (n) png.insert(png.end(), body, body + n);
    uint32_t crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, reinterpret_cast<const Bytef*>(type), 4);
    if (n) crc = crc32(crc, body, n);
    uint8_t c[4] = {static_cast<uint8_t>(crc >> 24),
                    static_cast<uint8_t>(crc >> 16),
                    static_cast<uint8_t>(crc >> 8), static_cast<uint8_t>(crc)};
    png.insert(png.end(), c, c + 4);
  };
  uint8_t ihdr[13] = {static_cast<uint8_t>(w >> 24),
                      static_cast<uint8_t>(w >> 16),
                      static_cast<uint8_t>(w >> 8), static_cast<uint8_t>(w),
                      static_cast<uint8_t>(h >> 24),
                      static_cast<uint8_t>(h >> 16),
                      static_cast<uint8_t>(h >> 8), static_cast<uint8_t>(h),
                      8, 2, 0, 0, 0};
  chunk("IHDR", ihdr, 13);
  chunk("IDAT", z.data(), z.size());
  chunk("IEND", nullptr, 0);
  return png;
}

// Hand-assembled minimal VP8L stream: no transforms/cache/meta, a
// two-symbol green code (literals 10 and 200) alternating per pixel,
// single-symbol red/blue/alpha/dist codes. Exercises the LSB bit reader,
// simple-form prefix codes, tree walking, and the literal pixel loop.
std::vector<uint8_t> MakeVp8l(int w, int h) {
  std::vector<uint8_t> bits;
  uint32_t acc = 0;
  int nacc = 0;
  auto put = [&](uint32_t v, int n) {
    acc |= v << nacc;
    nacc += n;
    while (nacc >= 8) {
      bits.push_back(static_cast<uint8_t>(acc));
      acc >>= 8;
      nacc -= 8;
    }
  };
  put(0x2f, 8);                                  // VP8L signature byte
  put(static_cast<uint32_t>(w - 1), 14);
  put(static_cast<uint32_t>(h - 1), 14);
  put(0, 1);                                     // no alpha
  put(0, 3);                                     // version 0
  put(0, 1);                                     // no transforms
  put(0, 1);                                     // no colour cache
  put(0, 1);                                     // no meta groups
  // green: simple form, 2 symbols (literal 10, literal 200)
  put(1, 1); put(1, 1); put(1, 1); put(10, 8); put(200, 8);
  // red / blue / alpha / dist: simple form, 1 symbol each
  put(1, 1); put(0, 1); put(1, 1); put(20, 8);   // red = 20
  put(1, 1); put(0, 1); put(1, 1); put(30, 8);   // blue = 30
  put(1, 1); put(0, 1); put(1, 1); put(255, 8);  // alpha = 255
  put(1, 1); put(0, 1); put(1, 1); put(0, 8);    // dist (unused)
  for (int i = 0; i < w * h; ++i) put(i & 1, 1); // alternate green symbols
  if (nacc) bits.push_back(static_cast<uint8_t>(acc));

  std::vector<uint8_t> riff;
  auto le32 = [&riff](uint32_t v) {
    for (int i = 0; i < 4; ++i) riff.push_back((v >> (8 * i)) & 0xff);
  };
  const uint32_t body = static_cast<uint32_t>(bits.size());
  riff.insert(riff.end(), {'R', 'I', 'F', 'F'});
  le32(4 + 8 + body + (body & 1));
  riff.insert(riff.end(), {'W', 'E', 'B', 'P', 'V', 'P', '8', 'L'});
  le32(body);
  riff.insert(riff.end(), bits.begin(), bits.end());
  if (body & 1) riff.push_back(0);
  return riff;
}

// Minimal little-endian uncompressed RGB TIFF.
std::vector<uint8_t> MakeTiff(int w, int h) {
  std::vector<uint8_t> px(static_cast<size_t>(w) * h * 3);
  for (size_t i = 0; i < px.size(); ++i)
    px[i] = static_cast<uint8_t>((i * 11) & 0xff);
  std::vector<uint8_t> out = {'I', 'I', 42, 0, 8, 0, 0, 0};
  const int n = 9;
  auto le16 = [&](int v) {
    out.push_back(v & 0xff);
    out.push_back((v >> 8) & 0xff);
  };
  auto le32 = [&](uint32_t v) {
    for (int i = 0; i < 4; ++i) out.push_back((v >> (8 * i)) & 0xff);
  };
  const uint32_t bps_off = 8 + 2 + n * 12 + 4;
  const uint32_t strip_off = bps_off + 6;
  le16(n);
  auto ent = [&](int tag, int type, uint32_t cnt, uint32_t val) {
    le16(tag);
    le16(type);
    le32(cnt);
    le32(val);
  };
  ent(256, 3, 1, w);
  ent(257, 3, 1, h);
  ent(258, 3, 3, bps_off);
  ent(259, 3, 1, 1);
  ent(262, 3, 1, 2);
  ent(273, 4, 1, strip_off);
  ent(277, 3, 1, 3);
  ent(278, 3, 1, h);
  ent(279, 4, 1, static_cast<uint32_t>(px.size()));
  le32(0);              // next IFD
  le16(8); le16(8); le16(8);  // BitsPerSample values
  out.insert(out.end(), px.begin(), px.end());
  return out;
}

// Synthetic (valid-shape, strictly descending) ICDF tables for the AV1
// entropy engine — the sanitizer cares about memory/race behavior, not
// table provenance. Scans are identity permutations.
struct Av1SynthTables {
  std::vector<uint16_t> rows[11];
  std::vector<int16_t> scans[4];
  void fill(int idx, size_t nrows, int rowlen) {
    rows[idx].resize(nrows * rowlen);
    for (size_t r = 0; r < nrows; ++r)
      for (int i = 0; i < rowlen; ++i)
        rows[idx][r * rowlen + i] =
            static_cast<uint16_t>(32768 - (i + 1) * (32768 / (rowlen + 2)));
  }
  Av1SynthTables() {
    fill(0, 4 * 5 * 13, 3);   // txb_skip
    fill(1, 4 * 13, 6);       // ext_tx2
    fill(2, 4 * 2 * 2, 6);    // eob_pt_16
    fill(3, 4 * 2 * 2, 8);    // eob_pt_64
    fill(4, 4 * 2 * 2, 10);   // eob_pt_256
    fill(5, 4 * 2 * 2, 12);   // eob_pt_1024
    fill(6, 4 * 5 * 2 * 9, 3);    // eob_extra
    fill(7, 4 * 5 * 2 * 4, 4);    // coeff_base_eob
    fill(8, 4 * 5 * 2 * 42, 5);   // coeff_base
    fill(9, 4 * 5 * 2 * 21, 5);   // coeff_br
    fill(10, 4 * 2 * 3, 3);       // dc_sign
    const int ns[4] = {16, 64, 256, 1024};
    for (int s = 0; s < 4; ++s) {
      scans[s].resize(ns[s]);
      for (int i = 0; i < ns[s]; ++i) scans[s][i] = static_cast<int16_t>(i);
    }
  }
};

}  // namespace

int main() {
  const int kThreads = 8, kIters = 24;
  // AV1 tables bound ONCE before threads start (mirrors production:
  // Python binds under a lock at load; threads only read afterwards)
  static Av1SynthTables av1t;
  ik_av1_bind_tables(av1t.rows[0].data(), av1t.rows[1].data(),
                     av1t.rows[2].data(), av1t.rows[3].data(),
                     av1t.rows[4].data(), av1t.rows[5].data(),
                     av1t.rows[6].data(), av1t.rows[7].data(),
                     av1t.rows[8].data(), av1t.rows[9].data(),
                     av1t.rows[10].data(), av1t.scans[0].data(),
                     av1t.scans[1].data(), av1t.scans[2].data(),
                     av1t.scans[3].data());
  const std::vector<uint8_t> jpeg = MakeJpeg(144, 112);
  const std::vector<uint8_t> png = MakePng(96, 64);
  const std::vector<uint8_t> vp8l = MakeVp8l(37, 22);
  const std::vector<uint8_t> tiff = MakeTiff(41, 19);

  std::vector<std::thread> threads;
  for (int t = 0; t < kThreads; ++t) {
    threads.emplace_back([&, t]() {
      for (int it = 0; it < kIters; ++it) {
        // -- JPEG paths on the SHARED input buffer --
        IkJpegInfo info;
        Require(ik_jpeg_parse(jpeg.data(), jpeg.size(), &info) == 0, "parse");
        std::vector<std::vector<int16_t>> cbufs(3);
        int16_t* cptrs[4] = {nullptr, nullptr, nullptr, nullptr};
        for (int c = 0; c < 3; ++c) {
          cbufs[c].assign(
              static_cast<size_t>(info.blocks_w[c]) * info.blocks_h[c] * 64,
              0);
          cptrs[c] = cbufs[c].data();
        }
        uint16_t qt[256];
        Require(
            ik_jpeg_decode_coeffs(jpeg.data(), jpeg.size(), cptrs, qt) == 0,
            "decode_coeffs");
        const int k = (t % 2) ? 2 : 4;
        std::vector<std::vector<int16_t>> lbufs(3);
        int16_t* lptrs[4] = {nullptr, nullptr, nullptr, nullptr};
        for (int c = 0; c < 3; ++c) {
          lbufs[c].assign(static_cast<size_t>(info.blocks_w[c]) *
                              info.blocks_h[c] * k * k,
                          0);
          lptrs[c] = lbufs[c].data();
        }
        Require(ik_jpeg_decode_coeffs_lowfreq(jpeg.data(), jpeg.size(), k,
                                              lptrs, qt) == 0,
                "decode_lowfreq");
        std::vector<std::vector<uint8_t>> pbufs(3);
        uint8_t* pptrs[4] = {nullptr, nullptr, nullptr, nullptr};
        for (int c = 0; c < 3; ++c) {
          pbufs[c].assign(static_cast<size_t>(info.blocks_w[c]) * 8 *
                              info.blocks_h[c] * 8,
                          0);
          pptrs[c] = pbufs[c].data();
        }
        Require(
            ik_jpeg_decode_planes(jpeg.data(), jpeg.size(), pptrs) == 0,
            "decode_planes");

        // -- VP8 encode (per-thread outputs, shared nothing but tables) --
        const int w = 80 + 16 * (t % 3), h = 48;
        std::vector<uint8_t> y(static_cast<size_t>(w) * h);
        std::vector<uint8_t> u(static_cast<size_t>(w / 2) * (h / 2), 128);
        std::vector<uint8_t> v = u;
        for (size_t i = 0; i < y.size(); ++i)
          y[i] = static_cast<uint8_t>((i * 3 + it) & 0xff);
        std::vector<uint8_t> webp(static_cast<size_t>(w) * h * 4 + 65536);
        const int64_t wn =
            ik_vp8_encode(y.data(), u.data(), v.data(), w, h, w, w / 2,
                          20 + (it % 80), webp.data(), webp.size());
        Require(wn > 0, "vp8 encode");

        // -- VP8 decode of the just-encoded stream (round trip) --
        IkVp8Info vi;
        Require(ik_webp_parse(webp.data(), static_cast<size_t>(wn), &vi) == 0,
                "webp parse");
        const int W16 = (vi.width + 15) / 16 * 16;
        const int H16 = (vi.height + 15) / 16 * 16;
        std::vector<uint8_t> dy(static_cast<size_t>(W16) * H16);
        std::vector<uint8_t> du(static_cast<size_t>(W16 / 2) * (H16 / 2));
        std::vector<uint8_t> dv = du;
        Require(ik_webp_decode_yuv(webp.data(), static_cast<size_t>(wn),
                                   dy.data(), W16, du.data(), dv.data(),
                                   W16 / 2) == 0,
                "webp decode");

        // -- PNG decode on the SHARED input buffer --
        IkPngInfo pi;
        Require(ik_png_parse(png.data(), png.size(), &pi) == 0, "png parse");
        std::vector<uint8_t> out(static_cast<size_t>(pi.width) * pi.height *
                                 pi.channels);
        Require(ik_png_decode(png.data(), png.size(), out.data(),
                              out.size()) == 0,
                "png decode");

        // -- VP8L decode on the SHARED input buffer --
        IkVp8lInfo li;
        Require(ik_vp8l_parse(vp8l.data(), vp8l.size(), &li) == 0,
                "vp8l parse");
        std::vector<uint8_t> lout(static_cast<size_t>(li.width) * li.height *
                                  4);
        Require(ik_vp8l_decode(vp8l.data(), vp8l.size(), lout.data(),
                               lout.size()) == 0,
                "vp8l decode");
        Require(lout[1] == 10 && lout[5] == 200 && lout[0] == 20 &&
                    lout[2] == 30 && lout[3] == 255,
                "vp8l pixels");

        // -- ALPH raw alpha plane, one filter mode per thread --
        const int aw = 33, ah = 17;
        std::vector<uint8_t> alph(1 + static_cast<size_t>(aw) * ah);
        alph[0] = static_cast<uint8_t>((t % 4) << 2);  // filter in bits 2-3
        for (size_t i = 1; i < alph.size(); ++i)
          alph[i] = static_cast<uint8_t>((i * 5 + it) & 0xff);
        std::vector<uint8_t> aout(static_cast<size_t>(aw) * ah);
        Require(ik_webp_decode_alph(alph.data(), alph.size(), aw, ah,
                                    aout.data()) == 0,
                "alph decode");

        // -- TIFF decode on the SHARED input buffer --
        IkTiffInfo ti;
        Require(ik_tiff_parse(tiff.data(), tiff.size(), &ti) == 0,
                "tiff parse");
        std::vector<uint8_t> tout(static_cast<size_t>(ti.width) * ti.height *
                                  ti.channels);
        Require(ik_tiff_decode(tiff.data(), tiff.size(), tout.data(),
                               tout.size()) == 0,
                "tiff decode");

        // -- AV1 entropy engine: per-thread encoder, SHARED tables --
        void* enc = ik_msac_new();
        Require(enc != nullptr, "msac new");
        for (int s = 0; s < 64; ++s)
          ik_msac_symbol(enc, av1t.rows[0].data() + (s % 13) * 3, 2,
                         (s + it) % 2);
        ik_msac_literal(enc, static_cast<uint32_t>(it * 2654435761u), 17);
        ik_msac_golomb(enc, static_cast<uint32_t>(it % 500));
        const int txl = 2 + (it % 4);
        const int sd = 1 << txl;
        std::vector<int32_t> quant(static_cast<size_t>(sd) * sd, 0);
        for (int i = 0; i < sd * sd; i += 3 + (t % 4))
          quant[i] = ((i + it) % 37) - 18;
        const int ent = ik_av1_txb(enc, t % 3 ? 1 : 0, it % 4, txl,
                                   quant.data(), t % 3 ? 7 + (it % 3) : 0,
                                   it % 3, it % 13, it % 5, nullptr, 0);
        Require(ent >= 0, "av1 txb");
        // adaptation paths: per-thread mutable CDF row + table block
        uint16_t my_row[3] = {16384, 0, 0};
        for (int s2 = 0; s2 < 40; ++s2)
          ik_msac_symbol_adapt(enc, my_row, 2, (s2 + it) % 2);
        Av1SynthTables mytabs;     // thread-local mutable copy
        uint16_t* tabptrs[11] = {
            mytabs.rows[0].data(), mytabs.rows[1].data(),
            mytabs.rows[2].data(), mytabs.rows[3].data(),
            mytabs.rows[4].data(), mytabs.rows[5].data(),
            mytabs.rows[6].data(), mytabs.rows[7].data(),
            mytabs.rows[8].data(), mytabs.rows[9].data(),
            mytabs.rows[10].data()};
        const int ent2 = ik_av1_txb(enc, 0, it % 4, txl, quant.data(), 0,
                                    it % 3, it % 13, it % 5, tabptrs, 1);
        Require(ent2 >= 0, "av1 txb adapt");
        void* snap = ik_msac_clone(enc);
        ik_msac_symbol(enc, av1t.rows[10].data(), 2, it % 2);
        ik_msac_assign(enc, snap);
        ik_msac_free(snap);
        std::vector<uint8_t> tilebuf(
            static_cast<size_t>(ik_msac_nbits(enc)) / 8 + 16);
        Require(ik_msac_done(enc, tilebuf.data(),
                             static_cast<int>(tilebuf.size())) > 0,
                "msac done");
        ik_msac_free(enc);
      }
    });
  }
  for (auto& th : threads) th.join();
  if (failures.load() == 0) {
    std::printf("sanitize harness: all codec paths OK under %d threads\n",
                kThreads);
    return 0;
  }
  std::printf("sanitize harness: %d failures\n", failures.load());
  return 1;
}
