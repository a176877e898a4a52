// Shared VP8 fixed-point primitives: the NORMATIVE inverse transforms
// (RFC 6386 §14.3-14.5) and quantiser setup used by both the encoder
// (vp8_encode.cpp) and the decoder (vp8_decode.cpp). The encoder's
// reconstruction must equal decoder output bit-exactly, so there is
// exactly one implementation of each.
#ifndef IK_VP8_COMMON_H_
#define IK_VP8_COMMON_H_

#include <cstdint>

#include "vp8_tables.h"

namespace ikvp8 {

inline uint8_t Clip255(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

constexpr int kSinPi8Sqrt2 = 35468;
constexpr int kCosPi8Sqrt2Minus1 = 20091;

// Inverse DCT (RFC 6386 §14.4), 4x4 coefficients -> residual.
inline void Idct4x4(const int16_t* in, int* out /*16*/) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {
    const int a1 = in[i] + in[8 + i];
    const int b1 = in[i] - in[8 + i];
    int t1 = (in[4 + i] * kSinPi8Sqrt2) >> 16;
    int t2 = in[12 + i] + ((in[12 + i] * kCosPi8Sqrt2Minus1) >> 16);
    const int c1 = t1 - t2;
    t1 = in[4 + i] + ((in[4 + i] * kCosPi8Sqrt2Minus1) >> 16);
    t2 = (in[12 + i] * kSinPi8Sqrt2) >> 16;
    const int d1 = t1 + t2;
    tmp[0 + i] = a1 + d1;
    tmp[12 + i] = a1 - d1;
    tmp[4 + i] = b1 + c1;
    tmp[8 + i] = b1 - c1;
  }
  for (int i = 0; i < 4; ++i) {
    const int a1 = tmp[i * 4 + 0] + tmp[i * 4 + 2];
    const int b1 = tmp[i * 4 + 0] - tmp[i * 4 + 2];
    int t1 = (tmp[i * 4 + 1] * kSinPi8Sqrt2) >> 16;
    int t2 = tmp[i * 4 + 3] + ((tmp[i * 4 + 3] * kCosPi8Sqrt2Minus1) >> 16);
    const int c1 = t1 - t2;
    t1 = tmp[i * 4 + 1] + ((tmp[i * 4 + 1] * kCosPi8Sqrt2Minus1) >> 16);
    t2 = (tmp[i * 4 + 3] * kSinPi8Sqrt2) >> 16;
    const int d1 = t1 + t2;
    out[i * 4 + 0] = (a1 + d1 + 4) >> 3;
    out[i * 4 + 3] = (a1 - d1 + 4) >> 3;
    out[i * 4 + 1] = (b1 + c1 + 4) >> 3;
    out[i * 4 + 2] = (b1 - c1 + 4) >> 3;
  }
}

// Inverse WHT (RFC 6386 §14.3) — scatters the 16 luma DC values.
inline void InvWht4x4(const int16_t* in, int* out) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {
    const int a1 = in[0 + i] + in[12 + i];
    const int b1 = in[4 + i] + in[8 + i];
    const int c1 = in[4 + i] - in[8 + i];
    const int d1 = in[0 + i] - in[12 + i];
    tmp[0 + i] = a1 + b1;
    tmp[4 + i] = c1 + d1;
    tmp[8 + i] = a1 - b1;
    tmp[12 + i] = d1 - c1;
  }
  for (int i = 0; i < 4; ++i) {
    const int a1 = tmp[i * 4 + 0] + tmp[i * 4 + 3];
    const int b1 = tmp[i * 4 + 1] + tmp[i * 4 + 2];
    const int c1 = tmp[i * 4 + 1] - tmp[i * 4 + 2];
    const int d1 = tmp[i * 4 + 0] - tmp[i * 4 + 3];
    const int a2 = a1 + b1 + 3;
    const int b2 = c1 + d1;
    const int c2 = a1 - b1;
    const int d2 = d1 - c1;
    out[i * 4 + 0] = a2 >> 3;
    out[i * 4 + 1] = (b2 + 3) >> 3;
    out[i * 4 + 2] = (c2 + 3) >> 3;
    out[i * 4 + 3] = (d2 + 3) >> 3;
  }
}

struct QuantPair {
  uint16_t dc, ac;
};
struct Quantizers {
  QuantPair y1, y2, uv;
};

inline int ClampQ(int v) { return v < 0 ? 0 : (v > 127 ? 127 : v); }

// Dequantiser values for a (possibly delta-adjusted) base index
// (RFC 6386 §14.1). Deltas are per-plane-type index offsets.
inline Quantizers SetupQuantDeltas(int qindex, int y1dc_d, int y2dc_d,
                                   int y2ac_d, int uvdc_d, int uvac_d) {
  Quantizers q;
  q.y1.dc = kDcQLookup[ClampQ(qindex + y1dc_d)];
  q.y1.ac = kAcQLookup[ClampQ(qindex)];
  q.y2.dc = static_cast<uint16_t>(kDcQLookup[ClampQ(qindex + y2dc_d)] * 2);
  {
    int v = (kAcQLookup[ClampQ(qindex + y2ac_d)] * 155) / 100;
    if (v < 8) v = 8;
    q.y2.ac = static_cast<uint16_t>(v);
  }
  {
    int v = kDcQLookup[ClampQ(qindex + uvdc_d)];
    if (v > 132) v = 132;  // chroma DC clamp (RFC 6386 §14.1)
    q.uv.dc = static_cast<uint16_t>(v);
  }
  q.uv.ac = kAcQLookup[ClampQ(qindex + uvac_d)];
  return q;
}

inline Quantizers SetupQuant(int qindex) {
  return SetupQuantDeltas(qindex, 0, 0, 0, 0, 0);
}

// 4x4 sub-block prediction (§12.3). A: 8 above pixels (4 + 4 above-right),
// L: 4 left pixels, AL: above-left. Formulas are the normative per-pixel
// definitions (written out position by position).
inline void PredictB(uint8_t* o, int os, int mode, const uint8_t* A,
              const uint8_t* L, int AL) {
  auto a3 = [](int a, int b, int c) {
    return static_cast<uint8_t>((a + 2 * b + c + 2) >> 2);
  };
  auto a2 = [](int a, int b) { return static_cast<uint8_t>((a + b + 1) >> 1); };
  auto D = [&](int y, int x) -> uint8_t& { return o[y * os + x]; };
  switch (mode) {
    case 0: {  // B_DC: above4 + left4 (borders included for sub-blocks)
      int sum = 4;
      for (int i = 0; i < 4; ++i) sum += A[i] + L[i];
      const int dc = sum >> 3;
      for (int y = 0; y < 4; ++y) std::memset(o + y * os, dc, 4);
      break;
    }
    case 1:  // B_TM
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) D(y, x) = Clip255(L[y] + A[x] - AL);
      break;
    case 2: {  // B_VE
      const uint8_t r[4] = {a3(AL, A[0], A[1]), a3(A[0], A[1], A[2]),
                            a3(A[1], A[2], A[3]), a3(A[2], A[3], A[4])};
      for (int y = 0; y < 4; ++y) std::memcpy(o + y * os, r, 4);
      break;
    }
    case 3: {  // B_HE
      const uint8_t r[4] = {a3(AL, L[0], L[1]), a3(L[0], L[1], L[2]),
                            a3(L[1], L[2], L[3]), a3(L[2], L[3], L[3])};
      for (int y = 0; y < 4; ++y) std::memset(o + y * os, r[y], 4);
      break;
    }
    case 4:  // B_LD (down-left)
      D(0, 0) = a3(A[0], A[1], A[2]);
      D(0, 1) = D(1, 0) = a3(A[1], A[2], A[3]);
      D(0, 2) = D(1, 1) = D(2, 0) = a3(A[2], A[3], A[4]);
      D(0, 3) = D(1, 2) = D(2, 1) = D(3, 0) = a3(A[3], A[4], A[5]);
      D(1, 3) = D(2, 2) = D(3, 1) = a3(A[4], A[5], A[6]);
      D(2, 3) = D(3, 2) = a3(A[5], A[6], A[7]);
      D(3, 3) = a3(A[6], A[7], A[7]);
      break;
    case 5:  // B_RD (down-right)
      D(3, 0) = a3(L[3], L[2], L[1]);
      D(3, 1) = D(2, 0) = a3(L[2], L[1], L[0]);
      D(3, 2) = D(2, 1) = D(1, 0) = a3(L[1], L[0], AL);
      D(3, 3) = D(2, 2) = D(1, 1) = D(0, 0) = a3(L[0], AL, A[0]);
      D(2, 3) = D(1, 2) = D(0, 1) = a3(AL, A[0], A[1]);
      D(1, 3) = D(0, 2) = a3(A[0], A[1], A[2]);
      D(0, 3) = a3(A[1], A[2], A[3]);
      break;
    case 6:  // B_VR (vertical-right)
      D(0, 0) = D(2, 1) = a2(AL, A[0]);
      D(0, 1) = D(2, 2) = a2(A[0], A[1]);
      D(0, 2) = D(2, 3) = a2(A[1], A[2]);
      D(0, 3) = a2(A[2], A[3]);
      D(1, 0) = D(3, 1) = a3(L[0], AL, A[0]);
      D(1, 1) = D(3, 2) = a3(AL, A[0], A[1]);
      D(1, 2) = D(3, 3) = a3(A[0], A[1], A[2]);
      D(1, 3) = a3(A[1], A[2], A[3]);
      D(2, 0) = a3(L[1], L[0], AL);
      D(3, 0) = a3(L[2], L[1], L[0]);
      break;
    case 7:  // B_VL (vertical-left)
      D(0, 0) = a2(A[0], A[1]);
      D(1, 0) = a3(A[0], A[1], A[2]);
      D(2, 0) = D(0, 1) = a2(A[1], A[2]);
      D(1, 1) = D(3, 0) = a3(A[1], A[2], A[3]);
      D(2, 1) = D(0, 2) = a2(A[2], A[3]);
      D(3, 1) = D(1, 2) = a3(A[2], A[3], A[4]);
      D(2, 2) = D(0, 3) = a2(A[3], A[4]);
      D(3, 2) = D(1, 3) = a3(A[3], A[4], A[5]);
      D(2, 3) = a3(A[4], A[5], A[6]);
      D(3, 3) = a3(A[5], A[6], A[7]);
      break;
    case 8:  // B_HD (horizontal-down)
      D(0, 0) = D(1, 2) = a2(AL, L[0]);
      D(0, 1) = D(1, 3) = a3(A[0], AL, L[0]);
      D(0, 2) = a3(A[1], A[0], AL);
      D(0, 3) = a3(A[2], A[1], A[0]);
      D(1, 0) = D(2, 2) = a2(L[0], L[1]);
      D(1, 1) = D(2, 3) = a3(AL, L[0], L[1]);
      D(2, 0) = D(3, 2) = a2(L[1], L[2]);
      D(2, 1) = D(3, 3) = a3(L[0], L[1], L[2]);
      D(3, 0) = a2(L[2], L[3]);
      D(3, 1) = a3(L[1], L[2], L[3]);
      break;
    default:  // B_HU (horizontal-up)
      D(0, 0) = a2(L[0], L[1]);
      D(0, 1) = a3(L[0], L[1], L[2]);
      D(0, 2) = D(1, 0) = a2(L[1], L[2]);
      D(0, 3) = D(1, 1) = a3(L[1], L[2], L[3]);
      D(1, 2) = D(2, 0) = a2(L[2], L[3]);
      D(1, 3) = D(2, 1) = a3(L[2], L[3], L[3]);
      D(2, 2) = D(2, 3) = D(3, 0) = D(3, 1) = D(3, 2) = D(3, 3) = L[3];
      break;
  }
}


// ---------------------------------------------------------------------------
// Intra prediction (RFC 6386 §12). Planes carry a 1-px top/left border:
// data origin at (1, 1); row 0 = 127 (with corner 127), col 0 = 129. Luma
// additionally keeps 4 extra columns on the right for "above-right" reads.
// ---------------------------------------------------------------------------
inline void PredictDc(uint8_t* o, int os, const uint8_t* above, const uint8_t* left,
               int ls, int size, bool have_above, bool have_left) {
  int dc, shift;
  if (have_above || have_left) {
    int sum = 0;
    int total = 0;
    if (have_above) {
      for (int i = 0; i < size; ++i) sum += above[i];
      total += size;
    }
    if (have_left) {
      for (int i = 0; i < size; ++i) sum += left[i * ls];
      total += size;
    }
    shift = (size == 16 ? 4 : 3) + (have_above && have_left ? 1 : 0);
    dc = (sum + (1 << (shift - 1))) >> shift;
    (void)total;
  } else {
    dc = 128;
  }
  for (int y = 0; y < size; ++y) std::memset(o + y * os, dc, size);
}

inline void PredictI16OrChroma(uint8_t* plane, int stride, int px, int py, int size,
                        int mode, bool have_above, bool have_left) {
  uint8_t* o = plane + py * stride + px;
  const uint8_t* above = o - stride;
  const uint8_t* left = o - 1;
  switch (mode) {
    case 0:
      PredictDc(o, stride, above, left, stride, size, have_above, have_left);
      break;
    case 1:  // V
      for (int y = 0; y < size; ++y) std::memcpy(o + y * stride, above, size);
      break;
    case 2:  // H
      for (int y = 0; y < size; ++y)
        std::memset(o + y * stride, left[y * stride], size);
      break;
    default: {  // TM
      const int al = above[-1];
      for (int y = 0; y < size; ++y)
        for (int x = 0; x < size; ++x)
          o[y * stride + x] = Clip255(left[y * stride] + above[x] - al);
      break;
    }
  }
}


}  // namespace ikvp8

#endif  // IK_VP8_COMMON_H_
