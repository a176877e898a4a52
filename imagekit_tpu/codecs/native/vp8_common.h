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

}  // namespace ikvp8

#endif  // IK_VP8_COMMON_H_
