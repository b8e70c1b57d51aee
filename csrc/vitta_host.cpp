// vitta_host — native host-side frame preprocessing.
//
// The reference's data plane is PIL + torchvision group transforms in
// DataLoader worker processes (models/tanet_models/transforms.py,
// corpus/basics.py:432-453).  This library provides the same pixel
// operations as tight C loops so a single host core can keep a TPU fed:
//
//  * resize_bilinear_u8 — convolution-based bilinear resampling with
//    scale-adaptive support, matching PIL Image.resize(BILINEAR)
//    semantics (triangle filter, antialias on downscale, fixed-point
//    accumulation) — the exactness requirement for eval parity
//    (SURVEY.md §7 "hard parts");
//  * crop_u8 — rectangular crop;
//  * normalize_f32 — fused (x[/255] - mean) / std, uint8 -> float32.
//
// Exposed with a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // PIL-style fixed point

inline double triangle_filter(double x) {
  if (x < 0.0) x = -x;
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Precompute convolution bounds+coefficients for one axis (in_size ->
// out_size), triangle filter with support widened by the scale factor
// when downscaling (antialias).
struct AxisCoeffs {
  int ksize;
  std::vector<int> bounds;    // (out_size, 2): xmin, xcount
  std::vector<int> coeffs;    // (out_size, ksize) fixed-point
};

AxisCoeffs compute_coeffs(int in_size, int out_size, int antialias) {
  const double support_base = 1.0;  // triangle
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = (antialias && scale > 1.0) ? scale : 1.0;
  double support = support_base * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  AxisCoeffs out;
  out.ksize = ksize;
  out.bounds.resize(out_size * 2);
  out.coeffs.resize(static_cast<size_t>(out_size) * ksize);
  std::vector<double> w(ksize);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      double v = triangle_filter((x + xmin - center + 0.5) * ss);
      w[x] = v;
      ww += v;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) w[x] /= ww;
    }
    for (int x = 0; x < xmax; ++x) {
      double c = w[x] * (1 << kPrecisionBits);
      out.coeffs[static_cast<size_t>(xx) * ksize + x] =
          static_cast<int>(c < 0 ? c - 0.5 : c + 0.5);
    }
    for (int x = xmax; x < ksize; ++x) {
      out.coeffs[static_cast<size_t>(xx) * ksize + x] = 0;
    }
    out.bounds[xx * 2 + 0] = xmin;
    out.bounds[xx * 2 + 1] = xmax;
  }
  return out;
}

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

}  // namespace

extern "C" {

// in:  (h, w, c) uint8 row-major; out: (oh, ow, c).
// antialias=1 -> PIL BILINEAR (scale-adaptive support);
// antialias=0 -> classic 2-tap bilinear (cv2/mmcv INTER_LINEAR semantics,
// used by the Swin/mmaction pipeline, transforms_backup.py:1162).
void resize_bilinear_u8(const uint8_t* in, int h, int w, int c,
                        uint8_t* out, int oh, int ow, int antialias) {
  AxisCoeffs hc = compute_coeffs(w, ow, antialias);
  AxisCoeffs vc = compute_coeffs(h, oh, antialias);
  const int64_t half = 1LL << (kPrecisionBits - 1);

  // horizontal pass: (h, w, c) -> (h, ow, c)
  std::vector<uint8_t> tmp(static_cast<size_t>(h) * ow * c);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * w * c;
    uint8_t* orow = tmp.data() + static_cast<size_t>(y) * ow * c;
    for (int xx = 0; xx < ow; ++xx) {
      int xmin = hc.bounds[xx * 2 + 0];
      int xcount = hc.bounds[xx * 2 + 1];
      const int* k = hc.coeffs.data() + static_cast<size_t>(xx) * hc.ksize;
      for (int ch = 0; ch < c; ++ch) {
        int64_t acc = half;
        for (int x = 0; x < xcount; ++x) {
          acc += static_cast<int64_t>(row[(xmin + x) * c + ch]) * k[x];
        }
        orow[xx * c + ch] = clip8(acc);
      }
    }
  }
  // vertical pass: (h, ow, c) -> (oh, ow, c)
  for (int yy = 0; yy < oh; ++yy) {
    int ymin = vc.bounds[yy * 2 + 0];
    int ycount = vc.bounds[yy * 2 + 1];
    const int* k = vc.coeffs.data() + static_cast<size_t>(yy) * vc.ksize;
    uint8_t* orow = out + static_cast<size_t>(yy) * ow * c;
    for (int xx = 0; xx < ow * c; ++xx) {
      int64_t acc = half;
      for (int y = 0; y < ycount; ++y) {
        acc += static_cast<int64_t>(
                   tmp[static_cast<size_t>(ymin + y) * ow * c + xx]) * k[y];
      }
      orow[xx] = clip8(acc);
    }
  }
}

// batched variant: (n, h, w, c) -> (n, oh, ow, c)
void resize_bilinear_u8_batch(const uint8_t* in, int n, int h, int w, int c,
                              uint8_t* out, int oh, int ow, int antialias) {
  for (int i = 0; i < n; ++i) {
    resize_bilinear_u8(in + static_cast<size_t>(i) * h * w * c, h, w, c,
                       out + static_cast<size_t>(i) * oh * ow * c, oh, ow,
                       antialias);
  }
}

// crop (n, h, w, c) -> (n, ch_, cw, c) at (y0, x0)
void crop_u8(const uint8_t* in, int n, int h, int w, int c,
             int y0, int x0, int ch_, int cw, uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    const uint8_t* base = in + static_cast<size_t>(i) * h * w * c;
    uint8_t* obase = out + static_cast<size_t>(i) * ch_ * cw * c;
    for (int y = 0; y < ch_; ++y) {
      std::memcpy(obase + static_cast<size_t>(y) * cw * c,
                  base + (static_cast<size_t>(y0 + y) * w + x0) * c,
                  static_cast<size_t>(cw) * c);
    }
  }
}

// fused normalize: out = (in[/255] - mean) / std, per channel (c<=8)
void normalize_f32(const uint8_t* in, float* out, int64_t n_pixels, int c,
                   const float* mean, const float* std_, int div255) {
  float scale[8], offset[8];
  for (int ch = 0; ch < c; ++ch) {
    float inv = 1.0f / std_[ch];
    scale[ch] = (div255 ? inv / 255.0f : inv);
    offset[ch] = -mean[ch] * inv;
  }
  for (int64_t i = 0; i < n_pixels; ++i) {
    for (int ch = 0; ch < c; ++ch) {
      out[i * c + ch] = in[i * c + ch] * scale[ch] + offset[ch];
    }
  }
}

}  // extern "C"
