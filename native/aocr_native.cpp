// Native (C++) host-side kernels for the tpu-attention-ocr data pipeline.
//
// The reference gets its host image ops from torch's C `image` library
// (rgb2y + bilinear scale, /root/reference/src/data/data_gen.lua:71-79) and
// its eval string math from Lua (Levenshtein, src/utils/utils.lua:55-94).
// This library supplies the same functionality natively for the rebuilt
// pipeline; Python binds it with ctypes (aocr/utils/native.py) and falls
// back to numpy when the shared object is absent.
//
// Conventions match the numpy implementations exactly:
//  - ITU-R 601 luma (0.299, 0.587, 0.114)
//  - bilinear resampling with half-pixel centers (align_corners=false)
//  - edit distance over int32 token rows truncated at the first EOS id
//
// Build: make -C native   (produces libaocr_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Bilinear resample of a (h, w) luminance plane into (oh, ow); shared by
// the float32 and uint8 entry points so neither pays a redundant copy.
static void resize_bilinear(const float* lum, int h, int w,
                            float* out, int oh, int ow) {
  if (h == oh && w == ow) {
    std::memcpy(out, lum, sizeof(float) * static_cast<size_t>(h) * w);
    return;
  }
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    if (y0 < 0) { y0 = 0; wy = 0.f; }
    if (y0 > h - 1) { y0 = h - 1; wy = 0.f; }
    int y1 = std::min(y0 + 1, h - 1);
    if (wy < 0.f) wy = 0.f;
    if (wy > 1.f) wy = 1.f;
    for (int ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      if (x0 < 0) { x0 = 0; wx = 0.f; }
      if (x0 > w - 1) { x0 = w - 1; wx = 0.f; }
      int x1 = std::min(x0 + 1, w - 1);
      if (wx < 0.f) wx = 0.f;
      if (wx > 1.f) wx = 1.f;
      const float top = lum[static_cast<size_t>(y0) * w + x0] * (1.f - wx) +
                        lum[static_cast<size_t>(y0) * w + x1] * wx;
      const float bot = lum[static_cast<size_t>(y1) * w + x0] * (1.f - wx) +
                        lum[static_cast<size_t>(y1) * w + x1] * wx;
      out[static_cast<size_t>(oy) * ow + ox] = top * (1.f - wy) + bot * wy;
    }
  }
}

// RGB (or grayscale) float image -> luminance, bilinear-resized.
// in:  (h, w, c) float32, c in {1, 3, 4}; values in [0, 255] (luma of the
//      [0,1]-scaled image times 255 equals luma of the [0,255] image).
// out: (oh, ow) float32.
void aocr_luminance_resize(const float* in, int h, int w, int c,
                           float* out, int oh, int ow) {
  std::vector<float> lum(static_cast<size_t>(h) * w);
  if (c >= 3) {
    for (int i = 0; i < h * w; ++i) {
      const float* p = in + static_cast<size_t>(i) * c;
      lum[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
  } else {
    for (int i = 0; i < h * w; ++i) lum[i] = in[static_cast<size_t>(i) * c];
  }
  resize_bilinear(lum.data(), h, w, out, oh, ow);
}

// uint8 RGB (or gray) image -> luminance in [0, 255], bilinear-resized.
// Operates directly on PIL's raw bytes so the Python side does no float
// math (ctypes releases the GIL for the whole call, letting decode worker
// threads scale).
void aocr_luminance_resize_u8(const unsigned char* in, int h, int w, int c,
                              float* out, int oh, int ow) {
  std::vector<float> lum(static_cast<size_t>(h) * w);
  if (c >= 3) {
    for (int i = 0; i < h * w; ++i) {
      const unsigned char* p = in + static_cast<size_t>(i) * c;
      lum[i] = 0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2];
    }
  } else {
    for (int i = 0; i < h * w; ++i) {
      lum[i] = static_cast<float>(in[static_cast<size_t>(i) * c]);
    }
  }
  resize_bilinear(lum.data(), h, w, out, oh, ow);
}

// Batched EOS-truncated Levenshtein distance over token id rows.
// pred, gold: (batch, t) int32; eos: EOS token id; out: (batch,) int32.
void aocr_edit_distance_batch(const int32_t* pred, const int32_t* gold,
                              int batch, int t, int32_t eos, int32_t* out) {
  std::vector<int32_t> prev(t + 1), cur(t + 1);
  for (int b = 0; b < batch; ++b) {
    const int32_t* p = pred + static_cast<size_t>(b) * t;
    const int32_t* g = gold + static_cast<size_t>(b) * t;
    int lp = 0, lg = 0;
    while (lp < t && p[lp] != eos) ++lp;
    while (lg < t && g[lg] != eos) ++lg;
    for (int j = 0; j <= lg; ++j) prev[j] = j;
    for (int i = 1; i <= lp; ++i) {
      cur[0] = i;
      for (int j = 1; j <= lg; ++j) {
        const int cost = (p[i - 1] != g[j - 1]) ? 1 : 0;
        cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
      }
      std::swap(prev, cur);
    }
    out[b] = prev[lg];
  }
}

int aocr_native_abi_version() { return 3; }

}  // extern "C"
