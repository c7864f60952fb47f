// hostops: native host-side preprocessing kernels for the TPU input pipeline.
//
// The reference has no native code (SURVEY.md §2.3) — its host path is
// cv2/numpy inside torch DataLoader workers. This library is the framework's
// native runtime component: the per-sample image ops that dominate host time
// (padded square crop, nearest resize, affine warp, circular occluder,
// windowed visibility tests) implemented in C++ with OpenMP-free simple
// loops (the box is single-core; vectorisation comes from the compiler) and
// exposed through ctypes (native/hostops.py). Semantics match
// mhentropy_tpu/data/{transforms,occlusion}.py bit-for-bit where exactness
// matters (visibility), and to float rounding elsewhere.
//
// Build: make -C native   (produces libhostops.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

// Templated over the SOURCE pixel type: a uint8 source is read directly
// (the common case — dataset images), fusing the uint8->float convert into
// the gather instead of converting the whole source image up front (the
// full-image ascontiguousarray(float32) cost ~7x more than the kernel).
template <typename T>
static void crop_resize_nearest_t(const T* img, int h, int w, int c,
                                  float cx, float cy, float half,
                                  float pad_value, float* out, int s) {
  // nearbyint (round-half-to-even under the default FP mode) matches the
  // numpy fallback's np.round; lround's half-away-from-zero shifted the
  // whole crop by one pixel whenever cx/cy +- half landed exactly on .5.
  const int x1 = (int)std::nearbyint(cx - half);
  const int y1 = (int)std::nearbyint(cy - half);
  const int x2 = (int)std::nearbyint(cx + half);
  const int y2 = (int)std::nearbyint(cy + half);
  const int cw = x2 - x1, ch = y2 - y1;
  // Degenerate crop (half <= 0): everything is padding. The prefix/suffix
  // padding below assumes col[] is monotone non-decreasing, which only
  // holds for cw >= 0.
  if (cw <= 0 || ch <= 0) {
    for (int64_t q = 0; q < (int64_t)s * s * c; ++q) out[q] = pad_value;
    return;
  }
  // Match numpy nearest: src = floor(dst * crop / s). Precompute the column
  // map once — a per-pixel int64 division dominated the original loop.
  std::vector<int> col(s);
  for (int ox = 0; ox < s; ++ox) col[ox] = x1 + (int)((int64_t)ox * cw / s);
  for (int oy = 0; oy < s; ++oy) {
    const int sy = y1 + (int)((int64_t)oy * ch / s);
    float* dst = out + (int64_t)oy * s * c;
    if (sy < 0 || sy >= h) {
      for (int q = 0; q < s * c; ++q) dst[q] = pad_value;
      continue;
    }
    const T* row = img + (int64_t)sy * w * c;
    // col[] is monotone, so the out-of-bounds columns are a prefix/suffix:
    // pad them en bloc and keep the interior loop branch-free (vectorizes).
    int lo = 0, hi = s;
    while (lo < s && (col[lo] < 0 || col[lo] >= w)) ++lo;
    while (hi > lo && (col[hi - 1] < 0 || col[hi - 1] >= w)) --hi;
    for (int q = 0; q < lo * c; ++q) dst[q] = pad_value;
    for (int q = hi * c; q < s * c; ++q) dst[q] = pad_value;
    if (c == 3) {
      float* d3 = dst + (int64_t)lo * 3;
      for (int ox = lo; ox < hi; ++ox, d3 += 3) {
        const T* src = row + (int64_t)col[ox] * 3;
        d3[0] = (float)src[0];
        d3[1] = (float)src[1];
        d3[2] = (float)src[2];
      }
    } else {
      float* dc = dst + (int64_t)lo * c;
      for (int ox = lo; ox < hi; ++ox, dc += c) {
        const T* src = row + (int64_t)col[ox] * c;
        for (int k = 0; k < c; ++k) dc[k] = (float)src[k];
      }
    }
  }
}

template <typename T>
static void warp_affine_nearest_t(const T* img, int h, int w, int c,
                                  const float* m /* 2x3 src->dst */,
                                  float border, float* out, int s) {
  // Invert [a b tx; d e ty].
  const float a = m[0], b = m[1], tx = m[2];
  const float d = m[3], e = m[4], ty = m[5];
  const float det = a * e - b * d;
  const float ia = e / det, ib = -b / det;
  const float id = -d / det, ie = a / det;
  const float itx = -(ia * tx + ib * ty);
  const float ity = -(id * tx + ie * ty);
  for (int oy = 0; oy < s; ++oy) {
    for (int ox = 0; ox < s; ++ox) {
      const float sxf = ia * ox + ib * oy + itx;
      const float syf = id * ox + ie * oy + ity;
      const int sx = (int)std::lround(sxf);
      const int sy = (int)std::lround(syf);
      float* dst = out + ((int64_t)oy * s + ox) * c;
      if (sx < 0 || sy < 0 || sx >= w || sy >= h) {
        for (int k = 0; k < c; ++k) dst[k] = border;
      } else {
        const T* src = img + ((int64_t)sy * w + sx) * c;
        for (int k = 0; k < c; ++k) dst[k] = (float)src[k];
      }
    }
  }
}

extern "C" {

// Padded square crop + nearest resize, fused.
// img: HxWxC float32; out: SxSxC float32.
void crop_resize_nearest(const float* img, int h, int w, int c,
                         float cx, float cy, float half, float pad_value,
                         float* out, int s) {
  crop_resize_nearest_t<float>(img, h, w, c, cx, cy, half, pad_value, out, s);
}

void crop_resize_nearest_u8(const uint8_t* img, int h, int w, int c,
                            float cx, float cy, float half, float pad_value,
                            float* out, int s) {
  crop_resize_nearest_t<uint8_t>(img, h, w, c, cx, cy, half, pad_value, out, s);
}

// Inverse-mapped affine warp with nearest sampling (cv2.warpAffine
// semantics: m maps src->dst; we invert here).
void warp_affine_nearest(const float* img, int h, int w, int c,
                         const float* m /* 2x3 src->dst */, float border,
                         float* out, int s) {
  warp_affine_nearest_t<float>(img, h, w, c, m, border, out, s);
}

void warp_affine_nearest_u8(const uint8_t* img, int h, int w, int c,
                            const float* m, float border, float* out, int s) {
  warp_affine_nearest_t<uint8_t>(img, h, w, c, m, border, out, s);
}

// Circular occluder: zero pixels inside radius r of (cx, cy); flag joints.
void circle_occlude(float* img, int h, int w, int c, int cx, int cy, int r,
                    const float* uv, int k, uint8_t* occluded) {
  const int64_t r2 = (int64_t)r * r;
  const int y0 = std::max(0, cy - r), y1 = std::min(h - 1, cy + r);
  const int x0 = std::max(0, cx - r), x1 = std::min(w - 1, cx + r);
  for (int y = y0; y <= y1; ++y) {
    const int64_t dy = (int64_t)(y - cy) * (y - cy);
    for (int x = x0; x <= x1; ++x) {
      const int64_t dx = (int64_t)(x - cx) * (x - cx);
      if (dx + dy <= r2) {
        float* p = img + ((int64_t)y * w + x) * c;
        for (int q = 0; q < c; ++q) p[q] = 0.f;
      }
    }
  }
  for (int i = 0; i < k; ++i) {
    const float du = uv[2 * i] - cx, dv = uv[2 * i + 1] - cy;
    occluded[i] = (du * du + dv * dv <= (float)r2) ? 1 : 0;
  }
}

// HO3D visibility: hand-mask pixel within +-(quant-1) window whose depth is
// within tol_mm in front of the joint (signed test).
void depth_mask_visibility(const float* uvd, int k, const uint8_t* mask,
                           const float* depth_m, int h, int w, int quant,
                           float tol_mm, uint8_t* vis) {
  for (int i = 0; i < k; ++i) {
    const int u0 = (int)uvd[3 * i];
    const int v0 = (int)uvd[3 * i + 1];
    const float d = uvd[3 * i + 2];
    uint8_t flag = 0;
    for (int u = u0 - quant + 1; u < u0 + quant && !flag; ++u) {
      if (u < 0 || u >= w) continue;
      for (int v = v0 - quant + 1; v < v0 + quant; ++v) {
        if (v < 0 || v >= h) continue;
        const int64_t at = (int64_t)v * w + u;
        if (mask[at] && (d - depth_m[at] * 1000.f) < tol_mm) {
          flag = 1;
          break;
        }
      }
    }
    vis[i] = flag;
  }
}

// RHD depth-agreement visibility: |depth(pixel) - z(joint)| <= delta within
// the window.
void check_occlusion(const float* uv, const float* z, int k,
                     const float* depth, int h, int w, float delta, int quant,
                     float* vis) {
  for (int i = 0; i < k; ++i) {
    // nearbyint == np.round (half to even) — the numpy twin's rounding.
    const int row0 = (int)std::nearbyint(uv[2 * i + 1]);
    const int col0 = (int)std::nearbyint(uv[2 * i]);
    float flag = 0.f;
    for (int row = row0 - quant + 1; row < row0 + quant && flag == 0.f; ++row) {
      // Reference bounds use (w, h) transposed; crops are square so this is
      // equivalent — keep square-image semantics. The READ clips to real
      // memory like the numpy twin (non-square inputs stay crash-free:
      // the transposed test admits rows in [h, w) on landscape frames,
      // which previously read past the buffer).
      if (row < 0 || row > w - 1) continue;
      const int rc = row > h - 1 ? h - 1 : row;
      for (int col = col0 - quant + 1; col < col0 + quant; ++col) {
        if (col < 0 || col > h - 1) continue;
        const int cc = col > w - 1 ? w - 1 : col;
        if (std::fabs(depth[(int64_t)rc * w + cc] - z[i]) <= delta) {
          flag = 1.f;
          break;
        }
      }
    }
    vis[i] = flag;
  }
}

}  // extern "C"
