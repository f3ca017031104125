// Independent C++ rasterisation oracle for dirt_tpu.
//
// Plays the role OpenGL hardware plays for the reference implementation: a
// trusted, independently-coded ground truth the JAX/Pallas kernels are tested
// against.  It implements the exact fragment semantics documented in
// dirt_tpu/ops/geometry.py -- homogeneous edge functions (E_i from cross
// products of clip (x, y, w)), a top-left fill rule on E_i == 0, per-fragment
// near/far clipping |Z| <= |W|, perspective-correct single-division attribute
// interpolation, GL_LESS depth with draw-order tie-break -- in strict
// (non-contracted, see Makefile's -ffp-contract=off) float arithmetic, so
// random scenes must match the JAX backends bit-for-bit.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <limits>

namespace {

struct Edge {
  float a, b, c;
  bool accept;  // include pixels with E == 0 (top-left rule)
};

inline float edge_eval(const Edge& e, float x, float y) {
  return e.a * x + e.b * y + e.c;
}

// cross(u, v) for (x, y, w) vectors; each product rounded separately.
inline void cross_xyw(const float* u, const float* v, float* out) {
  out[0] = u[1] * v[2] - u[2] * v[1];
  out[1] = u[2] * v[0] - u[0] * v[2];
  out[2] = u[0] * v[1] - u[1] * v[0];
}

}  // namespace

extern "C" {

// background:  [H, W, C]
// vertices:    [V, 4] clip-space
// colors:      [V, C]
// faces:       [F, 3]
// out_pixels:  [H, W, C]
// out_index:   [H, W] winning face per pixel, -1 for background
void dirt_oracle_rasterise(const float* background, const float* vertices,
                           const float* colors, const int32_t* faces,
                           int32_t num_vertices, int32_t num_faces,
                           int32_t height, int32_t width, int32_t channels,
                           float* out_pixels, int32_t* out_index) {
  (void)num_vertices;
  const float inv_w = 2.0f / static_cast<float>(width);
  const float inv_h = 2.0f / static_cast<float>(height);

  // Depth buffer, cleared to the far plane (glClearDepth(1.0) analogue).
  const int64_t pixel_count = static_cast<int64_t>(height) * width;
  float* depth = new float[pixel_count];
  for (int64_t i = 0; i < pixel_count; ++i) {
    depth[i] = 1.0f;
    out_index[i] = -1;
  }

  for (int32_t f = 0; f < num_faces; ++f) {
    const float* p[3];
    float q[3][3];  // (x, y, w) per corner
    float zc[3], wc[3];
    for (int k = 0; k < 3; ++k) {
      p[k] = vertices + static_cast<int64_t>(faces[f * 3 + k]) * 4;
      q[k][0] = p[k][0];
      q[k][1] = p[k][1];
      q[k][2] = p[k][3];
      zc[k] = p[k][2];
      wc[k] = p[k][3];
    }

    Edge e[3];
    float coeff[3][3];
    cross_xyw(q[1], q[2], coeff[0]);
    cross_xyw(q[2], q[0], coeff[1]);
    cross_xyw(q[0], q[1], coeff[2]);
    for (int k = 0; k < 3; ++k) {
      e[k].a = coeff[k][0];
      e[k].b = coeff[k][1];
      e[k].c = coeff[k][2];
      e[k].accept = (e[k].a > 0.f) || (e[k].a == 0.f && e[k].b > 0.f);
    }
    // Degenerate triangles (zero screen area) rasterise nothing.
    const float det =
        q[0][0] * coeff[0][0] + q[0][1] * coeff[0][1] + q[0][2] * coeff[0][2];
    if (det == 0.f) continue;

    for (int32_t r = 0; r < height; ++r) {
      const float y = 1.0f - (static_cast<float>(r) + 0.5f) * inv_h;
      for (int32_t col = 0; col < width; ++col) {
        const float x = (static_cast<float>(col) + 0.5f) * inv_w - 1.0f;
        const float E0 = edge_eval(e[0], x, y);
        const float E1 = edge_eval(e[1], x, y);
        const float E2 = edge_eval(e[2], x, y);
        const bool in_p =
            ((E0 > 0.f) || (E0 == 0.f && e[0].accept)) &&
            ((E1 > 0.f) || (E1 == 0.f && e[1].accept)) &&
            ((E2 > 0.f) || (E2 == 0.f && e[2].accept));
        const bool in_n =
            ((E0 < 0.f) || (E0 == 0.f && !e[0].accept)) &&
            ((E1 < 0.f) || (E1 == 0.f && !e[1].accept)) &&
            ((E2 < 0.f) || (E2 == 0.f && !e[2].accept));
        const float s_w = E0 * wc[0] + E1 * wc[1] + E2 * wc[2];
        const float s_z = E0 * zc[0] + E1 * zc[1] + E2 * zc[2];
        const bool cov_p = in_p && s_w > 0.f && s_z >= -s_w && s_z <= s_w;
        const bool cov_n = in_n && s_w < 0.f && s_z <= -s_w && s_z >= s_w;
        if (!(cov_p || cov_n)) continue;

        const float d = s_z / s_w;
        const int64_t idx = static_cast<int64_t>(r) * width + col;
        // GL_LESS; equal depth keeps the earlier face (draw order).
        if (d < depth[idx] ||
            (d == depth[idx] && out_index[idx] >= 0 && f < out_index[idx])) {
          depth[idx] = d;
          out_index[idx] = f;
        }
      }
    }
  }

  // Shading pass: perspective-correct single-division interpolation, shared
  // edge-function evaluation with the visibility pass.
  for (int32_t r = 0; r < height; ++r) {
    const float y = 1.0f - (static_cast<float>(r) + 0.5f) * inv_h;
    for (int32_t col = 0; col < width; ++col) {
      const float x = (static_cast<float>(col) + 0.5f) * inv_w - 1.0f;
      const int64_t idx = static_cast<int64_t>(r) * width + col;
      float* out = out_pixels + idx * channels;
      const int32_t f = out_index[idx];
      if (f < 0) {
        const float* bg = background + idx * channels;
        for (int32_t ch = 0; ch < channels; ++ch) out[ch] = bg[ch];
        continue;
      }
      const float* pv[3];
      float q[3][3];
      for (int k = 0; k < 3; ++k) {
        pv[k] = vertices + static_cast<int64_t>(faces[f * 3 + k]) * 4;
        q[k][0] = pv[k][0];
        q[k][1] = pv[k][1];
        q[k][2] = pv[k][3];
      }
      float coeff[3][3];
      cross_xyw(q[1], q[2], coeff[0]);
      cross_xyw(q[2], q[0], coeff[1]);
      cross_xyw(q[0], q[1], coeff[2]);
      const float E0 = coeff[0][0] * x + coeff[0][1] * y + coeff[0][2];
      const float E1 = coeff[1][0] * x + coeff[1][1] * y + coeff[1][2];
      const float E2 = coeff[2][0] * x + coeff[2][1] * y + coeff[2][2];
      const float s_e = (E0 + E1) + E2;
      const float denom = (s_e == 0.f) ? 1.0f : s_e;
      const float* c0 = colors + static_cast<int64_t>(faces[f * 3 + 0]) * channels;
      const float* c1 = colors + static_cast<int64_t>(faces[f * 3 + 1]) * channels;
      const float* c2 = colors + static_cast<int64_t>(faces[f * 3 + 2]) * channels;
      for (int32_t ch = 0; ch < channels; ++ch) {
        const float num = (E0 * c0[ch] + E1 * c1[ch]) + E2 * c2[ch];
        out[ch] = num / denom;
      }
    }
  }

  delete[] depth;
}

}  // extern "C"
