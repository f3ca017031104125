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

// Compensated-visibility adjudicator: the same fragment semantics as
// dirt_oracle_rasterise, with EVERY arithmetic step (cross products, edge
// functions, S_z / S_w, the depth compare) carried in double precision.
// f32 inputs promote exactly, and products of 24-bit significands are exact
// in f64, so near-tie winner picks that are implementation-sensitive in f32
// (sub-pixel faces, edge-function cancellation -- the 65,536-face sweep
// regime) resolve here by the true geometry.  This is an ADJUDICATOR, not a
// parity target: f32 backends can legitimately differ from it by one
// rounding at exact ties.  Writes only the winner map.
void dirt_oracle_visibility_f64(const float* vertices, const int32_t* faces,
                                int32_t num_vertices, int32_t num_faces,
                                int32_t height, int32_t width,
                                int32_t* out_index) {
  (void)num_vertices;
  const int64_t pixel_count = static_cast<int64_t>(height) * width;
  double* depth = new double[pixel_count];
  for (int64_t i = 0; i < pixel_count; ++i) {
    depth[i] = 1.0;
    out_index[i] = -1;
  }

  for (int32_t f = 0; f < num_faces; ++f) {
    double q[3][3], zc[3], wc[3];
    for (int k = 0; k < 3; ++k) {
      const float* p = vertices + static_cast<int64_t>(faces[f * 3 + k]) * 4;
      q[k][0] = p[0];
      q[k][1] = p[1];
      q[k][2] = p[3];
      zc[k] = p[2];
      wc[k] = p[3];
    }
    double coeff[3][3];
    const int ia[3] = {1, 2, 0};
    const int ib[3] = {2, 0, 1};
    for (int k = 0; k < 3; ++k) {
      const double* u = q[ia[k]];
      const double* v = q[ib[k]];
      coeff[k][0] = u[1] * v[2] - u[2] * v[1];
      coeff[k][1] = u[2] * v[0] - u[0] * v[2];
      coeff[k][2] = u[0] * v[1] - u[1] * v[0];
    }
    bool accept[3];
    for (int k = 0; k < 3; ++k) {
      accept[k] = (coeff[k][0] > 0.0) ||
                  (coeff[k][0] == 0.0 && coeff[k][1] > 0.0);
    }
    const double det =
        q[0][0] * coeff[0][0] + q[0][1] * coeff[0][1] + q[0][2] * coeff[0][2];
    if (det == 0.0) continue;

    for (int32_t r = 0; r < height; ++r) {
      const double y = 1.0 - (2.0 * (r + 0.5)) / height;
      for (int32_t col = 0; col < width; ++col) {
        const double x = (2.0 * (col + 0.5)) / width - 1.0;
        double E[3];
        for (int k = 0; k < 3; ++k) {
          E[k] = coeff[k][0] * x + coeff[k][1] * y + coeff[k][2];
        }
        bool in_p = true, in_n = true;
        for (int k = 0; k < 3; ++k) {
          in_p = in_p && ((E[k] > 0.0) || (E[k] == 0.0 && accept[k]));
          in_n = in_n && ((E[k] < 0.0) || (E[k] == 0.0 && !accept[k]));
        }
        const double s_w = E[0] * wc[0] + E[1] * wc[1] + E[2] * wc[2];
        const double s_z = E[0] * zc[0] + E[1] * zc[1] + E[2] * zc[2];
        const bool cov_p = in_p && s_w > 0.0 && s_z >= -s_w && s_z <= s_w;
        const bool cov_n = in_n && s_w < 0.0 && s_z <= -s_w && s_z >= s_w;
        if (!(cov_p || cov_n)) continue;
        const double d = s_z / s_w;
        const int64_t idx = static_cast<int64_t>(r) * width + col;
        if (d < depth[idx] ||
            (d == depth[idx] && out_index[idx] >= 0 && f < out_index[idx])) {
          depth[idx] = d;
          out_index[idx] = f;
        }
      }
    }
  }
  delete[] depth;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// GL-clipping oracle: an INDEPENDENTLY DERIVED rasteriser that reproduces
// what OpenGL hardware does for the reference (csrc/rasterise_egl.cpp:362-380
// invokes it): Sutherland-Hodgman polygon clipping in clip space against
//   w >= w_eps   (the limit form of the implicit w > 0 of the clip volume),
//   z >= -w, z <= w   (near / far planes),
// followed by projection to NDC and plain 2-D screen-space rasterisation of
// the fan-triangulated sub-polygon, with screen-linear (z/w) depth and
// GL_LESS + draw-order depth testing.  Attributes are interpolated the
// GL way: a/w and 1/w linear in screen space, divided per fragment.
//
// This deliberately shares NO formulation with the homogeneous edge-function
// path above: it is the ground truth for the claim (dirt_tpu/ops/geometry.py)
// that the per-fragment |Z| <= |W| rule with the S_w sign test equals exact
// GL near/far clipping for EVERY w sign pattern, including triangles
// crossing the camera plane (w = 0).  Coverage may differ only in a
// one-pixel band around region boundaries (w_eps and rounding).
// ---------------------------------------------------------------------------

namespace {

constexpr int kMaxPoly = 16;
constexpr int kMaxAttrs = 8;

struct ClipVertex {
  double x, y, z, w;
  double attr[kMaxAttrs];
};

inline ClipVertex lerp_vertex(const ClipVertex& a, const ClipVertex& b,
                              double t, int channels) {
  ClipVertex out;
  out.x = a.x + t * (b.x - a.x);
  out.y = a.y + t * (b.y - a.y);
  out.z = a.z + t * (b.z - a.z);
  out.w = a.w + t * (b.w - a.w);
  for (int c = 0; c < channels; ++c) {
    out.attr[c] = a.attr[c] + t * (b.attr[c] - a.attr[c]);
  }
  return out;
}

// Clips the polygon against {v : dist(v) >= 0}; returns the new count.
template <typename DistFn>
int clip_against(const ClipVertex* in, int n, ClipVertex* out, int channels,
                 DistFn dist) {
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const ClipVertex& cur = in[i];
    const ClipVertex& nxt = in[(i + 1) % n];
    const double dc = dist(cur);
    const double dn = dist(nxt);
    if (dc >= 0.0) {
      out[m++] = cur;
      if (dn < 0.0) {
        out[m++] = lerp_vertex(cur, nxt, dc / (dc - dn), channels);
      }
    } else if (dn >= 0.0) {
      out[m++] = lerp_vertex(cur, nxt, dc / (dc - dn), channels);
    }
  }
  return m;
}

}  // namespace

extern "C" {

// Same contract as dirt_oracle_rasterise, implemented via true polygon
// clipping (see block comment above).
void dirt_oracle_rasterise_clipped(const float* background,
                                   const float* vertices, const float* colors,
                                   const int32_t* faces, int32_t num_vertices,
                                   int32_t num_faces, int32_t height,
                                   int32_t width, int32_t channels,
                                   float* out_pixels, int32_t* out_index) {
  (void)num_vertices;
  const double w_eps = 1e-7;

  const int64_t pixel_count = static_cast<int64_t>(height) * width;
  double* depth = new double[pixel_count];
  for (int64_t i = 0; i < pixel_count; ++i) depth[i] = 1.0;
  for (int64_t i = 0; i < pixel_count; ++i) out_index[i] = -1;
  for (int64_t i = 0; i < pixel_count; ++i) {
    for (int32_t c = 0; c < channels; ++c) {
      out_pixels[i * channels + c] = background[i * channels + c];
    }
  }

  for (int32_t f = 0; f < num_faces; ++f) {
    ClipVertex poly[kMaxPoly], buf[kMaxPoly];
    for (int k = 0; k < 3; ++k) {
      const float* v = vertices + static_cast<int64_t>(faces[f * 3 + k]) * 4;
      poly[k].x = v[0];
      poly[k].y = v[1];
      poly[k].z = v[2];
      poly[k].w = v[3];
      const float* a =
          colors + static_cast<int64_t>(faces[f * 3 + k]) * channels;
      for (int c = 0; c < channels; ++c) poly[k].attr[c] = a[c];
    }
    int n = 3;
    n = clip_against(poly, n, buf, channels,
                     [&](const ClipVertex& v) { return v.w - w_eps; });
    n = clip_against(buf, n, poly, channels,
                     [](const ClipVertex& v) { return v.z + v.w; });
    n = clip_against(poly, n, buf, channels,
                     [](const ClipVertex& v) { return v.w - v.z; });
    if (n < 3) continue;

    // Project to screen space (pixel units, top row first).
    double sx[kMaxPoly], sy[kMaxPoly], sz[kMaxPoly], inv_w[kMaxPoly];
    for (int i = 0; i < n; ++i) {
      const double iw = 1.0 / buf[i].w;
      sx[i] = (buf[i].x * iw + 1.0) * 0.5 * width;
      sy[i] = (1.0 - buf[i].y * iw) * 0.5 * height;
      sz[i] = buf[i].z * iw;   // NDC depth, screen-linear
      inv_w[i] = iw;
    }

    // Fan-triangulate and rasterise each sub-triangle in 2-D.
    for (int t = 1; t + 1 < n; ++t) {
      const int i0 = 0, i1 = t, i2 = t + 1;
      const double ax = sx[i1] - sx[i0], ay = sy[i1] - sy[i0];
      const double bx = sx[i2] - sx[i0], by = sy[i2] - sy[i0];
      double area = ax * by - ay * bx;
      if (area == 0.0) continue;

      double minx = sx[i0], maxx = sx[i0], miny = sy[i0], maxy = sy[i0];
      const int rest[2] = {i1, i2};
      for (int j = 0; j < 2; ++j) {
        const int i = rest[j];
        minx = sx[i] < minx ? sx[i] : minx;
        maxx = sx[i] > maxx ? sx[i] : maxx;
        miny = sy[i] < miny ? sy[i] : miny;
        maxy = sy[i] > maxy ? sy[i] : maxy;
      }
      int c0 = static_cast<int>(std::floor(minx - 0.5));
      int c1 = static_cast<int>(std::ceil(maxx));
      int r0 = static_cast<int>(std::floor(miny - 0.5));
      int r1 = static_cast<int>(std::ceil(maxy));
      c0 = c0 < 0 ? 0 : c0;
      r0 = r0 < 0 ? 0 : r0;
      c1 = c1 >= width ? width - 1 : c1;
      r1 = r1 >= height ? height - 1 : r1;

      for (int r = r0; r <= r1; ++r) {
        const double py = r + 0.5;
        for (int col = c0; col <= c1; ++col) {
          const double px = col + 0.5;
          // 2-D barycentric coordinates in screen space.
          const double dx = px - sx[i0], dy = py - sy[i0];
          const double l1 = (dx * by - dy * bx) / area;
          const double l2 = (ax * dy - ay * dx) / area;
          const double l0 = 1.0 - l1 - l2;
          if (l0 < 0.0 || l1 < 0.0 || l2 < 0.0) continue;
          const double d = l0 * sz[i0] + l1 * sz[i1] + l2 * sz[i2];
          const int64_t idx = static_cast<int64_t>(r) * width + col;
          if (d < depth[idx]) {
            depth[idx] = d;
            out_index[idx] = f;
            // Perspective-correct attributes: (a/w, 1/w) screen-linear.
            const double iw =
                l0 * inv_w[i0] + l1 * inv_w[i1] + l2 * inv_w[i2];
            for (int c = 0; c < channels; ++c) {
              const double aw = l0 * buf[i0].attr[c] * inv_w[i0] +
                                l1 * buf[i1].attr[c] * inv_w[i1] +
                                l2 * buf[i2].attr[c] * inv_w[i2];
              out_pixels[idx * channels + c] = static_cast<float>(aw / iw);
            }
          }
        }
      }
    }
  }

  delete[] depth;
}

}  // extern "C"
