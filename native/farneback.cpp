// First-party Farnebäck dense optical flow + flow warping, C++.
//
// The reference outsources its only native-code compute to OpenCV:
// cv.calcOpticalFlowFarneback + cv.remap drive the optical-flow nowcasting
// workload (reference notebook 13 cells 7-9). This library is the native
// host-side equivalent: the same algorithm as the TPU Pallas/XLA kernel in
// predict_pv_yield_tpu/ops/optical_flow.py, so the two implementations
// cross-validate each other (tests/test_native_flow.py) and hosts without an
// accelerator still get fast flow.
//
// Algorithm (G. Farnebäck, SCIA 2003):
//   1. polynomial expansion: per-pixel quadratic fit via six separable
//      Gaussian-weighted correlations and a constant 6x6 normal-equation
//      inverse;
//   2. displacement update: warped-coefficient averaging, Gaussian window
//      accumulation of A^T A / A^T db, per-pixel 2x2 solve;
//   3. coarse-to-fine binomial pyramid (scale 0.5).
//
// Build: g++ -O3 -shared -fPIC (see native/Makefile). API is C for ctypes.

#include <cmath>
#include <cstring>
#include <vector>

namespace {

using std::vector;

// ---------------------------------------------------------------- helpers

// Separable cross-correlation with edge-replicated borders.
// kx has radius rx (length 2*rx+1), ky radius ry.
void sep_correlate(const float* src, float* dst, int H, int W,
                   const float* kx, int rx, const float* ky, int ry,
                   float* tmp /* H*W scratch */) {
  // rows: correlate along x into tmp
  for (int y = 0; y < H; ++y) {
    const float* row = src + y * W;
    for (int x = 0; x < W; ++x) {
      float acc = 0.f;
      for (int k = -rx; k <= rx; ++k) {
        int xx = x + k;
        if (xx < 0) xx = 0;
        if (xx >= W) xx = W - 1;
        acc += row[xx] * kx[k + rx];
      }
      tmp[y * W + x] = acc;
    }
  }
  // cols: correlate along y into dst
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      float acc = 0.f;
      for (int k = -ry; k <= ry; ++k) {
        int yy = y + k;
        if (yy < 0) yy = 0;
        if (yy >= H) yy = H - 1;
        acc += tmp[yy * W + x] * ky[k + ry];
      }
      dst[y * W + x] = acc;
    }
  }
}

void gaussian_kernel(float sigma, int radius, vector<float>& k) {
  k.resize(2 * radius + 1);
  double sum = 0.0;
  for (int i = -radius; i <= radius; ++i) {
    double v = std::exp(-(double)(i * i) / (2.0 * sigma * sigma));
    k[i + radius] = (float)v;
    sum += v;
  }
  for (auto& v : k) v = (float)(v / sum);
}

// Gauss-Jordan inverse of a 6x6 (the normal-equation matrix is well
// conditioned for any sane poly_sigma).
bool invert6(double a[6][6], double inv[6][6]) {
  double aug[6][12];
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j < 6; ++j) aug[i][j] = a[i][j];
    for (int j = 0; j < 6; ++j) aug[i][6 + j] = (i == j) ? 1.0 : 0.0;
  }
  for (int col = 0; col < 6; ++col) {
    int pivot = col;
    for (int r = col + 1; r < 6; ++r)
      if (std::fabs(aug[r][col]) > std::fabs(aug[pivot][col])) pivot = r;
    if (std::fabs(aug[pivot][col]) < 1e-12) return false;
    if (pivot != col)
      for (int j = 0; j < 12; ++j) std::swap(aug[col][j], aug[pivot][j]);
    double d = aug[col][col];
    for (int j = 0; j < 12; ++j) aug[col][j] /= d;
    for (int r = 0; r < 6; ++r) {
      if (r == col) continue;
      double f = aug[r][col];
      for (int j = 0; j < 12; ++j) aug[r][j] -= f * aug[col][j];
    }
  }
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) inv[i][j] = aug[i][6 + j];
  return true;
}

// ------------------------------------------------- polynomial expansion

struct PolyExp {
  vector<float> A11, A12, A22, b1, b2;  // (x, y) coordinate order
};

void polynomial_expansion(const float* img, int H, int W, int n, float sigma,
                          PolyExp& out) {
  vector<float> g(2 * n + 1), xg(2 * n + 1), xxg(2 * n + 1);
  {
    vector<float> base;
    gaussian_kernel(sigma, n, base);
    for (int i = -n; i <= n; ++i) {
      g[i + n] = base[i + n];
      xg[i + n] = base[i + n] * i;
      xxg[i + n] = base[i + n] * i * i;
    }
  }
  // 1-D applicability moments s[k] = sum g(x) x^k
  double s[5] = {0, 0, 0, 0, 0};
  for (int i = -n; i <= n; ++i)
    for (int k = 0; k < 5; ++k) s[k] += g[i + n] * std::pow((double)i, k);

  // basis exponents (p, q) for [1, x, y, x^2, y^2, xy]
  const int P[6] = {0, 1, 0, 2, 0, 1};
  const int Q[6] = {0, 0, 1, 0, 2, 1};
  double G[6][6], Ginv[6][6];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) G[i][j] = s[P[i] + P[j]] * s[Q[i] + Q[j]];
  invert6(G, Ginv);

  const int N = H * W;
  vector<float> m(6 * N), tmp(N);
  // moments: (kx, ky) pairs per basis function
  const float* KX[6] = {g.data(), xg.data(), g.data(), xxg.data(), g.data(), xg.data()};
  const float* KY[6] = {g.data(), g.data(), xg.data(), g.data(), xxg.data(), xg.data()};
  for (int k = 0; k < 6; ++k)
    sep_correlate(img, m.data() + k * N, H, W, KX[k], n, KY[k], n, tmp.data());

  out.A11.resize(N); out.A12.resize(N); out.A22.resize(N);
  out.b1.resize(N); out.b2.resize(N);
  for (int i = 0; i < N; ++i) {
    double r[6];
    for (int row = 0; row < 6; ++row) {
      double acc = 0.0;
      for (int col = 0; col < 6; ++col) acc += Ginv[row][col] * m[col * N + i];
      r[row] = acc;
    }
    out.b1[i] = (float)r[1];          // d/dx
    out.b2[i] = (float)r[2];          // d/dy
    out.A11[i] = (float)r[3];         // x^2
    out.A22[i] = (float)r[4];         // y^2
    out.A12[i] = (float)(r[5] / 2.0); // xy/2
  }
}

inline float bilinear(const float* f, int H, int W, float y, float x) {
  if (y < 0.f) y = 0.f;
  if (x < 0.f) x = 0.f;
  if (y > H - 1.f) y = H - 1.f;
  if (x > W - 1.f) x = W - 1.f;
  int y0 = (int)y, x0 = (int)x;
  int y1 = y0 + 1 < H ? y0 + 1 : H - 1;
  int x1 = x0 + 1 < W ? x0 + 1 : W - 1;
  float wy = y - y0, wx = x - x0;
  float top = f[y0 * W + x0] * (1 - wx) + f[y0 * W + x1] * wx;
  float bot = f[y1 * W + x0] * (1 - wx) + f[y1 * W + x1] * wx;
  return top * (1 - wy) + bot * wy;
}

// -------------------------------------------------------- flow update

void update_flow(const PolyExp& p1, const PolyExp& p2, int H, int W,
                 vector<float>& flow /* 2*N, [dx|dy] planes */, int winsize,
                 bool gaussian) {
  const int N = H * W;
  vector<float> g11(N), g12(N), g22(N), h1(N), h2(N);
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = y * W + x;
      float dx = flow[i], dy = flow[N + i];
      float sx = x + dx, sy = y + dy;
      float a11 = 0.5f * (p1.A11[i] + bilinear(p2.A11.data(), H, W, sy, sx));
      float a12 = 0.5f * (p1.A12[i] + bilinear(p2.A12.data(), H, W, sy, sx));
      float a22 = 0.5f * (p1.A22[i] + bilinear(p2.A22.data(), H, W, sy, sx));
      float db1 = -0.5f * (bilinear(p2.b1.data(), H, W, sy, sx) - p1.b1[i]) +
                  (a11 * dx + a12 * dy);
      float db2 = -0.5f * (bilinear(p2.b2.data(), H, W, sy, sx) - p1.b2[i]) +
                  (a12 * dx + a22 * dy);
      g11[i] = a11 * a11 + a12 * a12;
      g12[i] = a11 * a12 + a12 * a22;
      g22[i] = a12 * a12 + a22 * a22;
      h1[i] = a11 * db1 + a12 * db2;
      h2[i] = a12 * db1 + a22 * db2;
    }
  }
  // window accumulation
  int radius = winsize / 2;
  vector<float> kernel;
  if (gaussian) {
    float sigma = winsize * 0.15f;
    if (sigma < 1.f) sigma = 1.f;
    gaussian_kernel(sigma, radius, kernel);
  } else {
    kernel.assign(winsize, 1.0f / winsize);
    radius = (winsize - 1) / 2;  // odd box
    kernel.resize(2 * radius + 1, 1.0f / winsize);
  }
  vector<float> tmp(N), sm(N);
  float* fields[5] = {g11.data(), g12.data(), g22.data(), h1.data(), h2.data()};
  for (float* f : fields) {
    sep_correlate(f, sm.data(), H, W, kernel.data(), radius, kernel.data(), radius,
                  tmp.data());
    std::memcpy(f, sm.data(), N * sizeof(float));
  }
  for (int i = 0; i < N; ++i) {
    float det = g11[i] * g22[i] - g12[i] * g12[i];
    if (std::fabs(det) < 1e-9f) det = det < 0 ? -1e-9f : 1e-9f;
    flow[i] = (g22[i] * h1[i] - g12[i] * h2[i]) / det;
    flow[N + i] = (g11[i] * h2[i] - g12[i] * h1[i]) / det;
  }
}

void downsample(const float* src, int H, int W, vector<float>& dst, int& h2,
                int& w2) {
  static const float k[5] = {1.f / 16, 4.f / 16, 6.f / 16, 4.f / 16, 1.f / 16};
  vector<float> blurred(H * W), tmp(H * W);
  sep_correlate(src, blurred.data(), H, W, k, 2, k, 2, tmp.data());
  h2 = (H + 1) / 2;
  w2 = (W + 1) / 2;
  dst.resize(h2 * w2);
  for (int y = 0; y < h2; ++y)
    for (int x = 0; x < w2; ++x) dst[y * w2 + x] = blurred[(2 * y) * W + (2 * x)];
}

}  // namespace

extern "C" {

// flow: output, H*W*2 floats interleaved as (..., 2) like OpenCV (dx, dy).
void farneback_flow(const float* im1, const float* im2, int H, int W,
                    float* flow_out, int levels, int winsize, int iterations,
                    int poly_n, float poly_sigma, int gaussian) {
  // build pyramid
  vector<vector<float>> pyr1, pyr2;
  vector<int> hs, ws;
  pyr1.emplace_back(im1, im1 + H * W);
  pyr2.emplace_back(im2, im2 + H * W);
  hs.push_back(H);
  ws.push_back(W);
  for (int l = 1; l < levels; ++l) {
    vector<float> d1, d2;
    int h2, w2;
    downsample(pyr1.back().data(), hs.back(), ws.back(), d1, h2, w2);
    downsample(pyr2.back().data(), hs.back(), ws.back(), d2, h2, w2);
    pyr1.push_back(std::move(d1));
    pyr2.push_back(std::move(d2));
    hs.push_back(h2);
    ws.push_back(w2);
  }

  vector<float> flow(2 * hs.back() * ws.back(), 0.f);
  for (int level = levels - 1; level >= 0; --level) {
    int h = hs[level], w = ws[level];
    if ((int)flow.size() != 2 * h * w) {
      // upsample flow from the coarser level and rescale by 2
      int ph = hs[level + 1], pw = ws[level + 1];
      vector<float> up(2 * h * w);
      for (int plane = 0; plane < 2; ++plane) {
        const float* src = flow.data() + plane * ph * pw;
        for (int y = 0; y < h; ++y)
          for (int x = 0; x < w; ++x) {
            float sy = (float)y * (ph - 1) / (h - 1 > 0 ? h - 1 : 1);
            float sx = (float)x * (pw - 1) / (w - 1 > 0 ? w - 1 : 1);
            up[plane * h * w + y * w + x] = 2.f * bilinear(src, ph, pw, sy, sx);
          }
      }
      flow = std::move(up);
    }
    PolyExp p1, p2;
    polynomial_expansion(pyr1[level].data(), h, w, poly_n, poly_sigma, p1);
    polynomial_expansion(pyr2[level].data(), h, w, poly_n, poly_sigma, p2);
    for (int it = 0; it < iterations; ++it)
      update_flow(p1, p2, h, w, flow, winsize, gaussian != 0);
  }

  // planes -> interleaved (H, W, 2)
  const int N = H * W;
  for (int i = 0; i < N; ++i) {
    flow_out[2 * i] = flow[i];
    flow_out[2 * i + 1] = flow[N + i];
  }
}

// Warp image forward by flow (notebook remap semantics):
// dst(y, x) = src(y - fy, x - fx), NaN outside. flow interleaved (H, W, 2).
void remap_image(const float* image, const float* flow, int H, int W,
                 float* out) {
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int i = y * W + x;
      float sx = x - flow[2 * i];
      float sy = y - flow[2 * i + 1];
      if (sx < 0.f || sy < 0.f || sx > W - 1.f || sy > H - 1.f) {
        out[i] = std::nanf("");
      } else {
        out[i] = bilinear(image, H, W, sy, sx);
      }
    }
  }
}

// Batched flow over a (T, H, W) sequence -> (T-1, H, W, 2).
void farneback_flow_sequence(const float* frames, int T, int H, int W,
                             float* flows_out, int levels, int winsize,
                             int iterations, int poly_n, float poly_sigma,
                             int gaussian) {
  const int N = H * W;
  for (int t = 0; t < T - 1; ++t) {
    farneback_flow(frames + t * N, frames + (t + 1) * N, H, W,
                   flows_out + t * N * 2, levels, winsize, iterations, poly_n,
                   poly_sigma, gaussian);
  }
}

}  // extern "C"
