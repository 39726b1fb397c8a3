// Measured CPU baseline for the reference depth-estimation hot loop.
//
// The reference (facebook/facebook360_dep) publishes no wall-clock numbers
// and does not build in this image (Ceres/Boost/folly absent), so this is a
// faithful standalone port of its per-pixel cost kernel — computeCost
// (source/depth_estimation/Derp.cpp:104-226) + computeSSD
// (source/depth_estimation/DerpUtil.cpp:126-162) — run at the exact bench.py
// workload so `vs_baseline` divides by a MEASURED number instead of an
// estimate:
//
//   - 16-camera RECTILINEAR ring rig (ring_radius 0.3, focal 0.45*W),
//     identical geometry to facebook360_dep_tpu.render.synthetic.make_test_rig
//   - sphere scene at radius 5 for ground-truth disparity (validity pattern
//     matches the TPU bench scene)
//   - pyramid widths 2048..50 (scripts/render/config.py:46), H = 3W/4
//   - coarsest level: the 150-hypothesis brute-force sweep
//     (Derp.cpp:230-304, kNumDepths=150), one cost map per hypothesis
//   - every finer level: 12 full-image cost evaluations at per-pixel
//     disparity (2 random proposals + 9 ping-pong candidates + 1 init eval —
//     the same count bench.py's solver performs per level)
//   - per-level precompute: infinity warp fields (ImageUtil.cpp:142
//     computeWarpDstToSrc), color reprojection remap and 3x3 patch-mean bias
//     maps (Derp.cpp:978-1003 reprojectColors/colorBias), as the reference
//     pays per frame per level
//
// Pixel storage is cv::Vec3w (uint16, DerpUtil.h:19) with the 1/65535^2 SSD
// scale (DerpUtil.cpp:156-160), bilinear taps are scalar like
// cv_util::getPixelBilinear, and work is threaded with a spawn/join pool
// shaped like util/ThreadPool.h:23-57 (brute force: one task per hypothesis,
// Derp.cpp:288-304; refinement: tasks over row bands).
//
// Output: one JSON line with per-level and total seconds per destination map
// for the thread count given (default: hardware concurrency).
//
// Build: g++ -O3 -march=native -std=c++17 ref_cpu_baseline.cpp -o ref_cpu_baseline \
//            $(pkg-config --cflags --libs opencv4) -lpthread

#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

#include <chrono>
#include <cmath>
#include <cstdio>
#include <string>
#include <thread>
#include <tuple>
#include <vector>

using Vec3 = cv::Vec3d;
using Pixel = cv::Vec3w;       // DerpUtil.h:19
using PixelF = cv::Vec3f;

static const int kNumDepths = 150;          // Derp.h:33
static const int kSearchWindowRadius = 1;   // Derp.h:26
static const int kMinOverlappingCams = 2;   // Derp.h:28
// 8-bit rounding-noise variance floor (DerpUtil.h:28-31); the confidence
// divisor is per-pixel constant across hypotheses so timing is unaffected
static const float kMinVar = 1.0f / 12.0f / 65025.0f;
static const double kNearInfinity = 1e4;    // util/Camera.cpp:19
static const int kRefinementEvals = 12;     // 2 proposals + 9 ping-pong + init

// ---- spawn/join thread pool (util/ThreadPool.h:23-57 shape) ---------------
struct Pool {
  explicit Pool(int n) : limit(n <= 0 ? (int)std::thread::hardware_concurrency() : n) {}
  template <class F>
  void spawn(F&& f) {
    if (limit == 1) { f(); return; }
    if ((int)threads.size() >= limit) join();
    threads.emplace_back(std::forward<F>(f));
  }
  void join() {
    for (auto& t : threads) t.join();
    threads.clear();
  }
  int limit;
  std::vector<std::thread> threads;
};

// ---- RECTILINEAR camera (util/Camera.h pixel/rig, zero distortion) --------
struct Cam {
  Vec3 position;
  // rotation rows: right, up, backward (util/Camera.cpp:77-81); identity for
  // the forward ring rig, arbitrary for outward 360 rigs (mini_solver meta)
  double rot[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
  double fx, fy, cx, cy;  // pixel units at the current level resolution
  int w, h;

  // world -> pixel; false when behind the camera or outside the sensor
  // (Camera::pixel + sees())
  bool project(const Vec3& p, double& px, double& py) const {
    const Vec3 o = p - position;
    const Vec3 v(rot[0] * o[0] + rot[1] * o[1] + rot[2] * o[2],
                 rot[3] * o[0] + rot[4] * o[1] + rot[5] * o[2],
                 rot[6] * o[0] + rot[7] * o[1] + rot[8] * o[2]);
    const double zf = -v[2];
    if (!(zf > 0)) return false;
    px = fx * (v[0] / zf) + cx;
    py = fy * (v[1] / zf) + cy;
    return px >= 0 && px < w && py >= 0 && py < h;
  }

  // pixel center -> unit ray (Camera::rig); rot^T applied (rows orthonormal)
  Vec3 ray(double px, double py) const {
    const Vec3 d((px - cx) / fx, (py - cy) / fy, -1.0);
    const Vec3 r(rot[0] * d[0] + rot[3] * d[1] + rot[6] * d[2],
                 rot[1] * d[0] + rot[4] * d[1] + rot[7] * d[2],
                 rot[2] * d[0] + rot[5] * d[1] + rot[8] * d[2]);
    return r / cv::norm(r);
  }
};

static std::vector<Cam> makeRingRig(int n, int w, int h) {
  std::vector<Cam> rig(n);
  for (int i = 0; i < n; ++i) {
    const double a = 2.0 * M_PI * i / n;
    rig[i].position = Vec3(0.3 * std::cos(a), 0.3 * std::sin(a), 0.0);
    rig[i].fx = 0.45 * w;
    rig[i].fy = -0.45 * w;   // matches make_test_rig focal convention
    rig[i].cx = w / 2.0;
    rig[i].cy = h / 2.0;
    rig[i].w = w;
    rig[i].h = h;
  }
  return rig;
}

// distance to the inside of the sphere shell |p + t d| = R (scene geometry
// of render_sphere_scene: cameras inside, every ray hits)
static double sphereDepth(const Vec3& o, const Vec3& d, double R) {
  const double b = o.dot(d);
  const double c = o.dot(o) - R * R;
  return -b + std::sqrt(std::max(b * b - c, 0.0));
}

// scalar bilinear taps, cv_util::getPixelBilinear semantics (clamp-to-edge)
template <class T>
static inline cv::Vec<float, T::channels> tapBilinear(const cv::Mat_<T>& m, float x, float y) {
  x = std::min(std::max(x - 0.5f, 0.0f), (float)m.cols - 1.0f);
  y = std::min(std::max(y - 0.5f, 0.0f), (float)m.rows - 1.0f);
  const int x0 = (int)x, y0 = (int)y;
  const int x1 = std::min(x0 + 1, m.cols - 1), y1 = std::min(y0 + 1, m.rows - 1);
  const float ax = x - x0, ay = y - y0;
  cv::Vec<float, T::channels> out;
  for (int c = 0; c < T::channels; ++c) {
    const float top = (1 - ax) * m(y0, x0)[c] + ax * m(y0, x1)[c];
    const float bot = (1 - ax) * m(y1, x0)[c] + ax * m(y1, x1)[c];
    out[c] = (1 - ay) * top + ay * bot;
  }
  return out;
}

// ---- per-level state (PyramidLevel.h:24-530 equivalents) ------------------
struct Level {
  int w, h;
  std::vector<Cam> rig;                      // at level resolution
  std::vector<cv::Mat_<Pixel>> srcColor;     // per src
  cv::Mat_<float> gtDisparity;               // per-pixel eval disparity
  // per src, for one destination (the metric is per dst map):
  std::vector<cv::Mat_<cv::Vec2f>> projWarp;   // src-sized: pSrc -> pDstSrc
  std::vector<cv::Mat_<Pixel>> projColor;      // dst-sized reprojected color
  std::vector<cv::Mat_<Pixel>> projColorBias;  // 3x3 patch means
  cv::Mat_<float> dstVariance;
};

// procedural texture: cheap deterministic sinusoid mix over the hit point
static inline Pixel texture(const Vec3& p) {
  const double r = 0.5 + 0.5 * std::sin(3.1 * p[0] + 1.7 * p[1]);
  const double g = 0.5 + 0.5 * std::sin(2.3 * p[1] - 1.1 * p[2]);
  const double b = 0.5 + 0.5 * std::sin(4.7 * p[2] + 0.9 * p[0]);
  return Pixel((ushort)(r * 65535), (ushort)(g * 65535), (ushort)(b * 65535));
}

// ---- timed precompute: warps + reprojection + bias (Derp.cpp:955-1003) ----
// shared by the timing harness and the mini-solver oracle mode
static double precomputeForDst(Level& L, int dstIdx, Pool& pool) {
  const int numCams = (int)L.rig.size();
  const int w = L.w, h = L.h;
  const auto t0 = std::chrono::steady_clock::now();
  L.projWarp.resize(numCams);
  L.projColor.resize(numCams);
  L.projColorBias.resize(numCams);
  const Cam& dst = L.rig[dstIdx];
  for (int s = 0; s < numCams; ++s) {
    pool.spawn([&, s] {
      const Cam& src = L.rig[s];
      // dstProjWarp: for each SRC pixel, its infinity projection into the
      // dst-aligned frame (computeWarpDstToSrc, ImageUtil.cpp:142)
      L.projWarp[s].create(h, w);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
          const Vec3 d = src.ray(x + 0.5, y + 0.5);
          double px, py;
          if (dst.project(src.position + d * kNearInfinity, px, py))
            L.projWarp[s](y, x) = cv::Vec2f((float)px, (float)py);
          else
            L.projWarp[s](y, x) = cv::Vec2f(NAN, NAN);
        }
      // dstProjColor: src color remapped into the dst frame at infinity
      // (project(), Derp.cpp:986-993) — the inverse warp drives cv::remap
      if (s == dstIdx) {
        L.projColor[s] = L.srcColor[s];
      } else {
        cv::Mat map(h, w, CV_32FC2);
        for (int y = 0; y < h; ++y)
          for (int x = 0; x < w; ++x) {
            const Vec3 d = dst.ray(x + 0.5, y + 0.5);
            double px, py;
            if (src.project(dst.position + d * kNearInfinity, px, py))
              map.at<cv::Vec2f>(y, x) = cv::Vec2f((float)(px - 0.5), (float)(py - 0.5));
            else
              map.at<cv::Vec2f>(y, x) = cv::Vec2f(-1e6f, -1e6f);
          }
        // INTER_CUBIC: the reference's project() remap interpolation
        // (DerpUtil.cpp:198-205)
        cv::remap(L.srcColor[s], L.projColor[s], map, cv::noArray(), cv::INTER_CUBIC);
      }
      // colorBias: patch mean over the search window (Derp.cpp:999-1001)
      cv::blur(L.projColor[s], L.projColorBias[s],
               cv::Size(2 * kSearchWindowRadius + 1, 2 * kSearchWindowRadius + 1));
    });
  }
  pool.join();
  // dst color variance (PyramidLevel ctor computeVariances ->
  // computeImageVariance, DerpUtil.cpp:214-237): per-channel 3x3 local
  // variance combined with the ~1/3 kRgbWeights (DerpUtil.h:27)
  {
    cv::Mat f;
    L.projColor[dstIdx].convertTo(f, CV_32FC3, 1.0 / 65535.0);
    cv::Mat mean, meansq;
    cv::blur(f, mean, cv::Size(3, 3));
    cv::blur(f.mul(f), meansq, cv::Size(3, 3));
    cv::Mat var3 = meansq - mean.mul(mean);
    cv::Mat ch[3];
    cv::split(var3, ch);
    L.dstVariance = 0.3333f * ch[0] + 0.3334f * ch[1] + 0.3333f * ch[2];
  }
  return std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
}

static Level buildLevel(int w, int h, int numCams, int dstIdx, Pool& pool, double& precomputeSec) {
  Level L;
  L.w = w; L.h = h;
  L.rig = makeRingRig(numCams, w, h);

  // render src colors + gt disparity (fixture, untimed)
  L.srcColor.resize(numCams);
  for (int s = 0; s < numCams; ++s) {
    L.srcColor[s].create(h, w);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const Vec3 d = L.rig[s].ray(x + 0.5, y + 0.5);
        const double t = sphereDepth(L.rig[s].position, d, 5.0);
        L.srcColor[s](y, x) = texture(L.rig[s].position + d * t);
      }
  }
  L.gtDisparity.create(h, w);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const Vec3 d = L.rig[dstIdx].ray(x + 0.5, y + 0.5);
      L.gtDisparity(y, x) = (float)(1.0 / sphereDepth(L.rig[dstIdx].position, d, 5.0));
    }

  precomputeSec = precomputeForDst(L, dstIdx, pool);
  return L;
}

// ---- the hot kernel: computeCost (Derp.cpp:104-226) -----------------------
static std::tuple<float, float> computeCost(
    const Level& L, int dstIdx, float disparity, int x, int y) {
  const Cam& camDst = L.rig[dstIdx];
  // (1)-(2) dstToWorldPoint (DerpUtil.cpp:38-52)
  const Vec3 ray = camDst.ray(x + 0.5, y + 0.5);
  const Vec3 pWorld = camDst.position + ray * (1.0 / disparity);

  const int numSrc = (int)L.rig.size();
  std::vector<std::pair<float, float>> SSDs(numSrc);
  int ssdCount = 0;
  const cv::Mat_<Pixel>& dstColor = L.projColor[dstIdx];
  const Pixel& dstBiasPix = L.projColorBias[dstIdx](y, x);
  for (int s = 0; s < numSrc; ++s) {
    if (s == dstIdx) continue;
    // (3) worldToSrcPoint (DerpUtil.cpp:56+)
    double sx, sy;
    if (!L.rig[s].project(pWorld, sx, sy)) continue;
    // (3)->(5): precomputed infinity warp lookup (Derp.cpp:176-181)
    const cv::Vec2f pDstSrc = tapBilinear(L.projWarp[s], (float)sx, (float)sy);
    const float xDstSrc = pDstSrc[0] + 0.5f, yDstSrc = pDstSrc[1] + 0.5f;
    if (std::isnan(xDstSrc) || std::isnan(yDstSrc)) continue;

    // computeSSD (DerpUtil.cpp:126-162): biased + bias-compensated 3x3 SSD
    const PixelF srcBias = tapBilinear(L.projColorBias[s], xDstSrc, yDstSrc);
    PixelF bias;
    for (int c = 0; c < 3; ++c) bias[c] = (float)dstBiasPix[c] - srcBias[c];
    float ssdBiased = 0.0f, ssdUnbiased = 0.0f;
    for (int dx = -kSearchWindowRadius; dx <= kSearchWindowRadius; ++dx)
      for (int dy = -kSearchWindowRadius; dy <= kSearchWindowRadius; ++dy) {
        const Pixel& cDst = dstColor(y + dy, x + dx);
        const PixelF cSrc = tapBilinear(L.projColor[s], xDstSrc + dx, yDstSrc + dy);
        for (int c = 0; c < 3; ++c) {
          const float diffB = (float)cDst[c] - cSrc[c];
          const float diffU = diffB - bias[c];
          ssdBiased += diffB * diffB;
          ssdUnbiased += diffU * diffU;
        }
      }
    const float scale = 1.0f / (65535.0f * 65535.0f);
    SSDs[ssdCount++] = {ssdBiased * scale, ssdUnbiased * scale};
  }

  int keep = kMinOverlappingCams - 1;
  if (ssdCount < keep) return {FLT_MAX, 0.0f};
  keep = std::max(keep, ssdCount - 2);  // drop the two worst (Derp.cpp:208-215)
  std::nth_element(SSDs.begin(), SSDs.begin() + keep, SSDs.begin() + ssdCount);
  float cost = 0;
  for (int i = 0; i < keep; ++i) cost += SSDs[i].second;
  cost /= keep;
  const float trust = 1.0f / keep;
  const float confidence = std::max(L.dstVariance(y, x), kMinVar);
  return {cost * trust / confidence, confidence};
}

// one full-image evaluation at per-pixel disparity (the shape of a random-
// proposal / ping-pong pass, Derp.cpp:750-873 / 403-551), row bands threaded
static void evalFullImage(const Level& L, int dstIdx, const cv::Mat_<float>& disp,
                          cv::Mat_<float>& cost, Pool& pool) {
  const int r = kSearchWindowRadius;
  const int bands = std::max(pool.limit, 1);
  const int rows = L.h - 2 * r;
  for (int b = 0; b < bands; ++b) {
    const int y0 = r + rows * b / bands, y1 = r + rows * (b + 1) / bands;
    pool.spawn([&, y0, y1] {
      for (int y = y0; y < y1; ++y)
        for (int x = r; x < L.w - r; ++x)
          cost(y, x) = std::get<0>(computeCost(L, dstIdx, disp(y, x), x, y));
    });
  }
  pool.join();
}

// ============================================================================
// Mini reference-solver oracle mode (--mini_solver --input DIR --output DIR).
//
// A faithful single-level port of the reference pipeline so the repo solver's
// OUTPUT (not just its cost function) can be diffed against the reference
// algorithm on identical pixel data:
//   brute-force init   computeBruteForceDisparity   Derp.cpp:264-383
//   ping-pong (1 iter) pingPong (Jacobi semantics)  Derp.cpp:403-541
//   median filter      medianFilter/maskedMedianBlur Derp.cpp:904-920,
//                                                     CvUtil.h:336
// Input DIR layout (written by tests/test_ref_solver_oracle.py):
//   meta.txt   "ncams w h min_depth max_depth num_dsts var_noise_floor"
//              then per camera: "px py pz fx fy cx cy" optionally followed
//              by 9 rotation entries (rows right/up/backward; omitted =
//              identity, the forward ring of render/synthetic.py make_test_rig)
//   colorNN.u16  h*w*3 uint16 raw (RGB row-major)
// Output DIR: dispNN.f32 per destination (h*w float32).
// ============================================================================

// star candidate template (DerpUtil.h:34-43 candidateTemplateOriginal)
static const int kPingPongOffsets[9][2] = {
    {0, 0}, {-1, 0}, {1, 0}, {0, -1}, {0, 1}, {-2, -2}, {2, -2}, {-2, 2}, {2, 2}};

static cv::Mat_<float> bruteForceDisparity(
    const Level& L, int dstIdx, float minDepth, float maxDepth, Pool& pool) {
  const int w = L.w, h = L.h;
  const float minD = 1.0f / maxDepth, maxD = 1.0f / minDepth;
  std::vector<cv::Mat_<float>> maps(kNumDepths);
  std::vector<float> disparities(kNumDepths);
  for (int i = 0; i < kNumDepths; ++i) {
    const float f = (float)i / (kNumDepths - 1);
    disparities[i] = f * minD + (1 - f) * maxD;  // probeDisparity, ImageUtil.cpp:100
    maps[i].create(h, w);
    maps[i].setTo(NAN);
    const float d = disparities[i];
    pool.spawn([&, i, d] {
      const int r = kSearchWindowRadius;
      for (int y = r; y < h - r; ++y)
        for (int x = r; x < w - r; ++x)
          maps[i](y, x) = std::get<0>(computeCost(L, dstIdx, d, x, y));
    });
  }
  pool.join();

  // per-pixel argmin (Derp.cpp:306-356; FOV all-true, no fg masks)
  cv::Mat_<float> disp(h, w, NAN);
  const int margin = kSearchWindowRadius;
  for (int y = margin; y < h - margin; ++y)
    for (int x = margin; x < w - margin; ++x) {
      float minCost = FLT_MAX;
      int best = -1;
      for (int i = 0; i < kNumDepths; ++i) {
        const float c = maps[i](y, x);
        if (c < minCost) { minCost = c; best = i; }
      }
      disp(y, x) = best == -1 ? minD : disparities[best];
    }
  // extend to margins by clamped copy (Derp.cpp:358-383)
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      if (x < margin || x >= w - margin || y < margin || y >= h - margin)
        disp(y, x) = disp(std::min(std::max(y, margin), h - margin - 1),
                          std::min(std::max(x, margin), w - margin - 1));
  return disp;
}

static void pingPongOnce(
    const Level& L, int dstIdx, cv::Mat_<float>& disp, float varNoiseFloor, Pool& pool) {
  // Jacobi semantics: every candidate reads the PRE-iteration map
  // (pingPongRectangle reads `disp`, writes `dispRes`; changed=true on the
  // first iteration — Derp.cpp:485-541)
  const int w = L.w, h = L.h;
  cv::Mat_<float> dispRes = disp.clone();
  const int r = kSearchWindowRadius;
  const int bands = std::max(pool.limit, 1);
  const int rows = h - 2 * r;
  for (int b = 0; b < bands; ++b) {
    const int y0 = r + rows * b / bands, y1 = r + rows * (b + 1) / bands;
    pool.spawn([&, y0, y1] {
      for (int y = y0; y < y1; ++y)
        for (int x = r; x < w - r; ++x) {
          if (L.dstVariance(y, x) < varNoiseFloor) continue;  // Derp.cpp:434-437
          float bestCost = INFINITY;
          float bestDisparity = disp(y, x);
          for (const auto& off : kPingPongOffsets) {
            const int xx = std::min(std::max(x + off[0], 0), w - 1);
            const int yy = std::min(std::max(y + off[1], 0), h - 1);
            const float d = disp(yy, xx);
            const float cost = std::get<0>(computeCost(L, dstIdx, d, x, y));
            if (cost < bestCost) { bestCost = cost; bestDisparity = d; }
          }
          dispRes(y, x) = bestDisparity;
        }
    });
  }
  pool.join();
  dispRes.copyTo(disp);
}

static cv::Mat_<float> medianFilterMasked(const cv::Mat_<float>& mat, int radius) {
  // maskedMedianBlur with all-true mask, empty background, ignoreNan=true
  // (CvUtil.h:336-385: NaN AND exact-zero values are excluded from the
  // window; even-count windows average the two middle values)
  cv::Mat_<float> out(mat.size(), 0.0f);
  std::vector<float> values;
  for (int y = 0; y < mat.rows; ++y)
    for (int x = 0; x < mat.cols; ++x) {
      values.clear();
      for (int yy = y - radius; yy <= y + radius; ++yy)
        for (int xx = x - radius; xx <= x + radius; ++xx) {
          if (yy < 0 || yy >= mat.rows || xx < 0 || xx >= mat.cols) continue;
          const float v = mat(yy, xx);
          if (std::isnan(v) || v == 0) continue;
          values.push_back(v);
        }
      if (!values.empty()) {
        const size_t n = values.size() / 2;
        std::partial_sort(values.begin(), values.begin() + n + 1, values.end());
        out(y, x) = values.size() % 2 == 1 ? values[n] : (values[n - 1] + values[n]) / 2.0f;
      }
    }
  return out;
}

static int runMiniSolver(const std::string& inDir, const std::string& outDir, int threads) {
  FILE* f = std::fopen((inDir + "/meta.txt").c_str(), "r");
  if (!f) { std::fprintf(stderr, "cannot open %s/meta.txt\n", inDir.c_str()); return 1; }
  int ncams, w, h, numDsts;
  double minDepth, maxDepth, varNoiseFloor;
  if (std::fscanf(f, "%d %d %d %lf %lf %d %lf",
                  &ncams, &w, &h, &minDepth, &maxDepth, &numDsts, &varNoiseFloor) != 7) {
    std::fprintf(stderr, "bad meta.txt header\n"); std::fclose(f); return 1;
  }
  std::vector<Cam> rig(ncams);
  for (int i = 0; i < ncams; ++i) {
    Cam& c = rig[i];
    double px, py, pz;
    if (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf",
                    &px, &py, &pz, &c.fx, &c.fy, &c.cx, &c.cy) != 7) {
      std::fprintf(stderr, "bad meta.txt camera %d\n", i); std::fclose(f); return 1;
    }
    c.position = Vec3(px, py, pz);
    c.w = w; c.h = h;
    // optional 9-entry rotation (rows right/up/backward); peek the line rest
    long pos = std::ftell(f);
    double r[9];
    bool nine = true;
    for (int k = 0; k < 9; ++k) {
      // a newline before 9 doubles means identity (back-compat format)
      int ch;
      while ((ch = std::fgetc(f)) == ' ' || ch == '\t') {}
      if (ch == '\n' || ch == EOF) { nine = false; break; }
      std::ungetc(ch, f);
      if (std::fscanf(f, "%lf", &r[k]) != 1) { nine = false; break; }
    }
    if (nine) {
      for (int k = 0; k < 9; ++k) c.rot[k] = r[k];
    } else {
      std::fseek(f, pos, SEEK_SET);
    }
  }
  std::fclose(f);

  std::vector<cv::Mat_<Pixel>> colors(ncams);
  for (int s = 0; s < ncams; ++s) {
    char suffix[32];
    std::snprintf(suffix, sizeof suffix, "/color%02d.u16", s);
    const std::string name = inDir + suffix;
    FILE* cf = std::fopen(name.c_str(), "rb");
    if (!cf) { std::fprintf(stderr, "cannot open %s\n", name.c_str()); return 1; }
    colors[s].create(h, w);
    const size_t want = (size_t)h * w;
    std::vector<uint16_t> buf(want * 3);
    if (std::fread(buf.data(), 2, want * 3, cf) != want * 3) {
      std::fprintf(stderr, "short read %s\n", name.c_str()); std::fclose(cf); return 1;
    }
    std::fclose(cf);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const size_t i = ((size_t)y * w + x) * 3;
        colors[s](y, x) = Pixel(buf[i], buf[i + 1], buf[i + 2]);
      }
  }

  Pool pool(threads);
  for (int dstIdx = 0; dstIdx < numDsts; ++dstIdx) {
    Level L;
    L.w = w; L.h = h;
    L.rig = rig;
    L.srcColor = colors;
    precomputeForDst(L, dstIdx, pool);

    const auto dump = [&](const cv::Mat_<float>& m, const char* tag) {
      char suffix[48];
      std::snprintf(suffix, sizeof suffix, "/disp%02d%s.f32", dstIdx, tag);
      const std::string name = outDir + suffix;
      FILE* of = std::fopen(name.c_str(), "wb");
      if (!of) { std::fprintf(stderr, "cannot open %s\n", name.c_str()); std::exit(1); }
      std::fwrite(m.ptr<float>(), 4, (size_t)h * w, of);
      std::fclose(of);
      std::fprintf(stderr, "mini_solver: wrote %s\n", name.c_str());
    };
    cv::Mat_<float> disp = bruteForceDisparity(L, dstIdx, (float)minDepth, (float)maxDepth, pool);
    dump(disp, "_bf");  // per-stage intermediates: the oracle test diffs the
    pingPongOnce(L, dstIdx, disp, (float)varNoiseFloor, pool);
    dump(disp, "_pp");  // final map; the _bf/_pp dumps localize divergence
    disp = medianFilterMasked(disp, 1);  // kMedianFilterRadius=1 (Derp.h)
    dump(disp, "");
  }
  return 0;
}

int main(int argc, char** argv) {
  const int numCams = 16;
  const int dstIdx = 0;
  int threads = (int)std::thread::hardware_concurrency();
  std::vector<int> widths = {2048, 1024, 512, 256, 200, 128, 100, 80, 60, 50};
  bool miniSolver = false;
  std::string inDir, outDir;
  for (int i = 1; i < argc; ++i) {
    const std::string a = argv[i];
    if (a == "--mini_solver") miniSolver = true;
    if (a == "--input" && i + 1 < argc) inDir = argv[++i];
    if (a == "--output" && i + 1 < argc) outDir = argv[++i];
    if (a == "--threads" && i + 1 < argc) threads = std::atoi(argv[++i]);
    if (a == "--max_width" && i + 1 < argc) {
      const int mw = std::atoi(argv[++i]);
      std::vector<int> keep;
      for (int w : widths) if (w <= mw) keep.push_back(w);
      widths = keep;
    }
  }
  cv::setNumThreads(1);  // all parallelism through the ThreadPool equivalent
  if (miniSolver) return runMiniSolver(inDir, outDir, threads);
  Pool pool(threads);

  double total = 0.0;
  std::string levelJson;
  for (size_t li = 0; li < widths.size(); ++li) {
    const int w = widths[li], h = (3 * w + 2) / 4;
    double precomputeSec = 0.0;
    Level L = buildLevel(w, h, numCams, dstIdx, pool, precomputeSec);

    const bool coarsest = (li == widths.size() - 1);
    cv::Mat_<float> cost(h, w, NAN);
    const auto t0 = std::chrono::steady_clock::now();
    if (coarsest) {
      // 150-hypothesis brute force, one task per hypothesis (Derp.cpp:288-304)
      const float minD = 1.0f / 100.0f, maxD = 1.0f / 1.0f;
      std::vector<cv::Mat_<float>> maps(kNumDepths);
      for (int i = 0; i < kNumDepths; ++i) {
        maps[i].create(h, w);
        const float f = (float)i / (kNumDepths - 1);
        const float d = f * minD + (1 - f) * maxD;  // probeDisparity
        pool.spawn([&, i, d] {
          const int r = kSearchWindowRadius;
          for (int y = r; y < h - r; ++y)
            for (int x = r; x < w - r; ++x)
              maps[i](y, x) = std::get<0>(computeCost(L, dstIdx, d, x, y));
        });
      }
      pool.join();
    } else {
      for (int e = 0; e < kRefinementEvals; ++e)
        evalFullImage(L, dstIdx, L.gtDisparity, cost, pool);
    }
    const double evalSec =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    total += evalSec + precomputeSec;
    char buf[160];
    std::snprintf(buf, sizeof buf, "%s\"%d\": {\"eval_s\": %.3f, \"precompute_s\": %.3f}",
                  li ? ", " : "", w, evalSec, precomputeSec);
    levelJson += buf;
    std::fprintf(stderr, "level %d (%dx%d): eval %.3fs precompute %.3fs\n",
                 w, w, h, evalSec, precomputeSec);
  }

  std::printf(
      "{\"metric\": \"ref_cpu_seconds_per_map\", \"value\": %.3f, \"unit\": \"s/map\", "
      "\"threads\": %d, \"levels\": {%s}}\n",
      total, threads, levelJson.c_str());
  return 0;
}
