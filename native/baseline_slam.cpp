// Single-core C++ END-TO-END SLAM baseline on the corridor dataset.
//
// Re-implements (from scratch, scalar single-threaded C++ in the style of
// the reference SRRG2 stack) the FULL per-message pipeline the TPU
// framework's chunked loop runs — the pipeline-vs-pipeline comparison the
// ">= C++ e2e" north star requires (native/baseline_icp.cpp is
// tracking-only):
//   preprocess -> track (projective ICP + odometry prior) -> split local
//   maps at 1 m -> brute-force loop closure detection per split (graph-BFS
//   candidate selection + sequential 30-iteration projective alignments +
//   the corridor-config acceptance gates) -> pose-graph GN solve
//   (matrix-free CG inner loop, anchor at map 0).
//
// Deliberate simplifications, each FAVORING the C++ wall clock (so the TPU
// "beats C++" claim stays conservative): no closure validator voting, no
// closure-time scene merging, no relocalizer (the graph just grows).
//
// Input:  corridor.jsonl (LaserMessage ranges + OdometryMessage poses,
//         io/logfile.py format). Output: one JSON line with timing + graph
//         stats, plus a TUM trajectory for the Python ATE suite
//         (bench/native_e2e.py computes the ATE with the SAME
//         BenchmarkSuite as the TPU artifact).
//
// Build: g++ -O3 -march=native -std=c++17 baseline_slam.cpp -o baseline_slam

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <deque>
#include <fstream>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

struct Pt { float x, y, nx, ny; bool valid; };
struct Pose { float x, y, t; };

static inline Pose compose(const Pose& a, const Pose& b) {
  float c = std::cos(a.t), s = std::sin(a.t);
  return {a.x + c * b.x - s * b.y, a.y + s * b.x + c * b.y,
          std::atan2(std::sin(a.t + b.t), std::cos(a.t + b.t))};
}
static inline Pose inverse(const Pose& a) {
  float c = std::cos(a.t), s = std::sin(a.t);
  return {-(c * a.x + s * a.y), -(-s * a.x + c * a.y), -a.t};
}
static inline Pose relative(const Pose& a, const Pose& b) {
  return compose(inverse(a), b);
}
static inline Pt xform(const Pose& p, const Pt& q) {
  float c = std::cos(p.t), s = std::sin(p.t);
  return {p.x + c * q.x - s * q.y, p.y + s * q.x + c * q.y,
          c * q.nx - s * q.ny, s * q.nx + c * q.ny, q.valid};
}

struct Canvas { std::vector<float> depth; std::vector<int> idx; };

static void project(const std::vector<Pt>& cloud, const Pose& cam, int cols,
                    float f, float c0, float rmin, float rmax, Canvas& cv) {
  cv.depth.assign(cols, 1e30f);
  cv.idx.assign(cols, -1);
  Pose inv = inverse(cam);
  for (size_t i = 0; i < cloud.size(); ++i) {
    if (!cloud[i].valid) continue;
    Pt q = xform(inv, cloud[i]);
    float d = std::sqrt(q.x * q.x + q.y * q.y);
    if (d < rmin || d > rmax) continue;
    float a = std::atan2(q.y, q.x);
    int col = (int)std::floor(a * f + c0);
    if (col < 0 || col >= cols) continue;
    if (d < cv.depth[col]) { cv.depth[col] = d; cv.idx[col] = (int)i; }
  }
}

// ---------------------------------------------------------------- dataset IO
// minimal JSONL reader for the two message types the pipeline consumes
static bool extract_array(const std::string& line, const char* key,
                          std::vector<float>& out) {
  size_t k = line.find(key);
  if (k == std::string::npos) return false;
  size_t a = line.find('[', k);
  if (a == std::string::npos) return false;
  size_t b = line.find(']', a);
  out.clear();
  const char* p = line.c_str() + a + 1;
  const char* end = line.c_str() + b;
  while (p < end) {
    char* next;
    float v = std::strtof(p, &next);
    if (next == p) { ++p; continue; }
    out.push_back(v);
    p = next;
  }
  return true;
}

struct Frame {
  double timestamp;
  std::vector<float> ranges;
  Pose odom;
  bool has_odom;
};

// ------------------------------------------------------------- preprocessing
// polar unprojection + sliding-window normals + 2 cm voxel grid
// (models/preprocessor.py semantics; window 16, min 5 points, gate 0.3 m)
static std::vector<Pt> preprocess(const std::vector<float>& r, float a_min,
                                  float a_inc, float rmin, float rmax) {
  int NB = (int)r.size();
  std::vector<Pt> pts(NB);
  for (int i = 0; i < NB; ++i) {
    float a = a_min + a_inc * i;
    bool v = r[i] > rmin && r[i] < rmax;
    pts[i] = {r[i] * std::cos(a), r[i] * std::sin(a), 0, 0, v};
  }
  const int W = 16; const float d2max = 0.09f;
  std::vector<Pt> out = pts;
  for (int i = 0; i < NB; ++i) {
    if (!pts[i].valid) continue;
    float sw = 1, sx = pts[i].x, sy = pts[i].y;
    float sxx = pts[i].x * pts[i].x, syy = pts[i].y * pts[i].y,
          sxy = pts[i].x * pts[i].y;
    for (int dir = -1; dir <= 1; dir += 2) {
      for (int k = 1; k <= W; ++k) {
        int j = i + dir * k;
        if (j < 0 || j >= NB || !pts[j].valid) break;
        float dx = pts[j].x - pts[i].x, dy = pts[j].y - pts[i].y;
        if (dx * dx + dy * dy > d2max) break;
        sw += 1; sx += pts[j].x; sy += pts[j].y;
        sxx += pts[j].x * pts[j].x; syy += pts[j].y * pts[j].y;
        sxy += pts[j].x * pts[j].y;
      }
    }
    if (sw < 5) { out[i].valid = false; continue; }
    float mx = sx / sw, my = sy / sw;
    float cxx = sxx / sw - mx * mx, cyy = syy / sw - my * my,
          cxy = sxy / sw - mx * my;
    float tr = cxx + cyy,
          dh = std::sqrt(std::max(0.f, (cxx - cyy) * (cxx - cyy) / 4 + cxy * cxy));
    float lmin = tr / 2 - dh;
    float vx = cxy, vy = lmin - cxx;
    float n = std::sqrt(vx * vx + vy * vy);
    if (n < 1e-12f) { vx = -(lmin - cyy); vy = cxy; n = std::sqrt(vx*vx+vy*vy); }
    if (n < 1e-12f) { out[i].valid = false; continue; }
    vx /= n; vy /= n;
    if (vx * pts[i].x + vy * pts[i].y > 0) { vx = -vx; vy = -vy; }
    out[i].nx = vx; out[i].ny = vy;
  }
  std::unordered_map<uint64_t, int> grid;
  std::vector<Pt> vox; std::vector<int> cnt;
  for (auto& p : out) {
    if (!p.valid) continue;
    int cx = (int)std::floor(p.x / 0.02f), cy = (int)std::floor(p.y / 0.02f);
    uint64_t key = ((uint64_t)(uint32_t)cx << 32) ^ (uint32_t)cy;
    auto it = grid.find(key);
    if (it == grid.end()) { grid[key] = (int)vox.size(); vox.push_back(p); cnt.push_back(1); }
    else {
      int k = it->second;
      vox[k].x += p.x; vox[k].y += p.y; vox[k].nx += p.nx; vox[k].ny += p.ny;
      cnt[k]++;
    }
  }
  for (size_t k = 0; k < vox.size(); ++k) {
    vox[k].x /= cnt[k]; vox[k].y /= cnt[k];
    float n = std::sqrt(vox[k].nx * vox[k].nx + vox[k].ny * vox[k].ny);
    if (n > 1e-12f) { vox[k].nx /= n; vox[k].ny /= n; }
  }
  return vox;
}

// ------------------------------------------------------------------ aligner
// Projective point-to-plane GN (the tracking/detection aligner role).
// fixed: cloud in its own frame; moving: cloud to be expressed in fixed's
// frame via T. Returns iterations' end T; reports correspondences/inliers.
struct AlignStats { int ncorr = 0, ninl = 0; float chi_inl = 1e30f; };

static Pose align_clouds(const std::vector<Pt>& fixed,
                         const std::vector<Pt>& moving, Pose T, int iters,
                         float point_distance, float normal_cos,
                         float chi_thr, int cols, float fm, float cm,
                         float rmin, float rmax, const Pose* prior,
                         float prior_w, AlignStats* stats, Canvas& cf,
                         Canvas& cm2) {
  project(fixed, {0, 0, 0}, cols, fm, cm, rmin, rmax, cf);
  for (int it = 0; it < iters; ++it) {
    std::vector<Pt> moved(moving.size());
    for (size_t i = 0; i < moving.size(); ++i) moved[i] = xform(T, moving[i]);
    project(moved, {0, 0, 0}, cols, fm, cm, rmin, rmax, cm2);
    double H[3][3] = {{0}}, b[3] = {0};
    int ncorr = 0, ninl = 0; double chi_in = 0;
    for (int beam = 0; beam < cols; ++beam) {
      int fi = cf.idx[beam], mi = cm2.idx[beam];
      if (fi < 0 || mi < 0) continue;
      if (std::fabs(cf.depth[beam] - cm2.depth[beam]) > point_distance) continue;
      const Pt& pf = fixed[fi]; const Pt& pm = moved[mi];
      if (pf.nx * pm.nx + pf.ny * pm.ny < normal_cos) continue;
      ++ncorr;
      float e1 = pf.nx * (pm.x - pf.x) + pf.ny * (pm.y - pf.y);
      float e2 = pm.nx - pf.nx, e3 = pm.ny - pf.ny;
      float chi = e1 * e1 + e2 * e2 + e3 * e3;
      if (chi < chi_thr) { ++ninl; chi_in += chi; }
      float w = chi < chi_thr ? 1.f : chi_thr / chi;
      float j1[3] = {pf.nx, pf.ny, pf.nx * (-pm.y) + pf.ny * pm.x};
      float sx = -pm.ny, sy = pm.nx;
      for (int r = 0; r < 3; ++r) {
        for (int c2 = 0; c2 < 3; ++c2) H[r][c2] += w * j1[r] * j1[c2];
        b[r] += w * j1[r] * e1;
      }
      H[2][2] += w * (sx * sx + sy * sy);
      b[2] += w * (sx * e2 + sy * e3);
    }
    if (stats) { stats->ncorr = ncorr; stats->ninl = ninl;
                 stats->chi_inl = ninl ? (float)(chi_in / ninl) : 1e30f; }
    if (prior) {  // odometry pull toward the predicted pose (odom_weight)
      H[0][0] += prior_w; H[1][1] += prior_w; H[2][2] += prior_w;
      b[0] += prior_w * (T.x - prior->x);
      b[1] += prior_w * (T.y - prior->y);
      b[2] += prior_w * std::atan2(std::sin(T.t - prior->t), std::cos(T.t - prior->t));
    }
    if (ncorr < 10) break;
    double det = H[0][0]*(H[1][1]*H[2][2]-H[1][2]*H[2][1])
               - H[0][1]*(H[1][0]*H[2][2]-H[1][2]*H[2][0])
               + H[0][2]*(H[1][0]*H[2][1]-H[1][1]*H[2][0]);
    if (std::fabs(det) < 1e-12) break;
    double iv[3][3] = {
      {(H[1][1]*H[2][2]-H[1][2]*H[2][1])/det, (H[0][2]*H[2][1]-H[0][1]*H[2][2])/det, (H[0][1]*H[1][2]-H[0][2]*H[1][1])/det},
      {(H[1][2]*H[2][0]-H[1][0]*H[2][2])/det, (H[0][0]*H[2][2]-H[0][2]*H[2][0])/det, (H[0][2]*H[1][0]-H[0][0]*H[1][2])/det},
      {(H[1][0]*H[2][1]-H[1][1]*H[2][0])/det, (H[0][1]*H[2][0]-H[0][0]*H[2][1])/det, (H[0][0]*H[1][1]-H[0][1]*H[1][0])/det}};
    Pose dx{(float)-(iv[0][0]*b[0]+iv[0][1]*b[1]+iv[0][2]*b[2]),
            (float)-(iv[1][0]*b[0]+iv[1][1]*b[1]+iv[1][2]*b[2]),
            (float)-(iv[2][0]*b[0]+iv[2][1]*b[1]+iv[2][2]*b[2])};
    T = compose(dx, T);
  }
  return T;
}

// ---------------------------------------------------------------- pose graph
struct Edge { int i, j; Pose z; float wxy, wth; };

static void edge_error(const std::vector<Pose>& x, const Edge& e, float* out) {
  Pose d = compose(inverse(e.z), relative(x[e.i], x[e.j]));
  out[0] = d.x; out[1] = d.y;
  out[2] = std::atan2(std::sin(d.t), std::cos(d.t));
}

// Gauss-Newton with a matrix-free CG inner solve (the CSparse global-solver
// role; numeric Jacobians, anchor = variable 0)
static void solve_graph(std::vector<Pose>& x, const std::vector<Edge>& edges,
                        int gn_iters, int cg_iters) {
  int V = (int)x.size(), E = (int)edges.size();
  const float EPS = 1e-4f;
  std::vector<float> J(E * 18);    // per-edge 3x6 Jacobian
  std::vector<float> r0(E * 3);
  std::vector<double> g(V * 3), p(V * 3), Ap(V * 3), s(V * 3), res(V * 3);
  for (int gn = 0; gn < gn_iters; ++gn) {
    // linearize
    for (int k = 0; k < E; ++k) {
      const Edge& e = edges[k];
      float base[3]; edge_error(x, e, base);
      r0[k*3+0] = base[0]; r0[k*3+1] = base[1]; r0[k*3+2] = base[2];
      for (int v = 0; v < 6; ++v) {
        std::vector<Pose>& xm = x;  // perturb in place, restore after
        int vi = v < 3 ? e.i : e.j; int c = v % 3;
        float* f = c == 0 ? &xm[vi].x : (c == 1 ? &xm[vi].y : &xm[vi].t);
        float save = *f; *f = save + EPS;
        float pe[3]; edge_error(x, e, pe);
        *f = save;
        for (int rr = 0; rr < 3; ++rr)
          J[k*18 + rr*6 + v] = (pe[rr] - base[rr]) / EPS;
      }
    }
    // gradient g = J^T W r ; Hx via per-edge products
    auto apply_H = [&](const std::vector<double>& v, std::vector<double>& out) {
      std::fill(out.begin(), out.end(), 0.0);
      for (int k = 0; k < E; ++k) {
        const Edge& e = edges[k];
        double jv[3] = {0, 0, 0};
        for (int rr = 0; rr < 3; ++rr) {
          for (int c = 0; c < 3; ++c) {
            jv[rr] += J[k*18 + rr*6 + c] * v[e.i*3 + c];
            jv[rr] += J[k*18 + rr*6 + 3 + c] * v[e.j*3 + c];
          }
        }
        double w[3] = {jv[0]*e.wxy, jv[1]*e.wxy, jv[2]*e.wth};
        for (int c = 0; c < 3; ++c) {
          double a0 = 0, a1 = 0;
          for (int rr = 0; rr < 3; ++rr) {
            a0 += J[k*18 + rr*6 + c] * w[rr];
            a1 += J[k*18 + rr*6 + 3 + c] * w[rr];
          }
          out[e.i*3 + c] += a0;
          out[e.j*3 + c] += a1;
        }
      }
      for (size_t i = 0; i < out.size(); ++i) out[i] += 1e-6 * v[i];  // damping
      for (int c = 0; c < 3; ++c) out[c] += 1e6 * v[c];               // anchor
    };
    std::fill(g.begin(), g.end(), 0.0);
    for (int k = 0; k < E; ++k) {
      const Edge& e = edges[k];
      double w[3] = {r0[k*3+0]*e.wxy, r0[k*3+1]*e.wxy, r0[k*3+2]*e.wth};
      for (int c = 0; c < 3; ++c) {
        double a0 = 0, a1 = 0;
        for (int rr = 0; rr < 3; ++rr) {
          a0 += J[k*18 + rr*6 + c] * w[rr];
          a1 += J[k*18 + rr*6 + 3 + c] * w[rr];
        }
        g[e.i*3 + c] += a0;
        g[e.j*3 + c] += a1;
      }
    }
    // CG solve H s = -g
    std::fill(s.begin(), s.end(), 0.0);
    for (size_t i = 0; i < res.size(); ++i) { res[i] = -g[i]; p[i] = res[i]; }
    double rr_old = 0;
    for (size_t i = 0; i < res.size(); ++i) rr_old += res[i]*res[i];
    for (int it = 0; it < cg_iters && rr_old > 1e-12; ++it) {
      apply_H(p, Ap);
      double pAp = 0;
      for (size_t i = 0; i < p.size(); ++i) pAp += p[i]*Ap[i];
      if (pAp <= 0) break;
      double alpha = rr_old / pAp;
      double rr_new = 0;
      for (size_t i = 0; i < s.size(); ++i) {
        s[i] += alpha * p[i];
        res[i] -= alpha * Ap[i];
        rr_new += res[i]*res[i];
      }
      double beta = rr_new / rr_old;
      rr_old = rr_new;
      for (size_t i = 0; i < p.size(); ++i) p[i] = res[i] + beta * p[i];
    }
    for (int v = 0; v < V; ++v) {
      x[v].x += (float)s[v*3+0];
      x[v].y += (float)s[v*3+1];
      x[v].t = std::atan2(std::sin(x[v].t + (float)s[v*3+2]),
                          std::cos(x[v].t + (float)s[v*3+2]));
    }
  }
}

int main(int argc, char** argv) {
  const char* in_path = argc > 1 ? argv[1] : "bench/data/corridor.jsonl";
  const char* tum_path = argc > 2 ? argv[2] : "/tmp/baseline_slam.tum";
  const float PI = 3.14159265358979f;
  // matching canvas: the corridor config's 721-beam full-2pi projection
  const int CM_COLS = 721;
  const float f_m = CM_COLS / (2 * PI), c_m = CM_COLS / 2.0f;
  const float rmin_m = 0.3f, rmax_m = 20.0f;
  // corridor-config parameters (configurations/corridor.json)
  const float SPLIT_DIST = 1.0f;
  const int DET_CAND = 4, DET_ITERS = 30;
  const float DET_PD = 1.414f, DET_NC = 0.8f, DET_CHI = 0.05f;
  const int DET_MIN_INL = 110; const float DET_RATIO = 0.6f, DET_MAX_CHI = 0.1f;

  // ---- load dataset
  std::vector<Frame> frames;
  {
    std::ifstream f(in_path);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", in_path); return 1; }
    std::string line;
    Pose last_odom{0, 0, 0}; bool has_odom = false;
    std::vector<float> tmp;
    while (std::getline(f, line)) {
      if (line.find("\"OdometryMessage\"") != std::string::npos) {
        if (extract_array(line, "\"pose\"", tmp) && tmp.size() >= 3) {
          last_odom = {tmp[0], tmp[1], tmp[2]}; has_odom = true;
        }
      } else if (line.find("\"LaserMessage\"") != std::string::npos) {
        Frame fr; fr.has_odom = has_odom; fr.odom = last_odom;
        size_t k = line.find("\"timestamp\":");
        fr.timestamp = k == std::string::npos ? 0 : std::atof(line.c_str() + k + 12);
        float a_min = 0, a_inc = 0, rmin = 0.1f, rmax = 20.f;
        if ((k = line.find("\"angle_min\":")) != std::string::npos)
          a_min = (float)std::atof(line.c_str() + k + 12);
        if ((k = line.find("\"angle_increment\":")) != std::string::npos)
          a_inc = (float)std::atof(line.c_str() + k + 18);
        if ((k = line.find("\"range_min\":")) != std::string::npos)
          rmin = (float)std::atof(line.c_str() + k + 12);
        if ((k = line.find("\"range_max\":")) != std::string::npos)
          rmax = (float)std::atof(line.c_str() + k + 12);
        if (!extract_array(line, "\"ranges\"", tmp)) continue;
        fr.ranges = tmp;
        // stash scan geometry in the frame (reuse ranges metadata per frame)
        fr.odom = fr.odom;  // no-op, clarity
        frames.push_back(std::move(fr));
        frames.back().ranges.insert(frames.back().ranges.begin(),
                                    {a_min, a_inc, rmin, rmax});
      }
    }
  }
  if (frames.empty()) { std::fprintf(stderr, "no frames\n"); return 1; }

  // ---- run the pipeline
  std::vector<std::vector<Pt>> scenes;        // per-map scenes (map frames)
  std::vector<Pose> poses;                    // per-map world poses
  std::vector<std::set<int>> adj;
  std::vector<Edge> edges;
  std::vector<Pose> traj(frames.size());
  std::vector<double> stamps(frames.size());
  int closures = 0;
  Canvas cv, cf, cm2;

  auto t0c = std::chrono::steady_clock::now();
  std::vector<Pt> scene;                      // current map scene
  Pose X{0, 0, 0};
  Pose last_odom{0, 0, 0}; bool have_last_odom = false;
  int cur = -1;

  for (size_t t = 0; t < frames.size(); ++t) {
    Frame& fr = frames[t];
    float a_min = fr.ranges[0], a_inc = fr.ranges[1],
          rmin = fr.ranges[2], rmax = fr.ranges[3];
    std::vector<float> r(fr.ranges.begin() + 4, fr.ranges.end());
    std::vector<Pt> meas = preprocess(r, a_min, a_inc, rmin, rmax);
    stamps[t] = fr.timestamp;
    if (cur < 0) {
      cur = 0; poses.push_back({0, 0, 0}); adj.emplace_back();
      scene = meas;
      traj[t] = {0, 0, 0};
      if (fr.has_odom) { last_odom = fr.odom; have_last_odom = true; }
      continue;
    }
    // ---- track: initial guess from odometry, prior toward it
    Pose T0{0, 0, 0};
    bool prior_ok = have_last_odom && fr.has_odom;
    if (prior_ok) T0 = inverse(relative(last_odom, fr.odom));
    // fixed = measurement (sensor frame), moving = scene clipped by canvas
    Pose cam = X;
    project(scene, cam, CM_COLS, f_m, c_m, rmin_m, rmax_m, cv);
    std::vector<Pt> clipped;
    Pose inv_cam = inverse(cam);
    for (int b = 0; b < CM_COLS; ++b)
      if (cv.idx[b] >= 0) clipped.push_back(xform(inv_cam, scene[cv.idx[b]]));
    AlignStats st;
    Pose T = align_clouds(meas, clipped, T0, 10, 0.5f, 0.9f, 0.01f,
                          CM_COLS, f_m, c_m, rmin_m, rmax_m,
                          prior_ok ? &T0 : nullptr, 1.0f, &st, cf, cm2);
    X = compose(X, inverse(T));
    if (fr.has_odom) { last_odom = fr.odom; have_last_odom = true; }

    // ---- merge into the scene (per-beam merge/replace/append)
    Pose mcam = X;
    project(scene, mcam, CM_COLS, f_m, c_m, rmin_m, rmax_m, cv);
    std::vector<Pt> mis(meas.size());
    for (size_t i = 0; i < meas.size(); ++i) mis[i] = xform(mcam, meas[i]);
    project(mis, mcam, CM_COLS, f_m, c_m, rmin_m, rmax_m, cm2);
    for (int bm = 0; bm < CM_COLS; ++bm) {
      int mi = cm2.idx[bm];
      if (mi < 0 || cm2.depth[bm] > 0.9f * rmax_m) continue;
      int si = cv.idx[bm];
      const Pt& mp = mis[mi];
      if (si < 0) { scene.push_back(mp); continue; }
      float dr = cm2.depth[bm] - cv.depth[bm];
      if (std::fabs(dr) < 0.2f) {
        Pt& sp = scene[si];
        sp.x = 0.5f*(sp.x+mp.x); sp.y = 0.5f*(sp.y+mp.y);
        sp.nx = 0.5f*(sp.nx+mp.nx); sp.ny = 0.5f*(sp.ny+mp.ny);
        float n = std::sqrt(sp.nx*sp.nx + sp.ny*sp.ny);
        if (n > 1e-12f) { sp.nx /= n; sp.ny /= n; }
      } else if (dr > 0) scene[si] = mp; else scene.push_back(mp);
    }
    traj[t] = compose(poses[cur], X);

    // ---- split at 1 m
    if (std::sqrt(X.x * X.x + X.y * X.y) >= SPLIT_DIST) {
      Pose new_w = compose(poses[cur], X);
      int nw = (int)poses.size();
      poses.push_back(new_w); adj.emplace_back();
      edges.push_back({cur, nw, X, 100.f, 1000.f});
      adj[cur].insert(nw); adj[nw].insert(cur);
      scenes.resize(poses.size());
      scenes[cur] = scene;                    // capture old map
      // reseed on the current measurement
      scene.clear();
      for (auto& p : meas) scene.push_back(p);
      cur = nw; X = {0, 0, 0};

      // ---- brute-force closure detection (BFS selector + gates)
      std::vector<int> dist(poses.size(), 1 << 30);
      std::deque<int> q{cur}; dist[cur] = 0;
      while (!q.empty()) {
        int u = q.front(); q.pop_front();
        for (int v : adj[u]) if (dist[v] > dist[u] + 1) {
          dist[v] = dist[u] + 1; q.push_back(v);
        }
      }
      std::vector<std::pair<float, int>> cands;
      for (int m = 0; m < (int)poses.size() - 1; ++m) {
        if (dist[m] <= 1) continue;
        float rng2 = 1.0f * 2.0f;
        if (dist[m] >= 10) rng2 += std::min(dist[m], 20) * 0.05f;
        float dx = poses[m].x - new_w.x, dy = poses[m].y - new_w.y;
        float d = std::sqrt(dx * dx + dy * dy);
        if (d <= rng2 && !scenes[m].empty()) cands.push_back({d, m});
      }
      std::sort(cands.begin(), cands.end());
      if ((int)cands.size() > DET_CAND) cands.resize(DET_CAND);
      bool added = false;
      for (auto& [d, m] : cands) {
        Pose init = relative(poses[m], poses[cur]);
        AlignStats ds;
        Pose est = align_clouds(scenes[m], scene, init, DET_ITERS, DET_PD,
                                DET_NC, DET_CHI, CM_COLS, f_m, c_m, rmin_m,
                                rmax_m, nullptr, 0.f, &ds, cf, cm2);
        if (ds.ninl < DET_MIN_INL) continue;
        if (ds.ncorr == 0 || (float)ds.ninl / ds.ncorr < DET_RATIO) continue;
        if (ds.chi_inl > DET_MAX_CHI) continue;
        if (adj[cur].count(m)) continue;
        edges.push_back({m, cur, est, 100.f, 1000.f});
        adj[m].insert(cur); adj[cur].insert(m);
        ++closures; added = true;
      }
      // ---- global solve after accepted closures (10 GN x 30 CG)
      if (added) solve_graph(poses, edges, 10, 30);
    }
  }
  auto t1c = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1c - t0c).count();

  std::FILE* tf = std::fopen(tum_path, "w");
  for (size_t t = 0; t < frames.size(); ++t) {
    float h = traj[t].t / 2;
    std::fprintf(tf, "%.6f %.6f %.6f 0.000000 0.000000 0.000000 %.6f %.6f\n",
                 stamps[t], traj[t].x, traj[t].y, std::sin(h), std::cos(h));
  }
  std::fclose(tf);

  std::printf(
      "{\"frames\": %zu, \"seconds\": %.3f, \"fps\": %.2f, "
      "\"variables\": %zu, \"factors\": %zu, \"closures\": %d, "
      "\"tum\": \"%s\"}\n",
      frames.size(), secs, frames.size() / secs, poses.size(), edges.size(),
      closures, tum_path);
  return 0;
}
