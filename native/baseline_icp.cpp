// Single-core C++ baseline of the 2D laser tracking hot path.
//
// Re-implements (from scratch, scalar single-threaded C++ like the reference
// SRRG2 stack) the same per-frame pipeline the TPU framework runs:
//   preprocess: polar unprojection + sliding-window normals + voxel grid
//   clip:       project local-map scene to the sensor's polar canvas
//   align:      10 iterations {project moving, per-beam gate, robustified
//               point-to-plane GN, 3x3 solve}
//   merge:      per-beam merge/replace/append into the scene
// on the same synthetic workload as bench.py (721 beams, 64 frames).
//
// Emits one JSON line {"scans_per_sec": N} used as the vs_baseline anchor —
// the reference publishes no numbers (BASELINE.md), so the baseline must be
// produced by running an equivalent single-core harness.

#include <cmath>
#include <cstdio>
#include <cstdint>
#include <chrono>
#include <random>
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
static inline Pt xform(const Pose& p, const Pt& q) {
  float c = std::cos(p.t), s = std::sin(p.t);
  return {p.x + c * q.x - s * q.y, p.y + s * q.x + c * q.y,
          c * q.nx - s * q.ny, s * q.nx + c * q.ny, q.valid};
}

struct Canvas {
  std::vector<float> depth;
  std::vector<int> idx;
};

// z-buffer polar projection of cloud seen from camera pose
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

int main() {
  const int NB = 721;          // beams (reference configs)
  const int FRAMES = 64;
  const float PI = 3.14159265358979f;
  // scan model: synthetic generator's ±0.4π laser
  const float a_min = -0.4f * PI, a_max = 0.4f * PI;
  const float f_scan = NB / (a_max - a_min), c_scan = NB / 2.0f;
  // matching canvas: ±π, range [0.3, 20] (reference configs)
  const float f_m = NB / (2 * PI), c_m = NB / 2.0f;
  const float rmin_m = 0.3f, rmax_m = 20.0f;

  // ---- world: circle r=3.5 (2048) + corner (1024) at (2,0,π/4)
  std::vector<Pt> world;
  for (int i = 0; i < 2048; ++i) {
    float a = i * (2 * PI / 2048);
    world.push_back({3.5f * std::cos(a), 3.5f * std::sin(a), 0, 0, true});
  }
  {
    float step = 5.0f / 1024, c = std::cos(PI / 4), s = std::sin(PI / 4);
    for (int i = 0; i < 409; ++i) {
      float x = step * i, y = 0;
      world.push_back({2.0f + c * x - s * y, s * x + c * y, 0, 0, true});
    }
    for (int i = 1; i < 615; ++i) {
      float x = 0, y = -step * i;
      world.push_back({2.0f + c * x - s * y, s * x + c * y, 0, 0, true});
    }
  }

  // ---- trajectory + simulated ranges
  std::mt19937 rng(0);
  std::uniform_real_distribution<float> uni(-0.05f, 0.05f);
  Pose sensor_in_robot{0.2f, 0.2f, 0.1f};
  std::vector<Pose> robot(FRAMES);
  std::vector<std::vector<float>> ranges(FRAMES, std::vector<float>(NB, 0.f));
  Pose rp{0, 0, 0};
  Canvas cv;
  for (int t = 0; t < FRAMES; ++t) {
    if (t) rp = compose(rp, {uni(rng), uni(rng), uni(rng)});
    robot[t] = rp;
    Pose cam = compose(rp, sensor_in_robot);
    project(world, cam, NB, f_scan, c_scan, 0.01f, 1000.f, cv);
    for (int b = 0; b < NB; ++b)
      ranges[t][b] = cv.idx[b] >= 0 ? cv.depth[b] : 0.f;
  }

  // ---- preprocessing: unproject + sliding-window normals + voxelize
  auto preprocess = [&](const std::vector<float>& r) {
    std::vector<Pt> pts(NB);
    for (int i = 0; i < NB; ++i) {
      float a = (i - c_scan) / f_scan;
      bool v = r[i] > 0.01f && r[i] < 1000.f;
      pts[i] = {r[i] * std::cos(a), r[i] * std::sin(a), 0, 0, v};
    }
    // normals: contiguous window +-8, distance gate 0.3, min 5 points
    const int W = 8; const float d2max = 0.09f;
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
    // voxelize at 0.02 m (+normal bins)
    std::unordered_map<uint64_t, int> grid;
    std::vector<Pt> vox; std::vector<int> cnt;
    for (auto& p : out) {
      if (!p.valid) continue;
      int cx = (int)std::floor(p.x / 0.02f), cy = (int)std::floor(p.y / 0.02f);
      int nx = (int)std::floor(p.nx), ny = (int)std::floor(p.ny);
      uint64_t key = ((uint64_t)(uint32_t)cx << 40) ^ ((uint64_t)(uint32_t)cy << 16) ^
                     ((uint32_t)(nx & 0xff) << 8) ^ (uint32_t)(ny & 0xff);
      auto it = grid.find(key);
      if (it == grid.end()) { grid[key] = vox.size(); vox.push_back(p); cnt.push_back(1); }
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
  };

  std::vector<std::vector<Pt>> scans(FRAMES);
  for (int t = 0; t < FRAMES; ++t) scans[t] = preprocess(ranges[t]);

  // ---- tracking loop
  std::vector<Pt> scene;  // local-map frame
  Pose X{0, 0, 0};        // robot in local map
  Canvas cf, cm2;

  auto t0 = std::chrono::steady_clock::now();
  for (int t = 0; t < FRAMES; ++t) {
    const std::vector<Pt>& meas = scans[t];
    if (t == 0) {
      Pose cam = compose(X, sensor_in_robot);
      for (auto& p : meas) scene.push_back(xform(cam, p));
      continue;
    }
    // clip: project scene from sensor pose, keep visible, to robot frame
    Pose cam = compose(X, sensor_in_robot);
    project(scene, cam, NB, f_m, c_m, rmin_m, rmax_m, cv);
    std::vector<Pt> clipped;
    Pose inv_cam = inverse(cam);
    for (int b = 0; b < NB; ++b)
      if (cv.idx[b] >= 0)
        clipped.push_back(xform(sensor_in_robot, xform(inv_cam, scene[cv.idx[b]])));

    // align: fixed = meas (sensor frame), moving = clipped (robot frame)
    Pose T = inverse(sensor_in_robot);  // initial guess: no motion
    project(meas, {0, 0, 0}, NB, f_m, c_m, rmin_m, rmax_m, cf);
    for (int it = 0; it < 10; ++it) {
      // project moving through current estimate
      std::vector<Pt> moved(clipped.size());
      for (size_t i = 0; i < clipped.size(); ++i) moved[i] = xform(T, clipped[i]);
      project(moved, {0, 0, 0}, NB, f_m, c_m, rmin_m, rmax_m, cm2);
      double H[3][3] = {{0}}, b[3] = {0};
      int ncorr = 0;
      for (int beam = 0; beam < NB; ++beam) {
        int fi = cf.idx[beam], mi = cm2.idx[beam];
        if (fi < 0 || mi < 0) continue;
        if (std::fabs(cf.depth[beam] - cm2.depth[beam]) > 0.5f) continue;
        const Pt& pf = meas[fi]; const Pt& pm = moved[mi];
        float ndot = pf.nx * pm.nx + pf.ny * pm.ny;
        if (ndot < 0.8f) continue;
        ++ncorr;
        float e1 = pf.nx * (pm.x - pf.x) + pf.ny * (pm.y - pf.y);
        float e2 = pm.nx - pf.nx, e3 = pm.ny - pf.ny;
        float chi = e1 * e1 + e2 * e2 + e3 * e3;
        float w = chi < 0.05f ? 1.f : 0.05f / chi;  // Cauchy-style
        float j1[3] = {pf.nx, pf.ny, pf.nx * (-pm.y) + pf.ny * pm.x};
        float sx = -pm.ny, sy = pm.nx;
        for (int r = 0; r < 3; ++r) {
          for (int c2 = 0; c2 < 3; ++c2) H[r][c2] += w * j1[r] * j1[c2];
          b[r] += w * j1[r] * e1;
        }
        H[2][2] += w * (sx * sx + sy * sy);
        b[2] += w * (sx * e2 + sy * e3);
      }
      if (ncorr < 10) break;
      // 3x3 solve (Cramer)
      double det = H[0][0]*(H[1][1]*H[2][2]-H[1][2]*H[2][1])
                 - H[0][1]*(H[1][0]*H[2][2]-H[1][2]*H[2][0])
                 + H[0][2]*(H[1][0]*H[2][1]-H[1][1]*H[2][0]);
      if (std::fabs(det) < 1e-12) break;
      double inv00 = (H[1][1]*H[2][2]-H[1][2]*H[2][1])/det;
      double inv01 = (H[0][2]*H[2][1]-H[0][1]*H[2][2])/det;
      double inv02 = (H[0][1]*H[1][2]-H[0][2]*H[1][1])/det;
      double inv10 = (H[1][2]*H[2][0]-H[1][0]*H[2][2])/det;
      double inv11 = (H[0][0]*H[2][2]-H[0][2]*H[2][0])/det;
      double inv12 = (H[0][2]*H[1][0]-H[0][0]*H[1][2])/det;
      double inv20 = (H[1][0]*H[2][1]-H[1][1]*H[2][0])/det;
      double inv21 = (H[0][1]*H[2][0]-H[0][0]*H[2][1])/det;
      double inv22 = (H[0][0]*H[1][1]-H[0][1]*H[1][0])/det;
      Pose dx{(float)(-(inv00*b[0]+inv01*b[1]+inv02*b[2])),
              (float)(-(inv10*b[0]+inv11*b[1]+inv12*b[2])),
              (float)(-(inv20*b[0]+inv21*b[1]+inv22*b[2]))};
      T = compose(dx, T);
    }
    // update robot pose: X_new = X ∘ (S ∘ T)^-1
    X = compose(X, inverse(compose(sensor_in_robot, T)));

    // merge: per beam of scene/measurement canvases from measurement pose
    Pose mcam = compose(X, sensor_in_robot);
    project(scene, mcam, NB, f_m, c_m, rmin_m, rmax_m, cv);
    std::vector<Pt> meas_in_scene(meas.size());
    for (size_t i = 0; i < meas.size(); ++i) meas_in_scene[i] = xform(mcam, meas[i]);
    project(meas_in_scene, mcam, NB, f_m, c_m, rmin_m, rmax_m, cm2);
    for (int bm = 0; bm < NB; ++bm) {
      int mi = cm2.idx[bm];
      if (mi < 0 || cm2.depth[bm] > 0.9f * rmax_m) continue;
      int si = cv.idx[bm];
      const Pt& mp = meas_in_scene[mi];
      if (si < 0) { scene.push_back(mp); continue; }
      float dr = cm2.depth[bm] - cv.depth[bm];
      if (std::fabs(dr) < 0.2f) {
        Pt& sp = scene[si];
        sp.x = 0.5f * (sp.x + mp.x); sp.y = 0.5f * (sp.y + mp.y);
        sp.nx = 0.5f * (sp.nx + mp.nx); sp.ny = 0.5f * (sp.ny + mp.ny);
        float n = std::sqrt(sp.nx * sp.nx + sp.ny * sp.ny);
        if (n > 1e-12f) { sp.nx /= n; sp.ny /= n; }
      } else if (dr > 0) {
        scene[si] = mp;
      } else {
        scene.push_back(mp);
      }
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  // repeat timing with more rounds for stability
  int rounds = (int)std::max(1.0, 2.0 / std::max(secs, 1e-6));
  if (rounds > 1) {
    t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < rounds; ++r) {
      std::vector<Pt> sc2; Pose X2{0,0,0};
      for (int t = 0; t < FRAMES; ++t) {
        // identical loop body cost: rerun clip+align+merge against a copy
        const std::vector<Pt>& meas = scans[t];
        if (t == 0) { Pose cam = compose(X2, sensor_in_robot);
          for (auto& p : meas) sc2.push_back(xform(cam, p)); continue; }
        Pose cam = compose(X2, sensor_in_robot);
        project(sc2, cam, NB, f_m, c_m, rmin_m, rmax_m, cv);
        std::vector<Pt> clipped; Pose inv_cam = inverse(cam);
        for (int bb = 0; bb < NB; ++bb)
          if (cv.idx[bb] >= 0)
            clipped.push_back(xform(sensor_in_robot, xform(inv_cam, sc2[cv.idx[bb]])));
        Pose T = inverse(sensor_in_robot);
        project(meas, {0,0,0}, NB, f_m, c_m, rmin_m, rmax_m, cf);
        for (int it = 0; it < 10; ++it) {
          std::vector<Pt> moved(clipped.size());
          for (size_t i = 0; i < clipped.size(); ++i) moved[i] = xform(T, clipped[i]);
          project(moved, {0,0,0}, NB, f_m, c_m, rmin_m, rmax_m, cm2);
          double H[3][3] = {{0}}, b[3] = {0}; int ncorr = 0;
          for (int beam = 0; beam < NB; ++beam) {
            int fi = cf.idx[beam], mi = cm2.idx[beam];
            if (fi < 0 || mi < 0) continue;
            if (std::fabs(cf.depth[beam] - cm2.depth[beam]) > 0.5f) continue;
            const Pt& pf = meas[fi]; const Pt& pm = moved[mi];
            if (pf.nx * pm.nx + pf.ny * pm.ny < 0.8f) continue;
            ++ncorr;
            float e1 = pf.nx * (pm.x - pf.x) + pf.ny * (pm.y - pf.y);
            float e2 = pm.nx - pf.nx, e3 = pm.ny - pf.ny;
            float chi = e1*e1 + e2*e2 + e3*e3;
            float w = chi < 0.05f ? 1.f : 0.05f / chi;
            float j1[3] = {pf.nx, pf.ny, pf.nx * (-pm.y) + pf.ny * pm.x};
            float sx = -pm.ny, sy = pm.nx;
            for (int r2 = 0; r2 < 3; ++r2) {
              for (int c2 = 0; c2 < 3; ++c2) H[r2][c2] += w * j1[r2] * j1[c2];
              b[r2] += w * j1[r2] * e1;
            }
            H[2][2] += w * (sx*sx + sy*sy); b[2] += w * (sx*e2 + sy*e3);
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
        X2 = compose(X2, inverse(compose(sensor_in_robot, T)));
        Pose mcam = compose(X2, sensor_in_robot);
        project(sc2, mcam, NB, f_m, c_m, rmin_m, rmax_m, cv);
        std::vector<Pt> mis(meas.size());
        for (size_t i = 0; i < meas.size(); ++i) mis[i] = xform(mcam, meas[i]);
        project(mis, mcam, NB, f_m, c_m, rmin_m, rmax_m, cm2);
        for (int bm = 0; bm < NB; ++bm) {
          int mi = cm2.idx[bm];
          if (mi < 0 || cm2.depth[bm] > 0.9f * rmax_m) continue;
          int si = cv.idx[bm]; const Pt& mp = mis[mi];
          if (si < 0) { sc2.push_back(mp); continue; }
          float dr = cm2.depth[bm] - cv.depth[bm];
          if (std::fabs(dr) < 0.2f) {
            Pt& sp = sc2[si];
            sp.x = 0.5f*(sp.x+mp.x); sp.y = 0.5f*(sp.y+mp.y);
            sp.nx = 0.5f*(sp.nx+mp.nx); sp.ny = 0.5f*(sp.ny+mp.ny);
            float n = std::sqrt(sp.nx*sp.nx + sp.ny*sp.ny);
            if (n > 1e-12f) { sp.nx /= n; sp.ny /= n; }
          } else if (dr > 0) sc2[si] = mp; else sc2.push_back(mp);
        }
      }
    }
    t1 = std::chrono::steady_clock::now();
    secs = std::chrono::duration<double>(t1 - t0).count() / rounds;
  }
  std::printf("{\"scans_per_sec\": %.2f, \"frames\": %d, \"final_pose\": [%.4f, %.4f, %.4f]}\n",
              FRAMES / secs, FRAMES, X.x, X.y, X.t);
  return 0;
}
