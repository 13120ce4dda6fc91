// Native data loader: bulk CARMEN log parsing into flat arrays.
//
// The reference's data path is C++ (srrg2_core message sources feeding the
// pipeline, SURVEY.md §2.2 'Message/source pipeline'); this library is the
// TPU framework's native equivalent: it parses a whole CARMEN log in one
// pass into contiguous buffers (ranges matrix, poses, timestamps) that the
// Python side wraps as NumPy arrays and ships to the device in bulk — no
// per-message Python overhead on the ingest path.
//
// C ABI (ctypes):
//   void* carmen_open(const char* path)         -> handle (NULL on error)
//   int   carmen_num_scans(void* h)
//   int   carmen_num_beams(void* h)             (max beams across scans)
//   void  carmen_fill(void* h, float* ranges, float* laser_pose,
//                     float* odom_pose, double* timestamp, float* meta)
//         ranges:     [num_scans * num_beams] (padded with -1)
//         laser_pose: [num_scans * 3], odom_pose: [num_scans * 3]
//         timestamp:  [num_scans], meta: [num_scans * 4] = (n, angle_min,
//                     fov, range_max)
//   void  carmen_close(void* h)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 dataloader.cpp -o libdataloader.so

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Scan {
  std::vector<float> ranges;
  float laser_pose[3];
  float odom_pose[3];
  double timestamp;
  float angle_min;
  float fov;
  float range_max;
};

struct Log {
  std::vector<Scan> scans;
  int max_beams = 0;
};

constexpr float kPi = 3.14159265358979f;

}  // namespace

extern "C" {

void* carmen_open(const char* path) {
  std::ifstream f(path);
  if (!f.is_open()) return nullptr;
  auto* log = new Log();
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string tag;
    ss >> tag;
    if (tag == "FLASER") {
      int n;
      if (!(ss >> n) || n <= 0) continue;
      Scan s;
      s.ranges.resize(n);
      bool ok = true;
      for (int i = 0; i < n; ++i)
        if (!(ss >> s.ranges[i])) { ok = false; break; }
      if (!ok) continue;
      ss >> s.laser_pose[0] >> s.laser_pose[1] >> s.laser_pose[2];
      ss >> s.odom_pose[0] >> s.odom_pose[1] >> s.odom_pose[2];
      if (!(ss >> s.timestamp)) s.timestamp = 0.0;
      s.angle_min = -kPi / 2;
      s.fov = kPi;
      s.range_max = 80.0f;
      log->max_beams = std::max(log->max_beams, n);
      log->scans.push_back(std::move(s));
    } else if (tag == "ROBOTLASER1") {
      int type;
      float start, fov, res, rng_max, acc;
      int rem, n;
      if (!(ss >> type >> start >> fov >> res >> rng_max >> acc >> rem >> n) || n <= 0)
        continue;
      Scan s;
      s.ranges.resize(n);
      bool ok = true;
      for (int i = 0; i < n; ++i)
        if (!(ss >> s.ranges[i])) { ok = false; break; }
      if (!ok) continue;
      int n_rem;
      ss >> n_rem;
      for (int i = 0; i < n_rem; ++i) { float tmp; ss >> tmp; }
      ss >> s.laser_pose[0] >> s.laser_pose[1] >> s.laser_pose[2];
      ss >> s.odom_pose[0] >> s.odom_pose[1] >> s.odom_pose[2];
      // skip tv rv forward side turn timeout-ish fields then timestamp
      double vals[6];
      for (int i = 0; i < 5; ++i) ss >> vals[i];
      if (!(ss >> s.timestamp)) s.timestamp = 0.0;
      s.angle_min = start;
      s.fov = fov;
      s.range_max = rng_max;
      log->max_beams = std::max(log->max_beams, n);
      log->scans.push_back(std::move(s));
    }
  }
  return log;
}

int carmen_num_scans(void* h) { return h ? (int)((Log*)h)->scans.size() : 0; }
int carmen_num_beams(void* h) { return h ? ((Log*)h)->max_beams : 0; }

void carmen_fill(void* h, float* ranges, float* laser_pose, float* odom_pose,
                 double* timestamp, float* meta) {
  if (!h) return;
  Log* log = (Log*)h;
  const int nb = log->max_beams;
  for (size_t k = 0; k < log->scans.size(); ++k) {
    const Scan& s = log->scans[k];
    float* r = ranges + k * nb;
    for (int i = 0; i < nb; ++i)
      r[i] = i < (int)s.ranges.size() ? s.ranges[i] : -1.0f;
    std::memcpy(laser_pose + k * 3, s.laser_pose, 3 * sizeof(float));
    std::memcpy(odom_pose + k * 3, s.odom_pose, 3 * sizeof(float));
    timestamp[k] = s.timestamp;
    meta[k * 4 + 0] = (float)s.ranges.size();
    meta[k * 4 + 1] = s.angle_min;
    meta[k * 4 + 2] = s.fov;
    meta[k * 4 + 3] = s.range_max;
  }
}

void carmen_close(void* h) { delete (Log*)h; }

}  // extern "C"
