// Native host-side engine: coordinate hashing, kernel maps, radius search.
//
// The reference delegates these exact capabilities to external C++ libraries
// (MinkowskiEngine's coordinate manager for sparse_quantize/kernel maps,
// Open3D/scipy KD-trees for GT radius matching — SURVEY.md section 2.2).
// Device-side equivalents live in deepglobalregistration_tpu/ops (jittable,
// used by the TPU compute path); this library serves the *host* data pipeline
// (dataset voxelization, GT correspondence labeling over 100k+ LiDAR points)
// where a C++ hash map beats numpy by an order of magnitude.
//
// Exposed through ctypes (deepglobalregistration_tpu/native/__init__.py).
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp dgr_host.cpp -o libdgr_host.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

// 64-bit mix (splitmix64 finalizer) over packed coordinate words.
inline uint64_t mix64(uint64_t x) {
  x ^= x >> 30;
  x *= 0xbf58476d1ce4e5b9ULL;
  x ^= x >> 27;
  x *= 0x94d049bb133111ebULL;
  x ^= x >> 31;
  return x;
}

struct CoordKey {
  int32_t c[8];  // up to 8 dims
  int d;
  bool operator==(const CoordKey& o) const {
    return std::memcmp(c, o.c, sizeof(int32_t) * d) == 0;
  }
};

struct CoordHash {
  size_t operator()(const CoordKey& k) const {
    uint64_t h = 0x9e3779b97f4a7c15ULL;
    for (int i = 0; i < k.d; ++i) h = mix64(h ^ (uint64_t)(uint32_t)k.c[i]);
    return (size_t)h;
  }
};

using CoordMap = std::unordered_map<CoordKey, int32_t, CoordHash>;

CoordMap build_map(const int32_t* coords, int64_t n, int d) {
  CoordMap map;
  map.reserve((size_t)n * 2);
  for (int64_t i = 0; i < n; ++i) {
    CoordKey k{};
    k.d = d;
    std::memcpy(k.c, coords + i * d, sizeof(int32_t) * d);
    map.emplace(k, (int32_t)i);  // keeps the smallest index (first insert wins)
  }
  return map;
}

}  // namespace

extern "C" {

// Deduplicate coordinate rows; keeps the smallest-index representative.
// coords [n, d] -> out_coords [<=n, d], src_idx [<=n]; returns num_unique.
int64_t dgr_unique_rows(const int32_t* coords, int64_t n, int d,
                        int32_t* out_coords, int32_t* src_idx) {
  CoordMap map = build_map(coords, n, d);
  // Representatives in original-index order.
  std::vector<int32_t> reps;
  reps.reserve(map.size());
  for (int64_t i = 0; i < n; ++i) {
    CoordKey k{};
    k.d = d;
    std::memcpy(k.c, coords + i * d, sizeof(int32_t) * d);
    if (map.at(k) == (int32_t)i) reps.push_back((int32_t)i);
  }
  for (size_t u = 0; u < reps.size(); ++u) {
    std::memcpy(out_coords + u * d, coords + (int64_t)reps[u] * d,
                sizeof(int32_t) * d);
    src_idx[u] = reps[u];
  }
  return (int64_t)reps.size();
}

// Quantize points to a voxel grid: floor(xyz/voxel) + dedup.
// xyz [n, 3] float -> out_xyz [<=n, 3], out_coords [<=n, 3]; returns count.
int64_t dgr_voxelize(const float* xyz, int64_t n, double voxel_size,
                     float* out_xyz, int32_t* out_coords) {
  std::vector<int32_t> coords((size_t)n * 3);
  for (int64_t i = 0; i < n; ++i)
    for (int j = 0; j < 3; ++j)
      coords[i * 3 + j] = (int32_t)std::floor((double)xyz[i * 3 + j] / voxel_size);
  std::vector<int32_t> uc((size_t)n * 3), src((size_t)n);
  int64_t m = dgr_unique_rows(coords.data(), n, 3, uc.data(), src.data());
  for (int64_t u = 0; u < m; ++u) {
    std::memcpy(out_xyz + u * 3, xyz + (int64_t)src[u] * 3, sizeof(float) * 3);
    std::memcpy(out_coords + u * 3, uc.data() + u * 3, sizeof(int32_t) * 3);
  }
  return m;
}

// Kernel map: kmap[k_idx * n_out + j] = row index of in_coords equal to
// out_coords[j] + sign * offsets[k_idx] * unit, or -1.
void dgr_kernel_map(const int32_t* in_coords, int64_t n_in,
                    const int32_t* out_coords, int64_t n_out, int d,
                    const int32_t* offsets, int64_t k, int32_t unit,
                    int32_t sign, int32_t* kmap) {
  CoordMap map = build_map(in_coords, n_in, d);
#pragma omp parallel for schedule(static)
  for (int64_t j = 0; j < n_out; ++j) {
    CoordKey q{};
    q.d = d;
    for (int64_t ki = 0; ki < k; ++ki) {
      for (int i = 0; i < d; ++i)
        q.c[i] = out_coords[j * d + i] + sign * offsets[ki * d + i] * unit;
      auto it = map.find(q);
      kmap[ki * n_out + j] = (it == map.end()) ? -1 : it->second;
    }
  }
}

// Radius pairs via voxel-grid hashing: all (i, j) with
// |src[i] @ R^T + t - tgt[j]| <= radius. Returns the pair count (capped at
// max_pairs; pairs beyond the cap are dropped).
int64_t dgr_radius_pairs(const float* src, int64_t n_src, const float* tgt,
                         int64_t n_tgt, const float* rot /*3x3 row major*/,
                         const float* trans /*3*/, double radius,
                         int32_t* pairs /*[max_pairs, 2]*/, int64_t max_pairs) {
  const double cell = radius;
  CoordMap head;  // voxel -> first tgt index in chain
  head.reserve((size_t)n_tgt * 2);
  std::vector<int32_t> next((size_t)n_tgt, -1);
  auto cell_of = [&](const float* p) {
    CoordKey k{};
    k.d = 3;
    for (int i = 0; i < 3; ++i) k.c[i] = (int32_t)std::floor((double)p[i] / cell);
    return k;
  };
  for (int64_t j = 0; j < n_tgt; ++j) {
    CoordKey k = cell_of(tgt + j * 3);
    auto it = head.find(k);
    if (it == head.end()) {
      head.emplace(k, (int32_t)j);
    } else {
      next[j] = it->second;  // prepend
      it->second = (int32_t)j;
    }
  }
  const double r2 = radius * radius;
  int64_t count = 0;
  for (int64_t i = 0; i < n_src; ++i) {
    float m[3];
    for (int a = 0; a < 3; ++a)
      m[a] = rot[a * 3] * src[i * 3] + rot[a * 3 + 1] * src[i * 3 + 1] +
             rot[a * 3 + 2] * src[i * 3 + 2] + trans[a];
    CoordKey base = cell_of(m);
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          CoordKey k = base;
          k.c[0] += dx;
          k.c[1] += dy;
          k.c[2] += dz;
          auto it = head.find(k);
          if (it == head.end()) continue;
          for (int32_t j = it->second; j >= 0; j = next[j]) {
            double d2 = 0;
            for (int a = 0; a < 3; ++a) {
              double diff = (double)m[a] - (double)tgt[j * 3 + a];
              d2 += diff * diff;
            }
            if (d2 <= r2 && count < max_pairs) {
              pairs[count * 2] = (int32_t)i;
              pairs[count * 2 + 1] = j;
              ++count;
            }
          }
        }
  }
  return count;
}

}  // extern "C"
