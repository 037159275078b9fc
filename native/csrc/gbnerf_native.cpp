// gbnerf_native: host-side native runtime kernels (C++17 + OpenMP).
//
// Capability parity with the reference's native layer
// (/root/reference/DS_NeRF/torchsearchsorted/: CUDA/CPU batched binary
// search) plus the hot host-side data-path loops that the reference runs in
// per-image Python (ray-bank construction, run.py:1034-1124; COLMAP binary
// parsing, colmapUtils/read_write_model.py). The TPU compute path never
// calls these — they feed it.
//
// Exposed as a plain C ABI consumed via ctypes (gbnerf_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Batched row-wise searchsorted: for each (row, j), the insertion index of
// v[row, j] into sorted a[row_a, :], side 0 = left, 1 = right. Rows of `a`
// broadcast when ba == 1 (reference semantics, torchsearchsorted
// searchsorted.py:20-53).
// ---------------------------------------------------------------------------
void searchsorted_f32(const float* a, int64_t ba, int64_t na,
                      const float* v, int64_t bv, int64_t nv,
                      int32_t* out, int side) {
#pragma omp parallel for schedule(static)
  for (int64_t row = 0; row < bv; ++row) {
    const float* arow = a + (ba == 1 ? 0 : row) * na;
    const float* vrow = v + row * nv;
    int32_t* orow = out + row * nv;
    for (int64_t j = 0; j < nv; ++j) {
      const float x = vrow[j];
      int64_t lo = 0, hi = na;
      while (lo < hi) {
        const int64_t mid = (lo + hi) >> 1;
        const bool go_right = side ? (arow[mid] <= x) : (arow[mid] < x);
        if (go_right) lo = mid + 1; else hi = mid;
      }
      orow[j] = static_cast<int32_t>(lo);
    }
  }
}

// ---------------------------------------------------------------------------
// Full-image pinhole ray generation for a batch of cameras.
// poses: [n, 12] row-major 3x4 c2w. Outputs [n, H*W, 3] each.
// dirs convention matches run_nerf_helpers.get_rays_np.
// ---------------------------------------------------------------------------
void build_rays_f32(const float* poses, int64_t n, int64_t H, int64_t W,
                    float focal, float* rays_o, float* rays_d) {
#pragma omp parallel for schedule(static)
  for (int64_t k = 0; k < n; ++k) {
    const float* c2w = poses + k * 12;  // rows of [3, 4]
    const float ox = c2w[3], oy = c2w[7], oz = c2w[11];
    float* od = rays_d + k * H * W * 3;
    float* oo = rays_o + k * H * W * 3;
    for (int64_t y = 0; y < H; ++y) {
      for (int64_t x = 0; x < W; ++x) {
        const float dx = (static_cast<float>(x) - W * 0.5f) / focal;
        const float dy = -(static_cast<float>(y) - H * 0.5f) / focal;
        const float dz = -1.0f;
        const int64_t p = (y * W + x) * 3;
        od[p + 0] = c2w[0] * dx + c2w[1] * dy + c2w[2] * dz;
        od[p + 1] = c2w[4] * dx + c2w[5] * dy + c2w[6] * dz;
        od[p + 2] = c2w[8] * dx + c2w[9] * dy + c2w[10] * dz;
        oo[p + 0] = ox; oo[p + 1] = oy; oo[p + 2] = oz;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin parsing. Two-pass C ABI: first count, then fill
// caller-allocated arrays.
// Record: id u64 | xyz 3xd | rgb 3xu8 | error d | track_len u64 |
//         (image_id i32, point2d_idx i32) x track_len
// ---------------------------------------------------------------------------
static inline uint64_t rd_u64(const uint8_t*& p) {
  uint64_t v; std::memcpy(&v, p, 8); p += 8; return v;
}
static inline double rd_f64(const uint8_t*& p) {
  double v; std::memcpy(&v, p, 8); p += 8; return v;
}
static inline int32_t rd_i32(const uint8_t*& p) {
  int32_t v; std::memcpy(&v, p, 4); p += 4; return v;
}

int colmap_points3d_stats(const char* path, int64_t* n_points,
                          int64_t* total_track) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f); return -2;
  }
  std::fclose(f);
  const uint8_t* p = buf.data();
  const uint64_t n = rd_u64(p);
  uint64_t tracks = 0;
  for (uint64_t i = 0; i < n; ++i) {
    p += 8 + 24 + 3 + 8;  // id, xyz, rgb, error
    const uint64_t tl = rd_u64(p);
    tracks += tl;
    p += tl * 8;
  }
  *n_points = static_cast<int64_t>(n);
  *total_track = static_cast<int64_t>(tracks);
  return 0;
}

int colmap_read_points3d(const char* path,
                         int64_t* ids, double* xyz, uint8_t* rgb,
                         double* error, int64_t* track_offsets,
                         int32_t* track_image_ids, int32_t* track_p2d) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f); return -2;
  }
  std::fclose(f);
  const uint8_t* p = buf.data();
  const uint64_t n = rd_u64(p);
  int64_t toff = 0;
  for (uint64_t i = 0; i < n; ++i) {
    ids[i] = static_cast<int64_t>(rd_u64(p));
    xyz[i * 3 + 0] = rd_f64(p);
    xyz[i * 3 + 1] = rd_f64(p);
    xyz[i * 3 + 2] = rd_f64(p);
    rgb[i * 3 + 0] = *p++; rgb[i * 3 + 1] = *p++; rgb[i * 3 + 2] = *p++;
    error[i] = rd_f64(p);
    const uint64_t tl = rd_u64(p);
    track_offsets[i] = toff;
    for (uint64_t t = 0; t < tl; ++t) {
      track_image_ids[toff] = rd_i32(p);
      track_p2d[toff] = rd_i32(p);
      ++toff;
    }
  }
  track_offsets[n] = toff;
  return 0;
}

}  // extern "C"
