// Native host-side data path for the VoD streaming pipeline.
//
// The reference does all of this in per-frame Python (np.fromfile loads,
// numpy homogeneous transforms, open3d oriented-box point tests —
// src/vod/frame/data_loader.py:164-198, transformations.py:284-295,
// src/models/utils/track4d_utils.py:105-176). At multi-stream training
// rates the host must assemble dp x scan_frames padded records per
// dispatch, so the hot per-point loops live here: binary scan decode,
// homogeneous transforms, ego compensation, and the oriented-bounding-box
// membership test. Exposed as a plain C ABI for ctypes.
//
// Build: `make -C native` → native/libvod_native.so.

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Decode a float32 binary scan file with `stride` floats per point into
// `out` (capacity max_pts * stride). Returns the number of points read,
// or -1 on open failure, -2 if the byte size is not a multiple of the
// point record size. Points beyond max_pts are dropped (caller decides
// subsampling policy before padding).
int vod_decode_scan(const char* path, float* out, int max_pts, int stride) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const long rec = (long)stride * 4;
  if (bytes % rec != 0) {
    std::fclose(f);
    return -2;
  }
  long n = bytes / rec;
  if (n > max_pts) n = max_pts;
  size_t got = std::fread(out, rec, (size_t)n, f);
  std::fclose(f);
  return (int)got;
}

// out[i] = (T @ [p_i, 1])[0:3] for a row-major 4x4 T. in == out allowed.
void vod_transform_points(const float* pts, int n, const double* t,
                          float* out) {
  for (int i = 0; i < n; ++i) {
    const double x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    const double ox = t[0] * x + t[1] * y + t[2] * z + t[3];
    const double oy = t[4] * x + t[5] * y + t[6] * z + t[7];
    const double oz = t[8] * x + t[9] * y + t[10] * z + t[11];
    out[3 * i] = (float)ox;
    out[3 * i + 1] = (float)oy;
    out[3 * i + 2] = (float)oz;
  }
}

// Ego compensation, reference convention (track_vod_3d.py:114-115):
// out_i = (hom(p_i) @ inv(T^T))[0:3]. The caller passes inv(T^T)
// row-major; the multiply is p_hom (row vector) times the matrix.
void vod_compensate_ego(const float* pts, int n, const double* m,
                        float* out) {
  for (int i = 0; i < n; ++i) {
    const double x = pts[3 * i], y = pts[3 * i + 1], z = pts[3 * i + 2];
    out[3 * i] = (float)(x * m[0] + y * m[4] + z * m[8] + m[12]);
    out[3 * i + 1] = (float)(x * m[1] + y * m[5] + z * m[9] + m[13]);
    out[3 * i + 2] = (float)(x * m[2] + y * m[6] + z * m[10] + m[14]);
  }
}

// Closed oriented-box membership: |R^T (p - c)| <= extent/2 + eps.
// R row-major 3x3, extent full lengths. Writes 0/1 into out. Returns the
// inside count.
int vod_points_in_obb(const float* pts, int n, const double* center,
                      const double* rot, const double* extent, double eps,
                      uint8_t* out) {
  const double hx = extent[0] * 0.5 + eps;
  const double hy = extent[1] * 0.5 + eps;
  const double hz = extent[2] * 0.5 + eps;
  int count = 0;
  for (int i = 0; i < n; ++i) {
    const double dx = pts[3 * i] - center[0];
    const double dy = pts[3 * i + 1] - center[1];
    const double dz = pts[3 * i + 2] - center[2];
    // local = R^T d  (column j of R dotted with d)
    const double lx = rot[0] * dx + rot[3] * dy + rot[6] * dz;
    const double ly = rot[1] * dx + rot[4] * dy + rot[7] * dz;
    const double lz = rot[2] * dx + rot[5] * dy + rot[8] * dz;
    const bool in = (lx <= hx && lx >= -hx) && (ly <= hy && ly >= -hy) &&
                    (lz <= hz && lz >= -hz);
    out[i] = in ? 1 : 0;
    count += in ? 1 : 0;
  }
  return count;
}

// Pad/truncate an (n, c) float array into an (n_max, c) zeroed buffer and
// fill the validity mask. Returns the number of copied rows.
int vod_pad_cloud(const float* src, int n, int c, int n_max, float* dst,
                  uint8_t* mask) {
  const int keep = n < n_max ? n : n_max;
  std::memset(dst, 0, (size_t)n_max * c * sizeof(float));
  std::memset(mask, 0, (size_t)n_max);
  std::memcpy(dst, src, (size_t)keep * c * sizeof(float));
  for (int i = 0; i < keep; ++i) mask[i] = 1;
  return keep;
}

}  // extern "C"
