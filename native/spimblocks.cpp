// Native runtime: block decomposition + threaded raw-volume block IO.
//
// The TPU-native analog of the reference's CUDA-era native layer
// (SURVEY.md section 2.8: Block / BlockGenerator / BlockGeneratorFixedSizePrecise
// plus the JNA array shuttling): block decomposition with kernel-support
// halos for larger-than-memory volumes, and multi-threaded strided block
// reads/writes against raw float32 volumes on disk (the streaming store
// feeding the device pipeline). Exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libspimblocks.so spimblocks.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>

extern "C" {

// One block record (18 int64s): interior (out) range [out_lo, out_hi),
// padded (in) range [in_lo, in_hi) clamped to the volume, and how much
// halo was clipped at each face (pad_lo / pad_hi, to be mirror-filled by
// the caller).
struct BlockRec {
  int64_t out_lo[3];
  int64_t out_hi[3];
  int64_t in_lo[3];
  int64_t in_hi[3];
  int64_t pad_lo[3];
  int64_t pad_hi[3];
};

// Decompose dims into blocks of `block` interior size with `halo` overlap.
// Writes up to max_blocks records; returns the number of blocks (or -1 if
// max_blocks is too small). Mirrors BlockGeneratorFixedSizePrecise: every
// interior voxel belongs to exactly one block; halos overlap.
int64_t spim_block_decompose(const int64_t dims[3], const int64_t block[3],
                             const int64_t halo[3], BlockRec* out,
                             int64_t max_blocks) {
  int64_t n[3];
  for (int d = 0; d < 3; ++d) {
    n[d] = (dims[d] + block[d] - 1) / block[d];
  }
  int64_t total = n[0] * n[1] * n[2];
  if (out == nullptr) return total;
  if (total > max_blocks) return -1;
  int64_t idx = 0;
  for (int64_t bz = 0; bz < n[0]; ++bz)
    for (int64_t by = 0; by < n[1]; ++by)
      for (int64_t bx = 0; bx < n[2]; ++bx) {
        BlockRec& r = out[idx++];
        int64_t b[3] = {bz, by, bx};
        for (int d = 0; d < 3; ++d) {
          r.out_lo[d] = b[d] * block[d];
          r.out_hi[d] = std::min(r.out_lo[d] + block[d], dims[d]);
          int64_t want_lo = r.out_lo[d] - halo[d];
          int64_t want_hi = r.out_hi[d] + halo[d];
          r.in_lo[d] = std::max<int64_t>(want_lo, 0);
          r.in_hi[d] = std::min<int64_t>(want_hi, dims[d]);
          r.pad_lo[d] = r.in_lo[d] - want_lo;
          r.pad_hi[d] = want_hi - r.in_hi[d];
        }
      }
  return total;
}

// Threaded strided block read from a raw little-endian float32 volume
// file of shape dims (C order, z slowest). Reads [lo, hi) into dst
// (contiguous block of shape hi-lo). Returns 0 on success.
int spim_read_block_f32(const char* path, const int64_t dims[3],
                        const int64_t lo[3], const int64_t hi[3],
                        float* dst, int n_threads) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  const int64_t bz = hi[0] - lo[0], by = hi[1] - lo[1], bx = hi[2] - lo[2];
  if (bz <= 0 || by <= 0 || bx <= 0) { close(fd); return -2; }
  const int64_t row_bytes = bx * (int64_t)sizeof(float);
  std::atomic<int64_t> next_z{0};
  std::atomic<int> err{0};
  int nt = std::max(1, std::min<int>(n_threads, (int)bz));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      for (;;) {
        int64_t zi = next_z.fetch_add(1);
        if (zi >= bz || err.load()) break;
        int64_t z = lo[0] + zi;
        for (int64_t yi = 0; yi < by; ++yi) {
          int64_t y = lo[1] + yi;
          int64_t off = ((z * dims[1] + y) * dims[2] + lo[2]) *
                        (int64_t)sizeof(float);
          float* p = dst + (zi * by + yi) * bx;
          ssize_t got = pread(fd, p, row_bytes, off);
          if (got != (ssize_t)row_bytes) { err.store(1); break; }
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  close(fd);
  return err.load() ? -3 : 0;
}

// Threaded strided block write (file must be pre-sized; see
// spim_create_raw_f32). Returns 0 on success.
int spim_write_block_f32(const char* path, const int64_t dims[3],
                         const int64_t lo[3], const int64_t hi[3],
                         const float* src, int n_threads) {
  int fd = open(path, O_WRONLY);
  if (fd < 0) return -1;
  const int64_t bz = hi[0] - lo[0], by = hi[1] - lo[1], bx = hi[2] - lo[2];
  if (bz <= 0 || by <= 0 || bx <= 0) { close(fd); return -2; }
  const int64_t row_bytes = bx * (int64_t)sizeof(float);
  std::atomic<int64_t> next_z{0};
  std::atomic<int> err{0};
  int nt = std::max(1, std::min<int>(n_threads, (int)bz));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&]() {
      for (;;) {
        int64_t zi = next_z.fetch_add(1);
        if (zi >= bz || err.load()) break;
        int64_t z = lo[0] + zi;
        for (int64_t yi = 0; yi < by; ++yi) {
          int64_t y = lo[1] + yi;
          int64_t off = ((z * dims[1] + y) * dims[2] + lo[2]) *
                        (int64_t)sizeof(float);
          const float* p = src + (zi * by + yi) * bx;
          ssize_t put = pwrite(fd, p, row_bytes, off);
          if (put != (ssize_t)row_bytes) { err.store(1); break; }
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  close(fd);
  return err.load() ? -3 : 0;
}

// Create (or truncate) a raw f32 volume file of the given dims.
int spim_create_raw_f32(const char* path, const int64_t dims[3]) {
  int fd = open(path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  int64_t bytes = dims[0] * dims[1] * dims[2] * (int64_t)sizeof(float);
  int rc = ftruncate(fd, bytes);
  close(fd);
  return rc ? -2 : 0;
}

}  // extern "C"
