// Native host-side batch assembly for the input pipeline.
//
// The reference leans on compiled code in its dependencies for the data path
// (h5py's HDF5 C core + torch DataLoader workers, SURVEY.md section 2.2).
// This is the TPU rebuild's native equivalent: the per-step hot host op is
// "gather a shuffled batch of rows from large columnar int32/float32 arrays"
// (replacing torch's TensorDataset indexing).  numpy fancy-indexing is
// single-threaded; these routines parallelize the row gather with OpenMP and
// fuse multi-column assembly into one pass so one call builds the whole
// [B, num_cols] sparse matrix the trainer feeds to the device.
//
// Exposed via ctypes (no pybind11 in this image); see native/__init__.py.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// dst[i, :] = src[idx[i], :] for row_bytes-wide rows.
void gather_rows(const char* src, const int64_t* idx, char* dst,
                 int64_t n_rows, int64_t row_bytes) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes, row_bytes);
  }
}

// Fused multi-column gather: for each of n_cols int32 source columns
// (each a contiguous [n_src] array), write dst[i, c] = cols[c][idx[i]].
// Builds the packed [B, n_cols] sparse batch in one parallel pass.
void gather_columns_i32(const int32_t* const* cols, int64_t n_cols,
                        const int64_t* idx, int32_t* dst, int64_t n_rows) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t r = idx[i];
    int32_t* out = dst + i * n_cols;
    for (int64_t c = 0; c < n_cols; ++c) {
      out[c] = cols[c][r];
    }
  }
}

// Same for float32 columns (dense features).
void gather_columns_f32(const float* const* cols, int64_t n_cols,
                        const int64_t* idx, float* dst, int64_t n_rows) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_rows; ++i) {
    const int64_t r = idx[i];
    float* out = dst + i * n_cols;
    for (int64_t c = 0; c < n_cols; ++c) {
      out[c] = cols[c][r];
    }
  }
}

// In-place Fisher-Yates shuffle of an int64 index array with a
// SplitMix64-seeded xorshift generator - a fast parallel-friendly host
// shuffle for epoch permutations (numpy's is fine but single-threaded for
// very large n; this keeps the whole input path native).
static inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void shuffle_indices(int64_t* idx, int64_t n, uint64_t seed) {
  uint64_t s = seed;
  for (int64_t i = n - 1; i > 0; --i) {
    const uint64_t j = splitmix64(&s) % static_cast<uint64_t>(i + 1);
    const int64_t t = idx[i];
    idx[i] = idx[j];
    idx[j] = t;
  }
}

int omp_thread_count() {
#ifdef _OPENMP
  int n = 0;
#pragma omp parallel reduction(+ : n)
  n += 1;
  return n;
#else
  return 1;
#endif
}

}  // extern "C"
