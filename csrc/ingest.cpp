// Native ingest fast path: blob -> limb-plane packing and ragged-outputs
// chunking. This is the TPU-framework counterpart of the reference's C++
// ingest layer (AccumulateInput + limb converters,
// /root/reference/src/cudasp_extension.cu:56-224) — re-designed for the
// structure-of-arrays limb layout the TPU kernels consume.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// The Python side (cudasp_tpu.io.native) falls back to vectorized numpy
// when the shared library is absent.

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int kLimbBits = 13;
constexpr int kNumLimbs = 20;
constexpr int32_t kMask = (1 << kLimbBits) - 1;

// 32 LE bytes -> 20 x 13-bit limbs for one value, strided output:
// out[limb * stride + index].
inline void relimb_one(const uint8_t* bytes, int32_t* out, int64_t stride,
                       int64_t index) {
  for (int i = 0; i < kNumLimbs; ++i) {
    const int bit = kLimbBits * i;
    const int k = bit >> 3;
    const int s = bit & 7;
    uint32_t window = bytes[k];
    if (k + 1 < 32) window |= static_cast<uint32_t>(bytes[k + 1]) << 8;
    if (k + 2 < 32) window |= static_cast<uint32_t>(bytes[k + 2]) << 16;
    out[i * stride + index] = static_cast<int32_t>((window >> s) & kMask);
  }
}

}  // namespace

extern "C" {

// tweak_blobs: n x 64 bytes (LE x || LE y).
// out_x / out_y: kNumLimbs x n int32, limb-major (limb * n + row).
void cudasp_pack_points(const uint8_t* tweak_blobs, int64_t n,
                        int32_t* out_x, int32_t* out_y) {
  for (int64_t r = 0; r < n; ++r) {
    const uint8_t* blob = tweak_blobs + r * 64;
    relimb_one(blob, out_x, n, r);
    relimb_one(blob + 32, out_y, n, r);
  }
}

// Ragged outputs (CSR) -> padded (rows x max_outputs) hi/lo planes for the
// given virtual-row expansion:
//   src[v]       — source row of virtual row v
//   chunk[v]     — chunk index within the row
// Outputs are bit-split int64 -> (hi, lo) int32 planes plus a validity mask.
void cudasp_pack_outputs(const int64_t* flat, const int64_t* offsets,
                         const int64_t* src, const int64_t* chunk,
                         int64_t n_virtual, int64_t max_outputs,
                         int32_t* out_hi, int32_t* out_lo,
                         uint8_t* out_valid) {
  for (int64_t v = 0; v < n_virtual; ++v) {
    const int64_t row = src[v];
    const int64_t begin = offsets[row] + chunk[v] * max_outputs;
    const int64_t len =
        std::min<int64_t>(offsets[row + 1] - begin, max_outputs);
    for (int64_t m = 0; m < max_outputs; ++m) {
      const bool ok = m < len;
      const uint64_t u = ok ? static_cast<uint64_t>(flat[begin + m]) : 0;
      out_hi[v * max_outputs + m] = static_cast<int32_t>(u >> 32);
      out_lo[v * max_outputs + m] = static_cast<int32_t>(u & 0xFFFFFFFFu);
      out_valid[v * max_outputs + m] = ok ? 1 : 0;
    }
  }
}

// Virtual-row expansion sizes: chunks per row, given outputs offsets.
// Returns total virtual rows; fills nch[r].
int64_t cudasp_count_chunks(const int64_t* offsets, int64_t n_rows,
                            int64_t max_outputs, int64_t* nch) {
  int64_t total = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int64_t len = offsets[r + 1] - offsets[r];
    const int64_t c = (len + max_outputs - 1) / max_outputs;
    nch[r] = c;
    total += c;
  }
  return total;
}

}  // extern "C"
