// Host-side video frame preprocessing — native equivalent of the
// reference's decord/torchvision C++ dependency layer (SURVEY.md §2.6).
//
// Fused uint8 HWC -> bilinear resize -> center crop -> affine normalize ->
// float32 HWC in one pass per output pixel (no intermediate buffers), with
// a std::thread pool across frames. Exposed via extern "C" for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpandora_preproc.so preproc.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// One output frame: bilinear sample from src (sh x sw x 3 uint8) into
// dst (dh x dw x 3 float), where the source is first virtually resized to
// (rh x rw) and then center-cropped to (dh x dw). scale/offset: per-channel
// affine on the [0,1] value.
void process_frame(const uint8_t* src, int sh, int sw,
                   float* dst, int dh, int dw, int rh, int rw,
                   const float* scale, const float* offset) {
  const int top = (rh - dh) / 2;
  const int left = (rw - dw) / 2;
  const float ys = static_cast<float>(sh) / rh;
  const float xs = static_cast<float>(sw) / rw;
  for (int y = 0; y < dh; ++y) {
    // align_corners=False bilinear source coordinate
    float fy = (y + top + 0.5f) * ys - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    float* out_row = dst + static_cast<int64_t>(y) * dw * 3;
    const uint8_t* row0 = src + static_cast<int64_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<int64_t>(y1) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + left + 0.5f) * xs - 0.5f;
      fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * row0[x0 * 3 + c] + w01 * row0[x1 * 3 + c] +
                        w10 * row1[x0 * 3 + c] + w11 * row1[x1 * 3 + c];
        out_row[x * 3 + c] = (v * (1.0f / 255.0f)) * scale[c] + offset[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Batch API: t frames, shortest-side resize semantics computed by caller as
// (rh, rw) >= (dh, dw). dst must hold t*dh*dw*3 floats.
void preprocess_frames(const uint8_t* src, int t, int sh, int sw,
                       float* dst, int dh, int dw, int rh, int rw,
                       const float* scale, const float* offset,
                       int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < t) {
      process_frame(src + static_cast<int64_t>(i) * sh * sw * 3, sh, sw,
                    dst + static_cast<int64_t>(i) * dh * dw * 3, dh, dw,
                    rh, rw, scale, offset);
    }
  };
  if (num_threads == 1 || t == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  const int n = std::min(num_threads, t);
  pool.reserve(n);
  for (int i = 0; i < n; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// uint8 [0,255] -> float32 [-1, 1], threaded memory-bound conversion
// (the (frames/255 - 0.5)*2 at data/webvid.py:175).
void u8_to_pm1(const uint8_t* src, float* dst, int64_t n, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  const int64_t chunk = (n + num_threads - 1) / num_threads;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      dst[i] = src[i] * (2.0f / 255.0f) - 1.0f;
  };
  if (num_threads == 1) {
    worker(0, n);
    return;
  }
  std::vector<std::thread> pool;
  for (int i = 0; i < num_threads; ++i) {
    int64_t lo = i * chunk, hi = std::min(n, lo + chunk);
    if (lo < hi) pool.emplace_back(worker, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
