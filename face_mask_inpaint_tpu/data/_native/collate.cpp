// Native data-path kernels for the host-side input pipeline.
//
// TPU-native counterpart of the runtime work torch's C++ DataLoader workers
// did for the reference (dataloader.py num_workers=4 + pin_memory): batch
// collation, uint8 -> float conversion, (x-0.5)/0.5 normalization, and
// binary-mask extraction run here as multithreaded C++ over raw buffers, so
// the Python loader thread only orchestrates.
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in this
// image). All functions operate on contiguous NHWC buffers.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(i) for i in [0, n) across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  int workers = static_cast<int>(std::thread::hardware_concurrency());
  if (workers <= 1 || n < 4) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  if (workers > n) workers = static_cast<int>(n);
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// Stack `count` uint8 HWC images (each h*w*c bytes, given as an array of
// pointers) into one float32 NHWC batch, scaling by 1/255 and optionally
// normalizing to [-1, 1] ((x - 0.5) / 0.5), matching dataloader.py:88 and
// the transforms.Normalize(0.5, 0.5) path (dataloader.py:168-170).
void collate_images_u8(const uint8_t** images, int64_t count, int64_t h,
                       int64_t w, int64_t c, int normalize, float* out) {
  const int64_t px = h * w * c;
  parallel_for(count, [&](int64_t i) {
    const uint8_t* src = images[i];
    float* dst = out + i * px;
    if (normalize) {
      // (x/255 - 0.5) / 0.5 == x * (2/255) - 1
      constexpr float kScale = 2.0f / 255.0f;
      for (int64_t j = 0; j < px; ++j) dst[j] = src[j] * kScale - 1.0f;
    } else {
      constexpr float kScale = 1.0f / 255.0f;
      for (int64_t j = 0; j < px; ++j) dst[j] = src[j] * kScale;
    }
  });
}

// Stack `count` int64 HW masks into an int32 batch, binarized (mask > 0) —
// the (true_masks > 0).long() step every trainer applies
// (train_mask_detector.py:128, train_reference_fill.py:339).
void collate_masks_i64(const int64_t** masks, int64_t count, int64_t h,
                       int64_t w, int binarize, int32_t* out) {
  const int64_t px = h * w;
  parallel_for(count, [&](int64_t i) {
    const int64_t* src = masks[i];
    int32_t* dst = out + i * px;
    if (binarize) {
      for (int64_t j = 0; j < px; ++j) dst[j] = src[j] > 0 ? 1 : 0;
    } else {
      for (int64_t j = 0; j < px; ++j) dst[j] = static_cast<int32_t>(src[j]);
    }
  });
}

// Stack float32 HWC items (already preprocessed) into an NHWC batch —
// the plain np.stack fallback path, multithreaded memcpy.
void collate_f32(const float** items, int64_t count, int64_t item_elems,
                 float* out) {
  parallel_for(count, [&](int64_t i) {
    std::memcpy(out + i * item_elems, items[i], item_elems * sizeof(float));
  });
}

int native_collate_abi_version() { return 1; }

}  // extern "C"
