// Native host-side augmentation kernels for the data pipeline.
//
// The reference's input path runs PIL resize/crop/flip/normalize per
// sample in Python worker processes (reference: task/sseg/data.py:223-256,
// torch DataLoader workers). Here the augmentation chain is one fused C++
// pass per sample — bilinear resize + crop + horizontal flip + ImageNet
// normalization from uint8 HWC straight into the float32 batch slot, plus
// nearest-neighbor label resize into the int32 label slot — multithreaded
// across the batch with std::thread. Called from Python via ctypes
// (pixelssl_tpu/nn/native.py); the loader falls back to the PIL path when
// the shared library is unavailable.
//
// Build: make -C pixelssl_tpu/native  (produces libpixelssl_augment.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

// Bilinear sample from uint8 HWC image (channels = 3), PIL-convention
// half-pixel centers (align_corners=false).
inline void sample_bilinear(const uint8_t* img, int h, int w,
                            float sy, float sx, float* out3) {
  sy = std::min(std::max(sy, 0.0f), (float)(h - 1));
  sx = std::min(std::max(sx, 0.0f), (float)(w - 1));
  int y0 = (int)sy, x0 = (int)sx;
  int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
  float ty = sy - y0, tx = sx - x0;
  for (int c = 0; c < 3; ++c) {
    float v00 = img[(y0 * w + x0) * 3 + c];
    float v01 = img[(y0 * w + x1) * 3 + c];
    float v10 = img[(y1 * w + x0) * 3 + c];
    float v11 = img[(y1 * w + x1) * 3 + c];
    out3[c] = lerp(lerp(v00, v01, tx), lerp(v10, v11, tx), ty);
  }
}

struct AugmentJob {
  const uint8_t* image;   // [h, w, 3]
  const int32_t* label;   // [h, w] or nullptr
  int h, w;
  // geometry: resize to (rh, rw), crop at (cy, cx) of size (crop, crop)
  int rh, rw, cy, cx, crop;
  int flip;               // 1 → horizontal flip
  int label_fill;         // fill for out-of-bounds label (pad region)
  float* out_image;       // [crop, crop, 3] normalized float32
  int32_t* out_label;     // [crop, crop]
};

const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

void run_job(const AugmentJob& j) {
  const float sy_scale = (float)j.h / (float)j.rh;
  const float sx_scale = (float)j.w / (float)j.rw;
  for (int y = 0; y < j.crop; ++y) {
    int ry = y + j.cy;  // coordinate in the resized image
    for (int x = 0; x < j.crop; ++x) {
      int rx = x + j.cx;
      int ox = j.flip ? (j.crop - 1 - x) : x;
      float* out_px = j.out_image + (y * j.crop + ox) * 3;
      int32_t* out_lb = j.out_label + y * j.crop + ox;
      if (ry < 0 || ry >= j.rh || rx < 0 || rx >= j.rw) {
        // zero-pad region (reference pads image with 0, label with fill)
        for (int c = 0; c < 3; ++c) out_px[c] = (0.0f - kMean[c]) / kStd[c];
        *out_lb = j.label_fill;
        continue;
      }
      float sy = (ry + 0.5f) * sy_scale - 0.5f;
      float sx = (rx + 0.5f) * sx_scale - 0.5f;
      float rgb[3];
      sample_bilinear(j.image, j.h, j.w, sy, sx, rgb);
      for (int c = 0; c < 3; ++c)
        out_px[c] = (rgb[c] / 255.0f - kMean[c]) / kStd[c];
      if (j.label) {
        int ny = std::min(j.h - 1, std::max(0, (int)(sy + 0.5f)));
        int nx = std::min(j.w - 1, std::max(0, (int)(sx + 0.5f)));
        *out_lb = j.label[ny * j.w + nx];
      } else {
        *out_lb = j.label_fill;
      }
    }
  }
}

}  // namespace

extern "C" {

// Fused augment of a whole batch. Arrays are flat; per-sample geometry in
// the int arrays. Returns 0 on success.
int augment_batch(
    const uint8_t** images, const int32_t** labels,
    const int32_t* heights, const int32_t* widths,
    const int32_t* resize_h, const int32_t* resize_w,
    const int32_t* crop_y, const int32_t* crop_x,
    const int32_t* flips, const int32_t* label_fills,
    int batch, int crop_size,
    float* out_images, int32_t* out_labels, int n_threads) {
  std::vector<AugmentJob> jobs(batch);
  for (int i = 0; i < batch; ++i) {
    jobs[i] = AugmentJob{
        images[i], labels ? labels[i] : nullptr,
        heights[i], widths[i], resize_h[i], resize_w[i],
        crop_y[i], crop_x[i], crop_size, flips[i], label_fills[i],
        out_images + (size_t)i * crop_size * crop_size * 3,
        out_labels + (size_t)i * crop_size * crop_size};
  }
  if (n_threads <= 1 || batch == 1) {
    for (auto& j : jobs) run_job(j);
    return 0;
  }
  std::vector<std::thread> pool;
  std::atomic<int>* counter = new std::atomic<int>(0);
  int workers = std::min(n_threads, batch);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&jobs, counter, batch]() {
      while (true) {
        int i = counter->fetch_add(1);
        if (i >= batch) break;
        run_job(jobs[i]);
      }
    });
  }
  for (auto& th : pool) th.join();
  delete counter;
  return 0;
}

}  // extern "C"
