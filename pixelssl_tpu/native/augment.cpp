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
//
// decode_augment_batch additionally pulls JPEG (libjpeg) and PNG (libpng)
// decoding into the same C++ pass, so a loader thread's whole
// file->batch-slot pipeline runs outside the Python GIL: the torch
// DataLoader sidesteps the GIL with worker *processes* and pays pickling
// for every batch; here ctypes releases the GIL for the duration of the
// call and the decoded pixels never exist as Python objects at all.

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

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
  // raw-u8 wire mode: when out_image_u8 is set the job writes rounded
  // uint8 RGB (pad = 0) + int16 labels instead — 3.2x fewer bytes per
  // sample over the host->TPU link; normalization moves into the jitted
  // step (task device_prep hook). out_image/out_label are ignored then.
  uint8_t* out_image_u8 = nullptr;
  int16_t* out_label_i16 = nullptr;
};

const float kMean[3] = {0.485f, 0.456f, 0.406f};
const float kStd[3] = {0.229f, 0.224f, 0.225f};

void run_job(const AugmentJob& j) {
  const float sy_scale = (float)j.h / (float)j.rh;
  const float sx_scale = (float)j.w / (float)j.rw;
  const bool raw = j.out_image_u8 != nullptr;
  for (int y = 0; y < j.crop; ++y) {
    int ry = y + j.cy;  // coordinate in the resized image
    for (int x = 0; x < j.crop; ++x) {
      int rx = x + j.cx;
      int ox = j.flip ? (j.crop - 1 - x) : x;
      const size_t o = (size_t)y * j.crop + ox;
      if (ry < 0 || ry >= j.rh || rx < 0 || rx >= j.rw) {
        // zero-pad region (reference pads image with 0, label with fill)
        if (raw) {
          for (int c = 0; c < 3; ++c) j.out_image_u8[o * 3 + c] = 0;
          j.out_label_i16[o] = (int16_t)j.label_fill;
        } else {
          for (int c = 0; c < 3; ++c)
            j.out_image[o * 3 + c] = (0.0f - kMean[c]) / kStd[c];
          j.out_label[o] = j.label_fill;
        }
        continue;
      }
      float sy = (ry + 0.5f) * sy_scale - 0.5f;
      float sx = (rx + 0.5f) * sx_scale - 0.5f;
      float rgb[3];
      sample_bilinear(j.image, j.h, j.w, sy, sx, rgb);
      int32_t lb = j.label_fill;
      if (j.label) {
        int ny = std::min(j.h - 1, std::max(0, (int)(sy + 0.5f)));
        int nx = std::min(j.w - 1, std::max(0, (int)(sx + 0.5f)));
        lb = j.label[ny * j.w + nx];
      }
      if (raw) {
        for (int c = 0; c < 3; ++c)
          j.out_image_u8[o * 3 + c] =
              (uint8_t)std::min(255.0f, std::max(0.0f, rgb[c] + 0.5f));
        j.out_label_i16[o] = (int16_t)lb;
      } else {
        for (int c = 0; c < 3; ++c)
          j.out_image[o * 3 + c] = (rgb[c] / 255.0f - kMean[c]) / kStd[c];
        j.out_label[o] = lb;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// decoding (libjpeg / libpng)
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to uint8 RGB. Returns empty vector on failure.
bool decode_jpeg_rgb(const char* path, std::vector<uint8_t>* out,
                     int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr sources converted by libjpeg
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  out->resize((size_t)*h * *w * 3);
  const size_t stride = (size_t)*w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Decode an 8-bit gray or palette PNG to raw class indices (int32).
// Palette entries are NOT expanded to RGB — VOC SegmentationClassAug
// stores the class id as the palette index (reference prepare.sh output).
bool decode_png_label(const char* path, std::vector<int32_t>* out,
                      int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) { fclose(f); return false; }
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); fclose(f); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  if (color_type != PNG_COLOR_TYPE_PALETTE &&
      color_type != PNG_COLOR_TYPE_GRAY) {
    // labels must be single-channel index maps
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  if (bit_depth < 8) png_set_packing(png);   // 1/2/4-bit -> one byte/pixel
  if (bit_depth == 16) png_set_strip_16(png);
  png_read_update_info(png, info);
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  std::vector<uint8_t> raw((size_t)*h * *w);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y) rows[y] = raw.data() + (size_t)y * *w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  out->assign(raw.begin(), raw.end());
  return true;
}

}  // namespace

extern "C" {

// Fused decode (JPEG image + optional PNG label) + augment of one sample
// straight into the caller-provided crop-sized output slots. ctypes
// releases the GIL around this call, so loader threads calling it run
// truly in parallel — the Python-side pipeline never touches the pixels.
// Returns 0 on success, nonzero on decode failure (caller falls back to
// the PIL path).
int decode_augment_sample(
    const char* image_path, const char* label_path,  // label_path may be NULL
    int resize_h, int resize_w, int crop_y, int crop_x,
    int flip, int label_fill, int crop_size,
    float* out_image, int32_t* out_label) {
  std::vector<uint8_t> img;
  int h = 0, w = 0;
  if (!decode_jpeg_rgb(image_path, &img, &h, &w)) return 1;
  std::vector<int32_t> lbl;
  int lh = 0, lw = 0;
  if (label_path != nullptr) {
    if (!decode_png_label(label_path, &lbl, &lh, &lw)) return 2;
    if (lh != h || lw != w) return 3;
  }
  AugmentJob j{img.data(), label_path ? lbl.data() : nullptr,
               h, w, resize_h, resize_w, crop_y, crop_x, crop_size,
               flip, label_fill, out_image, out_label};
  run_job(j);
  return 0;
}

// Raw-u8 wire variant of decode_augment_sample: uint8 RGB + int16 label
// outputs (see AugmentJob.out_image_u8). Same geometry/decode code.
int decode_augment_sample_raw(
    const char* image_path, const char* label_path,  // label_path may be NULL
    int resize_h, int resize_w, int crop_y, int crop_x,
    int flip, int label_fill, int crop_size,
    uint8_t* out_image_u8, int16_t* out_label_i16) {
  std::vector<uint8_t> img;
  int h = 0, w = 0;
  if (!decode_jpeg_rgb(image_path, &img, &h, &w)) return 1;
  std::vector<int32_t> lbl;
  int lh = 0, lw = 0;
  if (label_path != nullptr) {
    if (!decode_png_label(label_path, &lbl, &lh, &lw)) return 2;
    if (lh != h || lw != w) return 3;
  }
  AugmentJob j{img.data(), label_path ? lbl.data() : nullptr,
               h, w, resize_h, resize_w, crop_y, crop_x, crop_size,
               flip, label_fill, nullptr, nullptr,
               out_image_u8, out_label_i16};
  run_job(j);
  return 0;
}

// Header-only size probe (no full decode): JPEG SOF dimensions.
int jpeg_dims(const char* path, int32_t* h, int32_t* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

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

// Raw-u8 wire variant of augment_batch (single-threaded: the per-sample
// cost without decode/normalize is small; callers parallelize samples).
int augment_batch_raw(
    const uint8_t** images, const int32_t** labels,
    const int32_t* heights, const int32_t* widths,
    const int32_t* resize_h, const int32_t* resize_w,
    const int32_t* crop_y, const int32_t* crop_x,
    const int32_t* flips, const int32_t* label_fills,
    int batch, int crop_size,
    uint8_t* out_images_u8, int16_t* out_labels_i16) {
  for (int i = 0; i < batch; ++i) {
    AugmentJob j{
        images[i], labels ? labels[i] : nullptr,
        heights[i], widths[i], resize_h[i], resize_w[i],
        crop_y[i], crop_x[i], crop_size, flips[i], label_fills[i],
        nullptr, nullptr,
        out_images_u8 + (size_t)i * crop_size * crop_size * 3,
        out_labels_i16 + (size_t)i * crop_size * crop_size};
    run_job(j);
  }
  return 0;
}

}  // extern "C"
