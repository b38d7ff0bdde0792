// vit_tpu native host data path: multithreaded JPEG decode + resize/crop/normalize.
//
// The reference's equivalent "native" layer is torchvision's C JPEG decode inside
// torch DataLoader worker processes (reference datasets.py:23-27). Here the whole
// per-image pipeline — libjpeg decode, Pillow-style triangle-filter bilinear resize
// (shorter side), random/center crop, horizontal flip, ImageNet normalization —
// runs in C++ threads with zero Python in the per-image path, producing NHWC float32
// batches ready for device transfer.
//
// Exposed via ctypes (see vit_tpu/data/native.py). Build: make -C native

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kMean[3] = {0.485f, 0.456f, 0.406f};
constexpr float kStd[3] = {0.229f, 0.224f, 0.225f};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG byte buffer to RGB8. Returns false on failure.
bool DecodeJpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), size);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  out->resize(static_cast<size_t>(*width) * *height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     (*width) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Pillow-style antialiased bilinear (triangle filter) resampling coefficients for
// one axis: for output index xx, weights over [bounds0, bounds0+kmax) input pixels.
void BuildCoeffs(int in_size, int out_size, std::vector<int>* bounds,
                 std::vector<float>* weights, int* kmax_out) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // bilinear support = 1
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->resize(out_size * 2);
  weights->assign(static_cast<size_t>(out_size) * kmax, 0.0f);
  std::vector<double> w(kmax);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    xmin = std::max(xmin, 0);
    int xmax = static_cast<int>(center + support + 0.5);
    xmax = std::min(xmax, in_size);
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      const double t = std::abs((x + 0.5 - center) / filterscale);
      w[x - xmin] = t < 1.0 ? 1.0 - t : 0.0;
      total += w[x - xmin];
    }
    for (int x = 0; x < xmax - xmin; ++x) {
      (*weights)[static_cast<size_t>(xx) * kmax + x] =
          static_cast<float>(total > 0 ? w[x] / total : 0.0);
    }
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax - xmin;
  }
  *kmax_out = kmax;
}

// Resize RGB8 (h, w) -> float RGB (out_h, out_w), two-pass separable.
void ResizeBilinear(const uint8_t* src, int w, int h, int out_w, int out_h,
                    std::vector<float>* dst) {
  std::vector<int> xb, yb;
  std::vector<float> xw, yw;
  int xkmax, ykmax;
  BuildCoeffs(w, out_w, &xb, &xw, &xkmax);
  BuildCoeffs(h, out_h, &yb, &yw, &ykmax);

  // horizontal pass: (h, w) -> (h, out_w)
  std::vector<float> tmp(static_cast<size_t>(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = xb[xx * 2], n = xb[xx * 2 + 1];
      const float* wt = xw.data() + static_cast<size_t>(xx) * xkmax;
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* px = row + static_cast<size_t>(xmin + k) * 3;
        acc[0] += wt[k] * px[0];
        acc[1] += wt[k] * px[1];
        acc[2] += wt[k] * px[2];
      }
      trow[xx * 3 + 0] = acc[0];
      trow[xx * 3 + 1] = acc[1];
      trow[xx * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (h, out_w) -> (out_h, out_w)
  dst->resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int yy = 0; yy < out_h; ++yy) {
    const int ymin = yb[yy * 2], n = yb[yy * 2 + 1];
    const float* wt = yw.data() + static_cast<size_t>(yy) * ykmax;
    float* drow = dst->data() + static_cast<size_t>(yy) * out_w * 3;
    std::memset(drow, 0, sizeof(float) * out_w * 3);
    for (int k = 0; k < n; ++k) {
      const float* trow = tmp.data() + static_cast<size_t>(ymin + k) * out_w * 3;
      const float wk = wt[k];
      for (int i = 0; i < out_w * 3; ++i) drow[i] += wk * trow[i];
    }
  }
}

// splitmix64 — cheap per-image deterministic RNG
uint64_t SplitMix64(uint64_t* state) {
  uint64_t z = (*state += 0x9E3779B97f4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

void ProcessOne(const uint8_t* jpeg, size_t jpeg_size, int out_size, bool train,
                uint64_t seed, float* out, int* status) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeJpeg(jpeg, jpeg_size, &rgb, &w, &h)) {
    *status = 1;
    std::memset(out, 0, sizeof(float) * out_size * out_size * 3);
    return;
  }
  // shorter-side resize (torchvision Resize(int) semantics)
  int rw, rh;
  if (w <= h) {
    rw = out_size;
    rh = std::max(1, static_cast<int>(std::lround(
             static_cast<double>(h) * out_size / w)));
  } else {
    rh = out_size;
    rw = std::max(1, static_cast<int>(std::lround(
             static_cast<double>(w) * out_size / h)));
  }
  std::vector<float> resized;
  ResizeBilinear(rgb.data(), w, h, rw, rh, &resized);

  uint64_t rng = seed;
  int top, left;
  bool flip = false;
  if (train) {
    top = rh == out_size ? 0 : SplitMix64(&rng) % (rh - out_size + 1);
    left = rw == out_size ? 0 : SplitMix64(&rng) % (rw - out_size + 1);
    flip = (SplitMix64(&rng) & 1) != 0;
  } else {
    top = std::max(0, (rh - out_size) / 2);
    left = std::max(0, (rw - out_size) / 2);
  }
  for (int y = 0; y < out_size; ++y) {
    const float* srow = resized.data() +
                        (static_cast<size_t>(top + y) * rw + left) * 3;
    float* drow = out + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      const int sx = flip ? (out_size - 1 - x) : x;
      for (int c = 0; c < 3; ++c) {
        // Pillow stores resized pixels back to uint8 before ToTensor; match that
        // quantization for parity with the PIL path.
        float v = std::min(255.f, std::max(0.f, srow[sx * 3 + c]));
        v = std::lround(v) / 255.0f;
        drow[x * 3 + c] = (v - kMean[c]) / kStd[c];
      }
    }
  }
  *status = 0;
}

}  // namespace

extern "C" {

// Decode + transform a batch of JPEGs into out (n, out_size, out_size, 3) float32.
// Returns the number of failed decodes (their slots are zeroed).
int vit_tpu_decode_batch(const uint8_t* const* jpegs, const size_t* sizes, int n,
                         int out_size, int train, uint64_t seed, float* out,
                         int num_threads) {
  std::vector<int> status(n, 0);
  std::atomic<int> next(0);
  const int threads = std::max(1, std::min(num_threads, n));
  auto worker = [&] {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      ProcessOne(jpegs[i], sizes[i], out_size, train != 0, seed + 0x9E37 * i,
                 out + static_cast<size_t>(i) * out_size * out_size * 3,
                 &status[i]);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  int failures = 0;
  for (int s : status) failures += s;
  return failures;
}

}  // extern "C"
