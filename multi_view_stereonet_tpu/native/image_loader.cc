// Native image-loading pipeline: JPEG decode + Pillow-compatible
// antialiased bilinear resize + normalization, with a thread pool.
//
// Why: the Python eval/streaming path spends ~46 ms/image in PIL decode
// + resize + normalize while the TPU forward takes ~5 ms/image -- host
// decode is the serving bottleneck (the reference hid it behind torch
// DataLoader worker processes, params.yaml:19). This library does the
// same per-sample work in C++ at ~2-3 ms/image/core and scales across a
// thread pool, feeding data.BatchLoader through ctypes.
//
// Parity: the resize replicates Pillow's ImagingResample for the
// BILINEAR (triangle) filter bit-for-bit -- same per-pixel coefficient
// windows, the same fixed-point accumulation (PRECISION_BITS = 22,
// round-half-away coefficients, u8 intermediate between the horizontal
// and vertical passes) -- so native and PIL pipelines produce identical
// tensors for JPEG sources decoded by the same libjpeg-turbo family.
//
// Build: g++ -O3 -shared -fPIC image_loader.cc -o _image_loader.so -ljpeg
// (done lazily by native/__init__.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <new>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's PRECISION_BITS

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success; sets (w, h) and
// fills `out` (resized to w*h*3).
bool DecodeJpeg(const char* path, std::vector<unsigned char>* out, int* w,
                int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  // Bound the allocation: a corrupt SOF can claim absurd dims, and a
  // bad_alloc would escape the thread and kill the process instead of
  // taking the status->PIL-fallback path.
  if (*w <= 0 || *h <= 0 ||
      static_cast<long long>(*w) * *h > 64LL * 1024 * 1024) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  try {
    out->resize(static_cast<size_t>(*w) * *h * 3);
  } catch (const std::bad_alloc&) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

inline int RoundHalfAway(double v) {
  return v < 0 ? static_cast<int>(v - 0.5) : static_cast<int>(v + 0.5);
}

inline unsigned char Clip8(int v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<unsigned char>(v);
}

// Pillow-style coefficient precompute for the triangle filter
// (ImagingPrecomputeCoeffs with bilinear_filter, support 1.0).
void PrecomputeCoeffs(int in_size, int out_size, std::vector<int>* bounds,
                      std::vector<int>* kk, int* ksize_out) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds->resize(static_cast<size_t>(out_size) * 2);
  kk->assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> k(ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      double w = (x + xmin - center + 0.5) * ss;
      w = w < 0 ? 1.0 + w : 1.0 - w;  // triangle filter on |w| < 1
      if (w < 0) w = 0;
      k[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x) {
      if (ww != 0.0) k[x] /= ww;
      (*kk)[static_cast<size_t>(xx) * ksize + x] =
          RoundHalfAway(k[x] * (1 << kPrecisionBits));
    }
    (*bounds)[xx * 2] = xmin;
    (*bounds)[xx * 2 + 1] = xmax;
  }
  *ksize_out = ksize;
}

// Two-pass u8 resample, horizontal then vertical (Pillow's order for
// plain resize), RGB interleaved.
void ResizeBilinear(const unsigned char* src, int in_w, int in_h,
                    unsigned char* dst, int out_w, int out_h) {
  std::vector<int> bounds, kk;
  int ksize;
  // Horizontal pass: (in_h, in_w) -> (in_h, out_w).
  std::vector<unsigned char> tmp(static_cast<size_t>(in_h) * out_w * 3);
  PrecomputeCoeffs(in_w, out_w, &bounds, &kk, &ksize);
  for (int yy = 0; yy < in_h; ++yy) {
    const unsigned char* srow = src + static_cast<size_t>(yy) * in_w * 3;
    unsigned char* drow = tmp.data() + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = bounds[xx * 2], xmax = bounds[xx * 2 + 1];
      const int* kp = kk.data() + static_cast<size_t>(xx) * ksize;
      int s0 = 1 << (kPrecisionBits - 1), s1 = s0, s2 = s0;
      for (int x = 0; x < xmax; ++x) {
        const unsigned char* p = srow + static_cast<size_t>(xmin + x) * 3;
        s0 += p[0] * kp[x];
        s1 += p[1] * kp[x];
        s2 += p[2] * kp[x];
      }
      drow[xx * 3] = Clip8(s0);
      drow[xx * 3 + 1] = Clip8(s1);
      drow[xx * 3 + 2] = Clip8(s2);
    }
  }
  // Vertical pass: (in_h, out_w) -> (out_h, out_w).
  PrecomputeCoeffs(in_h, out_h, &bounds, &kk, &ksize);
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = bounds[yy * 2], ymax = bounds[yy * 2 + 1];
    const int* kp = kk.data() + static_cast<size_t>(yy) * ksize;
    unsigned char* drow = dst + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w * 3; ++xx) {
      int ss = 1 << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y) {
        ss += tmp[static_cast<size_t>(ymin + y) * out_w * 3 + xx] * kp[y];
      }
      drow[xx] = Clip8(ss);
    }
  }
}

}  // namespace

extern "C" {

// Probe symbol for the ctypes wrapper.
int mvs_native_version() { return 1; }

// JPEG header dims without a full decode. Returns 0 on success.
int mvs_jpeg_dims(const char* path, int* w, int* h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

// Decode n JPEGs, resize each to (rows, cols) with the Pillow-parity
// bilinear resample, and write float32 HWC pixels (x/255 - mean) / std
// into out[i * rows * cols * 3]. status[i]: 0 ok, 1 decode failed.
// Thread-pooled over images.
void mvs_load_images(const char** paths, int n, int rows, int cols,
                     float mean, float stddev, float* out, int* status,
                     int n_threads) {
  std::atomic<int> next(0);
  const float inv = 1.0f / (255.0f * stddev);
  const float off = mean / stddev;
  const bool plain = (mean == 0.0f && stddev == 1.0f);
  auto work = [&]() {
    std::vector<unsigned char> rgb, resized;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      if (!DecodeJpeg(paths[i], &rgb, &w, &h)) {
        status[i] = 1;
        continue;
      }
      const unsigned char* px = rgb.data();
      if (w != cols || h != rows) {
        resized.resize(static_cast<size_t>(rows) * cols * 3);
        ResizeBilinear(rgb.data(), w, h, resized.data(), cols, rows);
        px = resized.data();
      }
      float* dst = out + static_cast<size_t>(i) * rows * cols * 3;
      size_t count = static_cast<size_t>(rows) * cols * 3;
      if (plain) {
        // Exact x / 255.0f division: bit-identical to the numpy ToArray
        // path (multiply-by-reciprocal is 1 ulp off).
        for (size_t j = 0; j < count; ++j) {
          dst[j] = px[j] / 255.0f;
        }
      } else {
        for (size_t j = 0; j < count; ++j) {
          dst[j] = px[j] * inv - off;
        }
      }
      status[i] = 0;
    }
  };
  int nt = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  if (nt == 1) {
    work();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(work);
  for (auto& t : pool) t.join();
}

}  // extern "C"
