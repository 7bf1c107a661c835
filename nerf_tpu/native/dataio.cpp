// Native data-loading runtime: parallel PNG decode + alpha composite +
// triangle-filter resize into a caller-provided float32 tensor.
//
// Role: the TPU-native successor of the reference repo's removed CUDA
// extension's "image sampler" (reference README.md:56, :89-92) on the host
// side: dataset ingestion is the only part of this framework's hot path that
// cannot be a TPU kernel, so it is native C++ (libpng + std::thread) with
// the PIL-based Python loader kept as the correctness oracle and fallback
// (nerf_tpu/data/blender.py).
//
// ABI: plain C, consumed via ctypes (no pybind11 in this environment).
// Build: see nerf_tpu/native/__init__.py (g++ -O3 -shared -fPIC -lpng).

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<float> data;  // H*W*C, C = 3 or 4, [0, 1]
  int h = 0, w = 0, c = 0;
};

// Decode one PNG into float RGB(A). Returns false on any error.
bool decode_png(const char* path, bool want_alpha, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  // Buffers live BEFORE the setjmp so a libpng longjmp (e.g. a corrupt
  // image mid png_read_image) returns into a frame where they are still
  // in scope and are destroyed on the normal return below — constructing
  // them after setjmp and jumping over their scope exit is UB / a leak.
  std::vector<uint8_t> raw;
  std::vector<png_bytep> rows;
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // normalize to 8-bit RGBA or RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (want_alpha)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);  // add opaque alpha if absent
  else
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  const int c = want_alpha ? 4 : 3;
  raw.resize((size_t)h * w * c);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = raw.data() + (size_t)y * w * c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  out->h = (int)h;
  out->w = (int)w;
  out->c = c;
  out->data.resize(raw.size());
  constexpr float kInv = 1.0f / 255.0f;
  for (size_t i = 0; i < raw.size(); ++i) out->data[i] = raw[i] * kInv;
  return true;
}

// Separable triangle-filter (bilinear-with-support) resample, matching the
// convolution PIL uses for Image.BILINEAR: filter support max(1, 1/scale),
// computed in float (PIL uses 8-bit fixed point; we are the more precise one).
void resize_axis(const float* src, float* dst, int n_out, int n_in, int stride,
                 int count, int inner) {
  const double scale = (double)n_in / n_out;
  const double support = scale < 1.0 ? 1.0 : scale;
  for (int o = 0; o < n_out; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = (int)std::floor(center - support);
    int hi = (int)std::ceil(center + support);
    if (lo < 0) lo = 0;
    if (hi > n_in) hi = n_in;
    double wsum = 0.0;
    std::vector<double> ws(hi - lo);
    for (int i = lo; i < hi; ++i) {
      double x = (i + 0.5 - center) / support;
      double wgt = x < 0 ? 1.0 + x : 1.0 - x;
      if (wgt < 0) wgt = 0;
      ws[i - lo] = wgt;
      wsum += wgt;
    }
    if (wsum <= 0) {
      ws.assign(1, 1.0);
      wsum = 1.0;
      if (lo >= n_in) lo = n_in - 1;
      hi = lo + 1;
    }
    for (int b = 0; b < count; ++b) {
      const float* s = src + (size_t)b * n_in * stride;
      float* d = dst + (size_t)b * n_out * stride;
      for (int k = 0; k < inner; ++k) {
        double acc = 0.0;
        for (int i = lo; i < hi; ++i)
          acc += ws[i - lo] * s[(size_t)i * stride + k];
        d[(size_t)o * stride + k] = (float)(acc / wsum);
      }
    }
  }
}

void resize_image(const Image& in, int oh, int ow, Image* out) {
  // rows first: (H, W*C) -> (OH, W*C)
  std::vector<float> tmp((size_t)oh * in.w * in.c);
  resize_axis(in.data.data(), tmp.data(), oh, in.h, in.w * in.c, 1,
              in.w * in.c);
  // then columns: treat as OH batches of (W, C) -> (OW, C)
  out->h = oh;
  out->w = ow;
  out->c = in.c;
  out->data.resize((size_t)oh * ow * in.c);
  resize_axis(tmp.data(), out->data.data(), ow, in.w, in.c, oh, in.c);
}

}  // namespace

extern "C" {

// Probe a PNG's dimensions after optional ratio resize (header-only read —
// no pixel decode). Returns 0 on success.
int dataio_probe(const char* path, double ratio, int* out_h, int* out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 1;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 1;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  const int h = (int)png_get_image_height(png, info);
  const int w = (int)png_get_image_width(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  *out_h = ratio == 1.0 ? h : (int)(h * ratio);
  *out_w = ratio == 1.0 ? w : (int)(w * ratio);
  return 0;
}

// Decode `n` PNGs into out[n, out_h, out_w, 3] float32 (C-contiguous,
// caller-allocated). paths is an array of NUL-terminated strings.
// white_bkg != 0: composite alpha over white (rgb*a + (1-a)).
// Any image whose post-resize size differs from (out_h, out_w) is an error.
// Returns 0 on success, else 1 + index of the first failing image.
int dataio_decode_batch(const char** paths, int n, double ratio,
                        int white_bkg, int out_h, int out_w, float* out,
                        int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  std::atomic<int> err(0);  // 0 = ok, else 1 + failing index

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n || err.load() != 0) return;
      Image img;
      if (!decode_png(paths[i], white_bkg != 0, &img)) {
        int expected = 0;
        err.compare_exchange_strong(expected, 1 + i);
        return;
      }
      Image resized;
      const Image* src = &img;
      if (ratio != 1.0) {
        int oh = (int)(img.h * ratio), ow = (int)(img.w * ratio);
        resize_image(img, oh, ow, &resized);
        src = &resized;
      }
      if (src->h != out_h || src->w != out_w) {
        int expected = 0;
        err.compare_exchange_strong(expected, 1 + i);
        return;
      }
      float* dst = out + (size_t)i * out_h * out_w * 3;
      const float* s = src->data.data();
      const size_t npix = (size_t)out_h * out_w;
      if (src->c == 4 && white_bkg) {
        for (size_t p = 0; p < npix; ++p) {
          const float a = s[p * 4 + 3];
          dst[p * 3 + 0] = s[p * 4 + 0] * a + (1.0f - a);
          dst[p * 3 + 1] = s[p * 4 + 1] * a + (1.0f - a);
          dst[p * 3 + 2] = s[p * 4 + 2] * a + (1.0f - a);
        }
      } else if (src->c == 4) {
        for (size_t p = 0; p < npix; ++p)
          std::memcpy(dst + p * 3, s + p * 4, 3 * sizeof(float));
      } else {
        std::memcpy(dst, s, npix * 3 * sizeof(float));
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

}  // extern "C"
