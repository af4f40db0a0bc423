// Native host-side data loader for semantic_slam_master_tpu.
//
// The TPU frontend consumes frames at tens of thousands of fps; PNG
// decode on the host is the real input bottleneck (the reference hides
// this behind torch DataLoader worker processes, train.py:190-196).
// This library provides multi-threaded libpng decoding of TUM RGB-D
// frames straight into caller-provided float buffers (rgb in [0,1],
// depth in meters via the /5000 TUM convention) — one C call per batch,
// no Python in the per-frame loop.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PngImage {
  int width = 0;
  int height = 0;
  int channels = 0;   // 1 (gray) or 3 (rgb)
  int bit_depth = 0;  // 8 or 16
  std::vector<uint8_t> data;  // row-major, native byte order for 16-bit
};

// Decode a PNG file. Applies standard transforms: palette->rgb,
// strip alpha, expand low-bit gray. Keeps 16-bit depth images 16-bit.
bool decode_png(const char* path, PngImage* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return false;
  }

  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return false;
  }

  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int color_type = png_get_color_type(png, info);
  int bit_depth = png_get_bit_depth(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian; we want LE

  png_read_update_info(png, info);

  out->width = png_get_image_width(png, info);
  out->height = png_get_image_height(png, info);
  out->bit_depth = png_get_bit_depth(png, info);
  out->channels = png_get_channels(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->height);
  std::vector<png_bytep> rows(out->height);
  for (int y = 0; y < out->height; ++y)
    rows[y] = out->data.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return true;
}

void worker_range(const char* const* rgb_paths, const char* const* depth_paths,
                  int begin, int end, int width, int height, float depth_scale,
                  float* rgb_out, float* depth_out, std::atomic<int>* status) {
  const size_t rgb_stride = static_cast<size_t>(width) * height * 3;
  const size_t depth_stride = static_cast<size_t>(width) * height;
  constexpr float kInv255 = 1.0f / 255.0f;

  for (int i = begin; i < end; ++i) {
    if (rgb_paths && rgb_out) {
      PngImage img;
      if (!decode_png(rgb_paths[i], &img) || img.width != width ||
          img.height != height || img.bit_depth != 8) {
        status->store(-(i + 1));
        return;
      }
      float* dst = rgb_out + i * rgb_stride;
      const uint8_t* src = img.data.data();
      const size_t n = depth_stride;
      if (img.channels == 3) {
        for (size_t p = 0; p < n * 3; ++p) dst[p] = src[p] * kInv255;
      } else {  // grayscale: broadcast
        for (size_t p = 0; p < n; ++p) {
          float v = src[p] * kInv255;
          dst[3 * p] = v;
          dst[3 * p + 1] = v;
          dst[3 * p + 2] = v;
        }
      }
    }
    if (depth_paths && depth_out) {
      PngImage img;
      if (!decode_png(depth_paths[i], &img) || img.width != width ||
          img.height != height || img.channels != 1) {
        status->store(-(i + 1));
        return;
      }
      float* dst = depth_out + i * depth_stride;
      const float inv_scale = 1.0f / depth_scale;
      if (img.bit_depth == 16) {
        const uint16_t* src =
            reinterpret_cast<const uint16_t*>(img.data.data());
        for (size_t p = 0; p < depth_stride; ++p) dst[p] = src[p] * inv_scale;
      } else {
        const uint8_t* src = img.data.data();
        for (size_t p = 0; p < depth_stride; ++p) dst[p] = src[p] * inv_scale;
      }
    }
  }
}

}  // namespace

extern "C" {

// Probe a PNG's dimensions/format. Returns 0 on success.
int ssm_png_info(const char* path, int* width, int* height, int* channels,
                 int* bit_depth) {
  PngImage img;  // full decode; info-only path not worth the code
  if (!decode_png(path, &img)) return 1;
  *width = img.width;
  *height = img.height;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

// Decode a batch of TUM RGB-D frames with a thread pool.
//
// rgb_paths / depth_paths: arrays of n C strings (either may be NULL to
// skip that modality). All images must be width x height; rgb 8-bit,
// depth 8/16-bit single channel. Outputs: rgb_out (n*h*w*3 float32 in
// [0,1]), depth_out (n*h*w float32 meters = raw / depth_scale).
// Returns 0 on success, or -(index+1) of the first failing frame.
int ssm_load_batch(const char* const* rgb_paths,
                   const char* const* depth_paths, int n, int width,
                   int height, float depth_scale, float* rgb_out,
                   float* depth_out, int num_threads) {
  if (n <= 0) return 0;
  if (num_threads <= 0) num_threads = 1;
  if (num_threads > n) num_threads = n;

  std::atomic<int> status(0);
  std::vector<std::thread> threads;
  int per = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int begin = t * per;
    int end = begin + per < n ? begin + per : n;
    if (begin >= end) break;
    threads.emplace_back(worker_range, rgb_paths, depth_paths, begin, end,
                         width, height, depth_scale, rgb_out, depth_out,
                         &status);
  }
  for (auto& th : threads) th.join();
  return status.load();
}

}  // extern "C"
