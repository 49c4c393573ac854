// Native data loader: multithreaded PNG decode + IMU CSV parse.
//
// The reference's data layer is pure Python (cv2.imread per frame on the
// consumer thread, reference src/streaming/dataset.py:103-146, with a
// disabled prefetch thread).  This loader is the TPU-native equivalent of a
// production input pipeline: a C thread pool decodes grayscale PNGs straight
// into a caller-provided contiguous buffer (ready for a single
// host->device transfer), and the CSV parser turns EuRoC IMU logs into
// flat float64 arrays without Python-level line parsing.
//
// C API (ctypes-friendly), see runtime/native.py for the Python bindings.

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct DecodeJob {
  const char* path;
  uint8_t* dst;
  int expect_h;
  int expect_w;
  int* status;  // 0 ok, nonzero error
};

int decode_png_gray(const char* path, uint8_t* dst, int expect_h, int expect_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return 2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    std::fclose(fp);
    return 3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 4;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize to 8-bit grayscale
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_PALETTE ||
      color == PNG_COLOR_TYPE_RGB_ALPHA)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  if ((int)h != expect_h || (int)w != expect_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 5;
  }

  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = dst + (size_t)y * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

}  // namespace

extern "C" {

// Decode n grayscale PNGs (paths as a NUL-joined blob with offsets) into a
// contiguous (n, h, w) uint8 buffer using `threads` worker threads.
// Returns the number of failed decodes; per-image status in `status`.
int uav_decode_pngs(const char* path_blob, const int64_t* offsets, int n,
                    uint8_t* out, int h, int w, int threads, int* status) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  if (threads < 1) threads = 1;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      const char* path = path_blob + offsets[i];
      int rc = decode_png_gray(path, out + (size_t)i * h * w, h, w);
      status[i] = rc;
      if (rc) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Parse a EuRoC-style CSV (first column int64 ns timestamp, then `cols`
// float64 fields per row, one header line).  Returns the number of rows
// parsed (<= max_rows); timestamps scaled by `scale` into `ts`.
int64_t uav_parse_csv(const char* path, int cols, double scale, double* ts,
                      double* values, int64_t max_rows) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return -1;
  char line[1024];
  // skip header
  if (!std::fgets(line, sizeof line, fp)) {
    std::fclose(fp);
    return -2;
  }
  int64_t row = 0;
  while (row < max_rows && std::fgets(line, sizeof line, fp)) {
    char* p = line;
    char* end;
    double t = strtod(p, &end);
    if (end == p) continue;
    ts[row] = t * scale;
    p = end;
    for (int c = 0; c < cols; ++c) {
      while (*p == ',' || *p == ' ') ++p;
      values[row * cols + c] = strtod(p, &end);
      p = end;
    }
    ++row;
  }
  std::fclose(fp);
  return row;
}

}  // extern "C"
