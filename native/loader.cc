// Native data-loader: multithreaded JPEG decode + bilinear resize to a fixed
// uint8 RGB batch buffer.
//
// TPU-native replacement for the reference's 32-process torchvision
// DataLoader (imdb-wiki-dir/train.py:66,128-133): the host side of the input
// pipeline only needs decoded, resized uint8 images (augmentation runs on
// device), so the hot loop is pure decode+resize. libjpeg's DCT-domain
// scaling (scale_denom in {1,2,4,8}) skips most of the IDCT work when
// downscaling large faces to 224x224, and std::thread workers drive one file
// each from a shared atomic cursor.
//
// C ABI (ctypes-friendly):
//   decode_resize_batch(paths, n, out, out_h, out_w, num_threads) -> int
//     out: n * out_h * out_w * 3 bytes, RGB. Returns the number of images
//     decoded successfully; failures leave their slot zeroed and set
//     status[i] = 0 (callers fall back to PIL for those).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize (uint8 RGB, half-pixel centers).
void resize_bilinear(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(sh - 1, static_cast<int>(fy)));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(sw - 1, static_cast<int>(fx)));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int c = 0; c < 3; ++c) {
        float top = src[(y0 * sw + x0) * 3 + c] * (1 - wx) +
                    src[(y0 * sw + x1) * 3 + c] * wx;
        float bot = src[(y1 * sw + x0) * 3 + c] * (1 - wx) +
                    src[(y1 * sw + x1) * 3 + c] * wx;
        dst[(y * dw + x) * 3 + c] =
            static_cast<unsigned char>(top * (1 - wy) + bot * wy + 0.5f);
      }
    }
  }
}

bool decode_one(const char* path, unsigned char* out, int out_h, int out_w) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  std::vector<unsigned char> decoded;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);

  // DCT-domain prescale: smallest 1/d (d in 1,2,4,8) that stays >= target.
  int denom = 1;
  while (denom < 8 &&
         static_cast<int>(cinfo.image_height) / (denom * 2) >= out_h &&
         static_cast<int>(cinfo.image_width) / (denom * 2) >= out_w) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  decoded.resize(static_cast<size_t>(sw) * sh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = decoded.data() + static_cast<size_t>(cinfo.output_scanline) * sw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);

  resize_bilinear(decoded.data(), sh, sw, out, out_h, out_w);
  return true;
}

}  // namespace

extern "C" {

int decode_resize_batch(const char** paths, int n, unsigned char* out,
                        unsigned char* status, int out_h, int out_w,
                        int num_threads) {
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> cursor(0);
  std::atomic<int> ok_count(0);

  auto worker = [&]() {
    while (true) {
      int i = cursor.fetch_add(1);
      if (i >= n) break;
      bool ok = decode_one(paths[i], out + stride * i, out_h, out_w);
      status[i] = ok ? 1 : 0;
      if (ok) {
        ok_count.fetch_add(1);
      } else {
        std::memset(out + stride * i, 0, stride);
      }
    }
  };

  int threads = std::max(1, num_threads);
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok_count.load();
}

}  // extern "C"
