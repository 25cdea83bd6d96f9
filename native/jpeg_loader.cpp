// flowerdiff native data-ingest: multithreaded JPEG decode + resize.
//
// The reference's only host-side data machinery is a torchvision DataLoader
// with 2 python workers doing PIL decode/resize per epoch (v1:1299-1303).
// flowerdiff instead decodes the whole split ONCE into a device-resident
// cache (src/flowerdiff/data/flowers102.py); this extension makes that
// one-time ingest fast: libjpeg decode (with DCT prescaling to the nearest
// power-of-two above the target) + separable Catmull-Rom bicubic resize,
// fanned out over a std::thread pool. Exposed as a plain C ABI consumed via
// ctypes (no pybind11 in this environment).
//
// Build: python tools/build_native.py   (g++ -O3 -shared -fPIC -ljpeg)

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

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB8. Returns false on any decode error.
bool decode_jpeg(const char* path, std::vector<uint8_t>& pixels, int& width,
                 int& height, int target) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // DCT-domain prescale: decode at >= 1.5x the target so the bicubic pass
  // keeps quality while the IDCT does the heavy shrinking for free.
  int full = std::min(cinfo.image_width, cinfo.image_height);
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  while (cinfo.scale_denom < 8 &&
         2 * full / (int)(cinfo.scale_denom * 2) >= 3 * target) {
    cinfo.scale_denom *= 2;
  }
  cinfo.dct_method = JDCT_IFAST;
  cinfo.do_fancy_upsampling = FALSE;

  jpeg_start_decompress(&cinfo);
  width = cinfo.output_width;
  height = cinfo.output_height;
  pixels.resize((size_t)width * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + (size_t)cinfo.output_scanline * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

inline float catmull_rom(float x) {
  // Catmull-Rom spline (a = -0.5) — the classic bicubic kernel PIL uses.
  x = std::fabs(x);
  if (x < 1.0f) return 1.5f * x * x * x - 2.5f * x * x + 1.0f;
  if (x < 2.0f) return -0.5f * x * x * x + 2.5f * x * x - 4.0f * x + 2.0f;
  return 0.0f;
}

// Precomputed filter taps for one output axis.
struct FilterTable {
  std::vector<int> lo;        // first source index per output pixel
  std::vector<int> len;       // tap count per output pixel
  std::vector<float> weights; // taps, normalized, stride = max_len
  int max_len = 0;
};

FilterTable build_filter(int src_size, int dst_size) {
  FilterTable ft;
  const float scale = (float)src_size / dst_size;
  const float support = std::max(1.0f, scale) * 2.0f;
  const float inv_k = 1.0f / std::max(1.0f, scale);
  ft.lo.resize(dst_size);
  ft.len.resize(dst_size);
  ft.max_len = (int)std::ceil(2 * support) + 2;
  ft.weights.assign((size_t)dst_size * ft.max_len, 0.0f);
  for (int o = 0; o < dst_size; ++o) {
    const float center = (o + 0.5f) * scale - 0.5f;
    const int lo = std::max(0, (int)std::floor(center - support));
    const int hi = std::min(src_size - 1, (int)std::ceil(center + support));
    float wsum = 0.0f;
    for (int i = lo; i <= hi; ++i) {
      const float wv = catmull_rom((i - center) * inv_k);
      ft.weights[(size_t)o * ft.max_len + (i - lo)] = wv;
      wsum += wv;
    }
    if (wsum == 0.0f) wsum = 1.0f;
    for (int i = 0; i <= hi - lo; ++i) {
      ft.weights[(size_t)o * ft.max_len + i] /= wsum;
    }
    ft.lo[o] = lo;
    ft.len[o] = hi - lo + 1;
  }
  return ft;
}

// Separable bicubic resize RGB8 -> RGB8 (antialiased for downscale, like
// PIL): precomputed normalized taps, row-major passes.
void resize_bicubic(const std::vector<uint8_t>& src, int sw, int sh,
                    uint8_t* dst, int tw, int th) {
  const FilterTable fx = build_filter(sw, tw);
  const FilterTable fy = build_filter(sh, th);

  // Horizontal pass: (sh x sw) -> (sh x tw), row-major for cache locality.
  std::vector<float> tmp((size_t)sh * tw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src.data() + (size_t)y * sw * 3;
    float* trow = tmp.data() + (size_t)y * tw * 3;
    for (int ox = 0; ox < tw; ++ox) {
      const float* w = fx.weights.data() + (size_t)ox * fx.max_len;
      const uint8_t* sp = srow + fx.lo[ox] * 3;
      float a0 = 0, a1 = 0, a2 = 0;
      for (int i = 0; i < fx.len[ox]; ++i, sp += 3) {
        a0 += w[i] * sp[0];
        a1 += w[i] * sp[1];
        a2 += w[i] * sp[2];
      }
      trow[ox * 3 + 0] = a0;
      trow[ox * 3 + 1] = a1;
      trow[ox * 3 + 2] = a2;
    }
  }

  // Vertical pass: (sh x tw) -> (th x tw).
  const int row_floats = tw * 3;
  for (int oy = 0; oy < th; ++oy) {
    const float* w = fy.weights.data() + (size_t)oy * fy.max_len;
    uint8_t* drow = dst + (size_t)oy * row_floats;
    std::vector<float> acc(row_floats, 0.0f);
    for (int i = 0; i < fy.len[oy]; ++i) {
      const float wv = w[i];
      const float* trow = tmp.data() + (size_t)(fy.lo[oy] + i) * row_floats;
      for (int j = 0; j < row_floats; ++j) acc[j] += wv * trow[j];
    }
    for (int j = 0; j < row_floats; ++j) {
      drow[j] = (uint8_t)std::clamp(acc[j] + 0.5f, 0.0f, 255.0f);
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` JPEG files and resize each to (size, size) RGB8 into `out`
// (n * size * size * 3 bytes, caller-allocated). `status[i]` receives 1 on
// success, 0 on failure for image i. Uses `n_threads` worker threads
// (0 = hardware concurrency). Returns the number of successes.
int flowerdiff_decode_batch(const char** paths, int n, int size, uint8_t* out,
                            uint8_t* status, int n_threads) {
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 4;
  }
  n_threads = std::min(n_threads, std::max(1, n));

  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    std::vector<uint8_t> pixels;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      uint8_t* dst = out + (size_t)i * size * size * 3;
      if (decode_jpeg(paths[i], pixels, w, h, size)) {
        resize_bicubic(pixels, w, h, dst, size, size);
        status[i] = 1;
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, (size_t)size * size * 3);
        status[i] = 0;
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int i = 0; i < n_threads; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
