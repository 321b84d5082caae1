// team_io: native data-loading runtime for TEAM-TPU.
//
// Replaces the reference's torch DataLoader worker processes + PIL/torchvision
// C loops (reference utils/data_manager.py DataLoader(num_workers=8),
// utils/data.py build_transform) with a threaded C++ pipeline:
//
//   file read -> JPEG/PNG decode -> bicubic resize to SxS -> CLIP normalize
//
// exposed through a C ABI for ctypes (no pybind11 in this image). One call
// processes a whole batch with an internal thread pool; output is written into
// a caller-provided float32 NHWC buffer ready for device upload.
//
// Build: see native/Makefile (links -ljpeg -lpng -lpthread).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// thread pool
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }
  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to RGB8. Returns false on failure.
bool DecodeJpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
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
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

struct PngReadState {
  const uint8_t* data;
  size_t size;
  size_t offset;
};

void PngReadFn(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->offset + n > st->size) {
    png_error(png, "png: read past end");
  }
  std::memcpy(out, st->data + st->offset, n);
  st->offset += n;
}

bool DecodePng(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
               int* width, int* height) {
  if (size < 8 || png_sig_cmp(data, 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{data, size, 0};
  png_set_read_fn(png, &st, PngReadFn);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray/low-bit -> 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *width = png_get_image_width(png, info);
  *height = png_get_image_height(png, info);
  out->resize(static_cast<size_t>(*width) * *height * 3);
  std::vector<png_bytep> rows(*height);
  for (int y = 0; y < *height; ++y) {
    rows[y] = out->data() + static_cast<size_t>(y) * *width * 3;
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool DecodeImage(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* width, int* height) {
  if (size >= 2 && data[0] == 0xFF && data[1] == 0xD8) {
    return DecodeJpeg(data, size, out, width, height);
  }
  if (size >= 8 && !png_sig_cmp(data, 0, 8)) {
    return DecodePng(data, size, out, width, height);
  }
  // fall back to trying both
  return DecodeJpeg(data, size, out, width, height) ||
         DecodePng(data, size, out, width, height);
}

// ---------------------------------------------------------------------------
// bicubic resize (Catmull-Rom a=-0.5, matching PIL's BICUBIC kernel shape)
// ---------------------------------------------------------------------------
inline float CubicWeight(float x) {
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// Precomputed 4-tap filter table for one resize axis (normalized weights).
struct FilterTaps {
  std::vector<int> idx;     // [out * 4] clamped source indices
  std::vector<float> wgt;   // [out * 4] normalized weights
};

FilterTaps BuildTaps(int in, int out) {
  FilterTaps t;
  t.idx.resize(static_cast<size_t>(out) * 4);
  t.wgt.resize(static_cast<size_t>(out) * 4);
  const float scale = static_cast<float>(in) / out;
  for (int o = 0; o < out; ++o) {
    const float center = (o + 0.5f) * scale - 0.5f;
    const int base = static_cast<int>(std::floor(center));
    float wsum = 0.0f;
    for (int k = 0; k < 4; ++k) {
      const int s = base - 1 + k;
      const float w = CubicWeight(center - s);
      t.idx[o * 4 + k] = s < 0 ? 0 : (s >= in ? in - 1 : s);
      t.wgt[o * 4 + k] = w;
      wsum += w;
    }
    for (int k = 0; k < 4; ++k) t.wgt[o * 4 + k] /= wsum;
  }
  return t;
}

// Separable bicubic resize RGB8 (h,w) -> float RGB (oh, ow), values in [0,255].
// Filter taps are precomputed per axis (weights are shift-invariant per output
// position), so the inner loops are pure multiply-adds.
void ResizeBicubic(const uint8_t* src, int h, int w, float* dst, int oh, int ow) {
  const FilterTaps tx = BuildTaps(w, ow);
  const FilterTaps ty = BuildTaps(h, oh);
  std::vector<float> tmp(static_cast<size_t>(h) * ow * 3);

  // horizontal pass
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* orow = tmp.data() + static_cast<size_t>(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      const int* xi = tx.idx.data() + x * 4;
      const float* xw = tx.wgt.data() + x * 4;
      float r = 0, g = 0, b = 0;
      for (int k = 0; k < 4; ++k) {
        const uint8_t* p = row + xi[k] * 3;
        const float w0 = xw[k];
        r += w0 * p[0];
        g += w0 * p[1];
        b += w0 * p[2];
      }
      orow[x * 3 + 0] = r;
      orow[x * 3 + 1] = g;
      orow[x * 3 + 2] = b;
    }
  }
  // vertical pass (row-major friendly: accumulate 4 source rows per output row)
  for (int y = 0; y < oh; ++y) {
    const int* yi = ty.idx.data() + y * 4;
    const float* yw = ty.wgt.data() + y * 4;
    float* orow = dst + static_cast<size_t>(y) * ow * 3;
    const float* r0 = tmp.data() + static_cast<size_t>(yi[0]) * ow * 3;
    const float* r1 = tmp.data() + static_cast<size_t>(yi[1]) * ow * 3;
    const float* r2 = tmp.data() + static_cast<size_t>(yi[2]) * ow * 3;
    const float* r3 = tmp.data() + static_cast<size_t>(yi[3]) * ow * 3;
    const float w0 = yw[0], w1 = yw[1], w2 = yw[2], w3 = yw[3];
    const int nn = ow * 3;
    for (int i = 0; i < nn; ++i) {
      orow[i] = w0 * r0[i] + w1 * r1[i] + w2 * r2[i] + w3 * r3[i];
    }
  }
}

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

// Shared decode+resize front-end; `resized` receives the unnormalized bicubic
// output in float (range ~[0, 255] with cubic over/undershoot).
bool DecodeAndResize(const char* path, int image_size, std::vector<float>* resized) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> bytes(fsize > 0 ? fsize : 0);
  if (fsize > 0 && std::fread(bytes.data(), 1, fsize, f) != static_cast<size_t>(fsize)) {
    std::fclose(f);
    return false;
  }
  std::fclose(f);

  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!DecodeImage(bytes.data(), bytes.size(), &rgb, &w, &h) || w <= 0 || h <= 0) {
    return false;
  }
  resized->resize(static_cast<size_t>(image_size) * image_size * 3);
  ResizeBicubic(rgb.data(), h, w, resized->data(), image_size, image_size);
  return true;
}

// Full single-image pipeline into out (image_size*image_size*3 floats).
bool ProcessOne(const char* path, int image_size, bool hflip, float* out) {
  std::vector<float> resized;
  if (!DecodeAndResize(path, image_size, &resized)) return false;
  for (int y = 0; y < image_size; ++y) {
    for (int x = 0; x < image_size; ++x) {
      const int sx = hflip ? (image_size - 1 - x) : x;
      const float* p = resized.data() + (static_cast<size_t>(y) * image_size + sx) * 3;
      float* o = out + (static_cast<size_t>(y) * image_size + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = p[c] * (1.0f / 255.0f);
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);  // clamp cubic over/undershoot
        o[c] = (v - kClipMean[c]) / kClipStd[c];
      }
    }
  }
  return true;
}

// uint8-output variant: decode + resize only (PIL-style round-to-nearest into
// uint8); normalization runs fused ON DEVICE (team_tpu/ops/preprocess.py).
// Output is 4x smaller than float32 — less host->device transfer and zero
// host float math per pixel.
bool ProcessOneU8(const char* path, int image_size, bool hflip, uint8_t* out) {
  std::vector<float> resized;
  if (!DecodeAndResize(path, image_size, &resized)) return false;
  for (int y = 0; y < image_size; ++y) {
    for (int x = 0; x < image_size; ++x) {
      const int sx = hflip ? (image_size - 1 - x) : x;
      const float* p = resized.data() + (static_cast<size_t>(y) * image_size + sx) * 3;
      uint8_t* o = out + (static_cast<size_t>(y) * image_size + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v = p[c] + 0.5f;
        o[c] = static_cast<uint8_t>(v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v));
      }
    }
  }
  return true;
}

// Patch-major uint8 variant: writes the decoded+resized pixels straight into
// the ViT patch-pixel layout [grid*grid, 3*ps*ps] with the torch-conv
// element order (token = (y/ps)*grid + x/ps; inner = (c*ps + y%ps)*ps + x%ps
// — matches team_tpu.backbone.clip.patch_pixels). Same bytes as the HWC
// image, but the device then does ZERO spatial reorder: the minor-dim-3
// [H,W,3] layout is lane-hostile on TPU (measured ~0.35 ms/batch of encode
// time, scripts/r4_patch_ingest_probe.py), and the resampler writes every
// pixel exactly once either way — patch-major offsets are free on the host.
bool ProcessOneU8Patches(const char* path, int image_size, int patch_size,
                         bool hflip, uint8_t* out) {
  std::vector<float> resized;
  if (!DecodeAndResize(path, image_size, &resized)) return false;
  const int grid = image_size / patch_size;
  const int ps2 = patch_size * patch_size;
  for (int y = 0; y < image_size; ++y) {
    const int ty = y / patch_size, py = y % patch_size;
    for (int x = 0; x < image_size; ++x) {
      const int sx = hflip ? (image_size - 1 - x) : x;
      const float* p = resized.data() + (static_cast<size_t>(y) * image_size + sx) * 3;
      const int tok = ty * grid + x / patch_size;
      const int px = x % patch_size;
      uint8_t* o = out + static_cast<size_t>(tok) * 3 * ps2;
      for (int c = 0; c < 3; ++c) {
        const float v = p[c] + 0.5f;
        o[(c * patch_size + py) * patch_size + px] =
            static_cast<uint8_t>(v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v));
      }
    }
  }
  return true;
}

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_size != n_threads) {
    delete g_pool;
    g_pool = new ThreadPool(n_threads);
    g_pool_size = n_threads;
  }
  return g_pool;
}

}  // namespace

extern "C" {

// Decode+resize+normalize a batch of image files into `out`
// [batch, image_size, image_size, 3] float32. `ok` (len batch) receives 1/0
// per image. Returns the number of successfully processed images.
int team_io_load_batch(const char** paths, int batch, int image_size,
                       const uint8_t* hflip, int n_threads, float* out,
                       uint8_t* ok) {
  ThreadPool* pool = GetPool(n_threads > 0 ? n_threads : 8);
  std::atomic<int> done{0};
  std::atomic<int> good{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(image_size) * image_size * 3;
  for (int i = 0; i < batch; ++i) {
    pool->Submit([&, i] {
      const bool success =
          ProcessOne(paths[i], image_size, hflip != nullptr && hflip[i], out + stride * i);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
      if (done.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == batch; });
  return good.load();
}

// uint8 variant of team_io_load_batch: decode+resize only, normalization is
// the device's job. out is [batch, image_size, image_size, 3] uint8.
int team_io_load_batch_u8(const char** paths, int batch, int image_size,
                          const uint8_t* hflip, int n_threads, uint8_t* out,
                          uint8_t* ok) {
  ThreadPool* pool = GetPool(n_threads > 0 ? n_threads : 8);
  std::atomic<int> done{0};
  std::atomic<int> good{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(image_size) * image_size * 3;
  for (int i = 0; i < batch; ++i) {
    pool->Submit([&, i] {
      const bool success =
          ProcessOneU8(paths[i], image_size, hflip != nullptr && hflip[i], out + stride * i);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
      if (done.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == batch; });
  return good.load();
}

// Patch-major uint8 batch loader: out is [batch, (image_size/patch_size)^2,
// 3*patch_size*patch_size] uint8 in the ViT patch-pixel order (see
// ProcessOneU8Patches). The device ingest becomes a pure per-column
// scale/bias folded into the patch-embedding dot — no reorder at all.
int team_io_load_batch_u8_patches(const char** paths, int batch,
                                  int image_size, int patch_size,
                                  const uint8_t* hflip, int n_threads,
                                  uint8_t* out, uint8_t* ok) {
  ThreadPool* pool = GetPool(n_threads > 0 ? n_threads : 8);
  std::atomic<int> done{0};
  std::atomic<int> good{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(image_size) * image_size * 3;
  for (int i = 0; i < batch; ++i) {
    pool->Submit([&, i] {
      const bool success = ProcessOneU8Patches(
          paths[i], image_size, patch_size, hflip != nullptr && hflip[i],
          out + stride * i);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
      if (done.fetch_add(1) + 1 == batch) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == batch; });
  return good.load();
}

// Herding exemplar selection (reference models/base.py:291-311 math):
// greedily pick m indices minimizing ||class_mean - (v + S)/k||. vectors is
// [n, d] row-major; selected indices written to out_idx (len m).
void team_io_herding(const float* vectors, int n, int d, const float* class_mean,
                     int m, int* out_idx) {
  std::vector<uint8_t> used(n, 0);
  std::vector<double> S(d, 0.0);
  if (m > n) m = n;
  for (int k = 1; k <= m; ++k) {
    double best = 1e300;
    int best_i = -1;
    for (int i = 0; i < n; ++i) {
      if (used[i]) continue;
      const float* v = vectors + static_cast<size_t>(i) * d;
      double dist = 0.0;
      for (int j = 0; j < d; ++j) {
        const double mu = (v[j] + S[j]) / k;
        const double diff = class_mean[j] - mu;
        dist += diff * diff;
      }
      if (dist < best) {
        best = dist;
        best_i = i;
      }
    }
    used[best_i] = 1;
    out_idx[k - 1] = best_i;
    const float* v = vectors + static_cast<size_t>(best_i) * d;
    for (int j = 0; j < d; ++j) S[j] += v[j];
  }
}

}  // extern "C"
