// banet_tpu native runtime: image decode + prefetch + point selection.
//
// The reference's data path runs on OpenCV + TF1's C++ runtime
// (cv2.imread at legacy/seq_example.py:142-144, TF queue runners
// implicitly); this library provides the TPU-framework equivalent: a
// threaded PNG decode/prefetch pipeline and the host-side per-keyframe
// hot ops (Sobel texture scoring + point selection,
// legacy/seq_example.py:72-82), callable from Python via ctypes
// (banet_tpu/runtime/native.py).
//
// Design:
//  - decode_rgb / decode_depth16: libpng decoders producing float32
//    HxWx3 (0..255) and float32 HxW (units: meters, raw/5000).
//  - Prefetcher: N worker threads decode (rgb, depth) pairs ahead of
//    the consumer into fixed slot buffers; frames are delivered
//    strictly in order.  Bounded memory: `capacity` slots.
//  - sobel_select_points: gradient-magnitude scoring + thresholded
//    uniform sampling with an xorshift PRNG (seeded, reproducible).
//
// Build: see Makefile (g++ -O3 -fPIC, links libpng/z/pthread).

#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------

// Reads image dimensions; returns 0 on success.
int png_dims(const char* path, int* height, int* width, int* channels,
             int* bit_depth) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *height = png_get_image_height(png, info);
  *width = png_get_image_width(png, info);
  *channels = png_get_channels(png, info);
  *bit_depth = png_get_bit_depth(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decodes any PNG to float32 RGB in [0, 255]; out has size H*W*3.
// Gray and palette images are expanded; 16-bit is scaled to 8-bit.
int decode_rgb(const char* path, float* out, int height, int width) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  if ((int)png_get_image_height(png, info) != height ||
      (int)png_get_image_width(png, info) != width) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  // Normalize to 8-bit RGB.
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  std::vector<png_byte> row(png_get_rowbytes(png, info));
  for (int y = 0; y < height; ++y) {
    png_read_row(png, row.data(), nullptr);
    float* dst = out + (size_t)y * width * 3;
    for (int x = 0; x < width * 3; ++x) dst[x] = (float)row[x];
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// Decodes a 16-bit grayscale depth PNG to float32 meters (value/scale).
int decode_depth16(const char* path, float* out, int height, int width,
                   float scale) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return 1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                             nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 2;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  int bd = png_get_bit_depth(png, info);
  if ((int)png_get_image_height(png, info) != height ||
      (int)png_get_image_width(png, info) != width ||
      png_get_channels(png, info) != 1) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 3;
  }
  const float inv = 1.0f / scale;
  if (bd == 16) {
    std::vector<png_byte> row((size_t)width * 2);
    for (int y = 0; y < height; ++y) {
      png_read_row(png, row.data(), nullptr);
      float* dst = out + (size_t)y * width;
      for (int x = 0; x < width; ++x) {
        // PNG is big-endian.
        uint16_t v = (uint16_t)((row[2 * x] << 8) | row[2 * x + 1]);
        dst[x] = v * inv;
      }
    }
  } else {
    std::vector<png_byte> row(width);
    for (int y = 0; y < height; ++y) {
      png_read_row(png, row.data(), nullptr);
      float* dst = out + (size_t)y * width;
      for (int x = 0; x < width; ++x) dst[x] = row[x] * inv;
    }
  }
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------
// Threaded prefetcher
// ---------------------------------------------------------------------

struct Prefetcher {
  int height, width;
  float depth_scale;
  std::vector<std::string> rgb_paths, depth_paths;
  int capacity;

  struct Slot {
    std::vector<float> rgb, depth;
    int status = 0;  // decode return code (0 ok)
  };
  std::vector<Slot> slots;  // slot i holds frame (next_emit + k)
  std::vector<int> slot_frame;          // frame index held, -1 empty
  std::vector<uint8_t> slot_ready;

  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  std::atomic<int> next_fetch{0};
  int next_emit = 0;
  bool stop = false;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      int frame = next_fetch.fetch_add(1);
      if (frame >= (int)rgb_paths.size()) return;
      int slot = frame % capacity;
      {
        // Wait until the slot is free for this frame's generation.
        std::unique_lock<std::mutex> lk(mu);
        cv_free.wait(lk, [&] {
          return stop || slot_frame[slot] < 0 ||
                 slot_frame[slot] >= frame;
        });
        if (stop) return;
        slot_frame[slot] = frame;
        slot_ready[slot] = 0;
      }
      Slot& s = slots[slot];
      int rc = decode_rgb(rgb_paths[frame].c_str(), s.rgb.data(), height,
                          width);
      if (rc == 0 && !depth_paths[frame].empty()) {
        rc = decode_depth16(depth_paths[frame].c_str(), s.depth.data(),
                            height, width, depth_scale);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        s.status = rc;
        slot_ready[slot] = 1;
      }
      cv_ready.notify_all();
    }
  }
};

void* prefetcher_create(const char** rgb_paths, const char** depth_paths,
                        int num_frames, int height, int width,
                        float depth_scale, int num_threads,
                        int capacity) {
  auto* p = new Prefetcher();
  p->height = height;
  p->width = width;
  p->depth_scale = depth_scale;
  // A worker for frame f may claim slot (f % capacity) once the slot's
  // previous tenant has been emitted; with more workers than slots two
  // workers could otherwise race a generation apart into the same slot,
  // so keep at least num_threads+1 slots.
  int min_cap = (num_threads < 1 ? 1 : num_threads) + 1;
  p->capacity = capacity < 2 ? 2 : capacity;
  if (p->capacity < min_cap) p->capacity = min_cap;
  for (int i = 0; i < num_frames; ++i) {
    p->rgb_paths.emplace_back(rgb_paths[i]);
    p->depth_paths.emplace_back(depth_paths ? depth_paths[i] : "");
  }
  p->slots.resize(p->capacity);
  for (auto& s : p->slots) {
    s.rgb.resize((size_t)height * width * 3);
    s.depth.resize((size_t)height * width);
  }
  p->slot_frame.assign(p->capacity, -1);
  p->slot_ready.assign(p->capacity, 0);
  int nthreads = num_threads < 1 ? 1 : num_threads;
  for (int t = 0; t < nthreads; ++t)
    p->workers.emplace_back(&Prefetcher::worker, p);
  return p;
}

// Copies the next frame (in order) into out buffers; returns the decode
// status (0 ok), or -1 when the sequence is exhausted.
int prefetcher_next(void* handle, float* out_rgb, float* out_depth) {
  auto* p = (Prefetcher*)handle;
  if (p->next_emit >= (int)p->rgb_paths.size()) return -1;
  int frame = p->next_emit;
  int slot = frame % p->capacity;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] {
    return p->slot_frame[slot] == frame && p->slot_ready[slot];
  });
  Prefetcher::Slot& s = p->slots[slot];
  int rc = s.status;
  if (rc == 0) {
    std::memcpy(out_rgb, s.rgb.data(), s.rgb.size() * sizeof(float));
    if (out_depth)
      std::memcpy(out_depth, s.depth.data(),
                  s.depth.size() * sizeof(float));
  }
  p->slot_frame[slot] = -1;  // release slot for reuse
  p->next_emit++;
  lk.unlock();
  p->cv_free.notify_all();
  return rc;
}

void prefetcher_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
    p->next_fetch.store((int)p->rgb_paths.size());
  }
  p->cv_free.notify_all();
  p->cv_ready.notify_all();
  for (auto& w : p->workers) w.join();
  delete p;
}

// ---------------------------------------------------------------------
// Point selection (Sobel texture + valid depth), reproducible PRNG
// ---------------------------------------------------------------------

static inline uint64_t xorshift64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

// rgb: H*W*3 floats; depth: H*W floats; out_points: N*2 (x, y);
// out_depths: N.  Relaxes the texture gate if too few candidates.
// Returns the number of candidate pixels found (>=0) or -1 on failure.
int sobel_select_points(const float* rgb, const float* depth, int height,
                        int width, float texture_threshold,
                        float min_depth, int num_points,
                        uint64_t seed, float* out_points,
                        float* out_depths) {
  const int H = height, W = width;
  std::vector<float> mag((size_t)H * W, 0.0f);
  // Sobel on the 3-channel sum of squared responses (matches
  // data/points.py sobel_magnitude).
  auto at = [&](int y, int x, int c) -> float {
    y = y < 0 ? 0 : (y >= H ? H - 1 : y);
    x = x < 0 ? 0 : (x >= W ? W - 1 : x);
    return rgb[((size_t)y * W + x) * 3 + c];
  };
  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      float gx2 = 0.f, gy2 = 0.f;
      for (int c = 0; c < 3; ++c) {
        float gx = (at(y - 1, x + 1, c) + 2 * at(y, x + 1, c) +
                    at(y + 1, x + 1, c)) -
                   (at(y - 1, x - 1, c) + 2 * at(y, x - 1, c) +
                    at(y + 1, x - 1, c));
        float gy = (at(y + 1, x - 1, c) + 2 * at(y + 1, x, c) +
                    at(y + 1, x + 1, c)) -
                   (at(y - 1, x - 1, c) + 2 * at(y - 1, x, c) +
                    at(y - 1, x + 1, c));
        gx2 += gx * gx;
        gy2 += gy * gy;
      }
      mag[(size_t)y * W + x] = std::sqrt(gx2 + gy2);
    }
  }
  std::vector<int> cand;
  float thr = texture_threshold;
  for (int tries = 0; tries < 24; ++tries) {
    cand.clear();
    for (int i = 0; i < H * W; ++i)
      if (mag[i] > thr && depth[i] > min_depth) cand.push_back(i);
    if ((int)cand.size() >= (num_points / 8 > 16 ? num_points / 8 : 16))
      break;
    thr *= 0.5f;
    if (thr < 1e-3f) break;
  }
  if (cand.empty()) {
    for (int i = 0; i < H * W; ++i)
      if (depth[i] > min_depth) cand.push_back(i);
    if (cand.empty()) return -1;
  }
  uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
  for (int n = 0; n < num_points; ++n) {
    int pick = cand[xorshift64(&s) % cand.size()];
    out_points[2 * n] = (float)(pick % W);
    out_points[2 * n + 1] = (float)(pick / W);
    out_depths[n] = depth[pick];
  }
  return (int)cand.size();
}

}  // extern "C"
