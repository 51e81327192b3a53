// limg-tpu native host runtime.
//
// The reference's native layer is a std::thread pool that shards *compute*
// (src/limg_threading.cpp) plus vendored stb image IO (src/main.cpp:17-21).
// On TPU the compute parallelism lives on the device, so the native layer's
// job moves to the host data path: decode images, relayout them into the
// packed (pixels, blocks) tensors the device kernels consume, write debug
// planes, and keep a worker pool streaming a corpus so host staging overlaps
// device encode.
//
// Exposed as extern "C" for ctypes (no pybind11 in this environment).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr int kBlock = 8;

#pragma pack(push, 1)
struct TgaHeader {
  uint8_t id_length = 0;
  uint8_t color_map_type = 0;
  uint8_t image_type = 0;  // 2 = truecolor, 3 = grayscale
  uint16_t cmap_origin = 0;
  uint16_t cmap_length = 0;
  uint8_t cmap_depth = 0;
  uint16_t x_origin = 0;
  uint16_t y_origin = 0;
  uint16_t width = 0;
  uint16_t height = 0;
  uint8_t bpp = 0;
  uint8_t descriptor = 0;
};
#pragma pack(pop)

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Blockify: (H, W) RGBA u32 image -> packed (64, NB) u32 block tensor in
// row-major in-block pixel order plus a (64, NB) u8 validity mask.
// NB = ceil(H/8) * ceil(W/8); edge blocks are zero-padded.
// The layout matches limg_tpu.ops.layout.blockify + pallas pack_channels.
// ---------------------------------------------------------------------------
void limg_rt_blockify_u32(const uint32_t* image, int64_t h, int64_t w,
                          uint32_t* out_packed, uint8_t* out_mask) {
  const int64_t by = (h + kBlock - 1) / kBlock;
  const int64_t bx = (w + kBlock - 1) / kBlock;
  const int64_t nb = by * bx;
  for (int64_t iy = 0; iy < by; iy++) {
    for (int64_t ix = 0; ix < bx; ix++) {
      const int64_t block = iy * bx + ix;
      for (int64_t py = 0; py < kBlock; py++) {
        const int64_t y = iy * kBlock + py;
        for (int64_t px = 0; px < kBlock; px++) {
          const int64_t x = ix * kBlock + px;
          const int64_t p = py * kBlock + px;
          const bool valid = (y < h) & (x < w);
          out_packed[p * nb + block] = valid ? image[y * w + x] : 0u;
          out_mask[p * nb + block] = valid ? 1 : 0;
        }
      }
    }
  }
}

// Inverse: packed (64, NB) u32 -> (H, W) RGBA u32 (crops padding).
void limg_rt_unblockify_u32(const uint32_t* packed, int64_t h, int64_t w,
                            uint32_t* out_image) {
  const int64_t by = (h + kBlock - 1) / kBlock;
  const int64_t bx = (w + kBlock - 1) / kBlock;
  const int64_t nb = by * bx;
  for (int64_t y = 0; y < h; y++) {
    for (int64_t x = 0; x < w; x++) {
      const int64_t block = (y / kBlock) * bx + (x / kBlock);
      const int64_t p = (y % kBlock) * kBlock + (x % kBlock);
      out_image[y * w + x] = packed[p * nb + block];
    }
  }
}

// ---------------------------------------------------------------------------
// TGA write (type 2 truecolor BGRA / type 3 grayscale), top-left origin.
// Matches the debug dumps the reference emits via stb (src/main.cpp:350-370).
// ---------------------------------------------------------------------------
int limg_rt_write_tga_rgba(const char* path, const uint32_t* rgba,
                           int64_t h, int64_t w) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  TgaHeader hdr;
  hdr.image_type = 2;
  hdr.width = (uint16_t)w;
  hdr.height = (uint16_t)h;
  hdr.bpp = 32;
  hdr.descriptor = 0x28;  // top-left, 8 alpha bits
  fwrite(&hdr, sizeof(hdr), 1, f);
  std::vector<uint32_t> row(w);
  for (int64_t y = 0; y < h; y++) {
    for (int64_t x = 0; x < w; x++) {
      const uint32_t v = rgba[y * w + x];  // 0xAABBGGRR in memory order
      row[x] = (v & 0xFF00FF00u) | ((v & 0xFFu) << 16) | ((v >> 16) & 0xFFu);
    }
    fwrite(row.data(), 4, w, f);
  }
  fclose(f);
  return 0;
}

int limg_rt_write_tga_gray(const char* path, const uint8_t* gray,
                           int64_t h, int64_t w) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  TgaHeader hdr;
  hdr.image_type = 3;
  hdr.width = (uint16_t)w;
  hdr.height = (uint16_t)h;
  hdr.bpp = 8;
  hdr.descriptor = 0x20;  // top-left
  fwrite(&hdr, sizeof(hdr), 1, f);
  fwrite(gray, 1, (size_t)h * w, f);
  fclose(f);
  return 0;
}

// Uncompressed truecolor/grayscale TGA reader -> RGBA u32.
// Returns 0 on success; fills *out_h/*out_w when out_rgba is null (probe).
int limg_rt_read_tga(const char* path, uint32_t* out_rgba,
                     int64_t* out_h, int64_t* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  TgaHeader hdr;
  if (fread(&hdr, sizeof(hdr), 1, f) != 1) { fclose(f); return -2; }
  if (hdr.color_map_type != 0 || (hdr.image_type != 2 && hdr.image_type != 3)) {
    fclose(f);
    return -3;
  }
  fseek(f, hdr.id_length, SEEK_CUR);
  const int64_t h = hdr.height, w = hdr.width;
  if (out_h) *out_h = h;
  if (out_w) *out_w = w;
  if (!out_rgba) { fclose(f); return 0; }
  const int bytes = hdr.bpp / 8;
  const bool top_left = (hdr.descriptor & 0x20) != 0;
  std::vector<uint8_t> row(w * bytes);
  for (int64_t ry = 0; ry < h; ry++) {
    if (fread(row.data(), bytes, w, f) != (size_t)w) { fclose(f); return -4; }
    const int64_t y = top_left ? ry : (h - 1 - ry);
    for (int64_t x = 0; x < w; x++) {
      uint8_t r, g, b, a = 0xFF;
      if (hdr.image_type == 3) {
        r = g = b = row[x];
      } else {
        b = row[x * bytes + 0];
        g = row[x * bytes + 1];
        r = row[x * bytes + 2];
        if (bytes == 4) a = row[x * bytes + 3];
      }
      out_rgba[y * w + x] =
          (uint32_t)r | ((uint32_t)g << 8) | ((uint32_t)b << 16) | ((uint32_t)a << 24);
    }
  }
  fclose(f);
  return 0;
}

// Binary PPM (P6) reader -> RGBA u32.
int limg_rt_read_ppm(const char* path, uint32_t* out_rgba,
                     int64_t* out_h, int64_t* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[3] = {0};
  int w = 0, h = 0, maxv = 0;
  if (fscanf(f, "%2s %d %d %d", magic, &w, &h, &maxv) != 4 ||
      strcmp(magic, "P6") != 0 || maxv != 255) {
    fclose(f);
    return -3;
  }
  fgetc(f);  // single whitespace after header
  if (out_h) *out_h = h;
  if (out_w) *out_w = w;
  if (!out_rgba) { fclose(f); return 0; }
  std::vector<uint8_t> row((size_t)w * 3);
  for (int64_t y = 0; y < h; y++) {
    if (fread(row.data(), 3, w, f) != (size_t)w) { fclose(f); return -4; }
    for (int64_t x = 0; x < w; x++) {
      out_rgba[y * w + x] = (uint32_t)row[x * 3] | ((uint32_t)row[x * 3 + 1] << 8) |
                            ((uint32_t)row[x * 3 + 2] << 16) | 0xFF000000u;
    }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Corpus staging pool: worker threads decode + blockify files into
// caller-provided slots so host IO overlaps device encode. The device-side
// analog of the reference's limg_thread_pool (src/limg_threading.h:9-17).
// ---------------------------------------------------------------------------
struct limg_rt_pool {
  std::vector<std::thread> workers;
  std::queue<std::function<void()>> tasks;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int64_t> pending{0};
  bool stop = false;
};

limg_rt_pool* limg_rt_pool_new(int threads) {
  auto* p = new limg_rt_pool();
  if (threads < 1) threads = 1;
  for (int i = 0; i < threads; i++) {
    p->workers.emplace_back([p] {
      while (true) {
        std::function<void()> task;
        {
          std::unique_lock<std::mutex> lk(p->mu);
          p->cv.wait(lk, [p] { return p->stop || !p->tasks.empty(); });
          if (p->stop && p->tasks.empty()) return;
          task = std::move(p->tasks.front());
          p->tasks.pop();
        }
        task();
        p->pending.fetch_sub(1);
      }
    });
  }
  return p;
}

void limg_rt_pool_destroy(limg_rt_pool* p) {
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->stop = true;
  }
  p->cv.notify_all();
  for (auto& t : p->workers) t.join();
  delete p;
}

int limg_rt_pool_thread_count(limg_rt_pool* p) { return (int)p->workers.size(); }

// Stage one file: decode (TGA/PPM by extension) and blockify into the given
// slot buffers. status: 0 queued-ok result written asynchronously; slot
// status cell becomes 1 on success, <0 on failure.
void limg_rt_pool_stage_file(limg_rt_pool* p, const char* path,
                             uint32_t* packed_slot, uint8_t* mask_slot,
                             int64_t h, int64_t w, int32_t* status_cell) {
  std::string spath(path);
  p->pending.fetch_add(1);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->tasks.push([spath, packed_slot, mask_slot, h, w, status_cell] {
      std::vector<uint32_t> img((size_t)h * w);
      int rc = -10;
      const size_t n = spath.size();
      if (n > 4 && spath.compare(n - 4, 4, ".tga") == 0)
        rc = limg_rt_read_tga(spath.c_str(), img.data(), nullptr, nullptr);
      else if (n > 4 && spath.compare(n - 4, 4, ".ppm") == 0)
        rc = limg_rt_read_ppm(spath.c_str(), img.data(), nullptr, nullptr);
      if (rc == 0) {
        limg_rt_blockify_u32(img.data(), h, w, packed_slot, mask_slot);
        *status_cell = 1;
      } else {
        *status_cell = rc;
      }
    });
  }
  p->cv.notify_one();
}

void limg_rt_pool_await(limg_rt_pool* p) {
  while (p->pending.load() > 0) std::this_thread::yield();
}

int64_t limg_rt_max_threads() {
  return (int64_t)std::thread::hardware_concurrency();
}

// ---------------------------------------------------------------------------
// rANS entropy codec (order-0, static 12-bit quantized frequencies).
//
// Used by the LTP1 v3 bitstream to entropy-code the crushed factor planes --
// a capability the reference lacks entirely (it has no bitstream; a dead
// buffer prototype sits at src/limg_internal.h:96-144). 32-bit state, byte
// renormalization; the encoder walks symbols in reverse and the byte stream
// is reversed at the end so the decoder reads forward.
// ---------------------------------------------------------------------------

namespace {

constexpr uint32_t kRansProbBits = 12;
constexpr uint32_t kRansProbScale = 1u << kRansProbBits;
constexpr uint32_t kRansLow = 1u << 23;

}  // namespace

// freqs: u32[256], quantized so that sum == 4096 and every symbol that
// occurs has freq >= 1 (the Python side quantizes). Returns bytes written,
// or -1 if out_cap is too small.
int64_t limg_rt_rans_encode(const uint8_t* syms, int64_t n,
                            const uint32_t* freqs, uint8_t* out,
                            int64_t out_cap) {
  uint32_t starts[257];
  starts[0] = 0;
  for (int i = 0; i < 256; i++) starts[i + 1] = starts[i] + freqs[i];
  if (starts[256] != kRansProbScale) return -2;

  std::vector<uint8_t> rev;
  rev.reserve((size_t)n + 16);
  uint32_t state = kRansLow;
  for (int64_t i = n - 1; i >= 0; i--) {
    const uint32_t s = syms[i];
    const uint32_t f = freqs[s];
    const uint32_t x_max = ((kRansLow >> kRansProbBits) << 8) * f;
    while (state >= x_max) {
      rev.push_back((uint8_t)(state & 0xFF));
      state >>= 8;
    }
    state = ((state / f) << kRansProbBits) + (state % f) + starts[s];
  }
  for (int i = 0; i < 4; i++) {
    rev.push_back((uint8_t)(state & 0xFF));
    state >>= 8;
  }
  const int64_t total = (int64_t)rev.size();
  if (total > out_cap) return -1;
  for (int64_t i = 0; i < total; i++) out[i] = rev[(size_t)(total - 1 - i)];
  return total;
}

// Returns 0 on success.
int limg_rt_rans_decode(const uint8_t* data, int64_t nbytes,
                        const uint32_t* freqs, uint8_t* out, int64_t n) {
  uint32_t starts[257];
  starts[0] = 0;
  for (int i = 0; i < 256; i++) starts[i + 1] = starts[i] + freqs[i];
  if (starts[256] != kRansProbScale) return -2;
  std::vector<uint8_t> slot_sym(kRansProbScale);
  for (int s = 0; s < 256; s++)
    for (uint32_t j = starts[s]; j < starts[s + 1]; j++) slot_sym[j] = (uint8_t)s;

  const uint8_t* p = data;
  const uint8_t* end = data + nbytes;
  if (nbytes < 4) return -3;
  uint32_t state = 0;
  for (int i = 0; i < 4; i++) state = (state << 8) | *p++;
  for (int64_t i = 0; i < n; i++) {
    const uint32_t slot = state & (kRansProbScale - 1);
    const uint8_t s = slot_sym[slot];
    out[i] = s;
    state = freqs[s] * (state >> kRansProbBits) + slot - starts[s];
    while (state < kRansLow) {
      if (p >= end) return -4;
      state = (state << 8) | *p++;
    }
  }
  // the encoder started from exactly kRansLow, so a well-formed stream
  // returns there after the last symbol
  return state == kRansLow ? 0 : -5;
}

}  // extern "C"
