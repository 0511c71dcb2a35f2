// vstpu_runtime: host-side native runtime for the TPU-native SLAM framework.
//
// The reference engine's host runtime is C++ behind JNI (camera frame
// marshalling in src/.../SystemPTAM.java:24-30 + jni/jni_part.cpp:59-71, and
// the MapMaker scheduler loop jni/MapMaker.cc:80-123).  This library is the
// TPU-native equivalent of that layer: everything that is NOT device compute
// but must keep a 60fps device busy --
//
//   * image decoding (PGM/PPM/PNG via libpng) to grayscale u8,
//   * bilinear resize to the tracker's frame geometry,
//   * a multi-threaded prefetching frame pipeline (bounded ring buffer,
//     worker pool) so the host never stalls the per-frame jitted program,
//   * the mapping-task scheduler: the priority policy of MapMaker::run()
//     (jni/MapMaker.cc:80-123) as a pure decision function over engine
//     state flags (the thread the reference disabled at MapMaker.cc:55-56
//     becomes explicit host scheduling between device dispatches),
//   * binary keyframe/map blob IO (fwrite-based, for fast checkpointing).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (visualslam_android_tpu/native_runtime.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <png.h>

#define VSTPU_API extern "C" __attribute__((visibility("default")))

namespace {

// ---------------------------------------------------------------------------
// Image decode: PGM (P2/P5), PPM (P3/P6) -> luma, PNG via libpng.
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> gray;  // row-major u8 luma
};

bool decode_pnm(FILE* f, Image* out) {
  char magic[3] = {0};
  if (fscanf(f, "%2s", magic) != 1) return false;
  bool ascii = magic[1] == '2' || magic[1] == '3';
  bool color = magic[1] == '3' || magic[1] == '6';
  if (magic[0] != 'P' || (magic[1] < '2' || magic[1] > '6')) return false;
  // Header ints with '#' comments.
  auto next_int = [&](int* v) -> bool {
    int c;
    for (;;) {
      c = fgetc(f);
      if (c == '#') {
        while (c != '\n' && c != EOF) c = fgetc(f);
      } else if (!isspace(c)) {
        break;
      }
      if (c == EOF) return false;
    }
    ungetc(c, f);
    return fscanf(f, "%d", v) == 1;
  };
  int w, h, maxv;
  if (!next_int(&w) || !next_int(&h) || !next_int(&maxv)) return false;
  if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 65535) return false;
  fgetc(f);  // single whitespace after maxval
  const size_t n = (size_t)w * h;
  const int ch = color ? 3 : 1;
  out->w = w;
  out->h = h;
  out->gray.resize(n);
  std::vector<uint16_t> px(n * ch);
  if (ascii) {
    for (size_t i = 0; i < n * ch; ++i) {
      int v;
      if (fscanf(f, "%d", &v) != 1) return false;
      px[i] = (uint16_t)v;
    }
  } else if (maxv < 256) {
    std::vector<uint8_t> raw(n * ch);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return false;
    for (size_t i = 0; i < raw.size(); ++i) px[i] = raw[i];
  } else {
    std::vector<uint8_t> raw(n * ch * 2);
    if (fread(raw.data(), 1, raw.size(), f) != raw.size()) return false;
    for (size_t i = 0; i < n * ch; ++i)
      px[i] = (uint16_t)((raw[2 * i] << 8) | raw[2 * i + 1]);
  }
  const float scale = 255.0f / (float)maxv;
  for (size_t i = 0; i < n; ++i) {
    float v;
    if (color) {
      // BT.601 luma, same weights OpenCV's cvtColor uses in the
      // reference's Java camera path.
      v = 0.299f * px[3 * i] + 0.587f * px[3 * i + 1] +
          0.114f * px[3 * i + 2];
    } else {
      v = (float)px[i];
    }
    v *= scale;
    out->gray[i] = (uint8_t)(v + 0.5f > 255.f ? 255 : (v < 0 ? 0 : v + 0.5f));
  }
  return true;
}

bool decode_png(FILE* f, Image* out) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
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
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_uint_32 w, h;
  int depth, color_type;
  png_get_IHDR(png, info, &w, &h, &depth, &color_type, nullptr, nullptr,
               nullptr);
  if (depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB ||
      color_type == PNG_COLOR_TYPE_RGB_ALPHA ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    // BT.601 luma to match the PNM path above.
    png_set_rgb_to_gray(png, PNG_ERROR_ACTION_NONE, 0.299, 0.587);
  png_read_update_info(png, info);
  out->w = (int)w;
  out->h = (int)h;
  out->gray.resize((size_t)w * h);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->gray.data() + (size_t)y * w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  int c0 = fgetc(f);
  rewind(f);
  bool ok = false;
  if (c0 == 'P') {
    ok = decode_pnm(f, out);
  } else {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// Bilinear resize u8 -> u8, matching cv::resize(INTER_LINEAR) pixel-center
// convention (the reference builds pyramids with cv::resize,
// jni/KeyFrame.cc:20-23).
void resize_bilinear(const Image& src, int dw, int dh, uint8_t* dst) {
  if (src.w == dw && src.h == dh) {
    memcpy(dst, src.gray.data(), (size_t)dw * dh);
    return;
  }
  const float sx = (float)src.w / dw, sy = (float)src.h / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    if (y0 > src.h - 2) y0 = src.h - 2;
    float wy = fy - y0;
    const uint8_t* r0 = src.gray.data() + (size_t)y0 * src.w;
    const uint8_t* r1 = r0 + src.w;
    uint8_t* drow = dst + (size_t)y * dw;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      if (x0 > src.w - 2) x0 = src.w - 2;
      float wx = fx - x0;
      float v = (1 - wy) * ((1 - wx) * r0[x0] + wx * r0[x0 + 1]) +
                wy * ((1 - wx) * r1[x0] + wx * r1[x0 + 1]);
      drow[x] = (uint8_t)(v + 0.5f);
    }
  }
}

// ---------------------------------------------------------------------------
// Frame pipeline: worker pool decodes + resizes ahead of the consumer.
// ---------------------------------------------------------------------------

struct Frame {
  int64_t index = -1;
  bool ok = false;
  std::vector<uint8_t> data;  // dh*dw luma
};

struct Pipeline {
  std::vector<std::string> paths;
  int dw, dh;
  size_t capacity;

  std::mutex mu;
  std::condition_variable cv_produced, cv_space;
  // Completed frames, delivered strictly in order.
  std::vector<Frame> done;        // ring keyed by index % capacity
  std::vector<bool> done_filled;  // slot occupancy
  std::atomic<int64_t> next_to_fetch{0};  // next path index a worker claims
  int64_t next_to_emit = 0;               // next index the consumer gets
  std::atomic<bool> stop{false};
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      if (stop.load()) return;
      int64_t idx = next_to_fetch.fetch_add(1);
      if (idx >= (int64_t)paths.size()) return;
      Frame fr;
      fr.index = idx;
      Image im;
      fr.ok = decode_file(paths[idx].c_str(), &im);
      if (fr.ok) {
        fr.data.resize((size_t)dw * dh);
        resize_bilinear(im, dw, dh, fr.data.data());
      }
      std::unique_lock<std::mutex> lk(mu);
      // In-order bounded delivery: wait until idx is within the window.
      cv_space.wait(lk, [&] {
        return stop.load() || idx < next_to_emit + (int64_t)capacity;
      });
      if (stop.load()) return;
      size_t slot = (size_t)(idx % capacity);
      done[slot] = std::move(fr);
      done_filled[slot] = true;
      cv_produced.notify_all();
    }
  }
};

// ---------------------------------------------------------------------------
// Mapping scheduler: MapMaker::run() priority policy (jni/MapMaker.cc:80-123)
// as a pure decision function.  Input flags describe engine state; output is
// the next mapping task the host should dispatch to the device.
// ---------------------------------------------------------------------------

enum MapTask : int {
  TASK_NONE = 0,
  TASK_BA_RECENT = 1,       // MapMaker.cc:96-98
  TASK_REFIND_NEWLY = 2,    // :102-103
  TASK_BA_ALL = 3,          // :107-108
  TASK_REFIND_FAILURES = 4, // :112-113 (1-in-20 chance)
  // NOTE HandleBadPoints (MapMaker.cc:116) is NOT a scheduled task: the
  // reference runs it unconditionally on every pass of the run() loop, so
  // the host runs it after every dispatched task instead.
  TASK_ADD_KEYFRAME = 6,    // :120-121
};

}  // namespace

// ===========================================================================
// C ABI
// ===========================================================================

VSTPU_API int vstpu_decode_image(const char* path, uint8_t* out, int dw,
                                 int dh) {
  Image im;
  if (!decode_file(path, &im)) return -1;
  resize_bilinear(im, dw, dh, out);
  return 0;
}

VSTPU_API int vstpu_image_size(const char* path, int* w, int* h) {
  Image im;
  if (!decode_file(path, &im)) return -1;
  *w = im.w;
  *h = im.h;
  return 0;
}

VSTPU_API void* vstpu_pipeline_create(const char** paths, int n_paths, int dw,
                                      int dh, int n_workers, int capacity) {
  if (n_paths < 0 || dw <= 0 || dh <= 0 || capacity < 1) return nullptr;
  auto* p = new Pipeline();
  p->paths.reserve(n_paths);
  for (int i = 0; i < n_paths; ++i) p->paths.emplace_back(paths[i]);
  p->dw = dw;
  p->dh = dh;
  p->capacity = (size_t)capacity;
  p->done.resize(p->capacity);
  p->done_filled.assign(p->capacity, false);
  if (n_workers < 1) n_workers = 1;
  for (int i = 0; i < n_workers; ++i)
    p->workers.emplace_back([p] { p->worker(); });
  return p;
}

// Returns the frame index (>=0) and fills `out` (dh*dw bytes); -1 at end of
// stream; -2 if that frame failed to decode (stream continues).
VSTPU_API int64_t vstpu_pipeline_next(void* handle, uint8_t* out) {
  auto* p = (Pipeline*)handle;
  std::unique_lock<std::mutex> lk(p->mu);
  if (p->next_to_emit >= (int64_t)p->paths.size()) return -1;
  size_t slot = (size_t)(p->next_to_emit % p->capacity);
  p->cv_produced.wait(lk, [&] { return p->done_filled[slot]; });
  Frame fr = std::move(p->done[slot]);
  p->done_filled[slot] = false;
  int64_t idx = p->next_to_emit++;
  p->cv_space.notify_all();
  lk.unlock();
  if (!fr.ok) return -2;
  memcpy(out, fr.data.data(), fr.data.size());
  return idx;
}

VSTPU_API void vstpu_pipeline_destroy(void* handle) {
  auto* p = (Pipeline*)handle;
  p->stop.store(true);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->cv_space.notify_all();
    p->cv_produced.notify_all();
  }
  for (auto& t : p->workers) t.join();
  delete p;
}

// The MapMaker::run() priority ladder (jni/MapMaker.cc:80-123).  rand20 is
// the caller-provided 1-in-20 draw (rand()%20==0 in the reference, :112).
VSTPU_API int vstpu_scheduler_next(int queue_size, int recent_converged,
                                   int full_converged, int has_failure_queue,
                                   int has_newly_made, int rand20) {
  // One prioritized work unit per call. Every BA/refind rung requires an
  // empty keyframe queue (MapMaker.cc:97,102,107,112), so a non-empty
  // queue falls straight through to AddKeyFrameFromTopOfQueue (:120-121).
  if (queue_size > 0) return TASK_ADD_KEYFRAME;
  if (!recent_converged) return TASK_BA_RECENT;
  if (has_newly_made) return TASK_REFIND_NEWLY;
  if (!full_converged) return TASK_BA_ALL;
  // Reaching here implies recent && full converged, matching the
  // reference's explicit condition on the failure-queue rung (:112).
  if (rand20 && has_failure_queue) return TASK_REFIND_FAILURES;
  return TASK_NONE;
}

// ---------------------------------------------------------------------------
// Binary blob checkpoint IO: length-prefixed named sections, fwrite-based.
// Layout: magic "VSTPU1\n", then per section: u32 name_len, name bytes,
// u64 payload_len, payload. Used for fast map checkpointing from Python
// (arrays serialized by the caller).
// ---------------------------------------------------------------------------

VSTPU_API int vstpu_blob_write(const char* path, const char** names,
                               const uint8_t** payloads, const uint64_t* sizes,
                               int n) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const char magic[] = "VSTPU1\n";
  if (fwrite(magic, 1, 7, f) != 7) goto fail;
  for (int i = 0; i < n; ++i) {
    uint32_t nl = (uint32_t)strlen(names[i]);
    if (fwrite(&nl, 4, 1, f) != 1) goto fail;
    if (fwrite(names[i], 1, nl, f) != nl) goto fail;
    if (fwrite(&sizes[i], 8, 1, f) != 1) goto fail;
    if (sizes[i] && fwrite(payloads[i], 1, sizes[i], f) != sizes[i]) goto fail;
  }
  fclose(f);
  return 0;
fail:
  fclose(f);
  return -1;
}

// Two-pass read: first call with payloads=nullptr fills sizes/name buffer
// requirements; returns section count or -1.
VSTPU_API int vstpu_blob_read_index(const char* path, char* names_buf,
                                    uint64_t names_buf_len, uint64_t* sizes,
                                    int max_sections) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char magic[8] = {0};
  if (fread(magic, 1, 7, f) != 7 || strcmp(magic, "VSTPU1\n") != 0) {
    fclose(f);
    return -1;
  }
  int count = 0;
  uint64_t name_off = 0;
  for (;;) {
    uint32_t nl;
    if (fread(&nl, 4, 1, f) != 1) break;  // EOF
    if (count >= max_sections || nl > 4096) { fclose(f); return -1; }
    if (name_off + nl + 1 > names_buf_len) { fclose(f); return -1; }
    if (fread(names_buf + name_off, 1, nl, f) != nl) { fclose(f); return -1; }
    names_buf[name_off + nl] = '\0';
    name_off += nl + 1;
    uint64_t sz;
    if (fread(&sz, 8, 1, f) != 1) { fclose(f); return -1; }
    sizes[count++] = sz;
    if (fseek(f, (long)sz, SEEK_CUR) != 0) { fclose(f); return -1; }
  }
  fclose(f);
  return count;
}

VSTPU_API int vstpu_blob_read_section(const char* path, int section_idx,
                                      uint8_t* out, uint64_t out_len) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 7, SEEK_SET) != 0) { fclose(f); return -1; }
  for (int i = 0;; ++i) {
    uint32_t nl;
    if (fread(&nl, 4, 1, f) != 1) { fclose(f); return -1; }
    if (fseek(f, (long)nl, SEEK_CUR) != 0) { fclose(f); return -1; }
    uint64_t sz;
    if (fread(&sz, 8, 1, f) != 1) { fclose(f); return -1; }
    if (i == section_idx) {
      if (sz > out_len) { fclose(f); return -1; }
      if (sz && fread(out, 1, sz, f) != sz) { fclose(f); return -1; }
      fclose(f);
      return 0;
    }
    if (fseek(f, (long)sz, SEEK_CUR) != 0) { fclose(f); return -1; }
  }
}
