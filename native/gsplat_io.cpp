// gsplat-tpu native IO runtime: COLMAP binary parsing + multithreaded image
// decode/resize/prefetch, exposed through a plain C ABI for ctypes.
//
// TPU-native equivalent of the reference's C++ data-ingestion layer
// (src/scene/colmap_loader.cpp binary struct-unpack readers, and the cv::imread
// image path of src/scene/dataset_readers.cpp:86-90) — re-designed as a *feeder
// for an accelerator input pipeline*: a fixed worker pool decodes and resizes
// images ahead of the training loop in host RAM so the JAX step never waits on
// PIL. No LibTorch/OpenCV: libjpeg/libpng/zlib only.
//
// Build: make -C native   (produces libgsplat_io.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

// ---------------------------------------------------------------------------
// COLMAP binary readers (reference colmap_loader.cpp:120-170,222-249 semantics)
// ---------------------------------------------------------------------------

struct ColmapCamera {
  int32_t camera_id;
  int32_t model_id;
  uint64_t width, height;
  double params[12];  // sized to the true max of kCameraModelNumParams (FULL_OPENCV / THIN_PRISM_FISHEYE = 12)
  int32_t num_params;
};

struct ColmapImageMeta {
  int32_t image_id;
  double qvec[4];
  double tvec[3];
  int32_t camera_id;
  char name[256];
  uint64_t num_points2d;
};

static const int kCameraModelNumParams[] = {
    3, 4, 4, 5, 8, 8, 12, 5, 4, 5, 12};  // SIMPLE_PINHOLE..THIN_PRISM_FISHEYE

struct Reader {
  FILE* f;
  bool ok;
  explicit Reader(const char* path) : f(fopen(path, "rb")), ok(f != nullptr) {}
  ~Reader() { if (f) fclose(f); }
  template <typename T> T get() {
    T v{};
    if (ok && fread(&v, sizeof(T), 1, f) != 1) ok = false;
    return v;  // little-endian host assumed (x86/ARM LE), as in the reference
  }
};

// Parse cameras.bin. Returns number of cameras, fills out[] up to max_out.
extern "C" int colmap_read_cameras_bin(const char* path, ColmapCamera* out, int max_out) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ColmapCamera c{};
    c.camera_id = r.get<int32_t>();
    c.model_id = r.get<int32_t>();
    c.width = r.get<uint64_t>();
    c.height = r.get<uint64_t>();
    int np = (c.model_id >= 0 && c.model_id < 11) ? kCameraModelNumParams[c.model_id] : 0;
    c.num_params = np;
    for (int p = 0; p < np; ++p) c.params[p] = r.get<double>();
    if ((int)i < max_out) out[i] = c;
  }
  return r.ok ? (int)n : -1;
}

// Parse images.bin. Point observations are skipped over (the trainer does not
// use them; the reference reads and discards them too).
extern "C" int colmap_read_images_bin(const char* path, ColmapImageMeta* out, int max_out) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    ColmapImageMeta m{};
    m.image_id = r.get<int32_t>();
    for (int k = 0; k < 4; ++k) m.qvec[k] = r.get<double>();
    for (int k = 0; k < 3; ++k) m.tvec[k] = r.get<double>();
    m.camera_id = r.get<int32_t>();
    int pos = 0;
    for (;;) {
      char ch = r.get<char>();
      if (!r.ok || ch == '\0') break;
      if (pos < 255) m.name[pos++] = ch;
    }
    m.name[pos] = '\0';
    m.num_points2d = r.get<uint64_t>();
    // skip (x,y,point3D_id) triplets: 2 doubles + 1 uint64 each
    if (r.ok && fseek(r.f, (long)(m.num_points2d * 24), SEEK_CUR) != 0) r.ok = false;
    if ((int)i < max_out) out[i] = m;
  }
  return r.ok ? (int)n : -1;
}

// Parse points3D.bin into xyz (n,3) float64, rgb (n,3) uint8, error (n,) float64.
// Pass null buffers to query the count first.
extern "C" int64_t colmap_read_points3d_bin(const char* path, double* xyz, uint8_t* rgb,
                                 double* err, int64_t max_out) {
  Reader r(path);
  if (!r.ok) return -1;
  uint64_t n = r.get<uint64_t>();
  if (!xyz) return (int64_t)n;
  for (uint64_t i = 0; i < n && r.ok; ++i) {
    (void)r.get<uint64_t>();  // point id
    double x = r.get<double>(), y = r.get<double>(), z = r.get<double>();
    uint8_t cr = r.get<uint8_t>(), cg = r.get<uint8_t>(), cb = r.get<uint8_t>();
    double e = r.get<double>();
    uint64_t track_len = r.get<uint64_t>();
    if (r.ok && fseek(r.f, (long)(track_len * 8), SEEK_CUR) != 0) r.ok = false;
    if ((int64_t)i < max_out) {
      xyz[i * 3 + 0] = x; xyz[i * 3 + 1] = y; xyz[i * 3 + 2] = z;
      rgb[i * 3 + 0] = cr; rgb[i * 3 + 1] = cg; rgb[i * 3 + 2] = cb;
      if (err) err[i] = e;
    }
  }
  return r.ok ? (int64_t)n : -1;
}

// ---------------------------------------------------------------------------
// Image decode (JPEG/PNG) + bilinear resize to float32 RGB in [0,1]
// ---------------------------------------------------------------------------

struct DecodedImage {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> pixels;  // interleaved, `channels` per pixel
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

static bool decode_jpeg(const char* path, DecodedImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->pixels.resize((size_t)out->w * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->pixels.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

static bool decode_png(const char* path, DecodedImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  int channels = png_get_channels(png, info);
  out->w = (int)w;
  out->h = (int)h;
  out->channels = channels;
  out->pixels.resize((size_t)w * h * channels);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->pixels.data() + (size_t)y * w * channels;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

static bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; ++i)
    if (tolower(s[s.size() - n + i]) != suf[i]) return false;
  return true;
}

static bool decode_any(const std::string& path, DecodedImage* out) {
  if (has_suffix(path, ".png")) return decode_png(path.c_str(), out);
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg(path.c_str(), out);
  // sniff the magic
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  fclose(f);
  if (got >= 4 && magic[0] == 0x89 && magic[1] == 'P') return decode_png(path.c_str(), out);
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path.c_str(), out);
  return false;
}

// Bilinear resize + RGBA-over-background compositing + float conversion.
// bg: 3 floats used when the source has an alpha channel (upstream convention:
// premultiply onto the scene background).
static void resize_to_float(const DecodedImage& src, int dst_w, int dst_h,
                            const float* bg, float* dst /* dst_h*dst_w*3 */) {
  const float sx = (float)src.w / dst_w;
  const float sy = (float)src.h / dst_h;
  const int c = src.channels;
  for (int y = 0; y < dst_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : (int)fy;
    int y1 = y0 + 1 < src.h ? y0 + 1 : src.h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dst_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : (int)fx;
      int x1 = x0 + 1 < src.w ? x0 + 1 : src.w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      float px[4] = {0, 0, 0, 255.0f};
      for (int k = 0; k < c && k < 4; ++k) {
        float v00 = src.pixels[((size_t)y0 * src.w + x0) * c + k];
        float v01 = src.pixels[((size_t)y0 * src.w + x1) * c + k];
        float v10 = src.pixels[((size_t)y1 * src.w + x0) * c + k];
        float v11 = src.pixels[((size_t)y1 * src.w + x1) * c + k];
        px[k] = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy;
      }
      float* o = dst + ((size_t)y * dst_w + x) * 3;
      if (c >= 4) {
        float a = px[3] / 255.0f;
        for (int k = 0; k < 3; ++k)
          o[k] = (px[k] / 255.0f) * a + bg[k] * (1.0f - a);
      } else if (c == 1) {
        o[0] = o[1] = o[2] = px[0] / 255.0f;
      } else {
        for (int k = 0; k < 3; ++k) o[k] = px[k] / 255.0f;
      }
    }
  }
}

// One-shot: decode `path`, resize to (w,h), write float32 RGB into out.
extern "C" int decode_image_f32(const char* path, int w, int h, const float* bg, float* out) {
  DecodedImage img;
  if (!decode_any(path, &img)) return -1;
  resize_to_float(img, w, h, bg, out);
  return 0;
}

// Query source dimensions without a full decode target.
extern "C" int image_size(const char* path, int* w, int* h) {
  DecodedImage img;  // full decode; simple and rarely on the hot path
  if (!decode_any(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetching loader: worker pool decodes a queue of (index) requests ahead.
// ---------------------------------------------------------------------------

struct Loader {
  std::vector<std::string> paths;
  int w, h;
  float bg[3];
  size_t frame_elems;
  // cache of ready frames
  std::mutex mu;
  std::condition_variable cv;
  std::unordered_map<int, std::unique_ptr<float[]>> ready;
  // queued-or-decoding request count per index: loader_get waits on these
  // instead of decoding a duplicate (which would orphan the worker's copy in
  // `ready` forever, since get() erases on fetch)
  std::unordered_map<int, int> pending;
  std::unordered_set<int> failed;  // decode errors surfaced to loader_get as -2
  std::deque<int> queue;
  std::vector<std::thread> workers;
  bool stop = false;

  void finish_pending(int idx) {  // call with mu held
    auto p = pending.find(idx);
    if (p != pending.end() && --p->second == 0) pending.erase(p);
  }

  void worker() {
    for (;;) {
      int idx;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop) return;
        idx = queue.front();
        queue.pop_front();
        if (ready.count(idx)) {
          finish_pending(idx);
          cv.notify_all();
          continue;
        }
      }
      std::unique_ptr<float[]> buf(new float[frame_elems]);
      bool ok = decode_image_f32(paths[idx].c_str(), w, h, bg, buf.get()) == 0;
      {
        std::lock_guard<std::mutex> lk(mu);
        if (ok) ready[idx] = std::move(buf);
        else failed.insert(idx);
        finish_pending(idx);
      }
      cv.notify_all();
    }
  }
};

extern "C" Loader* loader_create(const char** paths, int n, int w, int h, const float* bg,
                      int threads) {
  Loader* L = new Loader();
  L->paths.assign(paths, paths + n);
  L->w = w;
  L->h = h;
  memcpy(L->bg, bg, 3 * sizeof(float));
  L->frame_elems = (size_t)w * h * 3;
  if (threads < 1) threads = 1;
  for (int i = 0; i < threads; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

// Enqueue indices for background decode (call with the shuffled epoch order).
extern "C" void loader_prefetch(Loader* L, const int* indices, int n) {
  {
    std::lock_guard<std::mutex> lk(L->mu);
    for (int i = 0; i < n; ++i) {
      L->queue.push_back(indices[i]);
      L->pending[indices[i]]++;
    }
  }
  L->cv.notify_all();
}

// Blocking fetch: returns the frame and drops it from the cache (each epoch
// re-prefetches). If the frame is queued or mid-decode, waits for the worker
// instead of decoding a duplicate; only truly un-requested indices decode
// inline on the calling thread.
extern "C" int loader_get(Loader* L, int idx, float* out) {
  {
    std::unique_lock<std::mutex> lk(L->mu);
    for (;;) {
      auto it = L->ready.find(idx);
      if (it != L->ready.end()) {
        memcpy(out, it->second.get(), L->frame_elems * sizeof(float));
        L->ready.erase(it);
        return 0;
      }
      if (L->failed.count(idx)) {  // worker hit a decode error: caller decides
        L->failed.erase(idx);
        return -2;
      }
      if (!L->pending.count(idx) || L->stop) break;
      L->cv.wait(lk);
    }
  }
  return decode_image_f32(L->paths[idx].c_str(), L->w, L->h, L->bg, out);
}

extern "C" void loader_destroy(Loader* L) {
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
  }
  L->cv.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

