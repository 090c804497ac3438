// wcdecode — native host-side image decode + resize for the data pipeline.
//
// The reference decodes per-sample with PIL inside the torch DataLoader
// (reference: diffusion_model/dataloader.py:39-48, workers=0 — synchronous
// Python decode in the train loop). On TPU the host must keep a v5e fed at
// thousands of images/sec; this library provides the native equivalent:
// libjpeg/libpng decode + separable bilinear resize + fixed-box center
// crop/pad, batched over a persistent pthread pool, exposed through a plain
// C ABI consumed via ctypes (weatherconverter_tpu/data/native.py).
//
// Build: make -C native   (produces libwcdecode.so)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <libdeflate.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------------------
// Decode: JPEG / PNG -> RGB8 buffer
// ---------------------------------------------------------------------------

struct ImageU8 {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// req_min_side / (req_h, req_w): when nonzero, the decode may use libjpeg's
// DCT-domain M/8 pre-scaling (the PIL Image.draft() trick) as long as the
// scaled output still COVERS the requirement — the triangle resize below then
// only ever downsamples. IDCT work drops ~(M/8)^2; entropy decode remains.
// Pass zeros for bit-faithful full decode (the strict PIL-parity paths).
bool decode_jpeg(FILE* f, ImageU8* out, int req_min_side, int req_h, int req_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  if (req_min_side > 0 || req_h > 0) {
    for (int m = 1; m <= 8; ++m) {
      cinfo.scale_num = static_cast<unsigned>(m);
      cinfo.scale_denom = 8;
      jpeg_calc_output_dimensions(&cinfo);
      const int oh = static_cast<int>(cinfo.output_height);
      const int ow = static_cast<int>(cinfo.output_width);
      bool ok = true;
      if (req_min_side > 0 && std::min(oh, ow) < req_min_side) ok = false;
      if (req_h > 0 && (oh < req_h || ow < req_w)) ok = false;
      if (ok) break;  // smallest covering scale (m==8 == full size fallback)
    }
  }
  jpeg_start_decompress(&cinfo);
  out->h = static_cast<int>(cinfo.output_height);
  out->w = static_cast<int>(cinfo.output_width);
  out->rgb.resize(static_cast<size_t>(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// Fast PNG path (VERDICT r4 item 4): PNG is the ACDC/Cityscapes distribution
// format and the measured slow lane of the host feed (20.8 img/s/core vs
// 158.9 fast-JPEG, outputs/host_feed_r06.json). libpng's cost is dominated
// by zlib's streaming inflate; this path parses the chunk layout directly,
// inflates ALL IDAT data in one whole-buffer libdeflate call (~2-3x zlib),
// and unfilters with a tight scalar loop. Covers the common web of
// non-interlaced 8-bit images (gray / RGB / palette / +alpha, the ACDC and
// gt-label formats); anything else falls back to the bit-exact libpng path
// below. Output is BIT-IDENTICAL to the libpng path for covered files
// (integer unfilter + the same palette/gray expansion and alpha strip).
// ---------------------------------------------------------------------------

inline uint8_t paeth_predict(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  return static_cast<uint8_t>((pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c));
}

bool decode_png_fast(FILE* f, ImageU8* out) {
  fseek(f, 0, SEEK_END);
  const long fsz = ftell(f);
  rewind(f);
  if (fsz <= 8) return false;
  std::vector<uint8_t> buf(static_cast<size_t>(fsz));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) return false;
  const auto be32 = [&](size_t p) {
    return (static_cast<uint32_t>(buf[p]) << 24) |
           (static_cast<uint32_t>(buf[p + 1]) << 16) |
           (static_cast<uint32_t>(buf[p + 2]) << 8) | buf[p + 3];
  };
  uint32_t w = 0, h = 0;
  int color = -1;
  bool ihdr = false, iend = false;
  std::vector<uint8_t> idat, plte;
  idat.reserve(buf.size());
  size_t pos = 8;  // signature checked by decode_file
  while (pos + 12 <= buf.size()) {
    const uint32_t len = be32(pos);
    if (len > buf.size() || pos + 12 + len > buf.size()) return false;
    const uint8_t* data = &buf[pos + 8];
    const char* type = reinterpret_cast<const char*>(&buf[pos + 4]);
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return false;
      w = be32(pos + 8);
      h = be32(pos + 12);
      const int bit_depth = data[8], interlace = data[12];
      color = data[9];
      ihdr = true;
      if (interlace != 0 || bit_depth != 8) return false;  // libpng fallback
      if (color != 0 && color != 2 && color != 3 && color != 4 && color != 6)
        return false;
      if (w == 0 || h == 0 || w > (1u << 24) || h > (1u << 24)) return false;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      plte.assign(data, data + len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      iend = true;
      break;
    }
    pos += 12 + static_cast<size_t>(len);
  }
  if (!ihdr || !iend || idat.empty()) return false;
  if (color == 3 && plte.size() < 3) return false;

  const int ch = color == 2 ? 3 : color == 6 ? 4 : color == 4 ? 2 : 1;
  const size_t stride = static_cast<size_t>(w) * ch;
  const size_t raw_size = (stride + 1) * h;
  std::vector<uint8_t> raw(raw_size);
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (!d) return false;
  size_t actual = 0;
  const auto rc = libdeflate_zlib_decompress(d, idat.data(), idat.size(),
                                             raw.data(), raw_size, &actual);
  libdeflate_free_decompressor(d);
  if (rc != LIBDEFLATE_SUCCESS || actual != raw_size) return false;

  // unfilter in place: each reconstructed row becomes the next row's `prev`
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + static_cast<size_t>(y) * (stride + 1);
    const int filter = row[0];
    uint8_t* cur = row + 1;
    const uint8_t* prev =
        y ? raw.data() + static_cast<size_t>(y - 1) * (stride + 1) + 1 : nullptr;
    switch (filter) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t i = ch; i < stride; ++i) cur[i] += cur[i - ch];
        break;
      case 2:  // Up
        if (prev)
          for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // Average
        if (prev) {
          for (int i = 0; i < ch; ++i) cur[i] += prev[i] >> 1;
          for (size_t i = ch; i < stride; ++i)
            cur[i] += static_cast<uint8_t>((cur[i - ch] + prev[i]) >> 1);
        } else {
          for (size_t i = ch; i < stride; ++i) cur[i] += cur[i - ch] >> 1;
        }
        break;
      case 4:  // Paeth
        if (prev) {
          for (int i = 0; i < ch; ++i) cur[i] += prev[i];  // a=c=0 -> b
          for (size_t i = ch; i < stride; ++i)
            cur[i] += paeth_predict(cur[i - ch], prev[i], prev[i - ch]);
        } else {
          for (size_t i = ch; i < stride; ++i) cur[i] += cur[i - ch];  // b=c=0 -> a
        }
        break;
      default:
        return false;
    }
  }

  // channel conversion to RGB8 (same normalization set as the libpng path:
  // palette expand, gray replicate, alpha stripped)
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->rgb.resize(static_cast<size_t>(h) * w * 3);
  const size_t npal = plte.size() / 3;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + static_cast<size_t>(y) * (stride + 1) + 1;
    uint8_t* dst = out->rgb.data() + static_cast<size_t>(y) * w * 3;
    switch (color) {
      case 2:
        std::memcpy(dst, src, stride);
        break;
      case 6:
        for (uint32_t x = 0; x < w; ++x) std::memcpy(dst + x * 3, src + x * 4, 3);
        break;
      case 0:
        for (uint32_t x = 0; x < w; ++x)
          dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = src[x];
        break;
      case 4:
        for (uint32_t x = 0; x < w; ++x)
          dst[x * 3] = dst[x * 3 + 1] = dst[x * 3 + 2] = src[x * 2];
        break;
      case 3:
        for (uint32_t x = 0; x < w; ++x) {
          const size_t idx = src[x];
          if (idx >= npal) return false;
          std::memcpy(dst + x * 3, plte.data() + idx * 3, 3);
        }
        break;
    }
  }
  return true;
}

bool decode_png(FILE* f, ImageU8* out) {
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
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr, nullptr);
  // normalize everything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  else if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->rgb.resize(static_cast<size_t>(h) * w * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// Scale hints apply to JPEG only (PNG has no cheap partial decode).
bool decode_file(const char* path, ImageU8* out, int req_min_side = 0,
                 int req_h = 0, int req_w = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, out, req_min_side, req_h, req_w);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png_fast(f, out);
    if (!ok) {
      rewind(f);
      ok = decode_png(f, out);  // interlaced/16-bit/exotic: libpng fallback
    }
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// Separable triangle-filter resize with downscale antialiasing — the
// algorithm PIL's BILINEAR resampler implements (support widens by the scale
// factor when downscaling), so outputs track the reference's torchvision/PIL
// preprocessing closely.
// ---------------------------------------------------------------------------

struct Coeffs {
  std::vector<int> lo;        // first source index per output index
  std::vector<int> count;     // taps per output index
  std::vector<float> w;       // weights, row-major [out_index][tap]
  int ksize = 0;
};

Coeffs triangle_coeffs(int in_size, int out_size) {
  Coeffs c;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = std::max(scale, 1.0);
  const double support = 1.0 * fscale;  // triangle filter support = 1
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.lo.resize(out_size);
  c.count.resize(out_size);
  c.w.assign(static_cast<size_t>(out_size) * c.ksize, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(center - support + 0.5));
    int hi = std::min(in_size, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    int n = hi - lo;
    for (int i = 0; i < n; ++i) {
      double t = (lo + i + 0.5 - center) / fscale;  // in filter units
      double wv = (t < 0 ? -t : t) < 1.0 ? 1.0 - (t < 0 ? -t : t) : 0.0;
      c.w[static_cast<size_t>(x) * c.ksize + i] = static_cast<float>(wv);
      total += wv;
    }
    if (total > 0.0) {
      for (int i = 0; i < n; ++i)
        c.w[static_cast<size_t>(x) * c.ksize + i] /= static_cast<float>(total);
    }
    c.lo[x] = lo;
    c.count[x] = n;
  }
  return c;
}

void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh, int dw) {
  Coeffs cx = triangle_coeffs(sw, dw);
  Coeffs cy = triangle_coeffs(sh, dh);
  // horizontal pass: (sh, sw) -> (sh, dw), float32 intermediate
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const float* wp = cx.w.data() + static_cast<size_t>(x) * cx.ksize;
      const int lo = cx.lo[x], n = cx.count[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = srow + (lo + i) * 3;
        acc0 += wp[i] * p[0];
        acc1 += wp[i] * p[1];
        acc2 += wp[i] * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass: (sh, dw) -> (dh, dw)
  for (int y = 0; y < dh; ++y) {
    const float* wp = cy.w.data() + static_cast<size_t>(y) * cy.ksize;
    const int lo = cy.lo[y], n = cy.count[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0;
      for (int i = 0; i < n; ++i)
        acc += wp[i] * tmp[static_cast<size_t>(lo + i) * dw * 3 + x];
      drow[x] = static_cast<uint8_t>(std::clamp(acc + 0.5f, 0.0f, 255.0f));
    }
  }
}

// smaller-side resize + center-crop/edge-pad into a fixed (th, tw) box —
// the semantics of data/datasets.py::load_image_resized
bool decode_to_box(const char* path, int smaller_side, int th, int tw, uint8_t* out,
                   bool fast_dct = false) {
  ImageU8 img;
  if (!decode_file(path, &img, fast_dct ? smaller_side : 0)) return false;
  int nh, nw;
  if (img.h <= img.w) {
    nh = smaller_side;
    nw = std::max(1, static_cast<int>(std::lround(static_cast<double>(img.w) * smaller_side / img.h)));
  } else {
    nw = smaller_side;
    nh = std::max(1, static_cast<int>(std::lround(static_cast<double>(img.h) * smaller_side / img.w)));
  }
  std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * 3);
  resize_bilinear_u8(img.rgb.data(), img.h, img.w, resized.data(), nh, nw);

  const int y0 = std::max(0, (nh - th) / 2);
  const int x0 = std::max(0, (nw - tw) / 2);
  for (int y = 0; y < th; ++y) {
    int sy2 = std::min(y0 + y, nh - 1);
    uint8_t* drow = out + static_cast<size_t>(y) * tw * 3;
    const uint8_t* srow = resized.data() + static_cast<size_t>(sy2) * nw * 3;
    for (int x = 0; x < tw; ++x) {
      int sx2 = std::min(x0 + x, nw - 1);
      std::memcpy(drow + x * 3, srow + sx2 * 3, 3);
    }
  }
  return true;
}

// exact-size resize (paired seg images) — ExtResize semantics
bool decode_exact(const char* path, int th, int tw, uint8_t* out,
                  bool fast_dct = false) {
  ImageU8 img;
  if (!decode_file(path, &img, 0, fast_dct ? th : 0, fast_dct ? tw : 0)) return false;
  resize_bilinear_u8(img.rgb.data(), img.h, img.w, out, th, tw);
  return true;
}

// ---------------------------------------------------------------------------
// Persistent thread pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { loop(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void loop() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> q_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

Pool* pool(int nthreads) {
  static Pool* p = new Pool(nthreads > 0 ? nthreads : static_cast<int>(std::thread::hardware_concurrency()));
  return p;
}

template <typename Fn>
int run_batch(int n, int nthreads, Fn&& per_item) {
  std::atomic<int> failures{0};
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  Pool* p = pool(nthreads);
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      if (!per_item(i)) failures.fetch_add(1);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
  return failures.load();
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Bumped whenever the C ABI below changes; data/native.py refuses to bind a
// mismatched .so (a stale library would otherwise be called with the wrong
// argument list). v2: + fast_dct trailing arg on all decode entry points.
int wc_abi_version(void) { return 2; }

// Decode one file into a fixed (th, tw) RGB box (smaller-side resize +
// center crop/pad). fast_dct != 0 allows JPEG DCT-domain pre-scaling (a few
// LSBs off the full-decode path; PNG unaffected). Returns 0 on success.
int wc_decode_box(const char* path, int smaller_side, int th, int tw, uint8_t* out,
                  int fast_dct) {
  return decode_to_box(path, smaller_side, th, tw, out, fast_dct != 0) ? 0 : 1;
}

// Decode one file to an exact (th, tw) RGB resize. Returns 0 on success.
int wc_decode_exact(const char* path, int th, int tw, uint8_t* out, int fast_dct) {
  return decode_exact(path, th, tw, out, fast_dct != 0) ? 0 : 1;
}

// Batched variants over the persistent pool; `out` is (n, th, tw, 3)
// contiguous. Returns the number of failed items.
int wc_decode_box_batch(const char** paths, int n, int smaller_side, int th, int tw,
                        uint8_t* out, int nthreads, int fast_dct) {
  const size_t stride = static_cast<size_t>(th) * tw * 3;
  return run_batch(n, nthreads, [&](int i) {
    return decode_to_box(paths[i], smaller_side, th, tw, out + stride * i,
                         fast_dct != 0);
  });
}

int wc_decode_exact_batch(const char** paths, int n, int th, int tw, uint8_t* out,
                          int nthreads, int fast_dct) {
  const size_t stride = static_cast<size_t>(th) * tw * 3;
  return run_batch(n, nthreads, [&](int i) {
    return decode_exact(paths[i], th, tw, out + stride * i, fast_dct != 0);
  });
}

}  // extern "C"
