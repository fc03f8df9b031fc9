// Native host-side image preprocessing for the inference input pipeline.
//
// The reference's hot host path runs through native libraries (OpenCV
// letterbox in onnx_engines/localizer_engine.py:76-138, ONNXRuntime thread
// pools); this is the first-party equivalent for the TPU pipeline: batched
// letterbox (bilinear resize + pad) over a thread pool, feeding fixed-shape
// uint8 tensors straight to the device.  Coordinate convention matches
// cv2.INTER_LINEAR / jax.image.resize(antialias=False):
//     src = (dst + 0.5) * scale - 0.5, edge-clamped.
//
// Built as a shared library; bound via ctypes (effocr_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include "inflate.h"

#ifdef USE_LIBDEFLATE
#include <libdeflate.h>
#else
#include <zlib.h>
#endif

#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

inline void resize_bilinear_u8(const uint8_t* src, int sh, int sw,
                               uint8_t* dst, int dh, int dw, int channels) {
  // Separable evaluation with precomputed x taps and a two-row float
  // cache: the naive form recomputed the x coefficients for every pixel
  // and re-interpolated each source row up to twice (upscales reuse row
  // pairs across consecutive output rows).  The arithmetic per output
  // value is the EXACT float expression of the naive form — same
  // operand order, same promotions — so results are bit-identical
  // (tests/test_native.py asserts exactness vs the numpy reference).
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(sw - 1)));
    const int x0 = static_cast<int>(fx);
    x0s[x] = x0;
    x1s[x] = std::min(x0 + 1, sw - 1);
    wxs[x] = fx - x0;
  }
  const size_t rw = static_cast<size_t>(dw) * channels;
  std::vector<float> rowA(rw), rowB(rw);
  int rowA_y = -1, rowB_y = -1;
  auto interp_row = [&](int ysrc, std::vector<float>& out_row) {
    const uint8_t* r = src + static_cast<size_t>(ysrc) * sw * channels;
    float* o = out_row.data();
#if defined(__AVX2__)
    if (channels == 1) {
      // 8-lane x-interp: 32-bit byte gathers (&0xFF) + the same
      // mul/add expression as the scalar tail — the library builds with
      // -ffp-contract=off, so lanes and tail round identically.  Gathers
      // read 4 bytes at r + x; stay in-bounds by capping at the last x
      // whose x1 <= sw-4 (x1s is nondecreasing), scalar for the rest.
      int x = 0;
      int safe = dw;
      while (safe > 0 && x1s[safe - 1] > sw - 4) --safe;
      const __m256i bytemask = _mm256_set1_epi32(0xFF);
      for (; x + 8 <= safe; x += 8) {
        const __m256i vx0 =
            _mm256_loadu_si256(reinterpret_cast<const __m256i*>(&x0s[x]));
        const __m256i vx1 =
            _mm256_loadu_si256(reinterpret_cast<const __m256i*>(&x1s[x]));
        const __m256i g0 = _mm256_i32gather_epi32(
            reinterpret_cast<const int*>(r), vx0, 1);
        const __m256i g1 = _mm256_i32gather_epi32(
            reinterpret_cast<const int*>(r), vx1, 1);
        const __m256 p0 =
            _mm256_cvtepi32_ps(_mm256_and_si256(g0, bytemask));
        const __m256 p1 =
            _mm256_cvtepi32_ps(_mm256_and_si256(g1, bytemask));
        const __m256 wx = _mm256_loadu_ps(&wxs[x]);
        _mm256_storeu_ps(
            &o[x],
            _mm256_add_ps(p0, _mm256_mul_ps(_mm256_sub_ps(p1, p0), wx)));
      }
      for (; x < dw; ++x) {
        const float p0 = r[x0s[x]];
        const float p1 = r[x1s[x]];
        o[x] = p0 + (p1 - p0) * wxs[x];
      }
      return;
    }
#endif
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = r + x0s[x] * channels;
      const uint8_t* p1 = r + x1s[x] * channels;
      const float wx = wxs[x];
      for (int c = 0; c < channels; ++c) {
        o[x * channels + c] = p0[c] + (p1[c] - p0[c]) * wx;
      }
    }
  };
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    if (rowA_y != y0 && rowB_y == y0) {
      std::swap(rowA, rowB);
      std::swap(rowA_y, rowB_y);
    }
    if (rowA_y != y0) {
      interp_row(y0, rowA);
      rowA_y = y0;
    }
    const std::vector<float>* bot = &rowA;
    if (y1 != y0) {
      if (rowB_y != y1) {
        interp_row(y1, rowB);
        rowB_y = y1;
      }
      bot = &rowB;
    }
    const float* ta = rowA.data();
    const float* ba = bot->data();
    uint8_t* out = dst + static_cast<size_t>(y) * dw * channels;
    size_t j = 0;
#if defined(__AVX2__)
    // 8-lane vertical blend + float->u8 (cvtt truncates like the u8
    // cast; packus saturation is a no-op for values in [0, 255.5))
    const __m256 vwy = _mm256_set1_ps(wy);
    const __m256 vhalf = _mm256_set1_ps(0.5f);
    for (; j + 8 <= rw; j += 8) {
      const __m256 top = _mm256_loadu_ps(&ta[j]);
      const __m256 botv = _mm256_loadu_ps(&ba[j]);
      const __m256 v = _mm256_add_ps(
          _mm256_add_ps(top,
                        _mm256_mul_ps(_mm256_sub_ps(botv, top), vwy)),
          vhalf);
      const __m256i vi = _mm256_cvttps_epi32(v);
      const __m128i p16 = _mm_packus_epi32(
          _mm256_castsi256_si128(vi), _mm256_extracti128_si256(vi, 1));
      const __m128i p8 = _mm_packus_epi16(p16, p16);
      _mm_storel_epi64(reinterpret_cast<__m128i*>(&out[j]), p8);
    }
#endif
    for (; j < rw; ++j) {
      const float top = ta[j];
      out[j] = static_cast<uint8_t>(top + (ba[j] - top) * wy + 0.5f);
    }
  }
}

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (n <= 1 || num_threads <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      fn(i);
    }
  };
  const int t = std::min(n, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------- PNG decode
//
// First-party PNG decoder for the inference input pipeline: the reference
// outsources image decode to OpenCV/PIL (localizer_engine.py:78, PIL loads
// in effocr_datasets); on this pipeline host decode of the line corpus is
// the measured wall (PIL ~2.2 ms/line vs ~13.5 s total for 5k lines), so
// inflate (libdeflate when present, zlib otherwise) + unfilter + channel
// conversion run here, batched over a thread pool.  Supports the common
// fast path only — 8-bit, color type 0 (gray) / 2 (RGB), non-interlaced;
// anything else returns a nonzero status and the caller falls back to PIL.

inline bool zlib_inflate_buf(const uint8_t* src, size_t src_n, uint8_t* dst,
                             size_t dst_n) {
#ifdef USE_LIBDEFLATE
  struct Decomp {
    libdeflate_decompressor* d;
    Decomp() : d(libdeflate_alloc_decompressor()) {}
    ~Decomp() { if (d) libdeflate_free_decompressor(d); }
  };
  thread_local Decomp decomp;
  if (!decomp.d) return false;
  size_t actual = 0;
  return libdeflate_zlib_decompress(decomp.d, src, src_n, dst, dst_n,
                                    &actual) == LIBDEFLATE_SUCCESS &&
         actual == dst_n;
#else
  uLongf out_n = dst_n;
  return uncompress(dst, &out_n, src, src_n) == Z_OK && out_n == dst_n;
#endif
}

inline uint8_t paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  return static_cast<uint8_t>(pb <= pc ? b : c);
}

// Reconstruct one filtered row (PNG filter types 0-4) into dst.
// prev is the reconstructed row above (nullptr for the first row).
//
// bpp==3 (RGB, the corpus-dominant layout) takes specialized loops: the
// serial left-neighbor dependency chains of Sub/Average/Paeth are
// per-CHANNEL independent, so three running accumulators turn a
// 1-byte/iteration dependency walk into 3-way ILP — the decode wall on
// the 1-core bench host is this loop, not the (libdeflate) inflate.
inline bool unfilter_row(int filter, const uint8_t* src, uint8_t* dst,
                         const uint8_t* prev, size_t stride, int bpp) {
  const bool rgb = bpp == 3 && stride % 3 == 0;
  switch (filter) {
    case 0:
      std::memcpy(dst, src, stride);
      return true;
    case 1: {  // Sub
      if (rgb && stride >= 3) {
        uint8_t a0 = src[0], a1 = src[1], a2 = src[2];
        dst[0] = a0; dst[1] = a1; dst[2] = a2;
        for (size_t i = 3; i < stride; i += 3) {
          a0 = static_cast<uint8_t>(a0 + src[i]);
          a1 = static_cast<uint8_t>(a1 + src[i + 1]);
          a2 = static_cast<uint8_t>(a2 + src[i + 2]);
          dst[i] = a0; dst[i + 1] = a1; dst[i + 2] = a2;
        }
        return true;
      }
      std::memcpy(dst, src, std::min<size_t>(bpp, stride));
      for (size_t i = bpp; i < stride; ++i) dst[i] = src[i] + dst[i - bpp];
      return true;
    }
    case 2:  // Up — no left dependency; auto-vectorizes
      if (!prev) { std::memcpy(dst, src, stride); return true; }
      for (size_t i = 0; i < stride; ++i) dst[i] = src[i] + prev[i];
      return true;
    case 3: {  // Average
      if (rgb) {
        int a0 = 0, a1 = 0, a2 = 0;
        for (size_t i = 0; i < stride; i += 3) {
          const int b0 = prev ? prev[i] : 0;
          const int b1 = prev ? prev[i + 1] : 0;
          const int b2 = prev ? prev[i + 2] : 0;
          a0 = static_cast<uint8_t>(src[i] + ((a0 + b0) >> 1));
          a1 = static_cast<uint8_t>(src[i + 1] + ((a1 + b1) >> 1));
          a2 = static_cast<uint8_t>(src[i + 2] + ((a2 + b2) >> 1));
          dst[i] = static_cast<uint8_t>(a0);
          dst[i + 1] = static_cast<uint8_t>(a1);
          dst[i + 2] = static_cast<uint8_t>(a2);
        }
        return true;
      }
      for (size_t i = 0; i < stride; ++i) {
        const int a = i >= static_cast<size_t>(bpp) ? dst[i - bpp] : 0;
        const int b = prev ? prev[i] : 0;
        dst[i] = static_cast<uint8_t>(src[i] + ((a + b) >> 1));
      }
      return true;
    }
    case 4: {  // Paeth
      if (rgb && prev) {
        int a0 = 0, a1 = 0, a2 = 0, c0 = 0, c1 = 0, c2 = 0;
        for (size_t i = 0; i < stride; i += 3) {
          const int b0 = prev[i], b1 = prev[i + 1], b2 = prev[i + 2];
          a0 = static_cast<uint8_t>(src[i] + paeth(a0, b0, c0));
          a1 = static_cast<uint8_t>(src[i + 1] + paeth(a1, b1, c1));
          a2 = static_cast<uint8_t>(src[i + 2] + paeth(a2, b2, c2));
          dst[i] = static_cast<uint8_t>(a0);
          dst[i + 1] = static_cast<uint8_t>(a1);
          dst[i + 2] = static_cast<uint8_t>(a2);
          c0 = b0; c1 = b1; c2 = b2;
        }
        return true;
      }
      for (size_t i = 0; i < stride; ++i) {
        const int a = i >= static_cast<size_t>(bpp) ? dst[i - bpp] : 0;
        const int b = prev ? prev[i] : 0;
        const int c = (prev && i >= static_cast<size_t>(bpp))
                          ? prev[i - bpp] : 0;
        dst[i] = static_cast<uint8_t>(src[i] + paeth(a, b, c));
      }
      return true;
    }
    default:
      return false;
  }
}

inline uint32_t be32(const uint8_t* p) {
  return (static_cast<uint32_t>(p[0]) << 24) |
         (static_cast<uint32_t>(p[1]) << 16) |
         (static_cast<uint32_t>(p[2]) << 8) | p[3];
}

const uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

// Parsed-but-not-inflated PNG: header fields + concatenated IDAT.
struct PngParsed {
  std::vector<uint8_t> idat;
  int w = 0, h = 0, src_ch = 0;
  size_t raw_size() const {
    return (static_cast<size_t>(w) * src_ch + 1) * h;
  }
};

// Read + chunk-walk one PNG; 0 on success (fast path: 8-bit gray/RGB,
// non-interlaced), else the decode_png_one error code.
int parse_png(const char* path, int expect_h, int expect_w, PngParsed& pf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  if (fsize < 45) { std::fclose(f); return 2; }
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  const size_t got = std::fread(data.data(), 1, data.size(), f);
  std::fclose(f);
  if (got != data.size() || std::memcmp(data.data(), kPngSig, 8) != 0)
    return 2;

  int w = 0, h = 0, bit_depth = 0, color_type = 0, interlace = 0;
  pf.idat.clear();
  size_t i = 8;
  bool saw_ihdr = false;
  while (i + 12 <= data.size()) {
    const uint32_t len = be32(&data[i]);
    if (i + 12 + len > data.size()) return 6;
    const uint8_t* typ = &data[i + 4];
    const uint8_t* body = &data[i + 8];
    if (std::memcmp(typ, "IHDR", 4) == 0) {
      if (len < 13) return 6;
      w = static_cast<int>(be32(body));
      h = static_cast<int>(be32(body + 4));
      bit_depth = body[8];
      color_type = body[9];
      interlace = body[12];
      saw_ihdr = true;
    } else if (std::memcmp(typ, "IDAT", 4) == 0) {
      pf.idat.insert(pf.idat.end(), body, body + len);
    } else if (std::memcmp(typ, "IEND", 4) == 0) {
      break;
    }
    i += 12 + static_cast<size_t>(len);
  }
  if (!saw_ihdr || pf.idat.empty()) return 6;
  if (bit_depth != 8 || (color_type != 0 && color_type != 2) ||
      interlace != 0)
    return 3;
  if (w != expect_w || h != expect_h || w <= 0 || h <= 0) return 4;
  pf.w = w;
  pf.h = h;
  pf.src_ch = color_type == 2 ? 3 : 1;
  return 0;
}

// Unfilter + channel-convert an inflated raw buffer into out.
int unfilter_convert(const std::vector<uint8_t>& raw, int w, int h,
                     int src_ch, uint8_t* out, int out_channels);

// Decode one PNG file into out ([expect_h, expect_w, out_channels] u8).
// RGB -> 1-channel output uses the truncating channel mean ((r+g+b)/3,
// numpy .mean(-1).astype(uint8) semantics — matches letterbox_gray_batch);
// gray -> 3-channel replicates.  Returns 0 on success.
int decode_png_one(const char* path, uint8_t* out, int out_channels,
                   int expect_h, int expect_w) {
  PngParsed pf;
  const int rc = parse_png(path, expect_h, expect_w, pf);
  if (rc != 0) return rc;
  std::vector<uint8_t> raw(pf.raw_size());
  if (!zlib_inflate_buf(pf.idat.data(), pf.idat.size(), raw.data(),
                        raw.size()))
    return 5;
  return unfilter_convert(raw, pf.w, pf.h, pf.src_ch, out, out_channels);
}

int unfilter_convert(const std::vector<uint8_t>& raw, int w, int h,
                     int src_ch, uint8_t* out, int out_channels) {
  const size_t stride = static_cast<size_t>(w) * src_ch;
  if (src_ch == out_channels) {
    // reconstruct straight into the output — rows are contiguous
    const uint8_t* prev = nullptr;
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = raw.data() + static_cast<size_t>(y) * (stride + 1);
      uint8_t* dst = out + static_cast<size_t>(y) * stride;
      if (!unfilter_row(row[0], row + 1, dst, prev, stride, src_ch)) return 6;
      prev = dst;
    }
    return 0;
  }

  // channel conversion: reconstruct into two alternating scratch rows
  std::vector<uint8_t> rows(2 * stride);
  uint8_t* prev = nullptr;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = raw.data() + static_cast<size_t>(y) * (stride + 1);
    uint8_t* dst = rows.data() + (y & 1) * stride;
    if (!unfilter_row(row[0], row + 1, dst, prev, stride, src_ch)) return 6;
    prev = dst;
    uint8_t* o = out + static_cast<size_t>(y) * w * out_channels;
    if (src_ch == 3 && out_channels == 1) {
      const uint8_t* p = dst;
      for (int x = 0; x < w; ++x, p += 3)
        o[x] = static_cast<uint8_t>((p[0] + p[1] + p[2]) / 3);
    } else if (src_ch == 1 && out_channels == 3) {
      for (int x = 0; x < w; ++x) {
        o[3 * x] = o[3 * x + 1] = o[3 * x + 2] = dst[x];
      }
    } else {
      return 3;
    }
  }
  return 0;
}

// EFFOCR_FAST_INFLATE=0 disables the first-party interleaved inflater
// (falls back to libdeflate/zlib for every stream).
bool fast_inflate_enabled() {
  static const bool on = [] {
    const char* v = std::getenv("EFFOCR_FAST_INFLATE");
    return !(v && v[0] == '0');
  }();
  return on;
}

// Decode one or two PNGs; when both parse on the native fast path their
// zlib streams inflate INTERLEAVED in one thread (inflate.h
// zlib_inflate_pair) — two independent Huffman dependency chains fill
// each other's L1 load-latency bubbles, the single biggest host-CPU
// cost on the 1-core inference host.  Any nonzero fast-inflate rc falls
// back to the libdeflate/zlib path for that stream, so results are
// always identical to decode_png_one.
void decode_png_pair(const char* path_a, uint8_t* out_a, int oc_a, int eh_a,
                     int ew_a, int* st_a, const char* path_b, uint8_t* out_b,
                     int oc_b, int eh_b, int ew_b, int* st_b) {
  PngParsed a, b;
  int ra = parse_png(path_a, eh_a, ew_a, a);
  int rb = path_b ? parse_png(path_b, eh_b, ew_b, b) : 1;
  std::vector<uint8_t> raw_a, raw_b;
  if (ra == 0) raw_a.resize(a.raw_size());
  if (rb == 0) raw_b.resize(b.raw_size());

  if (ra == 0 && rb == 0 && fast_inflate_enabled()) {
    int ia = 1, ib = 1;
    fastinf::zlib_inflate_pair(a.idat.data(), a.idat.size(), raw_a.data(),
                               raw_a.size(), b.idat.data(), b.idat.size(),
                               raw_b.data(), raw_b.size(), &ia, &ib);
    if (ia != 0 && !zlib_inflate_buf(a.idat.data(), a.idat.size(),
                                     raw_a.data(), raw_a.size()))
      ra = 5;
    if (ib != 0 && !zlib_inflate_buf(b.idat.data(), b.idat.size(),
                                     raw_b.data(), raw_b.size()))
      rb = 5;
  } else {
    if (ra == 0 && !zlib_inflate_buf(a.idat.data(), a.idat.size(),
                                     raw_a.data(), raw_a.size()))
      ra = 5;
    if (rb == 0 && !zlib_inflate_buf(b.idat.data(), b.idat.size(),
                                     raw_b.data(), raw_b.size()))
      rb = 5;
  }
  if (ra == 0)
    ra = unfilter_convert(raw_a, a.w, a.h, a.src_ch, out_a, oc_a);
  *st_a = ra;
  if (path_b) {
    if (rb == 0)
      rb = unfilter_convert(raw_b, b.w, b.h, b.src_ch, out_b, oc_b);
    *st_b = rb;
  }
}

}  // namespace

extern "C" {

// Decode a batch of PNG files into pre-allocated per-image buffers
// outs[i] = [hs[i], ws[i], out_channels[i]] u8.  status[i] = 0 on
// success; nonzero means unsupported/corrupt and the caller decodes
// that image with PIL instead.
void decode_png_batch(const char** paths, int n, uint8_t** outs,
                      const int* hs, const int* ws,
                      const int* out_channels, int num_threads,
                      int* status) {
  // pair granularity: each task decodes two images with the interleaved
  // inflater (composes with thread parallelism on multi-core hosts)
  const int npairs = (n + 1) / 2;
  parallel_for(npairs, num_threads, [&](int j) {
    const int i = 2 * j;
    const bool two = i + 1 < n;
    decode_png_pair(paths[i], outs[i], out_channels[i], hs[i], ws[i],
                    &status[i], two ? paths[i + 1] : nullptr,
                    two ? outs[i + 1] : nullptr,
                    two ? out_channels[i + 1] : 0, two ? hs[i + 1] : 0,
                    two ? ws[i + 1] : 0, two ? &status[i + 1] : nullptr);
  });
}

// Letterbox a batch of images into out[n, out_h, out_w, 3] (uint8, RGB).
// imgs: array of n pointers to HWC uint8 buffers; hs/ws their shapes.
// Writes the scale ratio and (top, left) content offset per image.
// Mirrors localizer_engine.py:107-138 with auto=False, scaleup=True;
// out_h != out_w gives the TPU-first rectangular line bucket.
void letterbox_batch(const uint8_t** imgs, const int* hs, const int* ws,
                     int n, int out_h, int out_w, int channels,
                     uint8_t pad_val, int num_threads, uint8_t* out,
                     float* ratios, int* tops, int* lefts) {
  const size_t plane = static_cast<size_t>(out_h) * out_w * channels;
  parallel_for(n, num_threads, [&](int i) {
    const int h = hs[i], w = ws[i];
    const float r = std::min(static_cast<float>(out_h) / h,
                             static_cast<float>(out_w) / w);
    const int nw = static_cast<int>(std::lround(w * r));
    const int nh = static_cast<int>(std::lround(h * r));
    const float dw = (out_w - nw) / 2.0f;
    const float dh = (out_h - nh) / 2.0f;
    const int top = static_cast<int>(std::lround(dh - 0.1f));
    const int left = static_cast<int>(std::lround(dw - 0.1f));
    uint8_t* dst = out + i * plane;
    std::memset(dst, pad_val, plane);
    std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw * channels);
    if (nh == h && nw == w) {
      std::memcpy(resized.data(), imgs[i], resized.size());
    } else {
      resize_bilinear_u8(imgs[i], h, w, resized.data(), nh, nw, channels);
    }
    for (int y = 0; y < nh; ++y) {
      std::memcpy(dst + ((top + y) * out_w + left) * channels,
                  resized.data() + static_cast<size_t>(y) * nw * channels,
                  static_cast<size_t>(nw) * channels);
    }
    ratios[i] = r;
    tops[i] = top;
    lefts[i] = left;
  });
}

// Letterbox + grayscale conversion + optional 4-bit packing in one
// threaded pass.  This is the host side of the fused grayscale inference
// pipeline (pipelines/infer.py _dispatch_chunk): converting with
// numpy (float64 mean) and packing with slice arithmetic costs ~100 ms
// per 256-line chunk on the single prep worker; here both ride the
// resize loop.  in_channels is 3 (RGB, channel mean like np.mean) or 1.
// pack_bits 8 -> out [n, out_h, out_w] gray; pack_bits 4 ->
// out [n, out_h, out_w/2], two pixels per byte, even pixel in the high
// nibble: (p0 & 0xF0) | (p1 >> 4) — bit-identical to the numpy pack.
// pack_bits 2 -> out [n, out_h, out_w/4], four pixels per byte,
// MSB-first: (p0 & 0xC0) | ((p1 >> 2) & 0x30) | ((p2 >> 4) & 0x0C) |
// (p3 >> 6).
// One image of the gray letterbox+pack path (shared by
// letterbox_gray_batch and the fused decode path below).
inline void letterbox_gray_one(const uint8_t* gray_src, int h, int w,
                               int out_h, int out_w, int pack_bits,
                               uint8_t pad_val, uint8_t* dst, float* ratio,
                               int* top_out, int* left_out) {
  const int packed_w = out_w * pack_bits / 8;
  const size_t plane = static_cast<size_t>(out_h) * packed_w;
  {
    const float r = std::min(static_cast<float>(out_h) / h,
                             static_cast<float>(out_w) / w);
    const int nw = static_cast<int>(std::lround(w * r));
    const int nh = static_cast<int>(std::lround(h * r));
    const float dw = (out_w - nw) / 2.0f;
    const float dh = (out_h - nh) / 2.0f;
    const int top = static_cast<int>(std::lround(dh - 0.1f));
    const int left = static_cast<int>(std::lround(dw - 0.1f));

    std::vector<uint8_t> line(static_cast<size_t>(out_h) * out_w, pad_val);
    std::vector<uint8_t> resized(static_cast<size_t>(nh) * nw);
    if (nh == h && nw == w) {
      std::memcpy(resized.data(), gray_src, resized.size());
    } else {
      resize_bilinear_u8(gray_src, h, w, resized.data(), nh, nw, 1);
    }
    for (int y = 0; y < nh; ++y) {
      std::memcpy(line.data() + static_cast<size_t>(top + y) * out_w + left,
                  resized.data() + static_cast<size_t>(y) * nw,
                  static_cast<size_t>(nw));
    }

    if (pack_bits == 4) {
      const uint8_t* src = line.data();
      for (size_t j = 0; j < plane; ++j, src += 2) {
        dst[j] = static_cast<uint8_t>((src[0] & 0xF0) | (src[1] >> 4));
      }
    } else if (pack_bits == 2) {
      // 4x4 Bayer ordered dither + nearest-reconstruction-level 2-bit
      // quantization (device unpacks level v to v*85, so offsets span 85
      // and thresholds sit at ~42.7/128/213.3 via (q*3 + 128) >> 8) —
      // matching kernels/image_ops.py dither_offsets/quantize_2bit
      // bit-for-bit.  Offsets are round(((M+0.5)/16 - 0.5) * 85).
      // Each packed byte covers 4 pixels whose x phases are 0..3, so the
      // whole dither+quantize collapses to 16 value->level LUTs (256 B
      // each, dither row phase x column phase, pre-shifted into bit
      // position) — no div/mod/clamp per byte, and the y-phase LUT row
      // is hoisted per scanline.
      static uint8_t kLut[4][4][256];  // [y&3][t][v] -> level << (6-2t)
      static const bool init_lut = [] {
        static const int kBayer[4][4] = {
            {0, 8, 2, 10}, {12, 4, 14, 6}, {3, 11, 1, 9}, {15, 7, 13, 5}};
        for (int y = 0; y < 4; ++y) {
          for (int t = 0; t < 4; ++t) {
            const int off = static_cast<int>(
                std::lround(((kBayer[y][t] + 0.5) / 16.0 - 0.5) * 85.0));
            for (int v = 0; v < 256; ++v) {
              const int q = std::max(0, std::min(255, v + off));
              kLut[y][t][v] =
                  static_cast<uint8_t>(((q * 3 + 128) >> 8) << (6 - 2 * t));
            }
          }
        }
        return true;
      }();
      (void)init_lut;
      const uint8_t* src = line.data();
      uint8_t* d = dst;
      for (int y = 0; y < out_h; ++y) {
        const uint8_t(*lut)[256] = kLut[y & 3];
        for (int xb = 0; xb < packed_w; ++xb, src += 4) {
          *d++ = static_cast<uint8_t>(lut[0][src[0]] | lut[1][src[1]] |
                                      lut[2][src[2]] | lut[3][src[3]]);
        }
      }
    } else {
      std::memcpy(dst, line.data(), plane);
    }
    *ratio = r;
    *top_out = top;
    *left_out = left;
  }
}

void letterbox_gray_batch(const uint8_t** imgs, const int* hs, const int* ws,
                          int n, int out_h, int out_w, int in_channels,
                          int pack_bits, uint8_t pad_val, int num_threads,
                          uint8_t* out, float* ratios, int* tops,
                          int* lefts) {
  const size_t plane =
      static_cast<size_t>(out_h) * (out_w * pack_bits / 8);
  parallel_for(n, num_threads, [&](int i) {
    const int h = hs[i], w = ws[i];
    // grayscale source: truncating mean of the channels (numpy
    // .mean(-1).astype(uint8) semantics)
    const uint8_t* gray_src = imgs[i];
    std::vector<uint8_t> gray;
    if (in_channels == 3) {
      gray.resize(static_cast<size_t>(h) * w);
      const uint8_t* p = imgs[i];
      for (size_t j = 0; j < gray.size(); ++j, p += 3) {
        gray[j] = static_cast<uint8_t>((p[0] + p[1] + p[2]) / 3);
      }
      gray_src = gray.data();
    }
    letterbox_gray_one(gray_src, h, w, out_h, out_w, pack_bits, pad_val,
                       out + i * plane, &ratios[i], &tops[i], &lefts[i]);
  });
}

// Fused PNG decode -> gray letterbox -> sub-byte pack: one native pass
// per image straight from file path to canvas row.  Removes the
// per-image numpy arrays and the extra full-frame pass the separate
// decode_png_batch + letterbox_gray_batch calls cost on the 1-core
// inference host.  status[i] != 0 -> that image was NOT written (caller
// falls back to the two-step path for the whole chunk).
void decode_letterbox_gray_batch(const char** paths, const int* hs,
                                 const int* ws, int n, int out_h,
                                 int out_w, int pack_bits, uint8_t pad_val,
                                 int num_threads, uint8_t* out,
                                 float* ratios, int* tops, int* lefts,
                                 int* status) {
  const size_t plane =
      static_cast<size_t>(out_h) * (out_w * pack_bits / 8);
  const int npairs = (n + 1) / 2;
  parallel_for(npairs, num_threads, [&](int j) {
    const int i = 2 * j;
    const bool two = i + 1 < n;
    std::vector<uint8_t> gray_a(static_cast<size_t>(hs[i]) * ws[i]);
    std::vector<uint8_t> gray_b(
        two ? static_cast<size_t>(hs[i + 1]) * ws[i + 1] : 0);
    decode_png_pair(paths[i], gray_a.data(), 1, hs[i], ws[i], &status[i],
                    two ? paths[i + 1] : nullptr,
                    two ? gray_b.data() : nullptr, 1, two ? hs[i + 1] : 0,
                    two ? ws[i + 1] : 0, two ? &status[i + 1] : nullptr);
    if (status[i] == 0) {
      letterbox_gray_one(gray_a.data(), hs[i], ws[i], out_h, out_w,
                         pack_bits, pad_val, out + i * plane, &ratios[i],
                         &tops[i], &lefts[i]);
    }
    if (two && status[i + 1] == 0) {
      letterbox_gray_one(gray_b.data(), hs[i + 1], ws[i + 1], out_h, out_w,
                         pack_bits, pad_val, out + (i + 1) * plane,
                         &ratios[i + 1], &tops[i + 1], &lefts[i + 1]);
    }
  });
}

// Crop regions from original images, pad to white square (top-left
// anchored, MedianPad-override semantics), resize to out_size; output
// uint8 [n, out_size, out_size, 3].  rects are int32 (x0,y0,x1,y1) into
// each source image; img_idx selects the source.
void crop_square_batch(const uint8_t** imgs, const int* hs, const int* ws,
                       const int* rects, const int* img_idx, int n_crops,
                       int out_size, int num_threads, uint8_t* out) {
  const size_t plane = static_cast<size_t>(out_size) * out_size * 3;
  parallel_for(n_crops, num_threads, [&](int i) {
    const int b = img_idx[i];
    const int h = hs[b], w = ws[b];
    int x0 = std::max(rects[i * 4 + 0], 0);
    int y0 = std::max(rects[i * 4 + 1], 0);
    int x1 = std::min(rects[i * 4 + 2], w);
    int y1 = std::min(rects[i * 4 + 3], h);
    x1 = std::max(x1, x0 + 1);
    y1 = std::max(y1, y0 + 1);
    const int cw = x1 - x0, ch = y1 - y0;
    const int side = std::max(cw, ch);
    std::vector<uint8_t> square(static_cast<size_t>(side) * side * 3, 255);
    for (int y = 0; y < ch; ++y) {
      std::memcpy(square.data() + static_cast<size_t>(y) * side * 3,
                  imgs[b] + ((y0 + y) * w + x0) * 3,
                  static_cast<size_t>(cw) * 3);
    }
    resize_bilinear_u8(square.data(), side, side, out + i * plane,
                       out_size, out_size, 3);
  });
}

// Test hooks for the first-party inflater (tests/test_inflate.py):
// exercised directly so malformed-stream behavior is pinned beyond the
// real-corpus parity tests.
int fast_zlib_inflate(const uint8_t* src, size_t n, uint8_t* dst,
                      size_t dst_n) {
  return fastinf::zlib_inflate(src, n, dst, dst_n);
}

void fast_zlib_inflate_pair(const uint8_t* sa, size_t na, uint8_t* da,
                            size_t dna, const uint8_t* sb, size_t nb,
                            uint8_t* db, size_t dnb, int* ra, int* rb) {
  fastinf::zlib_inflate_pair(sa, na, da, dna, sb, nb, db, dnb, ra, rb);
}

}  // extern "C"
