// Native host-side image decoding for face-crop-plus-tpu.
//
// The reference delegates its host image I/O to OpenCV's C++ internals
// (cv2.imread / cvtColor — SURVEY §2.4). This library is the equivalent
// native component for the TPU build, tuned for the pipeline's access
// pattern:
//
//   * Multithreaded batch decode (one worker per file) — the read stage is
//     the host bottleneck once device compute is fused.
//   * libjpeg DCT-domain scaled decode (scale_denom ∈ {1,2,4,8}): when the
//     pipeline's interim size is far below the source resolution, decoding
//     at 1/2..1/8 scale skips most of the IDCT + color-convert work and
//     shrinks the host→device payload at the source.
//   * RGB8 output buffers, malloc-owned, freed via fcpt_free.
//
// Exposed as a plain C ABI consumed through ctypes
// (face_crop_plus_tpu/utils/native_io.py). PNG and other formats stay on
// the cv2/PIL fallback path.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>  // requires <cstddef>/<cstdio> first (uses size_t/FILE)

#include <csetjmp>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <atomic>
#include <thread>

#if defined(__AVX2__)
#include <immintrin.h>
#endif
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit_handler(j_common_ptr cinfo) {
  // libjpeg's default error handler calls exit(); longjmp back instead.
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Decodes a JPEG file to an RGB8 buffer (malloc-owned, caller frees with
// fcpt_free). scale_denom must be 1, 2, 4 or 8 (DCT-domain downscale).
// fast=0 decodes with libjpeg defaults (accurate IDCT + fancy chroma
// upsampling) for pixel parity with cv2.imread; fast=1 trades up to a few
// intensity levels on chroma-subsampled files for throughput.
// Returns 0 on success, nonzero on failure.
int fcpt_decode_jpeg(const char* path, unsigned char** out, int* out_h,
                     int* out_w, int scale_denom, int fast) {
  *out = nullptr;
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;

  unsigned char* buffer = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    std::free(buffer);
    *out = nullptr;
    return 2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 3;
  }

  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom =
      (scale_denom == 2 || scale_denom == 4 || scale_denom == 8) ? scale_denom
                                                                 : 1;
  if (fast) {
    // Opt-in throughput mode: fast DCT, no fancy chroma upsampling.
    cinfo.dct_method = JDCT_IFAST;
    cinfo.do_fancy_upsampling = FALSE;
  } else {
    // Parity mode (default): match cv2.imread's libjpeg configuration so
    // decoded pixels are identical to the reference pipeline's.
    cinfo.dct_method = JDCT_ISLOW;
    cinfo.do_fancy_upsampling = TRUE;
  }

  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  const int stride = w * static_cast<int>(cinfo.output_components);
  if (cinfo.output_components != 3) {
    // Grayscale/CMYK: bail to the generic fallback decoder.
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 4;
  }

  buffer = static_cast<unsigned char*>(
      std::malloc(static_cast<size_t>(h) * stride));
  if (!buffer) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 5;
  }

  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = buffer + static_cast<size_t>(cinfo.output_scanline) * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  *out = buffer;
  *out_h = h;
  *out_w = w;
  return 0;
}

// Decodes a JPEG file directly to its stored YCbCr 4:2:0 planes, skipping
// libjpeg's chroma upsampling and color conversion (the pipeline performs
// the inverse on device after uploading 1.5 bytes/pixel instead of RGB's
// 3).  Requirements: 3-component YCbCr with 2x2/1x1/1x1 sampling (what
// cameras and cv2/libjpeg writers emit) and even post-scale dimensions;
// anything else returns 10 and the caller falls back to the RGB decoder.
// out: malloc-owned packed buffer, planar Y|Cb|Cr (h*w + 2*(h/2)*(w/2)
// bytes), freed with fcpt_free.  scale_denom as fcpt_decode_jpeg.
int fcpt_decode_jpeg_yuv420(const char* path, unsigned char** out,
                            int* out_h, int* out_w, int scale_denom) {
  *out = nullptr;
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;

  unsigned char* packed = nullptr;
  unsigned char* staging = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    std::free(packed);
    std::free(staging);
    *out = nullptr;
    return 2;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 3;
  }

  if (cinfo.num_components != 3 || cinfo.jpeg_color_space != JCS_YCbCr ||
      cinfo.comp_info[0].h_samp_factor != 2 ||
      cinfo.comp_info[0].v_samp_factor != 2 ||
      cinfo.comp_info[1].h_samp_factor != 1 ||
      cinfo.comp_info[1].v_samp_factor != 1 ||
      cinfo.comp_info[2].h_samp_factor != 1 ||
      cinfo.comp_info[2].v_samp_factor != 1) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 10;  // not 4:2:0 — caller falls back to the RGB path
  }

  cinfo.raw_data_out = TRUE;
  cinfo.dct_method = JDCT_ISLOW;  // parity with the RGB decode path
  cinfo.scale_num = 1;
  cinfo.scale_denom =
      (scale_denom == 2 || scale_denom == 4 || scale_denom == 8) ? scale_denom
                                                                 : 1;
  jpeg_start_decompress(&cinfo);
  const int w = static_cast<int>(cinfo.output_width);
  const int h = static_cast<int>(cinfo.output_height);
  if ((w & 1) || (h & 1) || w < 2 || h < 2) {
    // Odd post-scale dims: the packed layout assumes exact 2x subsampling.
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 10;
  }
  const int cw = w / 2, ch = h / 2;

  // Raw output rows are written at the component's padded width
  // (width_in_blocks * DCTSIZE); decode into a padded staging strip and
  // compact into the packed layout.
  const int ypadw =
      static_cast<int>(cinfo.comp_info[0].width_in_blocks) * DCTSIZE;
  const int cpadw =
      static_cast<int>(cinfo.comp_info[1].width_in_blocks) * DCTSIZE;
  packed = static_cast<unsigned char*>(
      std::malloc(static_cast<size_t>(h) * w + 2 * static_cast<size_t>(ch) * cw));
  staging = static_cast<unsigned char*>(
      std::malloc(static_cast<size_t>(16) * ypadw + 2 * 8 * cpadw));
  if (!packed || !staging) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    std::free(packed);
    std::free(staging);
    return 5;
  }
  unsigned char* ybase = packed;
  unsigned char* cbbase = packed + static_cast<size_t>(h) * w;
  unsigned char* crbase = cbbase + static_cast<size_t>(ch) * cw;
  unsigned char* ys = staging;
  unsigned char* cbs = staging + static_cast<size_t>(16) * ypadw;
  unsigned char* crs = cbs + static_cast<size_t>(8) * cpadw;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  for (int r = 0; r < 16; ++r) yrows[r] = ys + static_cast<size_t>(r) * ypadw;
  for (int r = 0; r < 8; ++r) {
    cbrows[r] = cbs + static_cast<size_t>(r) * cpadw;
    crrows[r] = crs + static_cast<size_t>(r) * cpadw;
  }

  while (cinfo.output_scanline < cinfo.output_height) {
    const int y0 = static_cast<int>(cinfo.output_scanline);
    const JDIMENSION got = jpeg_read_raw_data(&cinfo, planes, 16);
    if (got == 0) break;
    const int ny = h - y0 < 16 ? h - y0 : 16;
    for (int r = 0; r < ny; ++r) {
      memcpy(ybase + static_cast<size_t>(y0 + r) * w, yrows[r], w);
    }
    const int c0 = y0 / 2;
    const int nc = ch - c0 < 8 ? ch - c0 : 8;
    for (int r = 0; r < nc; ++r) {
      memcpy(cbbase + static_cast<size_t>(c0 + r) * cw, cbrows[r], cw);
      memcpy(crbase + static_cast<size_t>(c0 + r) * cw, crrows[r], cw);
    }
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  std::free(staging);

  *out = packed;
  *out_h = h;
  *out_w = w;
  return 0;
}

// Decodes n files to packed 4:2:0 in parallel (mirrors fcpt_decode_batch).
// Failed/ineligible entries have outs[i] == nullptr and oks[i] != 0
// (10 = not 4:2:0; the caller retries those with the RGB decoder).
int fcpt_decode_yuv420_batch(const char** paths, int n, unsigned char** outs,
                             int* hs, int* ws, int* oks, int scale_denom,
                             int n_threads) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      oks[i] = fcpt_decode_jpeg_yuv420(paths[i], &outs[i], &hs[i], &ws[i],
                                       scale_denom);
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Reads only the JPEG header; returns full-resolution dimensions.
int fcpt_jpeg_dims(const char* path, int* out_h, int* out_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 3;
  }
  *out_h = static_cast<int>(cinfo.image_height);
  *out_w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

void fcpt_free(unsigned char* p) { std::free(p); }

// Decodes n files in parallel with n_threads workers. Per-file status in
// oks (0 = success). Failed entries have outs[i] == nullptr.
int fcpt_decode_batch(const char** paths, int n, unsigned char** outs,
                      int* hs, int* ws, int* oks, int scale_denom,
                      int n_threads, int fast) {
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      oks[i] = fcpt_decode_jpeg(paths[i], &outs[i], &hs[i], &ws[i],
                                scale_denom, fast);
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// ---------------------------------------------------------------------------
// Raw-data JPEG encoder (YCbCr 4:2:0 planes in, baseline JFIF out).
//
// The device pipeline performs the JPEG encoder's two lossy front stages
// (RGB→YCbCr + 2x2 chroma subsampling, ops/yuv.py) before crops cross the
// device→host link at 1.5 bytes/pixel; this entry feeds those planes
// straight into libjpeg's raw-data API, skipping its color-convert and
// downsample passes.  Counterpart of the reference's cv2.imwrite JPEG path
// (reference cropper.py:554-609): same library family, same default 4:2:0
// sampling, caller-chosen quality (cv2's default is 95).
// ---------------------------------------------------------------------------

// Encodes one image from planar YCbCr 4:2:0. y: h*w bytes; cb/cr:
// (h/2)*(w/2) bytes each, all row-major.  h and w must be even.
// Returns 0 on success.
int fcpt_jpeg_encode_yuv420(const unsigned char* y, const unsigned char* cb,
                            const unsigned char* cr, int h, int w,
                            int quality, const char* path) {
  if (h < 2 || w < 2 || (h & 1) || (w & 1)) return 1;
  FILE* f = std::fopen(path, "wb");
  if (!f) return 2;

  jpeg_compress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit_handler;

  unsigned char* staging = nullptr;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_compress(&cinfo);
    std::fclose(f);
    std::free(staging);
    return 3;
  }

  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = static_cast<JDIMENSION>(w);
  cinfo.image_height = static_cast<JDIMENSION>(h);
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_YCbCr;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.raw_data_in = TRUE;
  cinfo.comp_info[0].h_samp_factor = 2;
  cinfo.comp_info[0].v_samp_factor = 2;
  cinfo.comp_info[1].h_samp_factor = 1;
  cinfo.comp_info[1].v_samp_factor = 1;
  cinfo.comp_info[2].h_samp_factor = 1;
  cinfo.comp_info[2].v_samp_factor = 1;

  jpeg_start_compress(&cinfo, TRUE);

  // jpeg_write_raw_data reads width_in_blocks*DCTSIZE samples per row —
  // the row width rounded up to the MCU grid.  Stage rows with the edge
  // sample replicated into the padding; row *pointers* beyond the image
  // bottom replicate the last row.
  const int cw = w / 2, ch = h / 2;
  const int ypad = ((w + 15) / 16) * 16;
  const int cpad = ypad / 2;
  const bool need_pad = (ypad != w);
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};

  if (need_pad) {
    staging = static_cast<unsigned char*>(
        std::malloc(static_cast<size_t>(16) * ypad + 2 * 8 * cpad));
    if (!staging) {
      jpeg_destroy_compress(&cinfo);
      std::fclose(f);
      return 4;
    }
  }

  while (cinfo.next_scanline < cinfo.image_height) {
    const int y0 = static_cast<int>(cinfo.next_scanline);  // multiple of 16
    if (!need_pad) {
      for (int r = 0; r < 16; ++r) {
        const int yy = y0 + r < h ? y0 + r : h - 1;
        yrows[r] = const_cast<JSAMPROW>(y + static_cast<size_t>(yy) * w);
      }
      for (int r = 0; r < 8; ++r) {
        const int cy = y0 / 2 + r < ch ? y0 / 2 + r : ch - 1;
        cbrows[r] = const_cast<JSAMPROW>(cb + static_cast<size_t>(cy) * cw);
        crrows[r] = const_cast<JSAMPROW>(cr + static_cast<size_t>(cy) * cw);
      }
    } else {
      unsigned char* ys = staging;
      unsigned char* cbs = staging + static_cast<size_t>(16) * ypad;
      unsigned char* crs = cbs + static_cast<size_t>(8) * cpad;
      for (int r = 0; r < 16; ++r) {
        const int yy = y0 + r < h ? y0 + r : h - 1;
        unsigned char* row = ys + static_cast<size_t>(r) * ypad;
        memcpy(row, y + static_cast<size_t>(yy) * w, w);
        memset(row + w, row[w - 1], ypad - w);
        yrows[r] = row;
      }
      for (int r = 0; r < 8; ++r) {
        const int cy = y0 / 2 + r < ch ? y0 / 2 + r : ch - 1;
        unsigned char* rb = cbs + static_cast<size_t>(r) * cpad;
        unsigned char* rr = crs + static_cast<size_t>(r) * cpad;
        memcpy(rb, cb + static_cast<size_t>(cy) * cw, cw);
        memset(rb + cw, rb[cw - 1], cpad - cw);
        memcpy(rr, cr + static_cast<size_t>(cy) * cw, cw);
        memset(rr + cw, rr[cw - 1], cpad - cw);
        cbrows[r] = rb;
        crrows[r] = rr;
      }
    }
    jpeg_write_raw_data(&cinfo, planes, 16);
  }

  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  std::free(staging);
  staging = nullptr;
  if (std::fclose(f) != 0) return 5;
  return 0;
}

// Encodes n packed 4:2:0 images (each h*w + 2*(h/2)*(w/2) bytes, planar
// Y|Cb|Cr) to paths[i] with n_threads workers; per-file status in oks.
int fcpt_encode_yuv420_batch(const unsigned char* packed, int n, int h,
                             int w, int quality, const char** paths,
                             int n_threads, int* oks) {
  if (n <= 0) return 0;
  if (h < 2 || w < 2 || (h & 1) || (w & 1)) return 1;
  if (n_threads < 1) n_threads = 1;
  const size_t ylen = static_cast<size_t>(h) * w;
  const size_t clen = static_cast<size_t>(h / 2) * (w / 2);
  const size_t stride = ylen + 2 * clen;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const unsigned char* p = packed + static_cast<size_t>(i) * stride;
      oks[i] = fcpt_jpeg_encode_yuv420(p, p + ylen, p + ylen + clen, h, w,
                                       quality, paths[i]);
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Batched inverse affine warp (host-side).
//
// The reference delegates per-face warping to cv2.warpAffine's C++
// (reference cropper.py:542-547); on accelerator runs this framework warps
// on device (face_crop_plus_tpu/ops/warp.py), but host/CPU runs — the
// landmark-only CelebA config is pure host work — deserve a native warp
// too: XLA:CPU's gather-based formulation measures ~8 ms/face at 256²
// where a direct scalar loop with an interior fast path runs ~10x faster.
// Semantics mirror ops/warp.py's exact per-neighbor path (which is
// cv2-parity-tested): cv2 borderInterpolate index remapping for all five
// border modes, float32 accumulation, round-half-even saturate to uint8.
// ---------------------------------------------------------------------------

namespace {

// Border modes (must match utils/native_io.py): 0 constant, 1 replicate,
// 2 reflect, 3 wrap, 4 reflect_101.
inline int map_index(int i, int n, int mode) {
  switch (mode) {
    case 0:
    case 1:
      return i < 0 ? 0 : (i >= n ? n - 1 : i);
    case 3: {
      int j = i % n;
      return j < 0 ? j + n : j;
    }
    case 2: {
      const int p = 2 * n;
      int j = i % p;
      if (j < 0) j += p;
      return j >= n ? p - 1 - j : j;
    }
    case 4: {
      int p = 2 * n - 2;
      if (p < 1) p = 1;
      int j = i % p;
      if (j < 0) j += p;
      return j >= n ? p - j : j;
    }
  }
  return 0;
}

inline unsigned char sat_round(float v) {
  // nearbyintf under the default FP environment = round-half-to-even,
  // matching jnp.rint / np.rint in ops/warp.py::to_uint8.
  float r = nearbyintf(v);
  if (r < 0.f) return 0;
  if (r > 255.f) return 255;
  return static_cast<unsigned char>(r);
}

// EXACT=true: float accumulation + round-half-even (bit-aligned with the
// device warp, ops/warp.py).  EXACT=false: 10-bit fixed-point bilinear —
// the same arithmetic family as cv2's INTER_LINEAR (which uses 5 bits);
// quantizing the source coordinate to 1/1024 px bounds the deviation from
// the exact path to one intensity level, and the integer accumulator
// needs no per-channel rounding call (the exact path's nearbyintf
// dominates its profile).  Border pixels always take the exact path.
template <bool EXACT>
inline void warp_pixel(const unsigned char* src, size_t row_stride, int c,
                       float sx, float sy, int top, int left, int eh, int ew,
                       int mode, const unsigned char* bv,
                       unsigned char* out_px) {
  if (!EXACT) {
    const int sxq = static_cast<int>(floorf(sx * 1024.f));
    const int syq = static_cast<int>(floorf(sy * 1024.f));
    const int qx0 = sxq >> 10, qy0 = syq >> 10;
    if (qx0 >= 0 && qy0 >= 0 && qx0 + 1 < ew && qy0 + 1 < eh) {
      const int ifx = sxq & 1023, ify = syq & 1023;
      const int wx0 = 1024 - ifx, wy0 = 1024 - ify;
      const unsigned char* p00 =
          src + static_cast<size_t>(qy0 + top) * row_stride +
          static_cast<size_t>(qx0 + left) * c;
      const unsigned char* p10 = p00 + row_stride;
      for (int ch = 0; ch < c; ++ch) {
        const int h0 = wx0 * p00[ch] + ifx * p00[c + ch];
        const int h1 = wx0 * p10[ch] + ifx * p10[c + ch];
        // Weights sum to 1<<20 and taps are <=255, so the rounded
        // result is already in [0, 255]; no clamp needed.
        out_px[ch] = static_cast<unsigned char>(
            (wy0 * h0 + ify * h1 + (1 << 19)) >> 20);
      }
      return;
    }
    // Border neighborhood: fall through to the exact implementation.
  }

  const float fx0 = floorf(sx);
  const float fy0 = floorf(sy);
  const int x0 = static_cast<int>(fx0);
  const int y0 = static_cast<int>(fy0);
  const float fx = sx - fx0;
  const float fy = sy - fy0;
  const float w00 = (1.f - fx) * (1.f - fy);
  const float w01 = fx * (1.f - fy);
  const float w10 = (1.f - fx) * fy;
  const float w11 = fx * fy;

  if (x0 >= 0 && y0 >= 0 && x0 + 1 < ew && y0 + 1 < eh) {
    // Interior fast path: the 2x2 neighborhood is fully inside the
    // (un-padded) window — no border remap, contiguous fetches.
    const unsigned char* p00 =
        src + static_cast<size_t>(y0 + top) * row_stride +
        static_cast<size_t>(x0 + left) * c;
    const unsigned char* p10 = p00 + row_stride;
    for (int ch = 0; ch < c; ++ch) {
      const float v = w00 * p00[ch] + w01 * p00[c + ch] +
                      w10 * p10[ch] + w11 * p10[c + ch];
      out_px[ch] = sat_round(v);
    }
    return;
  }

  // Border path: per-neighbor cv2 index remapping (exact for all
  // five modes; "constant" blends outside-neighbor weights against the
  // per-channel border value (0 for RGB/luma black; 128 keeps chroma
  // planes color-neutral, the exact YCbCr image of an RGB black border).
  float acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};  // c <= 8 supported
  const float wgt[2][2] = {{w00, w01}, {w10, w11}};
  for (int dy = 0; dy < 2; ++dy) {
    const int yi = y0 + dy;
    for (int dx = 0; dx < 2; ++dx) {
      const int xi = x0 + dx;
      float g = wgt[dy][dx];
      if (mode == 0 && (xi < 0 || xi >= ew || yi < 0 || yi >= eh)) {
        for (int ch = 0; ch < c; ++ch) acc[ch] += g * bv[ch];
        continue;
      }
      const int ym = map_index(yi, eh, mode) + top;
      const int xm = map_index(xi, ew, mode) + left;
      const unsigned char* p = src + static_cast<size_t>(ym) * row_stride +
                               static_cast<size_t>(xm) * c;
      for (int ch = 0; ch < c; ++ch) acc[ch] += g * p[ch];
    }
  }
  for (int ch = 0; ch < c; ++ch) out_px[ch] = sat_round(acc[ch]);
}

#if defined(__AVX2__)
// 8-pixel AVX2 row kernel for the fixed-point c==3 path.  Strategy per
// block of 8 output pixels: vector-compute quantized source coordinates
// and the interior mask; when all 8 neighborhoods are interior (the
// overwhelmingly common case for face crops), fetch each pixel pair as
// one 8-byte load, rearrange bytes into per-channel (p0, p1) epi16 pairs,
// and do the bilinear blend with pmaddwd (horizontal) + 32-bit multiplies
// (vertical).  Bit-identical to the scalar fixed-point path.  Any block
// touching a border (or the end-of-buffer read guard) falls back to the
// scalar per-pixel path.
inline void warp_row_fixed3_avx2(const unsigned char* src, size_t row_stride,
                                 float a, float d, float sx_row, float sy_row,
                                 int top, int left, int eh, int ew, int mode,
                                 long long max_off, const unsigned char* bv,
                                 unsigned char* out_row, int ow) {
  const __m256 va = _mm256_set1_ps(a);
  const __m256 vd = _mm256_set1_ps(d);
  const __m256 vsxr = _mm256_set1_ps(sx_row);
  const __m256 vsyr = _mm256_set1_ps(sy_row);
  const __m256 v1024f = _mm256_set1_ps(1024.f);
  const __m256i v1023 = _mm256_set1_epi32(1023);
  const __m256i v1024 = _mm256_set1_epi32(1024);
  const __m256i vm1 = _mm256_set1_epi32(-1);
  const __m256i vxlim = _mm256_set1_epi32(ew - 1);  // need x0 < ew-1
  const __m256i vylim = _mm256_set1_epi32(eh - 1);
  const __m256i vtop = _mm256_set1_epi32(top);
  const __m256i vleft = _mm256_set1_epi32(left);
  const __m256i vrs = _mm256_set1_epi32(static_cast<int>(row_stride));
  const __m256i v3 = _mm256_set1_epi32(3);
  const __m256i vmaxoff = _mm256_set1_epi32(
      max_off > 0x7fffffffLL ? 0x7fffffff : static_cast<int>(max_off));
  const __m256i vbias = _mm256_set1_epi32(1 << 19);
  const __m256i iota = _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7);
  // unpacklo_epi64 of the two shuffled halves yields pixel order
  // [0,1,4,5 | 2,3,6,7]; this permutation is self-inverse.
  const __m256i swz = _mm256_setr_epi32(0, 1, 4, 5, 2, 3, 6, 7);
  // Per 128-bit lane: two pixels' 8-byte pairs at offsets 0 and 8 with
  // channel bytes [c, c+3] -> epi16 pairs in the low 8 bytes.
  const __m256i shufR = _mm256_setr_epi8(
      0, -128, 3, -128, 8, -128, 11, -128, -128, -128, -128, -128, -128,
      -128, -128, -128, 0, -128, 3, -128, 8, -128, 11, -128, -128, -128,
      -128, -128, -128, -128, -128, -128);
  const __m256i shufG = _mm256_setr_epi8(
      1, -128, 4, -128, 9, -128, 12, -128, -128, -128, -128, -128, -128,
      -128, -128, -128, 1, -128, 4, -128, 9, -128, 12, -128, -128, -128,
      -128, -128, -128, -128, -128, -128);
  const __m256i shufB = _mm256_setr_epi8(
      2, -128, 5, -128, 10, -128, 13, -128, -128, -128, -128, -128, -128,
      -128, -128, -128, 2, -128, 5, -128, 10, -128, 13, -128, -128, -128,
      -128, -128, -128, -128, -128, -128);
  // Compact 4 pixels' [r|g<<8|b<<16] epi32 into 12 rgb bytes per lane.
  const __m256i shufPack = _mm256_setr_epi8(
      0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14, -128, -128, -128, -128,
      0, 1, 2, 4, 5, 6, 8, 9, 10, 12, 13, 14, -128, -128, -128, -128);

  int x = 0;
  for (; x + 8 <= ow; x += 8) {
    const __m256 xs =
        _mm256_cvtepi32_ps(_mm256_add_epi32(_mm256_set1_epi32(x), iota));
    // mul+add (not fmadd): matches the scalar path's expression exactly.
    const __m256 sx = _mm256_add_ps(_mm256_mul_ps(va, xs), vsxr);
    const __m256 sy = _mm256_add_ps(_mm256_mul_ps(vd, xs), vsyr);
    const __m256i sxq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sx, v1024f)));
    const __m256i syq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sy, v1024f)));
    const __m256i x0 = _mm256_srai_epi32(sxq, 10);
    const __m256i y0 = _mm256_srai_epi32(syq, 10);
    const __m256i fx = _mm256_and_si256(sxq, v1023);
    const __m256i fy = _mm256_and_si256(syq, v1023);

    __m256i ok = _mm256_and_si256(_mm256_cmpgt_epi32(x0, vm1),
                                  _mm256_cmpgt_epi32(vxlim, x0));
    ok = _mm256_and_si256(
        ok, _mm256_and_si256(_mm256_cmpgt_epi32(y0, vm1),
                             _mm256_cmpgt_epi32(vylim, y0)));
    const __m256i off = _mm256_add_epi32(
        _mm256_mullo_epi32(_mm256_add_epi32(y0, vtop), vrs),
        _mm256_mullo_epi32(_mm256_add_epi32(x0, vleft), v3));
    const __m256i offB = _mm256_add_epi32(off, vrs);
    // 8-byte fetches read 2 bytes past the second pixel; keep them inside
    // the caller's buffer (only binding near the very end of the batch).
    ok = _mm256_andnot_si256(_mm256_cmpgt_epi32(offB, vmaxoff), ok);

    unsigned char* dst = out_row + static_cast<size_t>(x) * 3;
    if (_mm256_movemask_epi8(ok) != -1) {
      alignas(32) float sxs[8], sys[8];
      _mm256_store_ps(sxs, sx);
      _mm256_store_ps(sys, sy);
      for (int k = 0; k < 8; ++k) {
        warp_pixel<false>(src, row_stride, 3, sxs[k], sys[k], top, left, eh,
                          ew, mode, bv, dst + 3 * k);
      }
      continue;
    }

    // vpgatherqq beats 8x scalar staging (store-to-load forwarding stalls
    // when the staging array is re-read as 256-bit loads).  Pixel pairs
    // land in the same lane order the staging loop produced.
    const __m256i offLo = _mm256_cvtepi32_epi64(_mm256_castsi256_si128(off));
    const __m256i offHi =
        _mm256_cvtepi32_epi64(_mm256_extracti128_si256(off, 1));
    const long long* srcT = reinterpret_cast<const long long*>(src);
    const long long* srcB =
        reinterpret_cast<const long long*>(src + row_stride);
    const __m256i topA = _mm256_i64gather_epi64(srcT, offLo, 1);
    const __m256i topB = _mm256_i64gather_epi64(srcT, offHi, 1);
    const __m256i botA = _mm256_i64gather_epi64(srcB, offLo, 1);
    const __m256i botB = _mm256_i64gather_epi64(srcB, offHi, 1);

    const __m256i Rt = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(topA, shufR),
                                             _mm256_shuffle_epi8(topB, shufR));
    const __m256i Gt = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(topA, shufG),
                                             _mm256_shuffle_epi8(topB, shufG));
    const __m256i Bt = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(topA, shufB),
                                             _mm256_shuffle_epi8(topB, shufB));
    const __m256i Rb = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(botA, shufR),
                                             _mm256_shuffle_epi8(botB, shufR));
    const __m256i Gb = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(botA, shufG),
                                             _mm256_shuffle_epi8(botB, shufG));
    const __m256i Bb = _mm256_unpacklo_epi64(_mm256_shuffle_epi8(botA, shufB),
                                             _mm256_shuffle_epi8(botB, shufB));

    // (wx0 | fx<<16) as epi16 pairs, permuted into the pair registers'
    // [0,1,4,5,2,3,6,7] pixel order.
    const __m256i wx0 = _mm256_sub_epi32(v1024, fx);
    const __m256i WX = _mm256_permutevar8x32_epi32(
        _mm256_or_si256(wx0, _mm256_slli_epi32(fx, 16)), swz);
    const __m256i wy0s =
        _mm256_permutevar8x32_epi32(_mm256_sub_epi32(v1024, fy), swz);
    const __m256i fys = _mm256_permutevar8x32_epi32(fy, swz);

    const __m256i rr = _mm256_permutevar8x32_epi32(
        _mm256_srai_epi32(
            _mm256_add_epi32(
                _mm256_add_epi32(
                    _mm256_mullo_epi32(_mm256_madd_epi16(Rt, WX), wy0s),
                    _mm256_mullo_epi32(_mm256_madd_epi16(Rb, WX), fys)),
                vbias),
            20),
        swz);
    const __m256i gg = _mm256_permutevar8x32_epi32(
        _mm256_srai_epi32(
            _mm256_add_epi32(
                _mm256_add_epi32(
                    _mm256_mullo_epi32(_mm256_madd_epi16(Gt, WX), wy0s),
                    _mm256_mullo_epi32(_mm256_madd_epi16(Gb, WX), fys)),
                vbias),
            20),
        swz);
    const __m256i bb = _mm256_permutevar8x32_epi32(
        _mm256_srai_epi32(
            _mm256_add_epi32(
                _mm256_add_epi32(
                    _mm256_mullo_epi32(_mm256_madd_epi16(Bt, WX), wy0s),
                    _mm256_mullo_epi32(_mm256_madd_epi16(Bb, WX), fys)),
                vbias),
            20),
        swz);

    const __m256i rgb = _mm256_or_si256(
        rr, _mm256_or_si256(_mm256_slli_epi32(gg, 8),
                            _mm256_slli_epi32(bb, 16)));
    const __m256i packed = _mm256_shuffle_epi8(rgb, shufPack);
    const __m128i lo = _mm256_castsi256_si128(packed);
    const __m128i hi = _mm256_extracti128_si256(packed, 1);
    _mm_storel_epi64(reinterpret_cast<__m128i*>(dst), lo);
    const unsigned int lo2 =
        static_cast<unsigned int>(_mm_extract_epi32(lo, 2));
    memcpy(dst + 8, &lo2, 4);
    _mm_storel_epi64(reinterpret_cast<__m128i*>(dst + 12), hi);
    const unsigned int hi2 =
        static_cast<unsigned int>(_mm_extract_epi32(hi, 2));
    memcpy(dst + 20, &hi2, 4);
  }
  for (; x < ow; ++x) {
    const float sx = a * x + sx_row;
    const float sy = d * x + sy_row;
    warp_pixel<false>(src, row_stride, 3, sx, sy, top, left, eh, ew, mode,
                      bv, out_row + static_cast<size_t>(x) * 3);
  }
}

// 8-pixel AVX2 row kernel for the fixed-point c==1 / c==2 paths (the
// YUV-direct crop pipeline's luma and interleaved-chroma planes).  Per
// block: vector-compute quantized coordinates + interior mask like the
// c==3 kernel; interior blocks fetch each pixel's horizontal 2-tap pair
// as one 4-byte load (2 bytes used at c==1, all 4 at c==2), widen the
// taps into epi16 pairs and blend with pmaddwd (horizontal) + 32-bit
// multiplies (vertical).  Bit-identical to the scalar fixed-point path;
// border-touching blocks fall back per pixel.
template <int C>
inline void warp_row_fixed12_avx2(const unsigned char* src, size_t row_stride,
                                  float a, float d, float sx_row, float sy_row,
                                  int top, int left, int eh, int ew, int mode,
                                  long long max_off, const unsigned char* bv,
                                  unsigned char* out_row, int ow) {
  static_assert(C == 1 || C == 2, "c==1 / c==2 only");
  const __m256 va = _mm256_set1_ps(a);
  const __m256 vd = _mm256_set1_ps(d);
  const __m256 vsxr = _mm256_set1_ps(sx_row);
  const __m256 vsyr = _mm256_set1_ps(sy_row);
  const __m256 v1024f = _mm256_set1_ps(1024.f);
  const __m256i v1023 = _mm256_set1_epi32(1023);
  const __m256i v1024 = _mm256_set1_epi32(1024);
  const __m256i vm1 = _mm256_set1_epi32(-1);
  const __m256i vxlim = _mm256_set1_epi32(ew - 1);
  const __m256i vylim = _mm256_set1_epi32(eh - 1);
  const __m256i vtop = _mm256_set1_epi32(top);
  const __m256i vleft = _mm256_set1_epi32(left);
  const __m256i vrs = _mm256_set1_epi32(static_cast<int>(row_stride));
  const __m256i vmaxoff = _mm256_set1_epi32(
      max_off > 0x7fffffffLL ? 0x7fffffff : static_cast<int>(max_off));
  const __m256i vbias = _mm256_set1_epi32(1 << 19);
  const __m256i iota = _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7);
  // c==2: even bytes of each 4-byte pair = channel-0 taps (p00, p01) as
  // epi16; odd bytes = channel-1.  c==1: taps are bytes 0 and 1.
  const __m256i mEven = _mm256_set1_epi32(0x00FF00FF);

  int x = 0;
  for (; x + 8 <= ow; x += 8) {
    const __m256 xs =
        _mm256_cvtepi32_ps(_mm256_add_epi32(_mm256_set1_epi32(x), iota));
    const __m256 sx = _mm256_add_ps(_mm256_mul_ps(va, xs), vsxr);
    const __m256 sy = _mm256_add_ps(_mm256_mul_ps(vd, xs), vsyr);
    const __m256i sxq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sx, v1024f)));
    const __m256i syq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sy, v1024f)));
    const __m256i x0 = _mm256_srai_epi32(sxq, 10);
    const __m256i y0 = _mm256_srai_epi32(syq, 10);
    const __m256i fx = _mm256_and_si256(sxq, v1023);
    const __m256i fy = _mm256_and_si256(syq, v1023);

    __m256i ok = _mm256_and_si256(_mm256_cmpgt_epi32(x0, vm1),
                                  _mm256_cmpgt_epi32(vxlim, x0));
    ok = _mm256_and_si256(
        ok, _mm256_and_si256(_mm256_cmpgt_epi32(y0, vm1),
                             _mm256_cmpgt_epi32(vylim, y0)));
    const __m256i off = _mm256_add_epi32(
        _mm256_mullo_epi32(_mm256_add_epi32(y0, vtop), vrs),
        C == 2 ? _mm256_slli_epi32(_mm256_add_epi32(x0, vleft), 1)
               : _mm256_add_epi32(x0, vleft));
    const __m256i offB = _mm256_add_epi32(off, vrs);
    // 4-byte fetches read (4 - 2*C) bytes past the second pixel; keep
    // them inside the caller's buffer.
    ok = _mm256_andnot_si256(_mm256_cmpgt_epi32(offB, vmaxoff), ok);

    unsigned char* dst = out_row + static_cast<size_t>(x) * C;
    if (_mm256_movemask_epi8(ok) != -1) {
      alignas(32) float sxs[8], sys[8];
      _mm256_store_ps(sxs, sx);
      _mm256_store_ps(sys, sy);
      for (int k = 0; k < 8; ++k) {
        warp_pixel<false>(src, row_stride, C, sxs[k], sys[k], top, left, eh,
                          ew, mode, bv, dst + C * k);
      }
      continue;
    }

    // vpgatherdd beats 8x scalar staging here: the stores would hit
    // store-to-load forwarding stalls when re-read as one 256-bit load.
    const __m256i gT = _mm256_i32gather_epi32(
        reinterpret_cast<const int*>(src), off, 1);
    const __m256i gB = _mm256_i32gather_epi32(
        reinterpret_cast<const int*>(src + row_stride), off, 1);

    // (wx0 | fx<<16) epi16 pairs; lanes map 1:1 to pixels (no swizzle).
    const __m256i WX = _mm256_or_si256(_mm256_sub_epi32(v1024, fx),
                                       _mm256_slli_epi32(fx, 16));
    const __m256i wy0 = _mm256_sub_epi32(v1024, fy);

    if (C == 1) {
      // Lane bytes [p00, p01, x, x] -> epi16 pair [p00 | p01<<16].
      const __m256i pT = _mm256_or_si256(
          _mm256_and_si256(gT, _mm256_set1_epi32(0xFF)),
          _mm256_and_si256(_mm256_slli_epi32(gT, 8),
                           _mm256_set1_epi32(0x00FF0000)));
      const __m256i pB = _mm256_or_si256(
          _mm256_and_si256(gB, _mm256_set1_epi32(0xFF)),
          _mm256_and_si256(_mm256_slli_epi32(gB, 8),
                           _mm256_set1_epi32(0x00FF0000)));
      const __m256i vv = _mm256_srai_epi32(
          _mm256_add_epi32(
              _mm256_add_epi32(
                  _mm256_mullo_epi32(_mm256_madd_epi16(pT, WX), wy0),
                  _mm256_mullo_epi32(_mm256_madd_epi16(pB, WX), fy)),
              vbias),
          20);
      // 8 epi32 values (each <= 255) -> 8 bytes.
      const __m256i sh = _mm256_setr_epi8(
          0, 4, 8, 12, -128, -128, -128, -128, -128, -128, -128, -128, -128,
          -128, -128, -128, 0, 4, 8, 12, -128, -128, -128, -128, -128, -128,
          -128, -128, -128, -128, -128, -128);
      const __m256i b = _mm256_shuffle_epi8(vv, sh);
      const unsigned int lo =
          static_cast<unsigned int>(_mm_cvtsi128_si32(_mm256_castsi256_si128(b)));
      const unsigned int hi = static_cast<unsigned int>(
          _mm_cvtsi128_si32(_mm256_extracti128_si256(b, 1)));
      memcpy(dst, &lo, 4);
      memcpy(dst + 4, &hi, 4);
    } else {
      // Lane bytes [u0, v0, u1, v1]: even-byte mask isolates channel-0
      // taps as epi16 pairs, odd bytes (shifted) channel-1.
      const __m256i uT = _mm256_and_si256(gT, mEven);
      const __m256i vT = _mm256_and_si256(_mm256_srli_epi32(gT, 8), mEven);
      const __m256i uB = _mm256_and_si256(gB, mEven);
      const __m256i vB = _mm256_and_si256(_mm256_srli_epi32(gB, 8), mEven);
      const __m256i uu = _mm256_srai_epi32(
          _mm256_add_epi32(
              _mm256_add_epi32(
                  _mm256_mullo_epi32(_mm256_madd_epi16(uT, WX), wy0),
                  _mm256_mullo_epi32(_mm256_madd_epi16(uB, WX), fy)),
              vbias),
          20);
      const __m256i vv = _mm256_srai_epi32(
          _mm256_add_epi32(
              _mm256_add_epi32(
                  _mm256_mullo_epi32(_mm256_madd_epi16(vT, WX), wy0),
                  _mm256_mullo_epi32(_mm256_madd_epi16(vB, WX), fy)),
              vbias),
          20);
      // Interleave per lane to [u | v<<8] epi16, then compact the 8
      // lanes' low 16 bits to 16 output bytes.
      const __m256i uv = _mm256_or_si256(uu, _mm256_slli_epi32(vv, 8));
      const __m256i sh = _mm256_setr_epi8(
          0, 1, 4, 5, 8, 9, 12, 13, -128, -128, -128, -128, -128, -128, -128,
          -128, 0, 1, 4, 5, 8, 9, 12, 13, -128, -128, -128, -128, -128, -128,
          -128, -128);
      const __m256i b = _mm256_shuffle_epi8(uv, sh);
      _mm_storel_epi64(reinterpret_cast<__m128i*>(dst),
                       _mm256_castsi256_si128(b));
      _mm_storel_epi64(reinterpret_cast<__m128i*>(dst + 8),
                       _mm256_extracti128_si256(b, 1));
    }
  }
  for (; x < ow; ++x) {
    const float sx = a * x + sx_row;
    const float sy = d * x + sy_row;
    warp_pixel<false>(src, row_stride, C, sx, sy, top, left, eh, ew, mode,
                      bv, out_row + static_cast<size_t>(x) * C);
  }
}

// Chroma-pair row kernel: warps two single-channel planes that share one
// coordinate grid (4:2:0 Cb and Cr) in a single pass — the coordinate
// block (the kernel's dominant cost) is computed once for both.
// Bit-identical to two warp_row_fixed12_avx2<1> passes.
inline void warp_row_fixed1_pair_avx2(
    const unsigned char* srcA, const unsigned char* srcB, size_t row_stride,
    float a, float d, float sx_row, float sy_row, int eh, int ew, int mode,
    long long max_off_a, long long max_off_b, const unsigned char* bv,
    unsigned char* outA, unsigned char* outB, int ow) {
  const __m256 va = _mm256_set1_ps(a);
  const __m256 vd = _mm256_set1_ps(d);
  const __m256 vsxr = _mm256_set1_ps(sx_row);
  const __m256 vsyr = _mm256_set1_ps(sy_row);
  const __m256 v1024f = _mm256_set1_ps(1024.f);
  const __m256i v1023 = _mm256_set1_epi32(1023);
  const __m256i v1024 = _mm256_set1_epi32(1024);
  const __m256i vm1 = _mm256_set1_epi32(-1);
  const __m256i vxlim = _mm256_set1_epi32(ew - 1);
  const __m256i vylim = _mm256_set1_epi32(eh - 1);
  const __m256i vrs = _mm256_set1_epi32(static_cast<int>(row_stride));
  const long long max_off =
      max_off_a < max_off_b ? max_off_a : max_off_b;
  const __m256i vmaxoff = _mm256_set1_epi32(
      max_off > 0x7fffffffLL ? 0x7fffffff : static_cast<int>(max_off));
  const __m256i vbias = _mm256_set1_epi32(1 << 19);
  const __m256i iota = _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7);
  const __m256i sh = _mm256_setr_epi8(
      0, 4, 8, 12, -128, -128, -128, -128, -128, -128, -128, -128, -128,
      -128, -128, -128, 0, 4, 8, 12, -128, -128, -128, -128, -128, -128,
      -128, -128, -128, -128, -128, -128);

  int x = 0;
  for (; x + 8 <= ow; x += 8) {
    const __m256 xs =
        _mm256_cvtepi32_ps(_mm256_add_epi32(_mm256_set1_epi32(x), iota));
    const __m256 sx = _mm256_add_ps(_mm256_mul_ps(va, xs), vsxr);
    const __m256 sy = _mm256_add_ps(_mm256_mul_ps(vd, xs), vsyr);
    const __m256i sxq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sx, v1024f)));
    const __m256i syq =
        _mm256_cvtps_epi32(_mm256_floor_ps(_mm256_mul_ps(sy, v1024f)));
    const __m256i x0 = _mm256_srai_epi32(sxq, 10);
    const __m256i y0 = _mm256_srai_epi32(syq, 10);
    const __m256i fx = _mm256_and_si256(sxq, v1023);
    const __m256i fy = _mm256_and_si256(syq, v1023);

    __m256i ok = _mm256_and_si256(_mm256_cmpgt_epi32(x0, vm1),
                                  _mm256_cmpgt_epi32(vxlim, x0));
    ok = _mm256_and_si256(
        ok, _mm256_and_si256(_mm256_cmpgt_epi32(y0, vm1),
                             _mm256_cmpgt_epi32(vylim, y0)));
    const __m256i off =
        _mm256_add_epi32(_mm256_mullo_epi32(y0, vrs), x0);
    const __m256i offB = _mm256_add_epi32(off, vrs);
    ok = _mm256_andnot_si256(_mm256_cmpgt_epi32(offB, vmaxoff), ok);

    if (_mm256_movemask_epi8(ok) != -1) {
      alignas(32) float sxs[8], sys[8];
      _mm256_store_ps(sxs, sx);
      _mm256_store_ps(sys, sy);
      for (int k = 0; k < 8; ++k) {
        warp_pixel<false>(srcA, row_stride, 1, sxs[k], sys[k], 0, 0, eh, ew,
                          mode, bv, outA + x + k);
        warp_pixel<false>(srcB, row_stride, 1, sxs[k], sys[k], 0, 0, eh, ew,
                          mode, bv, outB + x + k);
      }
      continue;
    }

    const __m256i WX = _mm256_or_si256(_mm256_sub_epi32(v1024, fx),
                                       _mm256_slli_epi32(fx, 16));
    const __m256i wy0 = _mm256_sub_epi32(v1024, fy);
    const __m256i mLo = _mm256_set1_epi32(0xFF);
    const __m256i mHi = _mm256_set1_epi32(0x00FF0000);
    for (int plane = 0; plane < 2; ++plane) {
      const unsigned char* s = plane ? srcB : srcA;
      unsigned char* dst = (plane ? outB : outA) + x;
      const __m256i gT = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(s), off, 1);
      const __m256i gB = _mm256_i32gather_epi32(
          reinterpret_cast<const int*>(s + row_stride), off, 1);
      const __m256i pT = _mm256_or_si256(
          _mm256_and_si256(gT, mLo),
          _mm256_and_si256(_mm256_slli_epi32(gT, 8), mHi));
      const __m256i pB = _mm256_or_si256(
          _mm256_and_si256(gB, mLo),
          _mm256_and_si256(_mm256_slli_epi32(gB, 8), mHi));
      const __m256i vv = _mm256_srai_epi32(
          _mm256_add_epi32(
              _mm256_add_epi32(
                  _mm256_mullo_epi32(_mm256_madd_epi16(pT, WX), wy0),
                  _mm256_mullo_epi32(_mm256_madd_epi16(pB, WX), fy)),
              vbias),
          20);
      const __m256i b = _mm256_shuffle_epi8(vv, sh);
      const unsigned int lo = static_cast<unsigned int>(
          _mm_cvtsi128_si32(_mm256_castsi256_si128(b)));
      const unsigned int hi = static_cast<unsigned int>(
          _mm_cvtsi128_si32(_mm256_extracti128_si256(b, 1)));
      memcpy(dst, &lo, 4);
      memcpy(dst + 4, &hi, 4);
    }
  }
  for (; x < ow; ++x) {
    const float sx = a * x + sx_row;
    const float sy = d * x + sy_row;
    warp_pixel<false>(srcA, row_stride, 1, sx, sy, 0, 0, eh, ew, mode, bv,
                      outA + x);
    warp_pixel<false>(srcB, row_stride, 1, sx, sy, 0, 0, eh, ew, mode, bv,
                      outB + x);
  }
}
#endif  // __AVX2__

template <bool EXACT>
void warp_one_face(const unsigned char* images, long long images_bytes,
                   int h, int w, int c, const float* inv6, int img, int top,
                   int left, int eh, int ew, int oh, int ow, int mode,
                   const unsigned char* bv, unsigned char* dst) {
  const float a = inv6[0], b = inv6[1], tx = inv6[2];
  const float d = inv6[3], e = inv6[4], ty = inv6[5];
  const unsigned char* src = images + static_cast<size_t>(img) * h * w * c;
  const size_t row_stride = static_cast<size_t>(w) * c;

#if defined(__AVX2__)
  if (!EXACT && row_stride <= (1u << 29)) {  // offsets stay inside int32
    if (c == 3) {
      // Bytes from this image's start to the end of the whole batch
      // buffer, minus the 8-byte fetch width.
      const long long max_off =
          images_bytes - static_cast<long long>(img) * h * w * c - 8;
      for (int y = 0; y < oh; ++y) {
        warp_row_fixed3_avx2(src, row_stride, a, d, b * y + tx, e * y + ty,
                             top, left, eh, ew, mode, max_off, bv,
                             dst + static_cast<size_t>(y) * ow * c, ow);
      }
      return;
    }
    if (c == 1 || c == 2) {
      const long long max_off =
          images_bytes - static_cast<long long>(img) * h * w * c - 4;
      for (int y = 0; y < oh; ++y) {
        if (c == 1) {
          warp_row_fixed12_avx2<1>(src, row_stride, a, d, b * y + tx,
                                   e * y + ty, top, left, eh, ew, mode,
                                   max_off, bv,
                                   dst + static_cast<size_t>(y) * ow, ow);
        } else {
          warp_row_fixed12_avx2<2>(src, row_stride, a, d, b * y + tx,
                                   e * y + ty, top, left, eh, ew, mode,
                                   max_off, bv,
                                   dst + static_cast<size_t>(y) * ow * 2, ow);
        }
      }
      return;
    }
  }
#else
  (void)images_bytes;
#endif

  for (int y = 0; y < oh; ++y) {
    const float sx_row = b * y + tx;
    const float sy_row = e * y + ty;
    unsigned char* out_row = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const float sx = a * x + sx_row;
      const float sy = d * x + sy_row;
      warp_pixel<EXACT>(src, row_stride, c, sx, sy, top, left, eh, ew, mode,
                        bv, out_row + static_cast<size_t>(x) * c);
    }
  }
}

}  // namespace

extern "C" {

// Warps f faces out of a uint8 (n, h, w, c) batch into (f, oh, ow, c).
// inv_mats: f x 6 row-major dst->src transforms [a, b, tx, d, e, ty]
// (already inverted by the caller).  windows: f x 4 (top, left, eh, ew)
// un-padded sampling windows, or nullptr for the full image.  border_mode
// as map_index above.  exact: 1 = float round-half-even (device-warp
// parity), 0 = 10-bit fixed-point interior (within one level, faster).
// c must be <= 8.  Returns 0 on success.
// Packed planar YCbCr 4:2:0 rows (n, h*w + 2*(h/2)*(w/2)) -> uint8 RGB
// (n, h, w, 3).  Bit-identical to the framework's float32 numpy/device
// reconstruction (ops/yuv.py): chroma upsampled H-then-W with [0.75, 0.25]
// edge-clamped taps, BT.601 inverse, round-half-even, clip.  fp-contract
// is forced off for this function: an FMA would round differently from
// the twin's separate float32 multiply+add.
#pragma GCC push_options
#pragma GCC optimize("fp-contract=off")
int fcpt_yuv420_to_rgb(const unsigned char* packed, int n, int h, int w,
                       int n_threads, unsigned char* out) {
  if (h < 2 || w < 2 || (h & 1) || (w & 1)) return 1;
  if (n <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  const int ch = h / 2, cw = w / 2;
  const size_t ylen = static_cast<size_t>(h) * w;
  const size_t clen = static_cast<size_t>(ch) * cw;
  const size_t row_len = ylen + 2 * clen;
  std::atomic<int> next(0);
  auto worker = [&]() {
    // Per-row H-upsampled chroma (this output row's chroma line).
    std::vector<float> ucb(cw), ucr(cw);
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const unsigned char* yp = packed + static_cast<size_t>(i) * row_len;
      const unsigned char* cbp = yp + ylen;
      const unsigned char* crp = cbp + clen;
      unsigned char* dst = out + static_cast<size_t>(i) * ylen * 3;
      for (int r = 0; r < h; ++r) {
        const int ci = r >> 1;
        // H taps: even rows blend with the previous chroma row, odd rows
        // with the next (edge-clamped) — the twin's axis(-2) pass.
        const int other = (r & 1) ? (ci + 1 < ch ? ci + 1 : ci)
                                  : (ci > 0 ? ci - 1 : ci);
        const unsigned char* cb0 = cbp + static_cast<size_t>(ci) * cw;
        const unsigned char* cb1 = cbp + static_cast<size_t>(other) * cw;
        const unsigned char* cr0 = crp + static_cast<size_t>(ci) * cw;
        const unsigned char* cr1 = crp + static_cast<size_t>(other) * cw;
        for (int j = 0; j < cw; ++j) {
          ucb[j] = 0.75f * static_cast<float>(cb0[j]) +
                   0.25f * static_cast<float>(cb1[j]);
          ucr[j] = 0.75f * static_cast<float>(cr0[j]) +
                   0.25f * static_cast<float>(cr1[j]);
        }
        const unsigned char* yrow = yp + static_cast<size_t>(r) * w;
        unsigned char* drow = dst + static_cast<size_t>(r) * w * 3;
        for (int x = 0; x < w; ++x) {
          const int cj = x >> 1;
          const int jo = (x & 1) ? (cj + 1 < cw ? cj + 1 : cj)
                                 : (cj > 0 ? cj - 1 : cj);
          const float cbv = (0.75f * ucb[cj] + 0.25f * ucb[jo]) - 128.0f;
          const float crv = (0.75f * ucr[cj] + 0.25f * ucr[jo]) - 128.0f;
          const float yv = static_cast<float>(yrow[x]);
          const float rv = yv + 1.402f * crv;
          const float gv = yv - 0.344136286f * cbv - 0.714136286f * crv;
          const float bv = yv + 1.772f * cbv;
          const float vals[3] = {rv, gv, bv};
          for (int k = 0; k < 3; ++k) {
            float v = nearbyintf(vals[k]);
            if (v < 0.0f) v = 0.0f;
            if (v > 255.0f) v = 255.0f;
            drow[3 * x + k] = static_cast<unsigned char>(v);
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < n ? n_threads : n;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}
#pragma GCC pop_options

static int warp_affine_u8_impl(const unsigned char* images, int n, int h,
                               int w, int c, const float* inv_mats,
                               const int* img_idx, const int* windows, int f,
                               int oh, int ow, int border_mode, int exact,
                               int n_threads, const unsigned char* border_value,
                               unsigned char* out) {
  if (c > 8 || c < 1 || border_mode < 0 || border_mode > 4) return 1;
  if (f <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  unsigned char bv[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  if (border_value != nullptr) {
    for (int ch = 0; ch < c; ++ch) bv[ch] = border_value[ch];
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= f) break;
      const int img = img_idx[i];
      if (img < 0 || img >= n) {
        // Defined output for an invalid index (the caller hands this
        // buffer out as np.empty): border-colored crop, like the device
        // warp's clamped-gather-of-nothing for masked faces.
        unsigned char* dst0 = out + static_cast<size_t>(i) * oh * ow * c;
        const size_t npx = static_cast<size_t>(oh) * ow;
        for (size_t px = 0; px < npx; ++px) {
          for (int ch = 0; ch < c; ++ch) dst0[px * c + ch] = bv[ch];
        }
        continue;
      }
      int top = 0, left = 0, eh = h, ew = w;
      if (windows != nullptr) {
        top = windows[4 * i];
        left = windows[4 * i + 1];
        eh = windows[4 * i + 2];
        ew = windows[4 * i + 3];
        // Sanitize: a degenerate window (eh/ew < 1) would divide by zero
        // in map_index; an out-of-range one would read out of bounds.
        if (top < 0) top = 0;
        if (left < 0) left = 0;
        if (top > h - 1) top = h - 1;
        if (left > w - 1) left = w - 1;
        if (eh < 1) eh = 1;
        if (ew < 1) ew = 1;
        if (top + eh > h) eh = h - top;
        if (left + ew > w) ew = w - left;
      }
      unsigned char* dst = out + static_cast<size_t>(i) * oh * ow * c;
      const long long images_bytes =
          static_cast<long long>(n) * h * w * c;
      if (exact) {
        warp_one_face<true>(images, images_bytes, h, w, c, inv_mats + 6 * i,
                            img, top, left, eh, ew, oh, ow, border_mode, bv,
                            dst);
      } else {
        warp_one_face<false>(images, images_bytes, h, w, c, inv_mats + 6 * i,
                             img, top, left, eh, ew, oh, ow, border_mode, bv,
                             dst);
      }
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < f ? n_threads : f;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

int fcpt_warp_affine_u8(const unsigned char* images, int n, int h, int w,
                        int c, const float* inv_mats, const int* img_idx,
                        const int* windows, int f, int oh, int ow,
                        int border_mode, int exact, int n_threads,
                        unsigned char* out) {
  return warp_affine_u8_impl(images, n, h, w, c, inv_mats, img_idx, windows,
                             f, oh, ow, border_mode, exact, n_threads,
                             nullptr, out);
}

// Like fcpt_warp_affine_u8 with a per-channel constant-border value
// (border_value: c bytes, or nullptr for black).  The YUV-direct crop
// pipeline warps chroma planes with border_value 128 — the exact YCbCr
// image of the RGB path's black constant border (YCbCr is affine in RGB,
// so blending commutes).
int fcpt_warp_affine_u8_bv(const unsigned char* images, int n, int h, int w,
                           int c, const float* inv_mats, const int* img_idx,
                           const int* windows, int f, int oh, int ow,
                           int border_mode, int exact, int n_threads,
                           const unsigned char* border_value,
                           unsigned char* out) {
  return warp_affine_u8_impl(images, n, h, w, c, inv_mats, img_idx, windows,
                             f, oh, ow, border_mode, exact, n_threads,
                             border_value, out);
}

// YUV-direct crop warp: f faces out of packed planar YCbCr 4:2:0 source
// rows (n, h*w + 2*(h/2)*(w/2)) into packed crop rows
// (f, oh*ow + 2*(oh/2)*(ow/2)) — the JPEG pipeline never materializes
// full-size RGB.  Y warps with inv_y (f x 6 dst->src, full-resolution
// pixel coordinates, border value 0); Cb and Cr warp at half resolution
// with inv_c (the chroma-grid conjugate of the same transform — the
// caller maps both grids through the 4:2:0 centered-siting offset) and
// border value 128, the YCbCr image of an RGB black border.  Same
// border_mode/exact semantics as fcpt_warp_affine_u8; h, w, oh, ow all
// even.  Each plane runs the c==1 AVX2 row kernel.  Returns 0 on success.
int fcpt_warp_yuv420(const unsigned char* packed, int n, int h, int w,
                     const float* inv_y, const float* inv_c,
                     const int* img_idx, int f, int oh, int ow,
                     int border_mode, int exact, int n_threads,
                     unsigned char* out) {
  if (border_mode < 0 || border_mode > 4) return 1;
  if ((h & 1) || (w & 1) || (oh & 1) || (ow & 1) || h < 2 || w < 2 ||
      oh < 2 || ow < 2)
    return 1;
  if (f <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  const int ch = h / 2, cw = w / 2;
  const int coh = oh / 2, cow = ow / 2;
  const size_t ylen = static_cast<size_t>(h) * w;
  const size_t clen = static_cast<size_t>(ch) * cw;
  const size_t row_len = ylen + 2 * clen;
  const size_t oylen = static_cast<size_t>(oh) * ow;
  const size_t oclen = static_cast<size_t>(coh) * cow;
  const size_t orow_len = oylen + 2 * oclen;
  const long long total = static_cast<long long>(n) * row_len;
  const unsigned char bv0[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  const unsigned char bv128[8] = {128, 0, 0, 0, 0, 0, 0, 0};
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= f) break;
      unsigned char* dst = out + static_cast<size_t>(i) * orow_len;
      const int img = img_idx[i];
      if (img < 0 || img >= n) {
        memset(dst, 0, oylen);
        memset(dst + oylen, 128, 2 * oclen);
        continue;
      }
      const size_t base = static_cast<size_t>(img) * row_len;
      // warp_one_face takes a batch base + image index; hand it the
      // plane pointer directly (img 0) with the remaining buffer length
      // as the fetch guard.
      const auto plane = [&](size_t off, int ph, int pw, const float* inv6,
                             const unsigned char* bv, unsigned char* pdst,
                             int poh, int pow) {
        if (exact) {
          warp_one_face<true>(packed + base + off, total - base - off, ph,
                              pw, 1, inv6, 0, 0, 0, ph, pw, poh, pow,
                              border_mode, bv, pdst);
        } else {
          warp_one_face<false>(packed + base + off, total - base - off, ph,
                               pw, 1, inv6, 0, 0, 0, ph, pw, poh, pow,
                               border_mode, bv, pdst);
        }
      };
      plane(0, h, w, inv_y + 6 * i, bv0, dst, oh, ow);
#if defined(__AVX2__)
      if (!exact) {
        // Cb and Cr share the coordinate grid: one fused pass computes
        // the (dominant) coordinate block once for both planes.
        const float* inv6 = inv_c + 6 * i;
        const float ca = inv6[0], cb2 = inv6[1], ctx = inv6[2];
        const float cd = inv6[3], ce = inv6[4], cty = inv6[5];
        const unsigned char* sA = packed + base + ylen;
        const unsigned char* sB = sA + clen;
        const long long remA = total - static_cast<long long>(base) -
                               static_cast<long long>(ylen) - 4;
        const long long remB = remA - static_cast<long long>(clen);
        for (int y = 0; y < coh; ++y) {
          warp_row_fixed1_pair_avx2(
              sA, sB, cw, ca, cd, cb2 * y + ctx, ce * y + cty, ch, cw,
              border_mode, remA, remB, bv128,
              dst + oylen + static_cast<size_t>(y) * cow,
              dst + oylen + oclen + static_cast<size_t>(y) * cow, cow);
        }
        continue;
      }
#endif
      plane(ylen, ch, cw, inv_c + 6 * i, bv128, dst + oylen, coh, cow);
      plane(ylen + clen, ch, cw, inv_c + 6 * i, bv128, dst + oylen + oclen,
            coh, cow);
    }
  };
  std::vector<std::thread> threads;
  const int k = n_threads < f ? n_threads : f;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

}  // extern "C"
