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

void warp_one_face(const unsigned char* images, int h, int w, int c,
                   const float* inv6, int img, int top, int left, int eh,
                   int ew, int oh, int ow, int mode, unsigned char* dst) {
  const float a = inv6[0], b = inv6[1], tx = inv6[2];
  const float d = inv6[3], e = inv6[4], ty = inv6[5];
  const unsigned char* src = images + static_cast<size_t>(img) * h * w * c;
  const size_t row_stride = static_cast<size_t>(w) * c;

  for (int y = 0; y < oh; ++y) {
    const float sx_row = b * y + tx;
    const float sy_row = e * y + ty;
    unsigned char* out_row = dst + static_cast<size_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const float sx = a * x + sx_row;
      const float sy = d * x + sy_row;
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
      unsigned char* out_px = out_row + static_cast<size_t>(x) * c;

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
        continue;
      }

      // Border path: per-neighbor cv2 index remapping (exact for all
      // five modes; "constant" masks outside-neighbor weights to zero).
      float acc[8] = {0, 0, 0, 0, 0, 0, 0, 0};  // c <= 8 supported
      const float wgt[2][2] = {{w00, w01}, {w10, w11}};
      for (int dy = 0; dy < 2; ++dy) {
        const int yi = y0 + dy;
        for (int dx = 0; dx < 2; ++dx) {
          const int xi = x0 + dx;
          float g = wgt[dy][dx];
          if (mode == 0 && (xi < 0 || xi >= ew || yi < 0 || yi >= eh)) {
            continue;  // constant border: zero contribution
          }
          const int ym = map_index(yi, eh, mode) + top;
          const int xm = map_index(xi, ew, mode) + left;
          const unsigned char* p =
              src + static_cast<size_t>(ym) * row_stride +
              static_cast<size_t>(xm) * c;
          for (int ch = 0; ch < c; ++ch) acc[ch] += g * p[ch];
        }
      }
      for (int ch = 0; ch < c; ++ch) out_px[ch] = sat_round(acc[ch]);
    }
  }
}

}  // namespace

extern "C" {

// Warps f faces out of a uint8 (n, h, w, c) batch into (f, oh, ow, c).
// inv_mats: f x 6 row-major dst->src transforms [a, b, tx, d, e, ty]
// (already inverted by the caller).  windows: f x 4 (top, left, eh, ew)
// un-padded sampling windows, or nullptr for the full image.  border_mode
// as map_index above.  c must be <= 8.  Returns 0 on success.
int fcpt_warp_affine_u8(const unsigned char* images, int n, int h, int w,
                        int c, const float* inv_mats, const int* img_idx,
                        const int* windows, int f, int oh, int ow,
                        int border_mode, int n_threads, unsigned char* out) {
  if (c > 8 || c < 1 || border_mode < 0 || border_mode > 4) return 1;
  if (f <= 0) return 0;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= f) break;
      const int img = img_idx[i];
      if (img < 0 || img >= n) continue;
      int top = 0, left = 0, eh = h, ew = w;
      if (windows != nullptr) {
        top = windows[4 * i];
        left = windows[4 * i + 1];
        eh = windows[4 * i + 2];
        ew = windows[4 * i + 3];
      }
      warp_one_face(images, h, w, c, inv_mats + 6 * i, img, top, left, eh,
                    ew, oh, ow, border_mode,
                    out + static_cast<size_t>(i) * oh * ow * c);
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
