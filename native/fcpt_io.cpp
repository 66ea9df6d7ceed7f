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
