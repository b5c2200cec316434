// Native data-loader core for mllm_npu_tpu.
//
// The reference delegates its hot data path to torchdata's C++ workers
// (tar streaming) and PIL's C decoders, serialized per-process by the
// GIL. This library provides the TPU build's native equivalents:
//   * tar_* — streaming tar member reader with corrupt-shard tolerance
//     (the load_from_tar_wo_exception capability, reference
//     mllm_npu/data/datapipes.py:18-59) that never throws: bad headers
//     end the stream instead of killing the worker.
//   * jpeg_decode_resize_normalize — libjpeg decode + box/bilinear
//     resize + mean/std normalize straight into a float32 HWC buffer.
//   * jpeg_decode_batch — the same, fanned out over an internal thread
//     pool (GIL released on the Python side via ctypes), which is where
//     the anyres pipeline's CPU time goes.
//
// Plain C ABI so Python binds with ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

// ---------------------------------------------------------------------------
// tar reader
// ---------------------------------------------------------------------------

struct TarHandle {
  FILE* f = nullptr;
};

struct TarMember {
  char name[256];
  int64_t size;
};

void* tar_open(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  auto* h = new TarHandle();
  h->f = f;
  return h;
}

static int64_t octal_field(const char* p, int n) {
  int64_t v = 0;
  for (int i = 0; i < n && p[i]; ++i) {
    if (p[i] < '0' || p[i] > '7') {
      if (p[i] == ' ') continue;
      break;
    }
    v = v * 8 + (p[i] - '0');
  }
  return v;
}

// Advance to the next regular file member. Returns 1 and fills `out`
// (caller then calls tar_read_data), 0 on EOF or corruption.
int tar_next(void* handle, TarMember* out) {
  auto* h = static_cast<TarHandle*>(handle);
  if (!h || !h->f) return 0;
  char hdr[512];
  while (true) {
    size_t got = std::fread(hdr, 1, 512, h->f);
    if (got != 512) return 0;
    bool all_zero = true;
    for (int i = 0; i < 512; ++i)
      if (hdr[i]) { all_zero = false; break; }
    if (all_zero) return 0;  // end-of-archive marker
    // checksum validation (corrupt-shard tolerance)
    int64_t stored = octal_field(hdr + 148, 8);
    int64_t actual = 0;
    for (int i = 0; i < 512; ++i)
      actual += (i >= 148 && i < 156) ? ' ' : (unsigned char)hdr[i];
    if (stored != actual) return 0;  // corrupt: stop stream gracefully

    int64_t size = octal_field(hdr + 124, 12);
    char type = hdr[156];
    int64_t padded = (size + 511) & ~511LL;
    if (type == '0' || type == '\0') {
      std::memset(out->name, 0, sizeof(out->name));
      // prefix (ustar long names)
      if (hdr[345]) {
        std::strncpy(out->name, hdr + 345, 155);
        size_t l = std::strlen(out->name);
        out->name[l] = '/';
        std::strncpy(out->name + l + 1, hdr, 100);
      } else {
        std::strncpy(out->name, hdr, 100);
      }
      out->size = size;
      return 1;  // caller must consume exactly `size` (+pad) next
    }
    // skip non-regular members
    if (std::fseek(h->f, (long)padded, SEEK_CUR) != 0) return 0;
  }
}

// Read the current member's bytes into caller-provided buffer.
int tar_read_data(void* handle, uint8_t* buf, int64_t size) {
  auto* h = static_cast<TarHandle*>(handle);
  if (!h || !h->f) return 0;
  if (std::fread(buf, 1, (size_t)size, h->f) != (size_t)size) return 0;
  int64_t pad = ((size + 511) & ~511LL) - size;
  if (pad && std::fseek(h->f, (long)pad, SEEK_CUR) != 0) return 0;
  return 1;
}

void tar_close(void* handle) {
  auto* h = static_cast<TarHandle*>(handle);
  if (h) {
    if (h->f) std::fclose(h->f);
    delete h;
  }
}

// ---------------------------------------------------------------------------
// jpeg decode + resize + normalize
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode a JPEG, bilinear-resize to (out_h, out_w), normalize with
// mean/std (per channel, applied to value/255), write float32 HWC.
// Returns 1 on success, 0 on decode failure.
int jpeg_decode_resize_normalize(const uint8_t* data, int64_t len,
                                 int out_h, int out_w, const float* mean,
                                 const float* stddev, float* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  std::vector<uint8_t> pixels;
  int W = 0, H = 0;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain prescaling: decode at >= target size but as small as
  // possible (big speedup for large photos resized to 384/448).
  jpeg_calc_output_dimensions(&cinfo);
  int full_w = cinfo.output_width, full_h = cinfo.output_height;
  for (int denom = 8; denom >= 2; --denom) {
    if (full_w / denom >= out_w && full_h / denom >= out_h) {
      cinfo.scale_num = 1;
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  W = cinfo.output_width;
  H = cinfo.output_height;
  pixels.resize((size_t)W * H * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + (size_t)cinfo.output_scanline * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // bilinear resize + normalize
  const float sx = (float)W / out_w;
  const float sy = (float)H / out_h;
  for (int y = 0; y < out_h; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(H - 1, (int)fy));
    int y1 = std::min(H - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < out_w; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(W - 1, (int)fx));
      int x1 = std::min(W - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float v00 = pixels[((size_t)y0 * W + x0) * 3 + c];
        float v01 = pixels[((size_t)y0 * W + x1) * 3 + c];
        float v10 = pixels[((size_t)y1 * W + x0) * 3 + c];
        float v11 = pixels[((size_t)y1 * W + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        v = v / 255.0f;
        out[((size_t)y * out_w + x) * 3 + c] = (v - mean[c]) / stddev[c];
      }
    }
  }
  return 1;
}

// Batched parallel decode: n images -> out[i] buffers. Returns the
// number of successful decodes; results[i] = 1/0 per image.
int jpeg_decode_batch(const uint8_t** datas, const int64_t* lens, int n,
                      int out_h, int out_w, const float* mean,
                      const float* stddev, float** outs, int* results,
                      int num_threads) {
  if (num_threads <= 0)
    num_threads = (int)std::thread::hardware_concurrency();
  num_threads = std::min(num_threads, n);
  std::atomic<int> next(0), ok(0);
  auto work = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int r = jpeg_decode_resize_normalize(datas[i], lens[i], out_h,
                                           out_w, mean, stddev, outs[i]);
      results[i] = r;
      if (r) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return ok.load();
}

int mllm_native_abi_version() { return 1; }

}  // extern "C"
