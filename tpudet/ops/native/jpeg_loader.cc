// Native JPEG -> letterbox loader: the host half of the jpeg->NMS
// north-star path (BASELINE.json metric).
//
// The reference selects a turbojpeg decode backend per-pipeline
// (/root/reference/mmdet/datasets/pipelines/loading.py:35-41, config
// configs/yolov4/yolov4l_coco_mosaic.py:26) and letterboxes in Python via
// mmcv.imrescale. Here the whole hot path is one fused native kernel per
// image — decode (libjpeg-turbo, optionally at a reduced DCT scale when
// heavily downscaling), bilinear letterbox resize, and pad — run by a C++
// thread pool so batches scale with host cores instead of a GIL.
//
// Semantics match tpudet's Python path (tools/e2e_bench.py::decode_letterbox,
// tpudet/data/pipelines.py Resize(keep_ratio) + Pad):
//   f  = min(out_h/h, out_w/w)
//   nw = int(w*f + 0.5), nh = int(h*f + 0.5)
//   cv2.INTER_LINEAR resize (half-pixel centers), paste top-left, pad_val
//   scale_factor = [nw/w, nh/h, nw/w, nh/h]
//
// Built on demand with g++ (see jpeg_native.py); ctypes ABI, C linkage.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void quiet_output(j_common_ptr, int) {}

// cv2.INTER_LINEAR: src = (dst + 0.5) * (src_size / dst_size) - 0.5,
// clamped; weights in 15-bit fixed point like OpenCV's resize.
struct Axis {
  std::vector<int> i0, i1;
  std::vector<int> w1;  // weight of i1 in [0, 32768]
};

Axis make_axis(int src, int dst) {
  Axis ax;
  ax.i0.resize(dst);
  ax.i1.resize(dst);
  ax.w1.resize(dst);
  double scale = static_cast<double>(src) / dst;
  for (int d = 0; d < dst; ++d) {
    double s = (d + 0.5) * scale - 0.5;
    if (s < 0) s = 0;
    if (s > src - 1) s = src - 1;
    int i = static_cast<int>(s);
    if (i > src - 2) i = src - 2 < 0 ? 0 : src - 2;
    double frac = s - i;
    ax.i0[d] = i;
    ax.i1[d] = std::min(i + 1, src - 1);
    ax.w1[d] = static_cast<int>(frac * 32768.0 + 0.5);
  }
  return ax;
}

void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw, int dst_stride) {
  if (sh == dh && sw == dw) {
    for (int y = 0; y < dh; ++y)
      std::memcpy(dst + static_cast<size_t>(y) * dst_stride,
                  src + static_cast<size_t>(y) * sw * 3, sw * 3);
    return;
  }
  Axis ay = make_axis(sh, dh), axx = make_axis(sw, dw);
  for (int y = 0; y < dh; ++y) {
    const uint8_t* r0 = src + static_cast<size_t>(ay.i0[y]) * sw * 3;
    const uint8_t* r1 = src + static_cast<size_t>(ay.i1[y]) * sw * 3;
    int wy1 = ay.w1[y], wy0 = 32768 - wy1;
    uint8_t* out = dst + static_cast<size_t>(y) * dst_stride;
    for (int x = 0; x < dw; ++x) {
      int x0 = axx.i0[x] * 3, x1 = axx.i1[x] * 3;
      int wx1 = axx.w1[x], wx0 = 32768 - wx1;
      for (int c = 0; c < 3; ++c) {
        // horizontal then vertical, rounding once at the end (15+15 ->
        // 30-bit products fit int64)
        int64_t top = static_cast<int64_t>(r0[x0 + c]) * wx0 +
                      static_cast<int64_t>(r0[x1 + c]) * wx1;
        int64_t bot = static_cast<int64_t>(r1[x0 + c]) * wx0 +
                      static_cast<int64_t>(r1[x1 + c]) * wx1;
        int64_t v = top * wy0 + bot * wy1;  // scale 2^30
        out[x * 3 + c] =
            static_cast<uint8_t>((v + (1ll << 29)) >> 30);
      }
    }
  }
}

int decode_one(const unsigned char* buf, size_t len, int out_h, int out_w,
               unsigned char pad_val, int bgr, int fast_scale,
               uint8_t* out, float* scale_wh, int* new_hw) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  jerr.pub.emit_message = quiet_output;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  int w = static_cast<int>(cinfo.image_width);
  int h = static_cast<int>(cinfo.image_height);
  if (w <= 0 || h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  double f = std::min(static_cast<double>(out_h) / h,
                      static_cast<double>(out_w) / w);
  int nw = static_cast<int>(w * f + 0.5);
  int nh = static_cast<int>(h * f + 0.5);
  nw = std::max(1, std::min(nw, out_w));
  nh = std::max(1, std::min(nh, out_h));

  cinfo.out_color_space = bgr ? JCS_EXT_BGR : JCS_EXT_RGB;
  if (fast_scale && f < 1.0) {
    // decode at the smallest power-of-two DCT scale that still covers the
    // target: IDCT-domain downscale skips most of the IDCT work, and the
    // 1/2, 1/4, 1/8 scales ride libjpeg-turbo's SIMD IDCT kernels
    // (fractional scales like 3/8 fall back to scalar and can be slower
    // than a full decode).
    static const int kNums[] = {1, 2, 4, 8};
    for (int num : kNums) {
      cinfo.scale_num = num;
      cinfo.scale_denom = 8;
      jpeg_calc_output_dimensions(&cinfo);
      if (static_cast<int>(cinfo.output_width) >= nw &&
          static_cast<int>(cinfo.output_height) >= nh)
        break;
    }
  }
  jpeg_start_decompress(&cinfo);
  int dw = static_cast<int>(cinfo.output_width);
  int dh = static_cast<int>(cinfo.output_height);
  int comps = cinfo.output_components;
  if (comps != 3) {  // grayscale etc.: force via colorspace failed
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  std::vector<uint8_t> decoded(static_cast<size_t>(dw) * dh * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[8];
    int base = static_cast<int>(cinfo.output_scanline);
    int nrows = std::min(8, dh - base);
    for (int r = 0; r < nrows; ++r)
      rows[r] = decoded.data() + static_cast<size_t>(base + r) * dw * 3;
    jpeg_read_scanlines(&cinfo, rows, nrows);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // letterbox: resize into the top-left corner, pad the rest
  std::memset(out, pad_val, static_cast<size_t>(out_h) * out_w * 3);
  resize_bilinear_u8(decoded.data(), dh, dw, out, nh, nw, out_w * 3);
  if (scale_wh) {
    scale_wh[0] = static_cast<float>(nw) / w;
    scale_wh[1] = static_cast<float>(nh) / h;
  }
  if (new_hw) {
    new_hw[0] = nh;
    new_hw[1] = nw;
  }
  return 0;
}

}  // namespace

extern "C" {

// Single image. Returns 0 on success; on failure the canvas is pad_val.
int jl_decode_letterbox(const unsigned char* buf, size_t len, int out_h,
                        int out_w, unsigned char pad_val, int bgr,
                        int fast_scale, unsigned char* out, float* scale_wh,
                        int* new_hw) {
  return decode_one(buf, len, out_h, out_w, pad_val, bgr, fast_scale, out,
                    scale_wh, new_hw);
}

// Batch: bufs/lens arrays of n entries; out is n*out_h*out_w*3, scales n*2
// (w-scale, h-scale), new_hws n*2 (nh, nw), status n ints (0 = ok).
// n_threads <= 0 means hardware_concurrency.
void jl_decode_letterbox_batch(int n, const unsigned char** bufs,
                               const size_t* lens, int out_h, int out_w,
                               unsigned char pad_val, int bgr, int fast_scale,
                               int n_threads, unsigned char* out,
                               float* scales, int* new_hws, int* status) {
  if (n <= 0) return;
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n));
  const size_t img_sz = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next(0);
  auto work = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      int st = decode_one(bufs[i], lens[i], out_h, out_w, pad_val, bgr,
                          fast_scale, out + img_sz * i,
                          scales ? scales + 2 * i : nullptr,
                          new_hws ? new_hws + 2 * i : nullptr);
      if (st != 0) std::memset(out + img_sz * i, pad_val, img_sz);
      if (status) status[i] = st;
    }
  };
  if (n_threads == 1) {
    work();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(work);
  for (auto& th : pool) th.join();
}

// Full-size decode into caller-allocated h*w*3 (dims from jl_jpeg_info).
// Returns 0 on success.
int jl_decode(const unsigned char* buf, size_t len, int bgr,
              unsigned char* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  jerr.pub.emit_message = quiet_output;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  cinfo.out_color_space = bgr ? JCS_EXT_BGR : JCS_EXT_RGB;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  int dw = static_cast<int>(cinfo.output_width);
  int dh = static_cast<int>(cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW rows[8];
    int base = static_cast<int>(cinfo.output_scanline);
    int nrows = std::min(8, dh - base);
    for (int r = 0; r < nrows; ++r)
      rows[r] = out + static_cast<size_t>(base + r) * dw * 3;
    jpeg_read_scanlines(&cinfo, rows, nrows);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Header-only probe: fills h/w without decoding. Returns 0 on success.
int jl_jpeg_info(const unsigned char* buf, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  jerr.pub.emit_message = quiet_output;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
