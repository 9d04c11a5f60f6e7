// Native host-side preprocessing for the NOCS data pipeline.
//
// Replaces the per-sample cv2 sequence (depth-PNG decode, mask-PNG decode,
// three INTER_NEAREST warpAffine crops — reference tools/dataset_utils.py:80-136
// and tools/eval_utils.py:143-156) with one fused pass: the crop affine is a
// pure scale+translate (the CenterNet construction with rot=0), so the source
// pixel for every output pixel is computed ONCE and serves the depth, mask and
// coordinate-map crops together, with no full-resolution float intermediates.
//
// Bit-exactness contract: the warp replicates OpenCV's fixed-point nearest
// path (imgwarp.cpp): the forward affine is inverted with the exact
// invertAffineTransform arithmetic, per-axis deltas are rounded to 10-bit
// fixed point with round-half-to-even (lrint under the default FP rounding
// mode == cvRound), and the source index is (X0 + adelta[x]) >> 10 with the
// INTER_NEAREST round_delta of AB_SCALE/2.  The Python/cv2 path stays the
// reference semantics; tests assert this library matches it bit-for-bit.
//
// Build: g++ -O3 -shared -fPIC -o libpreproc.so preproc.cpp -lpng -lz -lpthread
//
// Error codes: 0 ok, -1 open failed, -2 not a PNG, -3 decode error,
// -4 unsupported pixel format, -5 depth/mask dimension mismatch,
// -6 output buffer too small.

#include <png.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrSig = -2;
constexpr int kErrDecode = -3;
constexpr int kErrFormat = -4;
constexpr int kErrDims = -5;
constexpr int kErrCap = -6;

struct PngHandle {
  FILE* f = nullptr;
  png_structp png = nullptr;
  png_infop info = nullptr;
  ~PngHandle() {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    if (f) fclose(f);
  }
};

// Open + signature check + png_read_info.  Returns 0 or an error code.
int open_png(const char* path, PngHandle& h) {
  h.f = fopen(path, "rb");
  if (!h.f) return kErrOpen;
  png_byte sig[8];
  if (fread(sig, 1, 8, h.f) != 8 || png_sig_cmp(sig, 0, 8)) return kErrSig;
  h.png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!h.png) return kErrDecode;
  h.info = png_create_info_struct(h.png);
  if (!h.info) return kErrDecode;
  if (setjmp(png_jmpbuf(h.png))) return kErrDecode;
  png_init_io(h.png, h.f);
  png_set_sig_bytes(h.png, 8);
  png_read_info(h.png, h.info);
  return kOk;
}

// Decode a NOCS depth PNG into uint16 (reference load_depth semantics,
// tools/eval_utils.py:143-156): plain 16-bit grayscale, or 8-bit RGB-encoded
// 256*G + R with the 32001 sentinel zeroed (channel indices are the cv2 BGR
// view's [:, :, 1] and [:, :, 2], i.e. G and R of the underlying RGB).
int decode_depth_impl(const char* path, std::vector<uint16_t>& out, int* h, int* w) {
  PngHandle ph;
  int rc = open_png(path, ph);
  if (rc != kOk) return rc;
  if (setjmp(png_jmpbuf(ph.png))) return kErrDecode;

  const int width = static_cast<int>(png_get_image_width(ph.png, ph.info));
  const int height = static_cast<int>(png_get_image_height(ph.png, ph.info));
  int bit_depth = png_get_bit_depth(ph.png, ph.info);
  int color = png_get_color_type(ph.png, ph.info);
  *h = height;
  *w = width;

  if (color == PNG_COLOR_TYPE_GRAY && bit_depth == 16) {
    png_set_swap(ph.png);  // PNG is big-endian; host is little-endian
    png_set_interlace_handling(ph.png);
    png_read_update_info(ph.png, ph.info);
    out.resize(static_cast<size_t>(height) * width);
    std::vector<png_bytep> rows(height);
    for (int y = 0; y < height; ++y)
      rows[y] = reinterpret_cast<png_bytep>(out.data() + static_cast<size_t>(y) * width);
    png_read_image(ph.png, rows.data());
    return kOk;
  }

  if (bit_depth == 8 && (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
                         color == PNG_COLOR_TYPE_PALETTE)) {
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(ph.png);
    if (png_get_valid(ph.png, ph.info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(ph.png);
    png_set_strip_alpha(ph.png);
    png_set_interlace_handling(ph.png);
    png_read_update_info(ph.png, ph.info);
    if (png_get_channels(ph.png, ph.info) != 3) return kErrFormat;
    std::vector<uint8_t> rgb(static_cast<size_t>(height) * width * 3);
    std::vector<png_bytep> rows(height);
    for (int y = 0; y < height; ++y)
      rows[y] = rgb.data() + static_cast<size_t>(y) * width * 3;
    png_read_image(ph.png, rows.data());
    out.resize(static_cast<size_t>(height) * width);
    for (size_t i = 0, n = static_cast<size_t>(height) * width; i < n; ++i) {
      int v = rgb[i * 3 + 1] * 256 + rgb[i * 3 + 0];  // G*256 + R
      out[i] = static_cast<uint16_t>(v == 32001 ? 0 : v);
    }
    return kOk;
  }
  // 8-bit grayscale depth is rejected by the Python path too (load_depth
  // raises ValueError -> retry-walk).
  return kErrFormat;
}

// Decode the instance-mask PNG the way cv2.imread(path) (IMREAD_COLOR) feeds
// the pipeline: 8 bits per channel (16-bit sources are high-byte truncated),
// and the pipeline reads the cv2-BGR channel 2 == the R channel (gray PNGs
// replicate the gray value across channels).
int decode_mask_impl(const char* path, std::vector<uint8_t>& out, int* h, int* w) {
  PngHandle ph;
  int rc = open_png(path, ph);
  if (rc != kOk) return rc;
  if (setjmp(png_jmpbuf(ph.png))) return kErrDecode;

  const int width = static_cast<int>(png_get_image_width(ph.png, ph.info));
  const int height = static_cast<int>(png_get_image_height(ph.png, ph.info));
  *h = height;
  *w = width;

  png_set_strip_16(ph.png);
  png_set_palette_to_rgb(ph.png);
  png_set_expand_gray_1_2_4_to_8(ph.png);
  if (png_get_valid(ph.png, ph.info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(ph.png);
  png_set_strip_alpha(ph.png);
  png_set_interlace_handling(ph.png);
  png_read_update_info(ph.png, ph.info);
  const int ch = png_get_channels(ph.png, ph.info);
  if (ch != 1 && ch != 3) return kErrFormat;

  std::vector<uint8_t> buf(static_cast<size_t>(height) * width * ch);
  std::vector<png_bytep> rows(height);
  for (int y = 0; y < height; ++y)
    rows[y] = buf.data() + static_cast<size_t>(y) * width * ch;
  png_read_image(ph.png, rows.data());
  out.resize(static_cast<size_t>(height) * width);
  if (ch == 1) {
    std::memcpy(out.data(), buf.data(), out.size());
  } else {
    for (size_t i = 0, n = out.size(); i < n; ++i) out[i] = buf[i * 3];  // R
  }
  return kOk;
}

// The fused nearest-warp crop.  mask may be strided (eval: pred_masks is
// (H, W, n_inst), element stride n_inst, base pointer offset by the instance
// column).  cmp_mode 0: mask[s] == inst_id; 1: mask[s] != 0.
//
// Rounding quirk, replicated deliberately: cv2's warpAffine INTER_NEAREST has
// TWO nearest-rounding behaviors and the Python pipeline uses both.  The
// single-channel float warps (depth, mask) go through the IPP fast path which
// rounds each source coordinate half-to-EVEN; the 2-channel coordinate-map
// warp falls back to OpenCV's 10-bit fixed-point path whose +AB_SCALE/2 bias
// rounds half UP.  At an output pixel whose exact source coordinate is k+0.5
// the two crops therefore disagree by one source pixel — in cv2 and here
// alike (asserted bit-for-bit in tests/test_native_preproc.py).  The affine
// is a pure scale+translate, so both index sets are separable per axis and
// precomputed once.
void fused_crop(const uint16_t* depth, const uint8_t* mask, long mask_step,
                int cmp_mode, int inst_id, int h, int w, double cx, double cy,
                double scale, int o, float* roi_depth, float* roi_mask,
                float* roi_coord, int* counts) {
  // Forward CenterNet affine (tools/dataset_utils.py:98-136, rot=0): pure
  // scale+translate mapping (cx, cy) -> (o/2, o/2) with scale o/scale.
  const double a = static_cast<double>(o) / scale;
  const double M0 = a, M2 = 0.5 * o - a * cx;
  const double M4 = a, M5 = 0.5 * o - a * cy;
  // cv2 invertAffineTransform arithmetic (M1 = M3 = 0 here).
  double D = M0 * M4;
  D = D != 0.0 ? 1.0 / D : 0.0;
  const double iM0 = M4 * D, iM4 = M0 * D;
  const double iM2 = -iM0 * M2, iM5 = -iM4 * M5;

  constexpr int AB_BITS = 10;
  constexpr int AB_SCALE = 1 << AB_BITS;
  constexpr int ROUND_DELTA = AB_SCALE / 2;  // INTER_NEAREST
  const int X0 = static_cast<int>(lrint(iM2 * AB_SCALE)) + ROUND_DELTA;
  // Per-axis source indices: _f = fixed-point (coord map; double, cvRound,
  // 10-bit bias — half rounds UP), _e = the IPP single-channel behavior: the
  // source coordinate is quantized to float32 BEFORE the half-to-even round
  // (measured: an exact-in-double k+0.5 rounds to even, and a double
  // k+0.5-1e-14 whose float32 is k+0.5 ALSO rounds to even, so the rounding
  // operates on the f32 value).  The f32 cast additionally absorbs last-ulp
  // differences between this closed-form affine chain and cv2's LU-solved
  // getAffineTransform, which only surface at exactly these half cases.
  std::vector<int> sx_f(o), sy_f(o), sx_e(o), sy_e(o);
  for (int x = 0; x < o; ++x) {
    sx_f[x] = (X0 + static_cast<int>(lrint(iM0 * x * AB_SCALE))) >> AB_BITS;
    sx_e[x] = static_cast<int>(lrintf(static_cast<float>(iM0 * x + iM2)));
  }
  for (int y = 0; y < o; ++y) {
    const double fy = iM4 * y + iM5;
    sy_f[y] = (static_cast<int>(lrint(fy * AB_SCALE)) + ROUND_DELTA) >> AB_BITS;
    sy_e[y] = static_cast<int>(lrintf(static_cast<float>(fy)));
  }
  float* xmap = roi_coord;
  float* ymap = roi_coord + static_cast<size_t>(o) * o;
  int c_depth = 0, c_both = 0;
  for (int y = 0; y < o; ++y) {
    const bool yin_f = static_cast<unsigned>(sy_f[y]) < static_cast<unsigned>(h);
    const bool yin_e = static_cast<unsigned>(sy_e[y]) < static_cast<unsigned>(h);
    const size_t row_e = yin_e ? static_cast<size_t>(sy_e[y]) * w : 0;
    for (int x = 0; x < o; ++x) {
      const size_t oi = static_cast<size_t>(y) * o + x;
      if (yin_f && static_cast<unsigned>(sx_f[x]) < static_cast<unsigned>(w)) {
        xmap[oi] = static_cast<float>(sx_f[x]);
        ymap[oi] = static_cast<float>(sy_f[y]);
      } else {
        xmap[oi] = 0.f;
        ymap[oi] = 0.f;
      }
      if (yin_e && static_cast<unsigned>(sx_e[x]) < static_cast<unsigned>(w)) {
        const size_t si = row_e + sx_e[x];
        const float dv = static_cast<float>(depth[si]);
        const int m = mask[si * static_cast<size_t>(mask_step)];
        const float mv = cmp_mode == 0 ? (m == inst_id ? 1.f : 0.f) : (m != 0 ? 1.f : 0.f);
        roi_depth[oi] = dv;
        roi_mask[oi] = mv;
        c_depth += dv > 0.f;
        c_both += (dv > 0.f) && (mv > 0.f);
      } else {
        roi_depth[oi] = 0.f;
        roi_mask[oi] = 0.f;
      }
    }
  }
  counts[0] = c_depth;
  counts[1] = c_both;
}

}  // namespace

extern "C" {

// Header-only dimension probe (no pixel decode) — used where the pipeline
// needs im_h/im_w before deciding the crop (train) or only the shape at all
// (the eval harness's color PNG, load_data_eval.py:139-143).
int hsp_png_dims(const char* path, int* h, int* w) {
  PngHandle ph;
  int rc = open_png(path, ph);
  if (rc != kOk) return rc;
  if (setjmp(png_jmpbuf(ph.png))) return kErrDecode;
  *h = static_cast<int>(png_get_image_height(ph.png, ph.info));
  *w = static_cast<int>(png_get_image_width(ph.png, ph.info));
  return kOk;
}

// Decode a depth PNG into a caller-allocated uint16 buffer of capacity `cap`
// elements.  Call hsp_png_dims first to size it.
int hsp_decode_depth(const char* path, uint16_t* out, long cap, int* h, int* w) {
  std::vector<uint16_t> buf;
  int rc = decode_depth_impl(path, buf, h, w);
  if (rc != kOk) return rc;
  if (static_cast<long>(buf.size()) > cap) return kErrCap;
  std::memcpy(out, buf.data(), buf.size() * sizeof(uint16_t));
  return kOk;
}

// One fused training sample: decode depth + mask PNGs, warp the three crops.
// counts[0] = #(roi_depth > 0), counts[1] = #(roi_mask > 0 & roi_depth > 0)
// (the degenerate-sample checks, datasets/load_data.py:236-245).
int hsp_train_sample(const char* depth_path, const char* mask_path, int inst_id,
                     double cx, double cy, double scale, int o, float* roi_depth,
                     float* roi_mask, float* roi_coord, int* counts) {
  std::vector<uint16_t> depth;
  std::vector<uint8_t> mask;
  int dh, dw, mh, mw;
  int rc = decode_depth_impl(depth_path, depth, &dh, &dw);
  if (rc != kOk) return rc;
  rc = decode_mask_impl(mask_path, mask, &mh, &mw);
  if (rc != kOk) return rc;
  if (dh != mh || dw != mw) return kErrDims;  // caller falls back to cv2
  fused_crop(depth.data(), mask.data(), 1, /*cmp_mode=*/0, inst_id, mh, mw, cx,
             cy, scale, o, roi_depth, roi_mask, roi_coord, counts);
  return kOk;
}

// Eval-harness crops: depth decoded once per image (hsp_decode_depth), masks
// is the (h, w, n_inst) uint8/bool detection-mask stack, crop j's mask column
// is masks + inst_cols[j] with element stride n_inst.  Threaded over crops.
int hsp_eval_crops(const uint16_t* depth, int h, int w, const uint8_t* masks,
                   int n_inst, const int* inst_cols, int n_crops,
                   const double* centers, const double* scales, int o,
                   float* roi_depths, float* roi_masks, float* roi_coords,
                   int* counts, int n_threads) {
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      const size_t plane = static_cast<size_t>(o) * o;
      fused_crop(depth, masks + inst_cols[i], n_inst, /*cmp_mode=*/1, 0, h, w,
                 centers[2 * i], centers[2 * i + 1], scales[i], o,
                 roi_depths + i * plane, roi_masks + i * plane,
                 roi_coords + i * 2 * plane, counts + 2 * i);
    }
  };
  int nt = n_threads < 1 ? 1 : (n_threads > n_crops ? n_crops : n_threads);
  if (nt <= 1) {
    work(0, n_crops);
    return kOk;
  }
  std::vector<std::thread> threads;
  const int chunk = (n_crops + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int b = t * chunk, e = b + chunk > n_crops ? n_crops : b + chunk;
    if (b < e) threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
  return kOk;
}

// Back-projection (datasets/load_data.py:322-333 semantics, bit-exact):
// row-major scan over the crop; valid = depth > 0 && mask > 0; per point
//   dx32 = (float)(x_map - cx)            [numpy does the subtract in f32]
//   real_x = (double)dx32 * (double)depth / (double)fx   [then f64]
// outputs cast to f32.  out must hold n_px * 3 floats; returns the count.
int hsp_backproject(const float* depth, const float* mask, const float* xmap,
                    const float* ymap, long n_px, float fx, float fy, float cx,
                    float cy, float* out, int* count) {
  long n = 0;
  for (long i = 0; i < n_px; ++i) {
    const float dv = depth[i];
    if (dv > 0.f && mask[i] > 0.f) {
      const double d = static_cast<double>(dv);
      const float dx32 = xmap[i] - cx;
      const float dy32 = ymap[i] - cy;
      out[n * 3 + 0] = static_cast<float>(static_cast<double>(dx32) * d /
                                          static_cast<double>(fx));
      out[n * 3 + 1] = static_cast<float>(static_cast<double>(dy32) * d /
                                          static_cast<double>(fy));
      out[n * 3 + 2] = static_cast<float>(d);
      ++n;
    }
  }
  *count = static_cast<int>(n);
  return kOk;
}

}  // extern "C"
