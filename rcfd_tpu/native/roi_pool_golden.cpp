// Independent golden implementation of torchvision's roi_pool CPU kernel
// for validating ops/roi_pool.py (SURVEY §7.3 item 2: off-by-one risk at
// the 1/64 and 1/128 skip scales).
//
// torchvision is not installed in this image, so this is a from-scratch
// C++ transcription of the kernel's DOCUMENTED algorithm
// (torchvision/csrc/ops/cpu/roi_pool_kernel.cpp semantics):
//
//   roi_start = round(coord * spatial_scale)            (std::round)
//   roi_w = max(roi_end_w - roi_start_w + 1, 1)  (same for h)
//   bin_size = roi_size / pooled_size                   (float division)
//   hstart = clamp(floor( ph      * bin_h) + roi_start_h, 0, height)
//   hend   = clamp(ceil ((ph + 1) * bin_h) + roi_start_h, 0, height)
//   empty bin -> 0, else max over the bin window
//
// It shares NO code or formulation with the JAX implementation (which is
// a structure-exploiting gather/shift-max) nor with the Python stub in
// tests/reference_import.py — three independently written kernels must
// agree bin-for-bin.
//
// C ABI: feat is NCHW float32 (torchvision's native layout), boxes are
// (K, 4) [x1, y1, x2, y2] in input coordinates for a single image;
// out is (K, C, PH, PW).

#include <algorithm>
#include <cmath>
#include <cstdint>

extern "C" {

void rcfd_roi_pool_golden(const float* feat, int channels, int height,
                          int width, const float* boxes, int n_rois,
                          float spatial_scale, int pooled_h, int pooled_w,
                          float* out) {
  for (int n = 0; n < n_rois; ++n) {
    const float* box = boxes + 4 * n;
    int roi_start_w = (int)std::round(box[0] * spatial_scale);
    int roi_start_h = (int)std::round(box[1] * spatial_scale);
    int roi_end_w = (int)std::round(box[2] * spatial_scale);
    int roi_end_h = (int)std::round(box[3] * spatial_scale);

    int roi_width = std::max(roi_end_w - roi_start_w + 1, 1);
    int roi_height = std::max(roi_end_h - roi_start_h + 1, 1);
    float bin_size_h = (float)roi_height / (float)pooled_h;
    float bin_size_w = (float)roi_width / (float)pooled_w;

    for (int c = 0; c < channels; ++c) {
      const float* plane = feat + (size_t)c * height * width;
      for (int ph = 0; ph < pooled_h; ++ph) {
        for (int pw = 0; pw < pooled_w; ++pw) {
          int hstart = (int)std::floor(ph * bin_size_h);
          int wstart = (int)std::floor(pw * bin_size_w);
          int hend = (int)std::ceil((ph + 1) * bin_size_h);
          int wend = (int)std::ceil((pw + 1) * bin_size_w);

          hstart = std::min(std::max(hstart + roi_start_h, 0), height);
          hend = std::min(std::max(hend + roi_start_h, 0), height);
          wstart = std::min(std::max(wstart + roi_start_w, 0), width);
          wend = std::min(std::max(wend + roi_start_w, 0), width);

          bool is_empty = (hend <= hstart) || (wend <= wstart);
          float maxval = is_empty ? 0.0f : -3.4028235e38f;
          for (int h = hstart; h < hend; ++h) {
            for (int w = wstart; w < wend; ++w) {
              float v = plane[(size_t)h * width + w];
              if (v > maxval) maxval = v;
            }
          }
          out[(((size_t)n * channels + c) * pooled_h + ph) * pooled_w + pw] =
              maxval;
        }
      }
    }
  }
}

}  // extern "C"
