// Native COCO greedy matcher + IoU kernels for the flexible mAP evaluator.
//
// Semantics-equivalent rebuild of the reference's Cython kernels
// (mmdet/ops/eval_utils/iou/iou_coco.pyx, match/match_coco.pyx):
//  - iou_coco: det x gt IoU, crowd gts use det-area-only union;
//  - match_coco: per-IoU-threshold greedy det->gt matching where each det
//    scans gts in order, a better-or-equal IoU replaces the current match
//    (so ties go to the LAST gt), ignored gts only match when no regular
//    gt clears the threshold, and matched non-crowd gts become
//    unavailable while crowd gts stay reusable.
//
// Exposed with C linkage for ctypes (no pybind11 in this environment).
#include <algorithm>
#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

extern "C" {

void iou_coco_native(const float* det, int num_det, const float* gt,
                     int num_gt, const uint8_t* is_crowd, float* out) {
  for (int d = 0; d < num_det; ++d) {
    const float dx1 = det[d * 4 + 0], dy1 = det[d * 4 + 1];
    const float dx2 = det[d * 4 + 2], dy2 = det[d * 4 + 3];
    const float det_area = (dx2 - dx1) * (dy2 - dy1);
    for (int g = 0; g < num_gt; ++g) {
      const float gx1 = gt[g * 4 + 0], gy1 = gt[g * 4 + 1];
      const float gx2 = gt[g * 4 + 2], gy2 = gt[g * 4 + 3];
      const float tlx = dx1 > gx1 ? dx1 : gx1;
      const float tly = dy1 > gy1 ? dy1 : gy1;
      const float brx = dx2 < gx2 ? dx2 : gx2;
      const float bry = dy2 < gy2 ? dy2 : gy2;
      float iou = 0.f;
      if (tlx < brx && tly < bry) {
        const float inter = (brx - tlx) * (bry - tly);
        float uni = is_crowd[g]
                        ? det_area
                        : det_area + (gx2 - gx1) * (gy2 - gy1) - inter;
        if (uni <= 0.f) uni = 1e-7f;
        iou = inter / uni;
      }
      out[d * num_gt + g] = iou;
    }
  }
}

void match_coco_native(const float* iou_mat, int num_det, int num_gt,
                       const float* iou_thrs, int num_thr,
                       const uint8_t* is_ignore, const uint8_t* is_crowd,
                       int32_t* matched /* (num_thr, num_det) */) {
  std::vector<uint8_t> gt_taken(num_gt);
  for (int t = 0; t < num_thr; ++t) {
    std::fill(gt_taken.begin(), gt_taken.end(), 0);
    for (int d = 0; d < num_det; ++d) {
      float thr_reg = iou_thrs[t];
      float thr_ign = iou_thrs[t];
      int m = -1;
      const float* row = iou_mat + (size_t)d * num_gt;
      for (int g = 0; g < num_gt; ++g) {
        if (gt_taken[g] && !is_crowd[g]) continue;
        // once matched to a regular gt, ignored gts cannot take over
        if (m > -1 && !is_ignore[m] && is_ignore[g]) continue;
        const float need = is_ignore[g] ? thr_ign : thr_reg;
        const float v = row[g];
        if (v < need) continue;
        if (is_ignore[g]) {
          thr_ign = v;
        } else {
          thr_reg = v;
        }
        m = g;
      }
      if (m != -1 && !is_crowd[m]) gt_taken[m] = 1;
      matched[(size_t)t * num_det + d] = m;
    }
  }
}

void match_best_only_native(const float* iou_mat, int num_det, int num_gt,
                            const float* iou_thrs, int num_thr,
                            const uint8_t* is_ignore,
                            const uint8_t* is_crowd,
                            int32_t* matched /* (num_thr, num_det) */) {
  // Best-only variant (reference match_best_only.pyx): a det may only
  // match the regular gt that equals its global-best regular IoU (scan
  // stops there); ignored gts behave like match_coco.
  std::vector<uint8_t> gt_taken(num_gt);
  std::vector<float> best_reg(num_det, -1e30f);
  for (int d = 0; d < num_det; ++d) {
    const float* row = iou_mat + (size_t)d * num_gt;
    for (int g = 0; g < num_gt; ++g) {
      if (!is_ignore[g] && row[g] > best_reg[d]) best_reg[d] = row[g];
    }
  }
  for (int t = 0; t < num_thr; ++t) {
    std::fill(gt_taken.begin(), gt_taken.end(), 0);
    for (int d = 0; d < num_det; ++d) {
      float thr = iou_thrs[t];
      int m = -1;
      const float* row = iou_mat + (size_t)d * num_gt;
      for (int g = 0; g < num_gt; ++g) {
        if (gt_taken[g] && !is_crowd[g]) continue;
        if (m > -1 && !is_ignore[m] && is_ignore[g]) continue;
        if (row[g] < thr) continue;
        if (!is_ignore[g]) {
          if (row[g] == best_reg[d]) {
            m = g;
            break;
          }
        } else {
          thr = row[g];
          m = g;
        }
      }
      if (m != -1 && !is_crowd[m]) gt_taken[m] = 1;
      matched[(size_t)t * num_det + d] = m;
    }
  }
}

}  // extern "C"
