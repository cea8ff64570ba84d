// fastmatch: native evaluation matching kernels.
//
// The reference delegates its metric hot loops to native code via
// pycocotools' C extension (reference train_utils/coco_eval.py:8-10) and runs
// its own greedy AP/LAMR matcher in Python (other_utils/metrics.py:121-138).
// This library provides both as C++ with a plain C ABI (loaded via ctypes;
// numpy fallback stays available):
//
//   greedy_match    — conf-sorted TP/FP assignment at a single IoU threshold
//                     with per-GT dedup and Pascal-style (+1) areas.
//   coco_match      — COCOeval-protocol per-image matching across T IoU
//                     thresholds with gt-ignore handling.
//
// Build: g++ -O3 -shared -fPIC -o libfastmatch.so fastmatch.cpp

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

inline double pascal_iou(const float* a, const float* b) {
    // +1 convention (reference metrics.py:69)
    double ix1 = a[0] > b[0] ? a[0] : b[0];
    double iy1 = a[1] > b[1] ? a[1] : b[1];
    double ix2 = a[2] < b[2] ? a[2] : b[2];
    double iy2 = a[3] < b[3] ? a[3] : b[3];
    double iw = ix2 - ix1 + 1.0, ih = iy2 - iy1 + 1.0;
    if (iw <= 0.0 || ih <= 0.0) return 0.0;
    double inter = iw * ih;
    double area_a = (a[2] - a[0] + 1.0) * (a[3] - a[1] + 1.0);
    double area_b = (b[2] - b[0] + 1.0) * (b[3] - b[1] + 1.0);
    return inter / (area_a + area_b - inter);
}

inline double coco_iou(const double* a, const double* b) {
    double ix1 = a[0] > b[0] ? a[0] : b[0];
    double iy1 = a[1] > b[1] ? a[1] : b[1];
    double ix2 = a[2] < b[2] ? a[2] : b[2];
    double iy2 = a[3] < b[3] ? a[3] : b[3];
    double iw = ix2 - ix1, ih = iy2 - iy1;
    if (iw <= 0.0 || ih <= 0.0) return 0.0;
    double inter = iw * ih;
    double area_a = (a[2] - a[0]) * (a[3] - a[1]);
    double area_b = (b[2] - b[0]) * (b[3] - b[1]);
    return inter / (area_a + area_b - inter + 1e-12);
}

}  // namespace

extern "C" {

// preds are pre-sorted by confidence descending (reference evaluate.py:114).
// gt_boxes: concatenated per-image (int-cast to float on the Python side);
// gt_offsets[i]..gt_offsets[i+1] delimit image i's gts.
void greedy_match(const float* pred_boxes, const int32_t* pred_img,
                  int64_t n_pred, const float* gt_boxes,
                  const int64_t* gt_offsets, int64_t n_imgs, float iou_thr,
                  uint8_t* tp, uint8_t* fp) {
    std::vector<uint8_t> used(gt_offsets[n_imgs], 0);
    for (int64_t d = 0; d < n_pred; ++d) {
        const float* pb = pred_boxes + 4 * d;
        int32_t img = pred_img[d];
        int64_t g0 = gt_offsets[img], g1 = gt_offsets[img + 1];
        if (g1 == g0) { fp[d] = 1; continue; }
        double best = -1.0;
        int64_t best_g = g0;
        for (int64_t g = g0; g < g1; ++g) {
            double iou = pascal_iou(pb, gt_boxes + 4 * g);
            if (iou > best) { best = iou; best_g = g; }
        }
        if (best >= iou_thr && !used[best_g]) {
            used[best_g] = 1;
            tp[d] = 1;
        } else {
            fp[d] = 1;
        }
    }
}

// COCOeval-protocol matching for one image.
// dets (D,4) sorted by score desc; gts (G,4) with non-ignored first;
// gt_ignore (G); iou_thrs (T). Outputs: dt_match (T*D) = matched gt index or
// -1; logic mirrors pycocotools cocoeval.evaluateImg.
void coco_match(const double* dets, int64_t n_det, const double* gts,
                const uint8_t* gt_ignore, int64_t n_gt,
                const double* iou_thrs, int64_t n_thr, int64_t* dt_match) {
    std::vector<double> iou(static_cast<size_t>(n_det) * n_gt);
    for (int64_t d = 0; d < n_det; ++d)
        for (int64_t g = 0; g < n_gt; ++g)
            iou[d * n_gt + g] = coco_iou(dets + 4 * d, gts + 4 * g);

    std::vector<int64_t> gt_used(n_gt);
    for (int64_t t = 0; t < n_thr; ++t) {
        double thr = iou_thrs[t];
        for (int64_t g = 0; g < n_gt; ++g) gt_used[g] = -1;
        for (int64_t d = 0; d < n_det; ++d) {
            double best = thr < (1.0 - 1e-10) ? thr : (1.0 - 1e-10);
            int64_t m = -1;
            for (int64_t g = 0; g < n_gt; ++g) {
                if (gt_used[g] >= 0) continue;
                if (m > -1 && !gt_ignore[m] && gt_ignore[g]) break;
                double v = iou[d * n_gt + g];
                if (v < best) continue;
                best = v;
                m = g;
            }
            dt_match[t * n_det + d] = m;
            if (m >= 0) gt_used[m] = d;
        }
    }
}

}  // extern "C"
