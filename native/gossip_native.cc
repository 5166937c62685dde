// gossip_native: host-side C++ kernels for gossipnet_tpu.
//
// The reference's only native component is a C++ TensorFlow CPU op doing
// greedy det<->GT matching inside the training loss
// (reference: matching_module/det_matching.cc). In the TPU rebuild the
// TRAINING matching runs on-device as vectorized XLA (ops/matching.py) —
// porting it to host C++ would reintroduce the reference's per-step
// device<->host round trip. The native surface instead moves to where
// host work actually dominates here:
//
//   * eval_match    — the COCO evaluation per-image matching loop
//                     (pycocotools semantics), the hot path of the
//                     vendored pure-numpy COCOeval.
//   * greedy_match  — the reference op's exact algorithm, as a host
//                     oracle for parity-testing the XLA implementation.
//   * greedy_nms    — classic greedy NMS for host-side baselines.
//
// Built as a plain shared library (see Makefile) and loaded with ctypes
// (gossipnet_tpu/native.py); every entry point has a numpy fallback so
// the framework works without the build step.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

template <typename T>
inline double box_area(const T* b) {
  const double w = std::max(0.0, double(b[2]) - double(b[0]));
  const double h = std::max(0.0, double(b[3]) - double(b[1]));
  return w * h;
}

// IoU; if `crowd`, intersection-over-detection-area (pycocotools iscrowd).
// Bit-identical to eval/cocoeval.py::_np_iou_xyxy (including the 1e-12
// denominator clamp) so the numpy and C++ eval paths fuzz bit-equal.
template <typename T>
inline double overlap(const T* det, const T* gt, bool crowd) {
  const double ix = std::max(
      0.0, std::min(double(det[2]), double(gt[2])) -
               std::max(double(det[0]), double(gt[0])));
  const double iy = std::max(
      0.0, std::min(double(det[3]), double(gt[3])) -
               std::max(double(det[1]), double(gt[1])));
  const double inter = ix * iy;
  const double denom =
      crowd ? box_area(det) : box_area(det) + box_area(gt) - inter;
  return denom > 0.0 ? inter / std::max(denom, 1e-12) : 0.0;
}

}  // namespace

extern "C" {

// ABI version handshake. Bump whenever any exported signature changes
// (e.g. the r2 eval_match float->double migration); gossipnet_tpu/
// native.py refuses to use a library whose version does not match, so
// a stale prebuilt .so degrades to the numpy path instead of silently
// reinterpreting buffers with the wrong element type.
// v3: greedy_nms float->double + greedy_nms_multi (shared-IoU sweep).
int gossip_abi_version() { return 3; }

// COCO evaluation matching for one image, one class, all thresholds.
// Inputs are PRE-SORTED: detections by descending score (capped at
// maxDet), GTs with non-ignored first. Mirrors pycocotools
// COCOeval.evaluateImg.
//
//   det_boxes  [n*4] xyxy    gt_boxes [g*4] xyxy
//   gt_crowd   [g]  0/1      gt_ignore [g] 0/1
//   thresholds [t]
// Outputs (caller-allocated):
//   dt_matched [t*n] 0/1     dt_ignore [t*n] 0/1
// NB double precision throughout: the vendored numpy evaluator works in
// float64, and a float32 threshold (e.g. f32(0.6) > 0.6) silently
// rejects IoUs landing exactly on a threshold.
void eval_match(const double* det_boxes, int n, const double* gt_boxes,
                const uint8_t* gt_crowd, const uint8_t* gt_ignore, int g,
                const double* thresholds, int t, uint8_t* dt_matched,
                uint8_t* dt_ignore) {
  std::memset(dt_matched, 0, size_t(t) * n);
  std::memset(dt_ignore, 0, size_t(t) * n);
  if (n == 0) return;
  // Precompute overlaps once (shared across thresholds).
  std::vector<double> ious(size_t(n) * std::max(g, 1), 0.0);
  for (int d = 0; d < n; ++d)
    for (int j = 0; j < g; ++j)
      ious[size_t(d) * g + j] =
          overlap(det_boxes + 4 * d, gt_boxes + 4 * j, gt_crowd[j] != 0);

  std::vector<char> gtm(size_t(t) * std::max(g, 1), 0);
  for (int ti = 0; ti < t; ++ti) {
    const double thr = thresholds[ti];
    for (int d = 0; d < n; ++d) {
      int best = -1;
      double best_iou = std::min(double(thr), 1.0 - 1e-10);
      for (int j = 0; j < g; ++j) {
        if (gtm[size_t(ti) * g + j] && !gt_crowd[j]) continue;
        // Holding a real match and reaching the ignored tail: stop.
        if (best > -1 && !gt_ignore[best] && gt_ignore[j]) break;
        const double o = ious[size_t(d) * g + j];
        if (o < best_iou) continue;
        best_iou = o;
        best = j;
      }
      if (best == -1) continue;
      gtm[size_t(ti) * g + best] = 1;
      dt_matched[size_t(ti) * n + d] = 1;
      dt_ignore[size_t(ti) * n + d] = gt_ignore[best];
    }
  }
}

// Training-loss matching oracle: EXACT algorithm of the reference op
// (matching_module/det_matching.cc): greedy over detections in
// descending-score order; each takes the highest-IoU still-unmatched
// non-crowd GT with IoU >= thr; unmatched detections overlapping a crowd
// region (IoF >= thr) are ignored. Outputs per threshold.
//
//   labels     [t*n] 0/1     ignore [t*n] 0/1    matched_gt [t*n] (-1)
void greedy_match(const float* det_boxes, const float* det_scores,
                  const uint8_t* det_valid, int n, const float* gt_boxes,
                  const uint8_t* gt_valid, const uint8_t* gt_crowd, int g,
                  const int32_t* det_classes, const int32_t* gt_classes,
                  const float* thresholds, int t, float* labels,
                  uint8_t* ignore, int32_t* matched_gt) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    const float sa = det_valid[a] ? det_scores[a] : -1e30f;
    const float sb = det_valid[b] ? det_scores[b] : -1e30f;
    return sa > sb;
  });
  std::memset(labels, 0, sizeof(float) * size_t(t) * n);
  for (int ti = 0; ti < t; ++ti)
    for (int d = 0; d < n; ++d) {
      ignore[size_t(ti) * n + d] = det_valid[d] ? 0 : 1;
      matched_gt[size_t(ti) * n + d] = -1;
    }

  std::vector<char> taken(size_t(t) * std::max(g, 1), 0);
  for (int ti = 0; ti < t; ++ti) {
    const double thr = thresholds[ti];
    for (int k = 0; k < n; ++k) {
      const int d = order[k];
      if (!det_valid[d]) continue;
      int best = -1;
      double best_iou = thr - 1e-12;
      for (int j = 0; j < g; ++j) {
        if (!gt_valid[j] || gt_crowd[j] || taken[size_t(ti) * g + j])
          continue;
        if (det_classes && det_classes[d] != gt_classes[j]) continue;
        const double o = overlap(det_boxes + 4 * d, gt_boxes + 4 * j, false);
        if (o >= thr && o > best_iou) {
          best_iou = o;
          best = j;
        }
      }
      if (best >= 0) {
        labels[size_t(ti) * n + d] = 1.0f;
        matched_gt[size_t(ti) * n + d] = best;
        taken[size_t(ti) * g + best] = 1;
      } else {
        for (int j = 0; j < g; ++j) {
          if (!gt_valid[j] || !gt_crowd[j]) continue;
          if (det_classes && det_classes[d] != gt_classes[j]) continue;
          if (overlap(det_boxes + 4 * d, gt_boxes + 4 * j, true) >= thr) {
            ignore[size_t(ti) * n + d] = 1;
            break;
          }
        }
      }
    }
  }
}

// Classic greedy NMS over MANY thresholds sharing ONE IoU pass.
// Mirrors ops/nms.py::greedy_nms_multi_np bit-for-bit: all math in
// double (so keep sets cannot depend on whether this .so is loadable —
// the float32 v2 entry point made the --nms-sweep baseline
// host-dependent), one stable descending-score scan, and each
// surviving detection's IoU row computed once and applied to every
// threshold where it is still alive. The per-threshold alive mask
// gates who suppresses: a det suppressed at one threshold can still
// suppress at another.
//
//   boxes [n*4] xyxy, scores [n], thresholds [t]
// Outputs (caller-allocated):
//   keep [t*n] kept ORIGINAL indices in descending-score order,
//   nk   [t]   number of kept entries per threshold.
void greedy_nms_multi(const double* boxes, const double* scores, int n,
                      const double* thresholds, int t, int32_t* keep,
                      int32_t* nk) {
  for (int ti = 0; ti < t; ++ti) nk[ti] = 0;
  if (n == 0 || t == 0) return;
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  // Boxes and areas in sorted order (identical formula to the numpy
  // path: area = max(0, x2-x1) * max(0, y2-y1) in f64).
  std::vector<double> b(size_t(n) * 4), areas(n);
  for (int k = 0; k < n; ++k) {
    const double* src = boxes + 4 * order[k];
    std::copy(src, src + 4, b.begin() + size_t(k) * 4);
    areas[k] = box_area(src);
  }
  std::vector<char> suppressed(size_t(t) * n, 0);
  std::vector<double> row(n);
  for (int k = 0; k < n; ++k) {
    bool any_alive = false;
    for (int ti = 0; ti < t; ++ti)
      any_alive |= !suppressed[size_t(ti) * n + k];
    if (!any_alive) continue;
    const double x1 = b[4 * k], y1 = b[4 * k + 1];
    const double x2 = b[4 * k + 2], y2 = b[4 * k + 3];
    for (int l = k + 1; l < n; ++l) {
      const double ix = std::max(
          0.0, std::min(x2, b[4 * l + 2]) - std::max(x1, b[4 * l]));
      const double iy = std::max(
          0.0, std::min(y2, b[4 * l + 3]) - std::max(y1, b[4 * l + 1]));
      const double inter = ix * iy;
      const double uni = areas[k] + areas[l] - inter;
      row[l] = uni > 0.0 ? inter / std::max(uni, 1e-12) : 0.0;
    }
    for (int ti = 0; ti < t; ++ti) {
      if (suppressed[size_t(ti) * n + k]) continue;
      const double thr = thresholds[ti];
      char* sup = suppressed.data() + size_t(ti) * n;
      for (int l = k + 1; l < n; ++l)
        if (row[l] > thr) sup[l] = 1;
    }
  }
  for (int ti = 0; ti < t; ++ti) {
    const char* sup = suppressed.data() + size_t(ti) * n;
    for (int k = 0; k < n; ++k)
      if (!sup[k]) keep[size_t(ti) * n + nk[ti]++] = order[k];
  }
}

// Single-threshold greedy NMS. Returns number of kept indices.
int greedy_nms(const double* boxes, const double* scores, int n,
               double iou_threshold, int32_t* keep) {
  int32_t nk = 0;
  greedy_nms_multi(boxes, scores, n, &iou_threshold, 1, keep, &nk);
  return nk;
}

}  // extern "C"
