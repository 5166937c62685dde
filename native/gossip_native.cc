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
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
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

// Greedy COCO matching core shared by eval_match / eval_match_many.
// `ious` is [n, g] in ORIGINAL gt order (crowd semantics baked in);
// `perm` lists gt indices non-ignored-first (stable); `crowd`/`ign`
// are in original order. Writes dt_matched / dt_ignore ([t, n],
// caller-zeroed). Semantics == eval/cocoeval.py::match_image_np:
// best still-available gt with IoU >= threshold, LAST sorted position
// winning exact ties, crowd gts reusable, ignored gts eligible only
// when no non-ignored gt clears the threshold.
void match_perm(const double* ious, int n, int g, const int* perm,
                const uint8_t* crowd, const uint8_t* ign,
                const double* thresholds, int t, uint8_t* dt_matched,
                uint8_t* dt_ignore, std::vector<char>& gtm) {
  // `gtm` is caller-provided scratch: eval_match_many calls this up to
  // 4x per (image, class) segment across ~100k+ segments on several
  // threads — a fresh heap allocation per call is pure allocator
  // contention on the batched path.
  if (n == 0 || g == 0) return;
  gtm.assign(size_t(t) * g, 0);
  for (int ti = 0; ti < t; ++ti) {
    const double floor = std::min(thresholds[ti], 1.0 - 1e-10);
    for (int d = 0; d < n; ++d) {
      int best = -1;  // position in perm order
      double best_iou = floor;
      for (int jj = 0; jj < g; ++jj) {
        const int j = perm[jj];
        if (gtm[size_t(ti) * g + jj] && !crowd[j]) continue;
        // Holding a real match and reaching the ignored tail: stop.
        if (best > -1 && !ign[perm[best]] && ign[j]) break;
        const double o = ious[size_t(d) * g + j];
        if (o < best_iou) continue;
        best_iou = o;
        best = jj;
      }
      if (best == -1) continue;
      gtm[size_t(ti) * g + best] = 1;
      dt_matched[size_t(ti) * n + d] = 1;
      dt_ignore[size_t(ti) * n + d] = ign[perm[best]];
    }
  }
}

// Per-thread scratch for eval_match_many (reused across segments so a
// worker allocates once, not per segment).
struct EvalScratch {
  std::vector<double> ious;
  std::vector<int> perm;
  std::vector<uint8_t> ign, ign0, m_buf, i_buf, m1, i1;
  std::vector<char> oor, gtm;
};

// One (image, class) segment of eval_match_many: every area range,
// writing the packed output columns [out_off[s], out_off[s]+n_cap_s)
// and num_gt[a*n_seg + s]. All writes are DISJOINT across segments
// (out_off is an exclusive cumsum of the capped segment widths), so
// segments can run on any thread in any order with bit-identical
// results — the parallel path needs no ordering or reduction.
void eval_many_segment(
    const double* det_boxes, const double* det_areas,
    const double* gt_boxes, const double* gt_areas,
    const uint8_t* gt_crowd, const int32_t* d_lo, const int32_t* d_hi,
    const int32_t* g_lo, const int32_t* g_hi, int n_seg,
    const double* thresholds, int t, const double* area_ranges,
    int n_area, int max_det, const int32_t* out_off, int n_cap_tot,
    uint8_t* dt_matched, uint8_t* dt_ignore, int32_t* num_gt, int s,
    EvalScratch& sc) {
  const int dlo = d_lo[s], glo = g_lo[s];
  const int n_all = d_hi[s] - dlo, g = g_hi[s] - glo;
  const int n = std::min(n_all, max_det);
  const double* db = det_boxes + size_t(dlo) * 4;
  const double* da = det_areas + dlo;
  const double* gb = gt_boxes + size_t(glo) * 4;
  const double* ga = gt_areas + glo;
  const uint8_t* gc = gt_crowd + glo;
  const int off = out_off[s];
  // IoU once per segment (original gt order, crowd baked in), shared
  // across all area ranges.
  if (n > 0 && g > 0) {
    sc.ious.assign(size_t(n) * g, 0.0);
    for (int d = 0; d < n; ++d)
      for (int j = 0; j < g; ++j)
        sc.ious[size_t(d) * g + j] =
            overlap(db + 4 * d, gb + 4 * j, gc[j] != 0);
  }
  sc.ign.assign(std::max(g, 1), 0);
  sc.ign0.assign(std::max(g, 1), 0);
  sc.perm.resize(std::max(g, 1));
  sc.oor.assign(std::max(n, 1), 0);
  // Area-0 ('all') match results, reused by any later area range
  // whose gt_ignore mask comes out identical (same mask => same
  // stable permutation => bit-identical matching).
  sc.m_buf.assign(size_t(t) * std::max(n, 1), 0);
  sc.i_buf.assign(size_t(t) * std::max(n, 1), 0);
  for (int a = 0; a < n_area; ++a) {
    const double lo = area_ranges[2 * a], hi = area_ranges[2 * a + 1];
    int n_keep = 0;
    for (int j = 0; j < g; ++j) {
      sc.ign[j] = a == 0 ? gc[j]
                         : uint8_t(gc[j] || ga[j] < lo || ga[j] > hi);
      n_keep += !sc.ign[j];
    }
    num_gt[size_t(a) * n_seg + s] = n_keep;
    if (n == 0) continue;
    uint8_t* outm = dt_matched + size_t(a) * t * n_cap_tot;
    uint8_t* outi = dt_ignore + size_t(a) * t * n_cap_tot;
    if (a == 0) {
      if (g > 0) {
        int p = 0;  // stable non-ignored-first permutation
        for (int j = 0; j < g; ++j)
          if (!sc.ign[j]) sc.perm[p++] = j;
        for (int j = 0; j < g; ++j)
          if (sc.ign[j]) sc.perm[p++] = j;
        match_perm(sc.ious.data(), n, g, sc.perm.data(), gc,
                   sc.ign.data(), thresholds, t, sc.m_buf.data(),
                   sc.i_buf.data(), sc.gtm);
        sc.ign0 = sc.ign;
      }
      for (int ti = 0; ti < t; ++ti) {
        std::memcpy(outm + size_t(ti) * n_cap_tot + off,
                    sc.m_buf.data() + size_t(ti) * n, n);
        std::memcpy(outi + size_t(ti) * n_cap_tot + off,
                    sc.i_buf.data() + size_t(ti) * n, n);
      }
      continue;
    }
    for (int d = 0; d < n; ++d) sc.oor[d] = da[d] < lo || da[d] > hi;
    const bool same_ign =
        g > 0 && std::memcmp(sc.ign.data(), sc.ign0.data(), g) == 0;
    const uint8_t* m_src;
    const uint8_t* i_src;
    if (g == 0) {
      // No gts: nothing matches; out-of-range dets are ignored.
      for (int ti = 0; ti < t; ++ti)
        for (int d = 0; d < n; ++d)
          outi[size_t(ti) * n_cap_tot + off + d] = sc.oor[d];
      continue;
    } else if (same_ign) {
      m_src = sc.m_buf.data();
      i_src = sc.i_buf.data();
    } else {
      sc.m1.assign(size_t(t) * n, 0);
      sc.i1.assign(size_t(t) * n, 0);
      int p = 0;
      for (int j = 0; j < g; ++j)
        if (!sc.ign[j]) sc.perm[p++] = j;
      for (int j = 0; j < g; ++j)
        if (sc.ign[j]) sc.perm[p++] = j;
      match_perm(sc.ious.data(), n, g, sc.perm.data(), gc,
                 sc.ign.data(), thresholds, t, sc.m1.data(),
                 sc.i1.data(), sc.gtm);
      m_src = sc.m1.data();
      i_src = sc.i1.data();
    }
    for (int ti = 0; ti < t; ++ti) {
      uint8_t* om = outm + size_t(ti) * n_cap_tot + off;
      uint8_t* oi = outi + size_t(ti) * n_cap_tot + off;
      const uint8_t* sm = m_src + size_t(ti) * n;
      const uint8_t* si = i_src + size_t(ti) * n;
      for (int d = 0; d < n; ++d) {
        om[d] = sm[d];
        oi[d] = uint8_t(si[d] || (!sm[d] && sc.oor[d]));
      }
    }
  }
}

}  // namespace

extern "C" {

// ABI version handshake. Bump whenever any exported signature changes
// (e.g. the r2 eval_match float->double migration); gossipnet_tpu/
// native.py refuses to use a library whose version does not match, so
// a stale prebuilt .so degrades to the numpy path instead of silently
// reinterpreting buffers with the wrong element type.
// v3: greedy_nms float->double + greedy_nms_multi (shared-IoU sweep).
// v4: eval_match_many (whole-roidb batched COCO matching).
// v5: eval_match_many grows an n_threads arg (in-library threading).
int gossip_abi_version() { return 5; }

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
  // GTs arrive pre-sorted non-ignored-first: identity permutation.
  std::vector<int> perm(std::max(g, 1));
  std::iota(perm.begin(), perm.end(), 0);
  std::vector<char> gtm;
  match_perm(ious.data(), n, g, perm.data(), gt_crowd, gt_ignore,
             thresholds, t, dt_matched, dt_ignore, gtm);
}

// Whole-roidb batched COCO matching: every (image, class) segment x
// every area range in ONE call — the per-call ctypes overhead of
// eval_match dominated 80-class evals (~90% of a 2000-image summarize
// was Python/ctypes marshalling over ~184k tiny calls). Mirrors the
// numpy path (eval/cocoeval.py::_evaluate_all) bit-for-bit;
// differential-fuzzed in tests/test_cocoeval_fuzz.py.
//
// Layout: segment s covers dets [d_lo[s], d_hi[s]) of the flat det
// arrays (pre-sorted per segment by descending score, stable) and gts
// [g_lo[s], g_hi[s]) (original per-class order, NOT ignored-sorted —
// sorting happens here per area range). area_ranges is [n_area*2];
// range 0 MUST be 'all': it uses gt_ignore = crowd and skips the
// det out-of-range clause (pycocotools is_all_area semantics). For
// a > 0, gt_ignore widens to crowd | area-out-of-range and unmatched
// out-of-range dets are ignored. Only the first min(n, max_det) dets
// per segment are evaluated; their columns land at
// [out_off[s], out_off[s] + n_cap_s) of the packed outputs.
//
// Outputs (caller-allocated; zeroed here):
//   dt_matched, dt_ignore [n_area * t * n_cap_tot] 0/1
//   num_gt [n_area * n_seg] non-ignored GT count per (area, segment)
void eval_match_many(
    const double* det_boxes, const double* det_areas,
    const double* gt_boxes, const double* gt_areas,
    const uint8_t* gt_crowd, const int32_t* d_lo, const int32_t* d_hi,
    const int32_t* g_lo, const int32_t* g_hi, int n_seg,
    const double* thresholds, int t, const double* area_ranges,
    int n_area, int max_det, const int32_t* out_off, int n_cap_tot,
    uint8_t* dt_matched, uint8_t* dt_ignore, int32_t* num_gt,
    int n_threads) {
  std::memset(dt_matched, 0, size_t(n_area) * t * n_cap_tot);
  std::memset(dt_ignore, 0, size_t(n_area) * t * n_cap_tot);
  auto run_range = [&](int lo, int hi, EvalScratch& sc) {
    for (int s = lo; s < hi; ++s)
      eval_many_segment(det_boxes, det_areas, gt_boxes, gt_areas,
                        gt_crowd, d_lo, d_hi, g_lo, g_hi, n_seg,
                        thresholds, t, area_ranges, n_area, max_det,
                        out_off, n_cap_tot, dt_matched, dt_ignore,
                        num_gt, s, sc);
  };
  n_threads = std::max(1, std::min(n_threads, n_seg));
  if (n_threads == 1) {
    EvalScratch sc;
    run_range(0, n_seg, sc);
    return;
  }
  // Parallelism lives HERE, not in Python: forking a warm jax process
  // (multiprocessing 'fork' after jax threads exist) deadlocks — seen
  // live when the full test suite forced workers>1 after earlier jax
  // tests. Plain std::thread over an atomic segment counter has no
  // such hazard, and output slices are disjoint per segment so the
  // result is bit-identical at ANY thread count / schedule
  // (tests/test_cocoeval_fuzz.py pins this).
  std::atomic<int> next{0};
  auto worker = [&]() {
    EvalScratch sc;
    // Chunked work-stealing: segments are tiny (one image-class), so
    // grab a handful per fetch to keep the atomic off the hot path.
    const int chunk = std::max(1, n_seg / (n_threads * 16));
    for (int s; (s = next.fetch_add(chunk)) < n_seg;)
      run_range(s, std::min(s + chunk, n_seg), sc);
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int i = 0; i < n_threads - 1; ++i) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
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
    // NaN sorts LAST (like np.argsort(-scores)); a raw `>` with NaN
    // is not a strict weak ordering and makes stable_sort UB.
    const bool na = std::isnan(sa), nb = std::isnan(sb);
    if (na || nb) return !na && nb;
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
        if (det_classes && gt_classes &&
            det_classes[d] != gt_classes[j]) continue;
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
          if (det_classes && gt_classes &&
            det_classes[d] != gt_classes[j]) continue;
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
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    // NaN sorts LAST (np.argsort(-scores) semantics, keeping the
    // numpy parity claim true for non-finite scores) and keeps the
    // comparator a strict weak ordering (raw `>` with NaN is UB).
    const bool na = std::isnan(scores[a]), nb = std::isnan(scores[b]);
    if (na || nb) return !na && nb;
    return scores[a] > scores[b];
  });
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
