"""COCOeval hardening (VERDICT r1 item 3).

(a) Differential fuzz: the numpy matching path and the C++ eval_match
    path must agree BIT-FOR-BIT on >= 1000 random images (every AP
    number this repo reports flows through one of them).
(b) Adversarial crowd x area x maxDet x score-tie interactions with
    hand-derived expected values.
(c) The numpy fallback is vectorized — a 5k-image eval must finish
    without the .so in well under 60 s (tested at reduced size in CI;
    scripts/scale_drill.py measures the full 5k).
"""

import time

import numpy as np
import pytest

from gossipnet_tpu import native
from gossipnet_tpu.eval.cocoeval import (
    COCOEvaluator, IOU_THRS, match_image_np,
)

needs_native = pytest.mark.skipif(
    not native.available(), reason="C++ fast path not built"
)


def _random_case(rng, quantize=False):
    """One random matching problem in the evaluator's internal layout:
    dets sorted by descending score, GTs sorted non-ignored first."""
    n = int(rng.integers(0, 40))
    g = int(rng.integers(0, 12))
    if quantize:
        # Coarse grid boxes force exact IoU ties; coarse scores force
        # score ties.
        xy = rng.integers(0, 6, size=(n, 2)) * 16.0
        wh = rng.integers(1, 4, size=(n, 2)) * 16.0
        gxy = rng.integers(0, 6, size=(g, 2)) * 16.0
        gwh = rng.integers(1, 4, size=(g, 2)) * 16.0
    else:
        xy = rng.uniform(0, 100, size=(n, 2))
        wh = rng.uniform(2, 50, size=(n, 2))
        gxy = rng.uniform(0, 100, size=(g, 2))
        gwh = rng.uniform(2, 50, size=(g, 2))
    det = np.concatenate([xy, xy + wh], axis=1).astype(np.float64)
    gt = np.concatenate([gxy, gxy + gwh], axis=1).astype(np.float64)
    crowd = rng.uniform(size=g) < 0.25
    ignore = crowd | (rng.uniform(size=g) < 0.2)
    # non-ignored first, stable — the caller contract.
    gord = np.argsort(ignore, kind="stable")
    return det, gt[gord], crowd[gord], ignore[gord]


@needs_native
def test_differential_fuzz_numpy_vs_cpp():
    """>= 1000 random images: match results identical to the bit."""
    rng = np.random.default_rng(1234)
    from gossipnet_tpu.eval.cocoeval import _np_iou_xyxy

    for trial in range(1000):
        det, gt, crowd, ignore = _random_case(rng, quantize=trial % 2 == 0)
        ious = _np_iou_xyxy(det, gt, crowd)
        got_m, got_i = match_image_np(ious, crowd, ignore, IOU_THRS)
        ref_m, ref_i = native.eval_match(det, gt, crowd, ignore, IOU_THRS)
        np.testing.assert_array_equal(got_m, np.asarray(ref_m, bool),
                                      err_msg=f"trial {trial} matched")
        np.testing.assert_array_equal(got_i, np.asarray(ref_i, bool),
                                      err_msg=f"trial {trial} ignore")


@needs_native
def test_differential_fuzz_full_evaluator():
    """End-to-end: summarize() identical (exact float equality) between
    the numpy-only evaluator and the C++-backed one on 200 random
    multi-class images."""
    rng = np.random.default_rng(7)
    evs = [COCOEvaluator(num_classes=3, force_numpy=True),
           COCOEvaluator(num_classes=3, force_numpy=False)]
    for i in range(200):
        n = int(rng.integers(0, 60))
        g = int(rng.integers(0, 10))
        xy = rng.integers(0, 8, size=(n, 2)) * 12.0
        wh = rng.integers(1, 8, size=(n, 2)) * 12.0
        gxy = rng.integers(0, 8, size=(g, 2)) * 12.0
        gwh = rng.integers(1, 8, size=(g, 2)) * 12.0
        args = dict(
            image_id=i,
            det_boxes=np.concatenate([xy, xy + wh], 1),
            det_scores=rng.integers(0, 20, size=n) / 20.0,
            det_classes=rng.integers(0, 3, size=n),
            gt_boxes=np.concatenate([gxy, gxy + gwh], 1),
            gt_classes=rng.integers(0, 3, size=g),
            gt_crowd=rng.uniform(size=g) < 0.2,
        )
        for ev in evs:
            ev.add_arrays(**args)
    s_np, s_cc = evs[0].summarize(), evs[1].summarize()
    assert s_np == s_cc, (s_np, s_cc)
    np.testing.assert_array_equal(evs[0].per_class_ap(),
                                  evs[1].per_class_ap())


@needs_native
def test_batch_path_worker_count_invariant():
    """The batched C++ path must be bit-identical at ANY worker count
    (serial, 2, 3 C++ threads inside eval_match_many) AND to the numpy
    reference — segments write disjoint packed-output slices, so the
    thread schedule cannot matter. Includes empty images, det-only and
    gt-only images, crowd GTs, and out-of-range class ids.

    (Python-process sharding was deliberately rejected: a forked eval
    worker deadlocked the full suite once jax threads existed.)"""
    rng = np.random.default_rng(99)

    def build(workers, force_numpy=False):
        ev = COCOEvaluator(num_classes=4, workers=workers,
                           force_numpy=force_numpy)
        for i in range(60):
            n = int(rng.integers(0, 50)) if i % 7 else 0
            g = int(rng.integers(0, 8)) if i % 5 else 0
            xy = rng.integers(0, 8, size=(n, 2)) * 12.0
            wh = rng.integers(1, 8, size=(n, 2)) * 12.0
            gxy = rng.integers(0, 8, size=(g, 2)) * 12.0
            gwh = rng.integers(1, 8, size=(g, 2)) * 12.0
            ev.add_arrays(
                i,
                det_boxes=np.concatenate([xy, xy + wh], 1),
                det_scores=rng.integers(0, 20, size=n) / 20.0,
                det_classes=rng.integers(0, 5, size=n),   # 4 = dropped
                gt_boxes=np.concatenate([gxy, gxy + gwh], 1),
                gt_classes=rng.integers(0, 5, size=g),
                gt_crowd=rng.uniform(size=g) < 0.2,
            )
        return ev

    rng = np.random.default_rng(99)
    ref = build(workers=1, force_numpy=True).summarize()
    for w in (1, 2, 3):
        rng = np.random.default_rng(99)
        got = build(workers=w).summarize()
        assert got == ref, (w, got, ref)


# ------------------------- adversarial hand-built interaction cases ----


def _ev1(**kw):
    ev = COCOEvaluator(num_classes=1, **kw)
    return ev


def test_crowd_out_of_area_still_absorbs():
    """A crowd GT outside the area range is ignored twice over — but a
    detection overlapping it must STILL be ignored (not counted FP) in
    the area-restricted metrics, while a clean small-object TP keeps
    APs at 1.0."""
    ev = _ev1(force_numpy=True)
    # small GT (16x16=256 < 32^2) + huge crowd region (way > 96^2).
    ev.add_arrays(
        0,
        det_boxes=[[0, 0, 16, 16], [100, 100, 300, 300]],
        det_scores=[0.9, 0.8],
        det_classes=[0, 0],
        gt_boxes=[[0, 0, 16, 16], [100, 100, 300, 300]],
        gt_classes=[0, 0],
        gt_crowd=[False, True],
    )
    s = ev.summarize()
    assert s["AP"] == 1.0          # crowd det ignored, not FP
    assert s["APs"] == 1.0         # in 'small' too: crowd det has large
    #                                area -> out-of-range ignore anyway;
    #                                the small TP is perfect.


def test_ignored_gt_only_eligible_without_real_match():
    """Det overlaps BOTH a real GT (IoU 0.55) and an out-of-area GT
    (IoU 0.95): at thr 0.5 it must take the REAL GT (sorted-first rule)
    and count as TP; at thr 0.6+ only the ignored GT clears, so the det
    is ignored, never FP."""
    ev = _ev1(force_numpy=True)
    # real GT: 20x110=2200 area (valid in 'all'); det overlaps it 0.55.
    # ignored GT: out of 'small' but we use area=all with crowd=False —
    # make it ignored via crowd flag instead (cleaner).
    ev.add_arrays(
        0,
        det_boxes=[[0, 0, 20, 100]],
        det_scores=[0.9],
        det_classes=[0],
        gt_boxes=[[0, 0, 20, 181.8], [0, 0, 20, 105]],
        gt_classes=[0, 0],
        gt_crowd=[False, True],     # second is crowd -> ignored
    )
    s = ev.summarize()
    # IoU(det, real) = 2000/3636 ~ 0.55; IoF(det, crowd) = 2000/2000=1.
    # thr .5, .55: TP. thr >= .6: matched-to-crowd -> ignored (no FP,
    # but also no recall): precision -1 at those thrs is excluded from
    # the mean; matched thrs give AP 1.
    assert s["AP50"] == 1.0
    # mean over the 10 thresholds: 2 thresholds TP (0.5, 0.55), others
    # contribute precision 0 ONLY if a FP exists — here the det is
    # ignored, so the PR curve is empty -> those thresholds count 0
    # recall/0 precision rows as 0.0 (tp empty -> precision 0).
    assert 0.0 < s["AP"] < 1.0


def test_maxdet_cap_with_score_ties():
    """11 tied-score dets, 1 GT: AR1/AR10 caps keep the stable-sort
    prefix; the TP det is placed first so every cap retains it."""
    ev = _ev1(force_numpy=True)
    dets = [[0, 0, 50, 50]] + [[200 + 10 * i, 200, 230 + 10 * i, 260]
                               for i in range(10)]
    ev.add_arrays(
        0,
        det_boxes=dets,
        det_scores=[0.5] * 11,      # all tied
        det_classes=[0] * 11,
        gt_boxes=[[0, 0, 50, 50]],
        gt_classes=[0],
        gt_crowd=[False],
    )
    s = ev.summarize()
    assert s["AR1"] == 1.0          # cap=1 keeps the first (stable) det
    assert s["AR10"] == 1.0
    assert s["AR100"] == 1.0


def test_iou_exactly_at_threshold_matches():
    """IoU == 0.5 exactly must match at thr 0.5 (>= semantics)."""
    ev = _ev1(force_numpy=True)
    # det [0,0,10,10], gt [0,0,10,20]: inter 100, union 200 -> 0.5.
    ev.add_arrays(
        0,
        det_boxes=[[0, 0, 10, 10]],
        det_scores=[0.9],
        det_classes=[0],
        gt_boxes=[[0, 0, 10, 20]],
        gt_classes=[0],
        gt_crowd=[False],
    )
    s = ev.summarize()
    assert s["AP50"] == 1.0
    assert s["AP75"] == 0.0


def test_cross_image_score_ties_stable():
    """Equal scores across images: global ordering uses a stable
    mergesort, so results are deterministic and identical between
    numpy and C++ paths."""
    stats = []
    for force in ([True, False] if native.available() else [True, True]):
        ev = _ev1(force_numpy=force)
        for i in range(4):
            ev.add_arrays(
                i,
                det_boxes=[[0, 0, 10, 10], [100, 100, 140, 140]],
                det_scores=[0.5, 0.5],
                det_classes=[0, 0],
                gt_boxes=[[0, 0, 10, 10]],
                gt_classes=[0],
                gt_crowd=[False],
            )
        stats.append(ev.summarize())
    # Interleaved TP/FP stream at one tied score, stable mergesort:
    # hand-derived AP from the 101-pt envelope of [1, .5, 2/3, .5,
    # .75, .5, .8, .5].
    assert abs(stats[0]["AP"] - 0.7123998114097123) < 1e-12
    assert stats[0] == stats[1]          # deterministic across paths


# ----------------------------------------------------- fallback speed --


def test_numpy_fallback_speed_1k_images():
    """Vectorized fallback: 1000 images x 80 classes in a few seconds
    (the scripts/scale_drill.py run measures the full 5k < 60 s)."""
    rng = np.random.default_rng(0)
    ev = COCOEvaluator(num_classes=80, force_numpy=True)
    for i in range(1000):
        n, g = 100, 12
        xy = rng.uniform(0, 600, size=(n, 2))
        wh = rng.uniform(5, 120, size=(n, 2))
        gxy = rng.uniform(0, 600, size=(g, 2))
        gwh = rng.uniform(5, 120, size=(g, 2))
        ev.add_arrays(
            i,
            det_boxes=np.concatenate([xy, xy + wh], 1),
            det_scores=rng.uniform(size=n),
            det_classes=rng.integers(0, 80, size=n),
            gt_boxes=np.concatenate([gxy, gxy + gwh], 1),
            gt_classes=rng.integers(0, 80, size=g),
            gt_crowd=rng.uniform(size=g) < 0.1,
        )
    # Calibrate the budget against THIS machine's current small-array
    # numpy dispatch speed — the eval's actual bottleneck (shared CI
    # hosts vary >3x and parallel jobs add contention; a fixed wall
    # budget flaked twice). Probe ~0.05 s where the eval measures
    # ~6 s (=> 5k images ~30 s, under the 60 s no-.so target;
    # scripts/scale_drill.py runs the full 5k). Budget 300x probe
    # (~2.5x headroom) scales with load; an algorithmic regression
    # (the old pure-Python triple loop was 10x slower) still fails.
    prng = np.random.default_rng(1)
    pa = prng.standard_normal((100, 12))
    p0 = time.monotonic()
    acc = 0.0
    for _ in range(3000):
        pb = pa > 0.2
        pc = np.where(pb, pa, -1.0)
        pm = pc.max(axis=1)
        acc += float(np.argsort(pm, kind="stable")[0])
    probe = time.monotonic() - p0
    t0 = time.monotonic()
    s = ev.summarize()
    dt = time.monotonic() - t0
    assert np.isfinite(s["AP"])
    budget = max(8.0, 300.0 * probe)
    assert dt < budget, (
        f"fallback eval too slow: {dt:.1f}s for 1k images "
        f"(budget {budget:.1f}s from {probe:.3f}s probe)")
