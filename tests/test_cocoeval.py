"""Tests for the vendored COCO AP implementation (SURVEY.md §4.6)."""

import numpy as np

from gossipnet_tpu.eval.cocoeval import COCOEvaluator
from tests.conftest import random_boxes


def _add_simple(ev, image_id, det_boxes, det_scores, gt_boxes,
                det_classes=None, gt_classes=None, gt_crowd=None):
    n, g = len(det_boxes), len(gt_boxes)
    ev.add_arrays(
        image_id,
        det_boxes, det_scores,
        det_classes if det_classes is not None else np.zeros(n, int),
        gt_boxes,
        gt_classes if gt_classes is not None else np.zeros(g, int),
        gt_crowd if gt_crowd is not None else np.zeros(g, bool),
    )


def test_perfect_detections_ap1(rng):
    ev = COCOEvaluator(num_classes=1)
    for i in range(4):
        gt = random_boxes(rng, 6, scale=400, min_size=40, max_size=90)
        scores = np.linspace(0.9, 0.4, 6)
        _add_simple(ev, i, gt.copy(), scores, gt)
    s = ev.summarize()
    assert np.isclose(s["AP"], 1.0), s
    assert np.isclose(s["AP50"], 1.0)
    assert np.isclose(s["AR100"], 1.0)


def test_no_overlap_ap0(rng):
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0, 0, 10, 10]], np.float64)
    det = np.array([[500, 500, 520, 520]], np.float64)
    _add_simple(ev, 0, det, np.array([0.9]), gt)
    s = ev.summarize()
    assert np.isclose(s["AP"], 0.0)


def test_duplicate_detection_halves_precision():
    """Classic NMS failure mode: 2 dets on 1 GT -> 1 TP + 1 FP.

    With a single GT: precision at recall>0 is 1.0 from the first (higher
    scored, matching) det; the duplicate becomes an FP after it. 101-pt
    AP = 1.0 only if the TP is ranked first; if the FP outranks the TP,
    AP ~ 0.5.
    """
    gt = np.array([[0, 0, 100, 100]], np.float64)
    dup = np.array([[15, 15, 115, 115]], np.float64)  # IoU ~ 0.56 with gt

    ev = COCOEvaluator(num_classes=1)
    _add_simple(ev, 0, np.concatenate([gt, dup]), np.array([0.9, 0.8]), gt)
    ap_good = ev.summarize()["AP50"]
    assert np.isclose(ap_good, 1.0)

    ev = COCOEvaluator(num_classes=1)
    _add_simple(ev, 0, np.concatenate([dup, gt]), np.array([0.9, 0.8]), gt)
    # Now the duplicate (slightly offset, still IoU>0.5) wins the match at
    # 0.5 but loses at high thresholds; AP drops well below 1.
    ap_bad = ev.summarize()["AP"]
    assert ap_bad < ap_good


def test_crowd_region_ignores_unmatched_dets():
    gt = np.array([[0, 0, 100, 100]], np.float64)
    crowd = np.array([[200, 0, 400, 100]], np.float64)
    # Two dets inside the crowd region: they must not count as FPs.
    dets = np.array(
        [[0, 0, 100, 100], [210, 10, 280, 90], [300, 5, 380, 95]], np.float64
    )
    ev = COCOEvaluator(num_classes=1)
    _add_simple(
        ev, 0, dets, np.array([0.9, 0.85, 0.8]),
        np.concatenate([gt, crowd]),
        gt_crowd=np.array([False, True]),
    )
    s = ev.summarize()
    assert np.isclose(s["AP"], 1.0), s


def test_missed_gt_caps_recall():
    gt = np.array([[0, 0, 100, 100], [300, 300, 400, 400]], np.float64)
    det = np.array([[0, 0, 100, 100]], np.float64)
    ev = COCOEvaluator(num_classes=1)
    _add_simple(ev, 0, det, np.array([0.9]), gt)
    s = ev.summarize()
    # Recall capped at 0.5 -> 101-pt AP ~ 0.5 (sampling grid effect ~0.505)
    assert 0.45 < s["AP"] < 0.56
    assert np.isclose(s["AR100"], 0.5)


def test_multiclass_mean():
    """AP averages over classes; class with no GT is excluded."""
    ev = COCOEvaluator(num_classes=3)
    gt = np.array([[0, 0, 100, 100]], np.float64)
    # class 0: perfect; class 1: total miss; class 2: no GT anywhere.
    _add_simple(ev, 0, gt.copy(), np.array([0.9]), gt,
                det_classes=np.array([0]), gt_classes=np.array([0]))
    _add_simple(ev, 1, np.array([[500, 500, 600, 600.0]]), np.array([0.9]),
                gt, det_classes=np.array([1]), gt_classes=np.array([1]))
    s = ev.summarize()
    assert np.isclose(s["AP"], 0.5), s


def test_localization_quality_affects_ap(rng):
    """Detections at IoU ~0.6 pass low thresholds, fail high ones."""
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([[0, 0, 100, 100]], np.float64)
    det = np.array([[0, 0, 80, 80.0]])  # IoU = 0.64
    _add_simple(ev, 0, det, np.array([0.9]), gt)
    s = ev.summarize()
    assert np.isclose(s["AP50"], 1.0)
    assert np.isclose(s["AP75"], 0.0)
    assert 0.2 < s["AP"] < 0.5


def test_maxdets_cap():
    """AR1 uses only the top-scored detection."""
    gt = np.array([[0, 0, 100, 100], [300, 300, 400, 400]], np.float64)
    dets = np.concatenate([gt])
    ev = COCOEvaluator(num_classes=1)
    _add_simple(ev, 0, dets, np.array([0.5, 0.9]), gt)
    s = ev.summarize()
    assert np.isclose(s["AR1"], 0.5)
    assert np.isclose(s["AR100"], 1.0)
