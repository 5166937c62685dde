"""Multi-threshold greedy NMS must equal the per-threshold scan.

greedy_nms_multi_np shares one IoU matrix + one score-ordered scan
across a whole threshold sweep (the --nms-sweep baseline); its keep
sets must match greedy_nms_np exactly at every threshold, including on
adversarial inputs (identical boxes, identical scores, empty input).
"""

import numpy as np
import pytest

from gossipnet_tpu.ops.nms import greedy_nms_multi_np, greedy_nms_np
from tests.conftest import random_boxes

THRESHOLDS = np.arange(0.3, 0.75, 0.05)


def _check(boxes, scores, thresholds=THRESHOLDS):
    multi = greedy_nms_multi_np(boxes, scores, thresholds)
    for t, got in zip(thresholds, multi):
        want = greedy_nms_np(boxes, scores, float(t))
        np.testing.assert_array_equal(
            got, want, err_msg=f"threshold {t}: keep sets differ")


def test_multi_matches_single_random(rng):
    for n in (1, 2, 17, 300):
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        _check(boxes, scores)


def test_multi_matches_single_clustered(rng):
    # heavy-overlap clusters: the regime where suppression chains matter
    centers = random_boxes(rng, 12)
    boxes = np.concatenate([
        centers + rng.normal(0, 2.0, centers.shape).astype(np.float32)
        for _ in range(25)
    ])
    scores = rng.uniform(0, 1, len(boxes)).astype(np.float32)
    _check(boxes, scores)


def test_multi_degenerate_inputs(rng):
    # identical boxes + tied scores: stable-sort order must break ties
    # the same way in both implementations
    box = np.array([[10, 10, 50, 50]], np.float32)
    boxes = np.repeat(box, 6, axis=0)
    scores = np.full(6, 0.5, np.float32)
    _check(boxes, scores)
    # empty input
    out = greedy_nms_multi_np(np.zeros((0, 4), np.float32),
                              np.zeros(0, np.float32), THRESHOLDS)
    assert all(len(k) == 0 for k in out)


def test_native_sweep_parity(rng):
    from gossipnet_tpu import native

    if not native.available():
        pytest.skip("native .so not built")
    for n in (2, 40, 300):
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = greedy_nms_multi_np(boxes, scores, THRESHOLDS)
        # single-threshold entry point, one call per threshold
        fast = [native.greedy_nms(boxes, scores, float(t))
                for t in THRESHOLDS]
        # shared-IoU multi entry point (what greedy_nms_host uses):
        # both are f64 end to end, so equality is exact, not approx
        multi = native.greedy_nms_multi(boxes, scores, THRESHOLDS)
        for t, a, m, b in zip(THRESHOLDS, fast, multi, ref):
            np.testing.assert_array_equal(
                a, b, err_msg=f"native single vs numpy at {t}")
            np.testing.assert_array_equal(
                m, b, err_msg=f"native multi vs numpy at {t}")
    # degenerate inputs: empty detections, tied scores on identical boxes
    out = native.greedy_nms_multi(np.zeros((0, 4), np.float32),
                                  np.zeros(0, np.float32), THRESHOLDS)
    assert all(len(k) == 0 for k in out)
    boxes = np.repeat(np.array([[10, 10, 50, 50]], np.float32), 6, axis=0)
    scores = np.full(6, 0.5, np.float32)
    for m, b in zip(native.greedy_nms_multi(boxes, scores, THRESHOLDS),
                    greedy_nms_multi_np(boxes, scores, THRESHOLDS)):
        np.testing.assert_array_equal(m, b)


def test_host_entry_refuses_nonfinite_scores(rng):
    # greedy_nms_host's bit-identical native/numpy guarantee only holds
    # on finite scores (np.argsort puts NaN last; the C++ comparator
    # leaves NaN in place) — the entry must refuse, not silently
    # diverge (ADVICE r4).
    from gossipnet_tpu.ops.nms import greedy_nms_host

    boxes = random_boxes(rng, 5)
    for bad in (np.nan, np.inf, -np.inf):
        scores = rng.uniform(0, 1, 5).astype(np.float32)
        scores[2] = bad
        with pytest.raises(ValueError, match="finite"):
            greedy_nms_host(boxes, scores, THRESHOLDS)
    # empty input passes the guard (no scores to check)
    out = greedy_nms_host(np.zeros((0, 4), np.float32),
                          np.zeros(0, np.float32), THRESHOLDS)
    assert all(len(k) == 0 for k in out)


def test_sweep_helper_matches_pointwise(rng):
    from gossipnet_tpu.data.synthetic import synthetic_roidb
    from gossipnet_tpu.evaluate import (evaluate_greedy_nms,
                                        evaluate_greedy_nms_sweep)

    roidb = synthetic_roidb(num_images=6, seed=3)
    sweep = evaluate_greedy_nms_sweep(roidb, [0.4, 0.6])
    for (t, stats) in sweep:
        want = evaluate_greedy_nms(roidb, t)
        assert stats == pytest.approx(want)
