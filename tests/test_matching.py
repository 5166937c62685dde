"""Greedy-matching tests against a pure-python oracle (SURVEY.md §4.1).

The oracle mirrors the reference C++ op's algorithm (SURVEY.md §3.4):
sort by descending score, assign each detection to the highest-IoU
still-unmatched real GT with IoU >= threshold; unmatched detections that sit
on a crowd region (IoF >= threshold) are ignored.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gossipnet_tpu.ops.matching import greedy_match, greedy_match_batch
from tests.test_geometry import np_iou
from tests.conftest import random_boxes


def np_greedy_match(boxes, scores, valid, gt, gt_valid, gt_crowd, thr,
                    det_classes=None, gt_classes=None):
    n, g = len(boxes), len(gt)
    iou = np_iou(boxes, gt)
    if det_classes is not None:
        same = det_classes[:, None] == gt_classes[None, :]
        iou = np.where(same, iou, 0.0)
    labels = np.zeros(n)
    matched_gt = np.full(n, -1)
    ignore = ~valid.copy()
    taken = np.zeros(g, bool)
    order = np.argsort(-np.where(valid, scores, -1e30), kind="stable")
    for i in order:
        if not valid[i]:
            continue
        best, best_iou = -1, thr - 1e-9
        for j in range(g):
            if not gt_valid[j] or gt_crowd[j] or taken[j]:
                continue
            if iou[i, j] >= thr and iou[i, j] > best_iou:
                best, best_iou = j, iou[i, j]
        if best >= 0:
            labels[i] = 1.0
            matched_gt[i] = best
            taken[best] = True
        else:
            # crowd IoF check
            for j in range(g):
                if gt_valid[j] and gt_crowd[j]:
                    if det_classes is not None and det_classes[i] != gt_classes[j]:
                        continue
                    bi, bj = boxes[i], gt[j]
                    ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
                    ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
                    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                    area = max(bi[2] - bi[0], 0) * max(bi[3] - bi[1], 0)
                    if area > 0 and inter / area >= thr:
                        ignore[i] = True
                        break
    return labels, ignore, matched_gt


def _random_problem(rng, n=48, g=12, crowd_frac=0.2):
    gt = random_boxes(rng, g)
    # detections: jittered copies of GTs plus random clutter
    src = gt[rng.integers(0, g, size=n)]
    jitter = rng.normal(0, 3.0, size=(n, 4)).astype(np.float32)
    boxes = src + jitter
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    gt_valid = rng.uniform(size=g) > 0.1
    gt_crowd = rng.uniform(size=g) < crowd_frac
    return boxes, scores, valid, gt, gt_valid, gt_crowd


def test_matches_oracle_random(rng):
    for trial in range(5):
        boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng)
        for thr in (0.5, 0.75):
            res = greedy_match(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
                jnp.asarray([thr]),
            )
            want_l, want_ig, want_mg = np_greedy_match(
                boxes, scores, valid, gt, gt_valid, gt_crowd, thr
            )
            np.testing.assert_array_equal(np.asarray(res.labels[0]), want_l)
            np.testing.assert_array_equal(np.asarray(res.ignore[0]), want_ig)
            np.testing.assert_array_equal(np.asarray(res.matched_gt[0]), want_mg)


def test_at_most_one_detection_per_gt(rng):
    boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng, n=96)
    res = greedy_match(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
        jnp.asarray([0.5]),
    )
    mg = np.asarray(res.matched_gt[0])
    matched = mg[mg >= 0]
    assert len(matched) == len(set(matched.tolist()))


def test_multi_threshold_monotone(rng):
    """Higher thresholds can only shrink the matched set size."""
    boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng, n=64)
    thrs = jnp.asarray([0.5, 0.6, 0.7, 0.8, 0.9])
    res = greedy_match(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd), thrs,
    )
    counts = np.asarray(res.labels.sum(axis=1))
    assert (np.diff(counts) <= 0).all()


def test_class_aware_blocks_cross_class():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    det_classes = np.array([1, 2])
    gt_classes = np.array([2])
    res = greedy_match(
        jnp.asarray(boxes), jnp.asarray([0.9, 0.8]), jnp.ones(2, bool),
        jnp.asarray(gt), jnp.ones(1, bool), jnp.zeros(1, bool),
        jnp.asarray([0.5]),
        det_classes=jnp.asarray(det_classes), gt_classes=jnp.asarray(gt_classes),
    )
    # Only the class-2 detection (lower score) can match.
    np.testing.assert_array_equal(np.asarray(res.labels[0]), [0.0, 1.0])


def test_padding_invariance(rng):
    """Adding padded detections/GTs never changes real outputs (§4.1)."""
    boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng)
    n, g = len(boxes), len(gt)
    res_a = greedy_match(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
        jnp.asarray([0.5]),
    )
    pad_n, pad_g = 16, 8
    res_b = greedy_match(
        jnp.asarray(np.pad(boxes, ((0, pad_n), (0, 0)))),
        jnp.asarray(np.pad(scores, (0, pad_n), constant_values=0.99)),
        jnp.asarray(np.pad(valid, (0, pad_n))),
        jnp.asarray(np.pad(gt, ((0, pad_g), (0, 0)))),
        jnp.asarray(np.pad(gt_valid, (0, pad_g))),
        jnp.asarray(np.pad(gt_crowd, (0, pad_g))),
        jnp.asarray([0.5]),
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.labels), np.asarray(res_b.labels[:, :n])
    )
    np.testing.assert_array_equal(
        np.asarray(res_a.ignore), np.asarray(res_b.ignore[:, :n])
    )


def test_batched_matches_single(rng):
    probs = [_random_problem(rng) for _ in range(3)]
    stack = [jnp.asarray(np.stack([p[k] for p in probs])) for k in range(6)]
    thrs = jnp.asarray([0.5, 0.75])
    batched = greedy_match_batch(*stack, thrs)
    for b, p in enumerate(probs):
        single = greedy_match(*[jnp.asarray(x) for x in p], thrs)
        np.testing.assert_array_equal(
            np.asarray(batched.labels[b]), np.asarray(single.labels)
        )


def test_jit_matches_eager(rng):
    boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng)
    args = (
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
        jnp.asarray([0.5]),
    )
    eager = greedy_match(*args)
    jitted = jax.jit(greedy_match)(*args)
    np.testing.assert_array_equal(np.asarray(eager.labels), np.asarray(jitted.labels))
