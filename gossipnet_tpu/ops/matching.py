"""Greedy det<->GT matching as a vectorized XLA op.

The reference implements this as a custom C++ TensorFlow CPU kernel
(reference: matching_module/det_matching.cc, loaded via
nms_net/matching_module.py) because the greedy pass is sequential over the
detections sorted by their *current predicted* scores, and TF-1.x had no
good in-graph way to express it. That design forces a device->host round
trip every training step.

The TPU-native rebuild keeps the exact algorithm — sort detections by
descending predicted score, greedily assign each to the best still-unmatched
ground-truth box with IoU >= threshold, mirroring COCO evaluation matching
(paper §4) — but expresses it as ``lax.sort`` + ``lax.scan`` over score
order with a per-threshold GT-taken mask. It is:

- fully jittable (lives inside the loss; differentiation is blocked —
  labels are targets, like the reference op which defines no gradient),
- batched with ``vmap`` (the scan body becomes [B, T, G] elementwise work),
- parallel across the T matching thresholds (COCO 0.5:0.95 sweep).

Crowd handling follows pycocotools: a detection that fails to match a real
GT but overlaps an ``iscrowd`` GT with IoF >= threshold is *ignored*
(zero loss weight), not counted negative.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from gossipnet_tpu.ops.geometry import pairwise_iof, pairwise_iou

NEG_INF = -1e30


def _pallas_threshold_domain_ok(thresholds) -> bool:
    """The Pallas matching kernels fold every exclusion (padding, crowd,
    class mismatch) into ZEROED IoU rows, so any threshold t <= 0 would
    make excluded rows eligible — silently wrong labels. True when every
    CONCRETE threshold is > 0; traced thresholds return True (the config
    loader refuses t <= 0 before anything is traced, config.py)."""
    if isinstance(thresholds, jax.core.Tracer):
        return True
    import numpy as np

    return bool(np.all(np.asarray(thresholds) > 0.0))


def _require_pallas_threshold_domain(thresholds) -> None:
    if not _pallas_threshold_domain_ok(thresholds):
        raise ValueError(
            "matching impl='pallas' requires all IoU thresholds > 0 "
            "(exclusions are folded into zeroed IoU rows; t <= 0 would "
            "match padding/crowd rows) — use impl='scan' for t <= 0, "
            f"got {thresholds}"
        )


class MatchResult(NamedTuple):
    """Per-threshold matching outcome, all ``[T, N]`` (or batched ``[B, T, N]``).

    labels:     1.0 where the detection matched a (non-crowd) GT, else 0.0.
    ignore:     True where the detection should get zero loss weight
                (invalid padding, or crowd-overlapped unmatched detection).
    matched_gt: index of the matched GT, -1 if unmatched.
    """

    labels: Array
    ignore: Array
    matched_gt: Array


def greedy_match(
    boxes: Array,
    scores: Array,
    valid: Array,
    gt_boxes: Array,
    gt_valid: Array,
    gt_crowd: Array,
    thresholds: Array,
    det_classes: Array | None = None,
    gt_classes: Array | None = None,
    impl: str | None = None,
) -> MatchResult:
    """Greedy score-ordered matching of N detections to G ground truths.

    Args:
      boxes:       [N, 4] xyxy detection boxes (padded rows arbitrary).
      scores:      [N] current predicted scores — matching is recomputed
                   every step against the *evolving* scores, exactly like
                   the reference op (matching_module/det_matching.cc).
      valid:       [N] bool, False for padding.
      gt_boxes:    [G, 4] xyxy ground-truth boxes.
      gt_valid:    [G] bool, False for padding.
      gt_crowd:    [G] bool, True for COCO iscrowd regions.
      thresholds:  [T] IoU thresholds (e.g. [0.5] or 0.5:0.95).
      det_classes: optional [N] int class ids — when given with gt_classes,
                   matching is class-aware (multi-class GossipNet).
      gt_classes:  optional [G] int class ids.
      impl:        'scan' (XLA lax.scan; the unbatched default) or
                   'pallas' (VMEM-resident kernel; requires thresholds
                   > 0). Both are exact and tie-break identically
                   (parity-tested). Batched callers should prefer
                   :func:`greedy_match_batch`, whose TPU default is the
                   batched kernel — measured 0.59 vs 1.14 ms/step for
                   the vmapped scan at B=8/N=1024/G=112 on v5e
                   (scripts/probe.py match; BENCHMARKS.md).

    Returns:
      MatchResult with arrays of shape [T, N].
    """
    n = boxes.shape[0]
    g = gt_boxes.shape[0]
    thresholds = jnp.asarray(thresholds, jnp.float32)
    t = thresholds.shape[0]

    iou = pairwise_iou(boxes, gt_boxes)          # [N, G]
    iof = pairwise_iof(boxes, gt_boxes)          # [N, G] for crowd regions

    real_gt = gt_valid & ~gt_crowd               # [G]
    crowd_gt = gt_valid & gt_crowd               # [G]

    if det_classes is not None and gt_classes is not None:
        same_class = det_classes[:, None] == gt_classes[None, :]  # [N, G]
        iou = jnp.where(same_class, iou, 0.0)
        iof = jnp.where(same_class, iof, 0.0)
    else:
        same_class = jnp.ones((n, g), bool)

    # Crowd overlap uses IoF (how much of the detection is inside the crowd
    # region), pycocotools iscrowd semantics.
    crowd_overlap = jnp.where(crowd_gt[None, :], iof, 0.0)  # [N, G]
    max_crowd = jnp.max(crowd_overlap, axis=1, initial=0.0)  # [N]

    # Sort detections by descending score; invalid rows sink to the end.
    sort_key = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-sort_key)               # [N], stable

    iou_sorted = iou[order]                      # [N, G]
    valid_sorted = valid[order]                  # [N]
    same_sorted = same_class[order]              # [N, G]

    if impl is None:
        # Default for the UNBATCHED entry point: the lax.scan. The speed
        # ladder at B=8/N=1024/G=112 on v5e (scripts/probe.py match) is
        # batched Pallas kernel 0.59 ms/step < vmapped scan 1.14 ms <
        # vmapped single-image kernel 2.95 ms (vmap lifts the kernel to
        # a sequential grid dimension) — so batched callers get the
        # batched kernel via greedy_match_batch, while here, where vmap
        # is the only batching, the scan wins. impl='pallas' remains
        # available (exact, parity-tested) for unbatched / huge-N use;
        # it requires thresholds > 0 (exclusions are folded into zeroed
        # IoU rows).
        impl = "scan"

    if impl == "pallas":
        _require_pallas_threshold_domain(thresholds)
        from gossipnet_tpu.ops.pallas.matching_kernel import (
            greedy_scan_pallas,
        )

        iou_masked = (
            iou_sorted
            * valid_sorted[:, None].astype(iou_sorted.dtype)
            * real_gt[None, :].astype(iou_sorted.dtype)
        )
        matched_sorted, best_sorted = greedy_scan_pallas(
            iou_masked, thresholds
        )
        matched = jnp.zeros((n, t), bool).at[order].set(matched_sorted).T
        matched_gt = jnp.full((n, t), -1, jnp.int32).at[order].set(
            best_sorted
        ).T
        labels = matched.astype(jnp.float32)
        crowd_ignore = (~matched) & (max_crowd[None, :] >= thresholds[:, None])
        ignore = (~valid)[None, :] | crowd_ignore
        return MatchResult(labels=labels, ignore=ignore, matched_gt=matched_gt)

    def step(taken, inputs):
        # taken: [T, G] bool. One detection (in score order) per step.
        iou_i, valid_i, same_i = inputs          # [G], scalar, [G]
        # Eligible GTs per threshold: real, unmatched, same class,
        # IoU >= t. The class exclusion is EXPLICIT here (not only the
        # zeroed-IoU fold the Pallas paths use) so the scan — the
        # documented implementation for t <= 0 — cannot match a
        # wrong-class GT through a masked 0.0 IoU at threshold 0,
        # where the C++ oracle skips that GT outright (r5 review).
        elig = (
            (iou_i[None, :] >= thresholds[:, None])
            & real_gt[None, :]
            & same_i[None, :]
            & ~taken
            & valid_i
        )                                        # [T, G]
        cand = jnp.where(elig, iou_i[None, :], NEG_INF)
        best = jnp.argmax(cand, axis=1)          # [T]
        matched = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0] > NEG_INF
        taken = taken | (jax.nn.one_hot(best, g, dtype=bool) & matched[:, None])
        return taken, (matched, jnp.where(matched, best, -1))

    taken0 = jnp.zeros((t, g), dtype=bool)
    # NB: measured on v5e, the scan is latency-bound on the serial
    # dependency through `taken` (~1.4us/step at B=8); unroll does not
    # help. 1.45ms per training step at N=1024 — and it runs ON DEVICE
    # inside the jitted step, vs the reference's per-step host round trip.
    _, (matched_sorted, best_sorted) = jax.lax.scan(
        step, taken0, (iou_sorted, valid_sorted, same_sorted)
    )
    # matched_sorted: [N, T] bool; best_sorted: [N, T] int — in score order.
    # Scatter back to original detection order.
    matched = jnp.zeros((n, t), bool).at[order].set(matched_sorted).T  # [T, N]
    matched_gt = jnp.full((n, t), -1, jnp.int32).at[order].set(
        best_sorted.astype(jnp.int32)
    ).T

    labels = matched.astype(jnp.float32)
    # Ignore: padding always; unmatched detections covered by a crowd
    # region. The EXISTENCE form (any same-class crowd GT with IoF >= t)
    # is equivalent to `max_crowd >= t` for t > 0 (folded entries are
    # 0 < t) but stays correct at t <= 0, where the zero-folded max
    # would ignore every unmatched detection even with no crowd GT at
    # all (r5 review; the scan is the documented t <= 0 path).
    crowd_hit = (
        crowd_gt[None, None, :]
        & same_class[None, :, :]
        & (iof[None, :, :] >= thresholds[:, None, None])
    )                                            # [T, N, G]
    crowd_ignore = (~matched) & jnp.any(crowd_hit, axis=2)
    ignore = (~valid)[None, :] | crowd_ignore
    return MatchResult(labels=labels, ignore=ignore, matched_gt=matched_gt)


def _greedy_match_batched_pallas(
    boxes, scores, valid, gt_boxes, gt_valid, gt_crowd, thresholds,
    det_classes=None, gt_classes=None,
) -> MatchResult:
    """Batched matching with the whole-batch Pallas greedy kernel.

    All B problems advance together inside ONE kernel (a vmap of the
    unbatched kernel would serialize B over the grid). Pre/post
    processing mirrors :func:`greedy_match` with a leading batch axis.
    Requires thresholds > 0 (exclusions fold into zeroed IoU).
    """
    from gossipnet_tpu.ops.pallas.matching_kernel import (
        greedy_scan_pallas_batched,
    )

    bsz, n = scores.shape
    thresholds = jnp.asarray(thresholds, jnp.float32)
    iou = jax.vmap(pairwise_iou)(boxes, gt_boxes)          # [B, N, G]
    iof = jax.vmap(pairwise_iof)(boxes, gt_boxes)
    real_gt = gt_valid & ~gt_crowd                         # [B, G]
    crowd_gt = gt_valid & gt_crowd
    if det_classes is not None and gt_classes is not None:
        same = det_classes[:, :, None] == gt_classes[:, None, :]
        iou = jnp.where(same, iou, 0.0)
        iof = jnp.where(same, iof, 0.0)
    crowd_overlap = jnp.where(crowd_gt[:, None, :], iof, 0.0)
    max_crowd = jnp.max(crowd_overlap, axis=2, initial=0.0)  # [B, N]

    sort_key = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-sort_key, axis=-1)                # [B, N]
    iou_sorted = jnp.take_along_axis(iou, order[..., None], axis=1)
    valid_sorted = jnp.take_along_axis(valid, order, axis=1)
    iou_masked = (
        iou_sorted
        * valid_sorted[..., None].astype(iou.dtype)
        * real_gt[:, None, :].astype(iou.dtype)
    )
    matched_s, best_s = greedy_scan_pallas_batched(iou_masked, thresholds)
    inv = jnp.argsort(order, axis=-1)
    matched = jnp.take_along_axis(matched_s, inv[..., None], axis=1)
    best = jnp.take_along_axis(best_s, inv[..., None], axis=1)
    matched = jnp.swapaxes(matched, 1, 2)                  # [B, T, N]
    matched_gt = jnp.swapaxes(best, 1, 2).astype(jnp.int32)

    labels = matched.astype(jnp.float32)
    crowd_ignore = (~matched) & (
        max_crowd[:, None, :] >= thresholds[None, :, None]
    )
    ignore = (~valid)[:, None, :] | crowd_ignore
    return MatchResult(labels=labels, ignore=ignore, matched_gt=matched_gt)


def greedy_match_batch(
    boxes: Array,
    scores: Array,
    valid: Array,
    gt_boxes: Array,
    gt_valid: Array,
    gt_crowd: Array,
    thresholds: Array,
    det_classes: Array | None = None,
    gt_classes: Array | None = None,
    impl: str | None = None,
) -> MatchResult:
    """Batched matching -> [B, T, N].

    impl: None = batched Pallas kernel on TPU (the whole batch advances
    inside one kernel), scan elsewhere; 'scan' | 'pallas' force a path.
    This is the entry the train-step loss uses (losses.py), so the TPU
    default IS the measured-fastest path for the flagship training
    shape: 0.59 ms/step (batched kernel) vs 1.14 ms (vmapped scan) at
    B=8/N=1024/G=112 on v5e (scripts/probe.py match, 2026-08-19).
    """
    if impl is None:
        try:
            impl = "pallas" if jax.default_backend() == "tpu" else "scan"
        except Exception:
            impl = "scan"
        if not _pallas_threshold_domain_ok(thresholds):
            # Auto-selection routes out-of-domain thresholds to the
            # (always-correct) scan instead of producing wrong labels.
            impl = "scan"
    if impl == "pallas":
        _require_pallas_threshold_domain(thresholds)
        return _greedy_match_batched_pallas(
            boxes, scores, valid, gt_boxes, gt_valid, gt_crowd,
            thresholds, det_classes, gt_classes,
        )
    if det_classes is None:
        fn = lambda b, s, v, gb, gv, gc: greedy_match(  # noqa: E731
            b, s, v, gb, gv, gc, thresholds, impl="scan"
        )
        return jax.vmap(fn)(boxes, scores, valid, gt_boxes, gt_valid, gt_crowd)
    fn = lambda b, s, v, gb, gv, gc, dc, gcl: greedy_match(  # noqa: E731
        b, s, v, gb, gv, gc, thresholds, dc, gcl, impl="scan"
    )
    return jax.vmap(fn)(
        boxes, scores, valid, gt_boxes, gt_valid, gt_crowd,
        det_classes, gt_classes,
    )
