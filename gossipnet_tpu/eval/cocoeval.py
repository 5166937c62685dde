"""Vendored pure-numpy COCO detection AP (bbox only).

The reference evaluates with pycocotools' COCOeval
(SURVEY.md §1 "Evaluation"); pycocotools is NOT available in this
environment (§4.6), so this module reimplements the COCO bbox protocol
from its published specification: greedy per-image matching in descending
score order at IoU thresholds 0.50:0.05:0.95, crowd regions matched by
intersection-over-foreground and usable by multiple detections, ignored
GTs/detections excluded from the PR curve, 101-point interpolated AP,
area-range splits (all/small/medium/large) and max-detection caps
(1/10/100), means taken over classes with at least one non-ignored GT.

It operates directly on numpy arrays (no JSON round trip needed), and is
unit-tested against hand-constructed cases with known AP.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)          # [10]
RECALL_THRS = np.linspace(0.0, 1.0, 101)                    # [101]
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


@dataclass
class EvalImage:
    """Everything the evaluator needs for one image."""

    image_id: int
    det_boxes: np.ndarray     # [n, 4] xyxy
    det_scores: np.ndarray    # [n]
    det_classes: np.ndarray   # [n]
    gt_boxes: np.ndarray      # [g, 4] xyxy
    gt_classes: np.ndarray    # [g]
    gt_crowd: np.ndarray      # [g] bool


def _np_iou_xyxy(det: np.ndarray, gt: np.ndarray, crowd: np.ndarray) -> np.ndarray:
    """IoU [n, g]; crowd GTs use intersection / det_area (pycocotools
    iscrowd semantics)."""
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    lt = np.maximum(det[:, None, :2], gt[None, :, :2])
    rb = np.minimum(det[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    det_a = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(
        det[:, 3] - det[:, 1], 0, None
    )
    gt_a = np.clip(gt[:, 2] - gt[:, 0], 0, None) * np.clip(
        gt[:, 3] - gt[:, 1], 0, None
    )
    union = det_a[:, None] + gt_a[None, :] - inter
    denom = np.where(crowd[None, :], det_a[:, None], union)
    return np.where(denom > 0, inter / np.maximum(denom, 1e-12), 0.0)


@dataclass
class _ImgResult:
    dt_scores: np.ndarray   # [n]
    dt_matched: np.ndarray  # [T, n] bool
    dt_ignore: np.ndarray   # [T, n] bool
    num_gt: int             # non-ignored GT count


def _evaluate_image(
    det_boxes, det_scores, gt_boxes, gt_crowd, area_rng, max_det
) -> _ImgResult | None:
    """Match one image's single-class detections to GT (all IoU thrs)."""
    t = len(IOU_THRS)
    gt_area = np.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 0, None) * np.clip(
        gt_boxes[:, 3] - gt_boxes[:, 1], 0, None
    )
    gt_ignore = gt_crowd | (gt_area < area_rng[0]) | (gt_area > area_rng[1])
    if len(det_boxes) == 0 and len(gt_boxes) == 0:
        return None

    # Detections: descending score, capped.
    dord = np.argsort(-det_scores, kind="stable")[:max_det]
    det_boxes, det_scores = det_boxes[dord], det_scores[dord]
    # GTs: non-ignored first (stable).
    gord = np.argsort(gt_ignore, kind="stable")
    gt_boxes, gt_crowd_s, gt_ignore = (
        gt_boxes[gord], gt_crowd[gord], gt_ignore[gord]
    )

    n, g = len(det_boxes), len(gt_boxes)
    from gossipnet_tpu import native

    if native.available():
        # Hot path in C++ (native/gossip_native.cc eval_match) — same
        # algorithm, parity-tested in tests/test_native.py.
        dt_matched, dt_ignore = native.eval_match(
            det_boxes, gt_boxes, gt_crowd_s, gt_ignore, IOU_THRS
        )
    else:
        ious = _np_iou_xyxy(det_boxes, gt_boxes, gt_crowd_s)
        dt_matched = np.zeros((t, n), bool)
        dt_ignore = np.zeros((t, n), bool)
        gt_matched = np.zeros((t, g), bool)

        for ti, thr in enumerate(IOU_THRS):
            for d in range(n):
                best, best_iou = -1, min(thr, 1 - 1e-10)
                for gi in range(g):
                    if gt_matched[ti, gi] and not gt_crowd_s[gi]:
                        continue
                    # Prefer any non-ignored match over ignored ones: once
                    # a real GT is held and we reach the ignored tail, stop.
                    if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                        break
                    if ious[d, gi] < best_iou:
                        continue
                    best_iou = ious[d, gi]
                    best = gi
                if best == -1:
                    continue
                gt_matched[ti, best] = True
                dt_matched[ti, d] = True
                dt_ignore[ti, d] = gt_ignore[best]

    # Unmatched detections outside the area range are ignored.
    det_area = np.clip(det_boxes[:, 2] - det_boxes[:, 0], 0, None) * np.clip(
        det_boxes[:, 3] - det_boxes[:, 1], 0, None
    )
    out_of_range = (det_area < area_rng[0]) | (det_area > area_rng[1])
    dt_ignore |= (~dt_matched) & out_of_range[None, :]

    return _ImgResult(
        dt_scores=det_scores,
        dt_matched=dt_matched,
        dt_ignore=dt_ignore,
        num_gt=int((~gt_ignore).sum()),
    )


@dataclass
class COCOEvaluator:
    """Accumulates images and produces COCO AP/AR statistics.

    Usage::

        ev = COCOEvaluator(num_classes=1)
        for img in images: ev.add(img)
        stats = ev.summarize()   # {'AP': ..., 'AP50': ..., ...}
    """

    num_classes: int = 1
    images: list[EvalImage] = field(default_factory=list)

    def add(self, img: EvalImage) -> None:
        self.images.append(img)

    def add_arrays(self, image_id, det_boxes, det_scores, det_classes,
                   gt_boxes, gt_classes, gt_crowd) -> None:
        self.images.append(EvalImage(
            image_id=image_id,
            det_boxes=np.asarray(det_boxes, np.float64).reshape(-1, 4),
            det_scores=np.asarray(det_scores, np.float64).reshape(-1),
            det_classes=np.asarray(det_classes).reshape(-1),
            gt_boxes=np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            gt_classes=np.asarray(gt_classes).reshape(-1),
            gt_crowd=np.asarray(gt_crowd, bool).reshape(-1),
        ))

    def _accumulate(
        self, area: str, max_det: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (precision [T, 101, K], recall [T, K]); -1 = undefined."""
        t, k = len(IOU_THRS), self.num_classes
        precision = -np.ones((t, len(RECALL_THRS), k))
        recall = -np.ones((t, k))
        rng = AREA_RANGES[area]

        for cls in range(k):
            results = []
            for img in self.images:
                dmask = img.det_classes == cls
                gmask = img.gt_classes == cls
                r = _evaluate_image(
                    img.det_boxes[dmask], img.det_scores[dmask],
                    img.gt_boxes[gmask], img.gt_crowd[gmask],
                    rng, max_det,
                )
                if r is not None:
                    results.append(r)
            if not results:
                continue
            npig = sum(r.num_gt for r in results)
            if npig == 0:
                continue
            scores = np.concatenate([r.dt_scores for r in results])
            order = np.argsort(-scores, kind="mergesort")
            matched = np.concatenate([r.dt_matched for r in results], axis=1)[
                :, order
            ]
            ignored = np.concatenate([r.dt_ignore for r in results], axis=1)[
                :, order
            ]
            for ti in range(t):
                m = matched[ti][~ignored[ti]]
                tp = np.cumsum(m)
                fp = np.cumsum(~m)
                if len(tp) == 0:
                    recall[ti, cls] = 0.0
                    precision[ti, :, cls] = 0.0
                    continue
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, 1e-12)
                recall[ti, cls] = rc[-1]
                # Monotone-decreasing envelope, then 101-point sampling.
                for i in range(len(pr) - 1, 0, -1):
                    pr[i - 1] = max(pr[i - 1], pr[i])
                inds = np.searchsorted(rc, RECALL_THRS, side="left")
                q = np.zeros(len(RECALL_THRS))
                valid = inds < len(pr)
                q[valid] = pr[inds[valid]]
                precision[ti, :, cls] = q
        return precision, recall

    def summarize(self) -> dict[str, float]:
        def _mean(x):
            x = x[x > -1]
            return float(x.mean()) if x.size else -1.0

        p_all, r_all = self._accumulate("all", 100)
        stats = {
            "AP": _mean(p_all),
            "AP50": _mean(p_all[np.where(IOU_THRS == 0.5)[0]]),
            "AP75": _mean(p_all[np.where(IOU_THRS == 0.75)[0]]),
            "AR100": _mean(r_all),
        }
        for name in ("small", "medium", "large"):
            p, _ = self._accumulate(name, 100)
            stats[f"AP{name[0]}"] = _mean(p)
        for md in (1, 10):
            _, r = self._accumulate("all", md)
            stats[f"AR{md}"] = _mean(r)
        return stats

    def per_class_ap(self) -> np.ndarray:
        """AP per class (−1 where undefined), area=all, maxDet=100."""
        p, _ = self._accumulate("all", 100)
        out = np.full(self.num_classes, -1.0)
        for cls in range(self.num_classes):
            v = p[:, :, cls]
            v = v[v > -1]
            if v.size:
                out[cls] = float(v.mean())
        return out
