"""Evaluation: rescore a roidb with a trained model and compute COCO AP.

Mirrors the reference's eval pass (SURVEY.md §3.2): forward-only over the
val set, collect (boxes, new_scores, classes), run COCO AP. No NMS is
applied — thresholding/ranking by the rescored output IS the suppression.
Also provides the two baselines the paper compares against: raw detector
scores (no suppression) and tuned GreedyNMS.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from gossipnet_tpu.data.bucketing import eval_batches
from gossipnet_tpu.data.roidb import Roidb
from gossipnet_tpu.eval.cocoeval import COCOEvaluator
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.ops.nms import greedy_nms_np


def rescore_roidb(
    params,
    model: GossipNet,
    roidb: Roidb,
    batch_size: int = 8,
    bucket_sizes: Sequence[int] = (256, 512, 1024),
) -> dict[int, np.ndarray]:
    """New scores per image id: sigmoid(logit), aligned with the record's
    detection order. One jit specialization per bucket shape."""
    multiclass = model.cfg.num_classes > 1

    @jax.jit
    def forward(boxes, scores, valid, classes):
        logits = model.apply(
            {"params": params}, boxes, scores, valid,
            classes if multiclass else None,
        )
        return jax.nn.sigmoid(logits)

    out: dict[int, np.ndarray] = {}
    for batch in eval_batches(roidb, batch_size, bucket_sizes):
        new_scores = np.asarray(forward(
            batch.boxes, batch.scores, batch.valid, batch.classes
        ))
        for i, img_id in enumerate(batch.image_ids):
            if int(img_id) in out:   # repeat-padded tail
                continue
            n_valid = int(batch.valid[i].sum())
            out[int(img_id)] = new_scores[i, :n_valid]
    return out


def _evaluator_for(
    roidb: Roidb, scores_by_image: dict[int, np.ndarray] | None = None,
    keep_by_image: dict[int, np.ndarray] | None = None,
) -> COCOEvaluator:
    ev = COCOEvaluator(num_classes=roidb.num_classes)
    for rec in roidb:
        scores = rec.det_scores
        boxes, classes = rec.det_boxes, rec.det_classes
        if scores_by_image is not None:
            scores = scores_by_image[rec.image_id]
        if keep_by_image is not None:
            keep = keep_by_image[rec.image_id]
            boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
        ev.add_arrays(
            rec.image_id, boxes, scores, classes,
            rec.gt_boxes, rec.gt_classes, rec.gt_crowd,
        )
    return ev


def evaluate_model(
    params, model: GossipNet, roidb: Roidb,
    batch_size: int = 8, bucket_sizes: Sequence[int] = (256, 512, 1024),
) -> dict[str, float]:
    """COCO stats for the rescored detections."""
    rescored = rescore_roidb(params, model, roidb, batch_size, bucket_sizes)
    return _evaluator_for(roidb, scores_by_image=rescored).summarize()


def evaluate_raw_scores(roidb: Roidb) -> dict[str, float]:
    """Baseline: rank by raw detector scores, no suppression at all."""
    return _evaluator_for(roidb).summarize()


def evaluate_greedy_nms(
    roidb: Roidb, iou_threshold: float = 0.5
) -> dict[str, float]:
    """Baseline: classic per-class GreedyNMS at the given threshold
    (the reference tunes this threshold; sweep externally)."""
    keep_by_image = {}
    for rec in roidb:
        keep_mask = np.zeros(rec.num_dets, bool)
        for cls in np.unique(rec.det_classes):
            sel = np.where(rec.det_classes == cls)[0]
            kept = greedy_nms_np(
                rec.det_boxes[sel], rec.det_scores[sel], iou_threshold
            )
            keep_mask[sel[kept]] = True
        keep_by_image[rec.image_id] = np.where(keep_mask)[0]
    return _evaluator_for(roidb, keep_by_image=keep_by_image).summarize()
