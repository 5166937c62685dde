"""Training loss: matching-driven weighted logistic loss.

Reference behavior (nms_net/network.py loss subgraph + paper §4): each
detection gets a binary target from greedy det<->GT matching at one or more
IoU thresholds; the loss is a weighted logistic loss
``sum_i w_i * log(1 + exp(-y_i * logit_i))`` with ``y_i in {-1, +1}``,
where weights balance positives vs negatives and zero out ignored
detections (padding, crowd-overlapped unmatched dets). With T thresholds
the per-threshold losses are averaged (paper's multi-threshold variant;
both modes behind ``MatchingConfig.thresholds``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

import jax

from gossipnet_tpu.config import Config, LossConfig
from gossipnet_tpu.ops.matching import MatchResult, greedy_match_batch


def detection_weights(
    labels: Array, ignore: Array, cfg: LossConfig
) -> Array:
    """Per-detection loss weights ``[..., T, N]``.

    'balanced': positives and negatives contribute equal total weight per
    image and threshold (each half sums to 0.5 before normalization), the
    scheme the reference uses to counter the heavy negative skew of
    detection pools. 'fixed': positives scaled by ``fixed_pos_weight``.
    'none': uniform over non-ignored detections.
    """
    active = (~ignore).astype(jnp.float32)
    pos = labels * active
    neg = (1.0 - labels) * active
    n_pos = jnp.sum(pos, axis=-1, keepdims=True)
    n_neg = jnp.sum(neg, axis=-1, keepdims=True)
    if cfg.pos_weight_mode == "balanced":
        w_pos = jnp.where(n_pos > 0, 0.5 / jnp.maximum(n_pos, 1.0), 0.0)
        w_neg = jnp.where(n_neg > 0, 0.5 / jnp.maximum(n_neg, 1.0), 0.0)
        weights = pos * w_pos + neg * w_neg
        # Renormalize so each image/threshold sums to 1 even when one side
        # is empty (e.g. no GT in image -> all-negative, total 0.5).
        total = jnp.sum(weights, axis=-1, keepdims=True)
        weights = jnp.where(total > 0, weights / jnp.maximum(total, 1e-12), 0.0)
    elif cfg.pos_weight_mode == "fixed":
        weights = pos * cfg.fixed_pos_weight + neg
        total = jnp.sum(weights, axis=-1, keepdims=True)
        weights = jnp.where(total > 0, weights / jnp.maximum(total, 1e-12), 0.0)
    elif cfg.pos_weight_mode == "none":
        total = jnp.sum(active, axis=-1, keepdims=True)
        weights = jnp.where(total > 0, active / jnp.maximum(total, 1e-12), 0.0)
    else:
        raise ValueError(f"unknown pos_weight_mode: {cfg.pos_weight_mode!r}")
    return weights


def weighted_logistic_loss(
    logits: Array, match: MatchResult, cfg: LossConfig
) -> tuple[Array, dict[str, Array]]:
    """Scalar loss + metrics.

    Args:
      logits: ``[..., N]`` raw rescoring logits (batch dims optional).
      match:  MatchResult with ``[..., T, N]`` labels/ignore.
    """
    labels, ignore = match.labels, match.ignore     # [..., T, N]
    if cfg.normalize == "per_batch" and labels.ndim == 3:
        # Pool the batch into one weighting problem: [B, T, N] ->
        # [T, B*N]. pos/neg balance then spans images, like the
        # reference's single-image steps scaled up.
        t = labels.shape[1]
        labels = jnp.moveaxis(labels, 0, 1).reshape(t, -1)
        ignore = jnp.moveaxis(ignore, 0, 1).reshape(t, -1)
        logits = logits.reshape(-1)
        match = MatchResult(labels=labels, ignore=ignore,
                            matched_gt=match.matched_gt)
    elif cfg.normalize not in ("per_image", "per_batch"):
        raise ValueError(f"unknown LossConfig.normalize: {cfg.normalize!r}")
    weights = detection_weights(labels, ignore, cfg)
    y = 2.0 * labels - 1.0                      # {-1, +1}
    z = y * logits[..., None, :]                # broadcast over thresholds
    # log(1 + exp(-z)) computed stably.
    per_det = jnp.logaddexp(0.0, -z)
    per_img = jnp.sum(weights * per_det, axis=-1)   # [..., T]
    per_img = jnp.mean(per_img, axis=-1)            # average over thresholds
    loss = jnp.mean(per_img)
    active = (~match.ignore).astype(jnp.float32)
    metrics = {
        "loss": loss,
        "pos_frac": jnp.sum(labels * active) / jnp.maximum(jnp.sum(active), 1.0),
        "num_pos": jnp.sum(labels * active),
    }
    return loss, metrics


def matching_loss(
    logits: Array, batch_arrays: dict, cfg: Config
) -> tuple[Array, dict[str, Array]]:
    """Shared loss tail: greedy matching on the CURRENT logits + weighted
    logistic loss. Used by both the local train step (train.py) and the
    det-sharded step (parallel/sharding.py) so every MatchingConfig /
    LossConfig knob behaves identically on both paths.

    ``MatchingConfig.crowd_as_ignore``: True (pycocotools semantics, the
    default) leaves crowd GTs in matching as ignore regions — unmatched
    detections covered by a crowd get zero loss weight. False removes
    crowd GTs entirely, so those detections train as plain negatives.
    """
    m = cfg.matching
    gt_valid = batch_arrays["gt_valid"]
    gt_crowd = batch_arrays["gt_crowd"]
    if not m.crowd_as_ignore:
        gt_valid = gt_valid & ~gt_crowd
        gt_crowd = jnp.zeros_like(gt_crowd)
    match = greedy_match_batch(
        batch_arrays["boxes"],
        jax.lax.stop_gradient(logits),
        batch_arrays["valid"],
        batch_arrays["gt_boxes"],
        gt_valid,
        gt_crowd,
        jnp.asarray(m.thresholds, jnp.float32),
        det_classes=batch_arrays["classes"] if m.class_aware else None,
        gt_classes=batch_arrays["gt_classes"] if m.class_aware else None,
    )
    return weighted_logistic_loss(logits, match, cfg.loss)
