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

from gossipnet_tpu.config import LossConfig
from gossipnet_tpu.ops.matching import MatchResult


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
    labels = match.labels                       # [..., T, N]
    weights = detection_weights(labels, match.ignore, cfg)
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
