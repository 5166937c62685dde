"""Handcrafted pair features g_ij for the gossip blocks.

Reference: nms_net/network.py builds, per dynamic pair (i, j), the paper's
feature set (paper §3, "detection pair features"): IoU; normalized
translation; log size ratios; aspect-ratio difference; both raw detector
scores; and, multi-class, a class-match indicator.

TPU-first redesign: no pair list. The feature math is written over
*broadcastable column arrays* so the same function serves
(a) the dense path — full [N, N] broadcasting for small N and for parity
tests — and (b) the Pallas kernel — [TI, 1] x [1, TJ] tile slices, where
features are recomputed on the fly in VMEM and the [N, N, G] tensor never
exists in HBM. Keeping one definition guarantees the two paths compute the
same function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

# Feature count (class-agnostic). Multi-class adds the class-match feature.
NUM_PAIR_FEATURES = 8
NUM_PAIR_FEATURES_MC = 9

_EPS = 1e-6
_MIN_SIZE = 1e-3


class DetColumns(NamedTuple):
    """Per-detection geometry columns, each ``[..., N]``.

    Precomputed once per forward pass and sliced by the Pallas kernel; the
    kernel consumes these stacked as a ``[NUM_COLUMNS, N]`` array so the
    lane (last) dimension is the detection axis (TPU tiling wants the
    128-multiple axis last).
    """

    x1: Array
    y1: Array
    x2: Array
    y2: Array
    cx: Array
    cy: Array
    w: Array
    h: Array
    log_w: Array
    log_h: Array
    log_aspect: Array
    area: Array
    score: Array
    valid: Array  # 1.0 / 0.0


NUM_COLUMNS = len(DetColumns._fields)


def det_columns(boxes: Array, scores: Array, valid: Array) -> DetColumns:
    """Build DetColumns from ``[..., N, 4]`` xyxy boxes + ``[..., N]`` scores."""
    x1, y1 = boxes[..., 0], boxes[..., 1]
    x2, y2 = boxes[..., 2], boxes[..., 3]
    w = jnp.maximum(x2 - x1, _MIN_SIZE)
    h = jnp.maximum(y2 - y1, _MIN_SIZE)
    return DetColumns(
        x1=x1, y1=y1, x2=x2, y2=y2,
        cx=x1 + 0.5 * w, cy=y1 + 0.5 * h,
        w=w, h=h,
        log_w=jnp.log(w), log_h=jnp.log(h),
        log_aspect=jnp.log(w) - jnp.log(h),
        area=w * h,
        score=scores,
        valid=valid.astype(boxes.dtype),
    )


def stack_columns(cols: DetColumns) -> Array:
    """Stack to ``[..., NUM_COLUMNS, N]`` for kernel consumption."""
    return jnp.stack(list(cols), axis=-2)


def unstack_columns(arr: Array) -> DetColumns:
    """Inverse of :func:`stack_columns` over the -2 axis."""
    return DetColumns(*[arr[..., k, :] for k in range(NUM_COLUMNS)])


def pair_iou(ci: DetColumns, cj: DetColumns) -> Array:
    """IoU between broadcastable row/col columns (e.g. [TI,1] vs [1,TJ])."""
    ix = jnp.maximum(
        jnp.minimum(ci.x2, cj.x2) - jnp.maximum(ci.x1, cj.x1), 0.0
    )
    iy = jnp.maximum(
        jnp.minimum(ci.y2, cj.y2) - jnp.maximum(ci.y1, cj.y1), 0.0
    )
    inter = ix * iy
    union = ci.area + cj.area - inter
    return inter / jnp.maximum(union, _EPS)


def pair_feature_list(
    ci: DetColumns,
    cj: DetColumns,
    iou: Array | None = None,
    class_match: Array | None = None,
) -> list[Array]:
    """Pair features as a list of broadcast ``[..., NI, NJ]`` arrays.

    This unstacked form is what the Pallas kernel consumes (each feature
    plane stays in a hardware-friendly [TI, TJ] layout instead of a
    lane-padded [TI, TJ, G] stack); :func:`pair_features` is the stacked
    wrapper for the dense path. One shared definition keeps the two model
    paths bit-identical.

    Order: iou, dx/w_i, dy/h_i, log(w_j/w_i), log(h_j/h_i),
    log-aspect diff, s_i, s_j, [class_match].
    """
    if iou is None:
        iou = pair_iou(ci, cj)
    feats = [
        iou,
        (cj.cx - ci.cx) / ci.w,
        (cj.cy - ci.cy) / ci.h,
        cj.log_w - ci.log_w,
        cj.log_h - ci.log_h,
        cj.log_aspect - ci.log_aspect,
        jnp.broadcast_to(ci.score, iou.shape),
        jnp.broadcast_to(cj.score, iou.shape),
    ]
    if class_match is not None:
        feats.append(jnp.broadcast_to(class_match, iou.shape).astype(iou.dtype))
    return feats


def pair_features(
    ci: DetColumns,
    cj: DetColumns,
    iou: Array | None = None,
    class_match: Array | None = None,
) -> Array:
    """Pair feature tensor ``[..., G]`` (stacked :func:`pair_feature_list`).

    G = 8 (or 9 with class_match).
    """
    return jnp.stack(
        pair_feature_list(ci, cj, iou=iou, class_match=class_match), axis=-1
    )


def _rows(cols: DetColumns) -> DetColumns:
    return DetColumns(*[c[..., :, None] for c in cols])


def _cols(cols: DetColumns) -> DetColumns:
    return DetColumns(*[c[..., None, :] for c in cols])


def dense_pair_tensor(
    cols: DetColumns,
    neighbor_iou: float,
    classes: Array | None = None,
) -> tuple[Array, Array]:
    """Full dense pair features + neighbor mask for one batch of images.

    Returns ``(g [..., N, N, G], mask [..., N, N])`` where mask is True for
    neighbor pairs: IoU >= threshold (self-pairs included since
    IoU(i,i)=1) and both detections valid. Used by the dense (non-Pallas)
    model path and as the parity oracle for the Pallas kernel.
    """
    ri, cj = _rows(cols), _cols(cols)
    iou = pair_iou(ri, cj)
    class_match = None
    if classes is not None:
        class_match = classes[..., :, None] == classes[..., None, :]
    g = pair_features(ri, cj, iou=iou, class_match=class_match)
    mask = (iou >= neighbor_iou) & (ri.valid > 0) & (cj.valid > 0)
    return g, mask
