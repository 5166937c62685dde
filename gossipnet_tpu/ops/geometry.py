"""Box geometry: areas, pairwise IoU / IoF, format conversion.

The reference computes det<->det IoU densely in-graph with TF broadcasting
(reference: nms_net/network.py) and det<->GT IoU inside the C++ matching op
(reference: matching_module/det_matching.cc). Here both live in one pure-JAX
module, vmap/broadcast-first, with static shapes — the Pallas kernel in
ops/pallas/pairwise.py recomputes IoU tile-wise on the fly and is
parity-tested against these dense versions.

Box format: ``[x1, y1, x2, y2]`` float, with ``x2 >= x1`` and ``y2 >= y1``
for non-degenerate boxes. Degenerate/padded boxes (zeros) yield zero area
and zero IoU against everything, so padding is inert by construction.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def box_area(boxes: Array) -> Array:
    """Area of ``[..., 4]`` xyxy boxes; clamped at zero for degenerate boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def _pairwise_intersection(a: Array, b: Array) -> Array:
    """Intersection areas of ``[N, 4]`` x ``[M, 4]`` -> ``[N, M]``."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])   # [N, M, 2]
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])   # [N, M, 2]
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(a: Array, b: Array) -> Array:
    """Dense IoU matrix ``[N, M]`` for xyxy boxes ``a: [N, 4]``, ``b: [M, 4]``.

    Zero-area pairs return IoU 0 (guarded divide), so padded rows/cols are 0.
    """
    inter = _pairwise_intersection(a, b)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_iof(a: Array, b: Array) -> Array:
    """Intersection-over-foreground: ``inter(a, b) / area(a)`` -> ``[N, M]``.

    This is COCO's "crowd" overlap: a detection against an ``iscrowd`` GT is
    scored by how much of the *detection* is covered, matching pycocotools'
    ``iscrowd=1`` branch of ``maskUtils.iou``. Used to decide ignore labels
    (reference: matching_module/det_matching.cc crowd handling).
    """
    inter = _pairwise_intersection(a, b)
    area = box_area(a)[:, None]
    return jnp.where(area > 0.0, inter / jnp.maximum(area, 1e-12), 0.0)


def xywh_to_xyxy(boxes: Array) -> Array:
    """COCO ``[x, y, w, h]`` -> ``[x1, y1, x2, y2]``."""
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: Array) -> Array:
    """``[x1, y1, x2, y2]`` -> COCO ``[x, y, w, h]``."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def box_center_size(boxes: Array) -> tuple[Array, Array, Array, Array]:
    """Centers and sizes ``(cx, cy, w, h)`` of xyxy boxes, each ``[...]``."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h
