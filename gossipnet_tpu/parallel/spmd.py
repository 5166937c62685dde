"""Detection-axis (pair-row) sharded GossipNet forward.

The reference has NO parallelism of any kind (single process, one image
per step — SURVEY.md §2.3). This module is the TPU-native scaling path
the survey prescribes as the analog of sequence parallelism: the O(N^2)
pair matrix is sharded by ROWS across the 'det' mesh axis, with one small
all-gather of the reduced per-detection state per block riding ICI
(N x 32 floats — negligible next to the N^2/shards tile compute).

Every per-detection tensor (c, r, logits) lives row-sharded; the only
replicated work is the parameter-free matching/loss outside. Because each
'det' rank evaluates the FULL loss on the gathered logits, AD through the
all_gathers (transpose: psum_scatter) already sums cotangents across
ranks — the train step therefore closes with pmean over ('data', 'det'),
not psum (see parallel/sharding.py::_local_grads).

This is a functional mirror of models/gossipnet.py's module using the
SAME parameter tree (param names = module submodule names); parity with
the flax module at num_shards=1 is enforced by tests/test_sharding.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.models.gossipnet import PAD_LOGIT, PairParams
from gossipnet_tpu.ops import order as ordering
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops import ranking
from gossipnet_tpu.ops.pallas.pairwise import (
    pallas_pair_pool_rect as _pair_pool_rect_v1,
)
from gossipnet_tpu.ops.pallas.pairwise2 import (
    pallas_pair_pool_rect_v2 as _pair_pool_rect_v2,
)

DET_AXIS = "det"


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def gossipnet_sharded_forward(
    params,
    cfg: ModelConfig,
    boxes: Array,      # [B, N, 4] replicated over 'det'
    scores: Array,     # [B, N]
    valid: Array,      # [B, N]
    classes: Array | None = None,
    axis: str = DET_AXIS,
    num_shards: int = 1,
    interpret: bool | None = None,
    remat: bool = False,
) -> Array:
    """Row-sharded forward; call INSIDE shard_map. Returns full logits
    [B, N] (identical on every 'det' rank after the final all-gather).

    ``num_shards`` must equal the 'det' mesh axis size (static Python
    int — shard sizes are compile-time shapes). N % num_shards == 0.
    ``remat`` rematerializes each block on the backward pass, mirroring
    GossipNet(remat=True) on the flax path.
    """
    multiclass = cfg.num_classes > 1
    # Same const-folding defense as GossipNet.__call__ (see
    # docs/KNOWN_ISSUES.md: XLA:TPU folds constant gathers wrongly).
    if classes is None:
        boxes, scores, valid = jax.lax.optimization_barrier(
            (boxes, scores, valid))
    else:
        boxes, scores, valid, classes = jax.lax.optimization_barrier(
            (boxes, scores, valid, classes))
    dtype = jnp.dtype(cfg.dtype)
    boxes = boxes.astype(dtype)
    scores = scores.astype(dtype)
    b, n = scores.shape
    assert n % num_shards == 0, (n, num_shards)
    nloc = n // num_shards

    # Spatial (Morton) sort for the block-sparse kernel (see
    # models/gossipnet.py and ops/order.py); inputs are replicated over
    # 'det', so every rank computes the same permutation and the row
    # slicing below stays consistent.
    inv_perm = None
    if cfg.sort_detections:
        sort_key = ordering.morton_sort_key(boxes, valid)
        perm = jnp.argsort(sort_key, axis=-1)
        inv_perm = jnp.argsort(perm, axis=-1)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=-2)
        scores = jnp.take_along_axis(scores, perm, axis=-1)
        valid = jnp.take_along_axis(valid, perm, axis=-1)
        if classes is not None:
            classes = jnp.take_along_axis(classes, perm, axis=-1)

    if num_shards > 1:
        rank = jax.lax.axis_index(axis)
    else:
        rank = 0
    start = rank * nloc

    def rows(x, axis_=1):
        if num_shards == 1:
            return x
        return jax.lax.dynamic_slice_in_dim(x, start, nloc, axis=axis_)

    cols_full = pf.det_columns(boxes, scores, valid)
    cols_stacked = pf.stack_columns(cols_full)        # [B, C, N]
    row_cols = rows(cols_stacked, axis_=2)            # [B, C, nloc]
    scores_loc = rows(scores)
    valid_loc = rows(valid)
    classes_loc = rows(classes) if classes is not None else None

    # --- input features (local rows, computed on the replicated full
    # arrays then row-sliced; ops/ranking.py is O(N log N), no [N, N]) ---
    phi = [scores_loc[..., None]]
    if cfg.score_rank_feature:
        rank_full = ranking.score_rank(
            scores, valid,
            classes if multiclass else None,
            num_classes=cfg.num_classes,
        )                                                 # [B, N]
        phi.append(rows(rank_full).astype(dtype)[..., None])
    if multiclass:
        emb_table = params["class_embed"]["embedding"].astype(dtype)
        phi.append(emb_table[classes_loc])
    phi = jnp.concatenate(phi, axis=-1)
    c = _dense(params["init_fc"], phi)                    # [B, nloc, D]

    # --- blocks ---
    def block_fn(bp, c):
        pair = PairParams(
            wa=bp["pair_wa"], wb=bp["pair_wb"], wg=bp["pair_wg"],
            b1=bp["pair_b1"], w2=bp["pair_w2"], b2=bp["pair_b2"],
        )
        r_loc = jax.nn.relu(_dense(bp["reduce"], c))      # [B, nloc, R]
        if num_shards > 1:
            r_full = jax.lax.all_gather(r_loc, axis, axis=1, tiled=True)
        else:
            r_full = r_loc
        a_loc = r_loc @ pair.wa + pair.b1                 # [B, nloc, P]
        b_full = r_full @ pair.wb                         # [B, N, P]
        pool_rect = (_pair_pool_rect_v2 if cfg.pair_kernel == 2
                     else _pair_pool_rect_v1)
        m_loc = pool_rect(
            row_cols, cols_stacked, a_loc, b_full, pair,
            cfg.neighbor_iou,
            row_classes=classes_loc if multiclass else None,
            col_classes=classes if multiclass else None,
            interpret=interpret,
            compute_dtype=cfg.pair_matmul_dtype,
            block_sparse=cfg.block_sparse,
            tile_i=cfg.pair_tile_i, tile_j=cfg.pair_tile_j,
        )                                                 # [B, nloc, P]
        e = m_loc
        for i in range(cfg.expand_hidden_layers - 1):
            key = "expand" if i == 0 else f"expand_h{i}"
            e = jax.nn.relu(_dense(bp[key], e))
        return c + _dense(bp["expand_out"], e)

    if remat:
        block_fn = jax.checkpoint(block_fn)
    for k in range(cfg.num_blocks):
        c = block_fn(params[f"block_{k}"], c)

    logits_loc = _dense(params["head"], c)[..., 0]        # [B, nloc]
    logits_loc = jnp.where(valid_loc, logits_loc, PAD_LOGIT)
    if num_shards > 1:
        logits = jax.lax.all_gather(logits_loc, axis, axis=1, tiled=True)
    else:
        logits = logits_loc
    if inv_perm is not None:
        logits = jnp.take_along_axis(logits, inv_perm, axis=-1)
    return logits
