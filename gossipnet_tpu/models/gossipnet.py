"""GossipNet: stacked gossip message-passing blocks for learned NMS.

Behavioral spec (SURVEY.md §2.2, paper §3 Fig. 3; reference:
nms_net/network.py class Gnet):

Per image with N detections and neighbor set E = {(i,j): IoU >= 0.2}
(self-pairs included):

  c_i in R^128  (detection state; init from a small FC over score
                 [+ class embedding, multi-class])
  one block (K stacked, residual):
    r_i    = relu(FC_reduce(c_i))                  128 -> 32
    u1_ij  = relu(FC1([r_i ; r_j ; g_ij]))         -> 32   (pair FC 1)
    p_ij   = relu(FC2(u1_ij))                      -> 32   (pair FC 2)
    m_i    = max_{j in E(i)} p_ij                  (elementwise "gossip")
    c_i   += FC_out(relu(FC_expand(m_i)))          32 -> 128
  logit_i = FC_head(c_K,i)                         128 -> 1

TPU-first redesign vs the reference:

- Static shapes: the reference builds a dynamic pair list with tf.where;
  here neighborship is a dense mask and non-neighbors are -inf'd before
  the max. Padding detections are inert (masked out of pairs, zero loss
  weight, forced to logit PAD_LOGIT at the head).
- The pair FC1 is algebraically split: FC1([r_i; r_j; g_ij]) =
  a_i + b_j + g_ij @ Wg, where a = r @ Wa + bias and b = r @ Wb are
  precomputed as [N, 32] matmuls OUTSIDE the O(N^2) stage (MXU-friendly),
  and only the cheap broadcast-add + g-projection happen per pair. This
  identical decomposition is what the tiled Pallas kernel consumes, so
  dense and Pallas paths share parameters and compute the same function.
- All pair-stage parameters are raw ``self.param`` tensors (not nn.Dense)
  so the Pallas kernel can take them directly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.ops import order as ordering
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops import ranking

NEG_INF = -1e30
PAD_LOGIT = -1e4  # logit assigned to padded detections at the head


class PairParams(NamedTuple):
    """Pair-stage parameters of one block, shared by dense/Pallas paths."""

    wa: Array   # [R, P]  r_i path of pair FC1
    wb: Array   # [R, P]  r_j path of pair FC1
    wg: Array   # [G, P]  pair-feature path of FC1
    b1: Array   # [P]
    w2: Array   # [P, P]  pair FC2
    b2: Array   # [P]


def pair_pool_dense(
    a: Array,
    b: Array,
    wg: Array,
    w2: Array,
    b2: Array,
    g: Array,
    mask: Array,
) -> Array:
    """Dense reference implementation of the pair stage + neighbor max.

    Args:
      a:    [..., N, P] precomputed r @ Wa + b1 (rows, detection i).
      b:    [..., N, P] precomputed r @ Wb (cols, detection j).
      wg:   [G, P] pair-feature projection.
      w2:   [P, P]; b2: [P].
      g:    [..., N, N, G] pair features.
      mask: [..., N, N] neighbor mask.

    Returns:
      m: [..., N, P] per-detection max-pooled pair activations (0 where a
      row has no neighbors, which only happens for padded rows).

    Materializes the O(N^2 P) tensor — used for small N, tests, and as
    the parity oracle for the Pallas kernel (ops/pallas/pairwise.py).
    """
    u1 = (
        a[..., :, None, :]
        + b[..., None, :, :]
        + jnp.einsum("...ijg,gp->...ijp", g, wg)
    )
    h1 = jax.nn.relu(u1)
    h2 = jax.nn.relu(jnp.einsum("...ijp,pq->...ijq", h1, w2) + b2)
    h2 = jnp.where(mask[..., None], h2, NEG_INF)
    m = jnp.max(h2, axis=-2)  # max over j (neighbors) -> [..., N, P]
    return jnp.where(m <= NEG_INF / 2, 0.0, m)


class GossipBlock(nn.Module):
    """One gossip block: reduce -> pair MLP -> neighbor max -> expand."""

    cfg: ModelConfig
    num_pair_features: int

    @nn.compact
    def __call__(
        self,
        c: Array,                 # [..., N, D]
        pool_inputs: dict[str, Any],
        pool_fn,                  # (PairParams, a, b, pool_inputs) -> m
    ) -> Array:
        cfg = self.cfg
        r = jax.nn.relu(nn.Dense(cfg.reduced_dim, name="reduce")(c))

        p, rdim, g = cfg.pairwise_dim, cfg.reduced_dim, self.num_pair_features
        init = nn.initializers.lecun_normal()
        params = PairParams(
            wa=self.param("pair_wa", init, (rdim, p)),
            wb=self.param("pair_wb", init, (rdim, p)),
            wg=self.param("pair_wg", init, (g, p)),
            b1=self.param("pair_b1", nn.initializers.zeros, (p,)),
            w2=self.param("pair_w2", init, (p, p)),
            b2=self.param("pair_b2", nn.initializers.zeros, (p,)),
        )
        # MXU-friendly: the two r-projections are plain [N, R] @ [R, P]
        # matmuls outside the O(N^2) stage.
        a = r @ params.wa + params.b1
        b = r @ params.wb
        m = pool_fn(params, a, b, pool_inputs)

        # Expand stack: expand_hidden_layers-1 relu FCs of width P, then
        # the linear map back to feature_dim (default 2 total = the
        # paper's FC(FC(m))). Names keep 'expand'/'expand_out' so
        # default-depth checkpoints are unaffected.
        e = m
        for i in range(cfg.expand_hidden_layers - 1):
            name = "expand" if i == 0 else f"expand_h{i}"
            e = jax.nn.relu(nn.Dense(cfg.pairwise_dim, name=name)(e))
        delta = nn.Dense(cfg.feature_dim, name="expand_out")(e)
        return c + delta


class GossipNet(nn.Module):
    """Full rescoring network over a batch of padded detection sets.

    Inputs are batch-first with static N: boxes [B, N, 4] xyxy, scores
    [B, N], valid [B, N] bool, classes [B, N] int (multi-class only).
    Output: logits [B, N]; padded entries get PAD_LOGIT.

    ``pool_impl``: 'dense' materializes the pair tensor (small N / tests);
    'pallas' streams it tile-wise (ops/pallas/pairwise.py).
    ``remat``: rematerialize each gossip block on the backward pass
    (jax.checkpoint) — trades recompute for activation memory, the
    headroom knob for N=4096 training (TrainConfig.remat_blocks).
    """

    cfg: ModelConfig
    pool_impl: str = "dense"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        boxes: Array,
        scores: Array,
        valid: Array,
        classes: Array | None = None,
    ) -> Array:
        cfg = self.cfg
        multiclass = cfg.num_classes > 1
        if multiclass and classes is None:
            raise ValueError("multi-class model requires `classes`")
        # Defense against an XLA:TPU gather CONSTANT-FOLDING miscompile
        # (docs/KNOWN_ISSUES.md): if a caller closes over the detection
        # arrays instead of passing them as jit arguments, the folded
        # take_along_axis keeps only lane 0 of each box. The barrier
        # stops constant folding at the model boundary; it is free at
        # runtime.
        if classes is None:
            boxes, scores, valid = jax.lax.optimization_barrier(
                (boxes, scores, valid))
        else:
            boxes, scores, valid, classes = jax.lax.optimization_barrier(
                (boxes, scores, valid, classes))
        dtype = jnp.dtype(cfg.dtype)
        boxes = boxes.astype(dtype)
        scores = scores.astype(dtype)

        # Spatial sort (Pallas path): GossipNet is permutation-equivariant
        # per detection, so reordering inputs and unsorting the logits is
        # a pure perf transform — Morton (Z-order) keys cluster each tile
        # in BOTH axes so the block-sparse kernel's 2-D tile-bbox test
        # can prune (ops/order.py; honest value 1.2-2.1x, BENCHMARKS.md).
        inv_perm = None
        if self.pool_impl == "pallas" and cfg.sort_detections:
            key = ordering.morton_sort_key(boxes, valid)
            perm = jnp.argsort(key, axis=-1)
            inv_perm = jnp.argsort(perm, axis=-1)
            boxes = jnp.take_along_axis(boxes, perm[..., None], axis=-2)
            scores = jnp.take_along_axis(scores, perm, axis=-1)
            valid = jnp.take_along_axis(valid, perm, axis=-1)
            if classes is not None:
                classes = jnp.take_along_axis(classes, perm, axis=-1)

        cols = pf.det_columns(boxes, scores, valid)
        num_g = pf.NUM_PAIR_FEATURES_MC if multiclass else pf.NUM_PAIR_FEATURES

        # --- per-detection input features ---
        phi = [scores[..., None]]
        if cfg.score_rank_feature:
            # Normalized score rank among valid detections of the image
            # (multi-class: rank within the detection's class), computed
            # sort-based in O(N log N) — no [N, N] tensor ever exists
            # outside the Pallas kernel (ops/ranking.py). Rank and
            # normalizer count only valid same-class dets, so the
            # feature is padding-invariant.
            rank_feat = ranking.score_rank(
                scores, valid,
                classes if multiclass else None,
                num_classes=cfg.num_classes,
            )
            phi.append(rank_feat.astype(dtype)[..., None])
        if multiclass:
            emb = nn.Embed(cfg.num_classes, cfg.class_embed_dim,
                           name="class_embed", dtype=dtype)(classes)
            phi.append(emb)
        phi = jnp.concatenate(phi, axis=-1)
        c = nn.Dense(cfg.feature_dim, name="init_fc")(phi)

        # --- pair-stage inputs, shared across blocks ---
        if self.pool_impl == "dense":
            g, mask = pf.dense_pair_tensor(
                cols, cfg.neighbor_iou,
                classes=classes if multiclass else None,
            )

            def pool_fn(params: PairParams, a, b, inputs):
                return pair_pool_dense(
                    a, b, params.wg, params.w2, params.b2,
                    inputs["g"], inputs["mask"],
                )

            pool_inputs = {"g": g, "mask": mask}
        elif self.pool_impl == "pallas":
            kernel_kw = {}
            if cfg.pair_kernel == 2:
                from gossipnet_tpu.ops.pallas.pairwise2 import (
                    pallas_pair_pool_v2 as pallas_pair_pool,
                )
                kernel_kw["elementwise_dtype"] = cfg.pair_elementwise_dtype
            else:
                from gossipnet_tpu.ops.pallas.pairwise import (
                    pallas_pair_pool,
                )

            cols_stacked = pf.stack_columns(cols)   # [B, C, N]

            def pool_fn(params: PairParams, a, b, inputs):
                return pallas_pair_pool(
                    inputs["cols"], a, b, params,
                    neighbor_iou=cfg.neighbor_iou,
                    classes=inputs["classes"],
                    compute_dtype=cfg.pair_matmul_dtype,
                    block_sparse=cfg.block_sparse,
                    tile_i=cfg.pair_tile_i, tile_j=cfg.pair_tile_j,
                    **kernel_kw,
                )

            pool_inputs = {
                "cols": cols_stacked,
                "classes": classes if multiclass else None,
            }
        else:
            raise ValueError(f"unknown pool_impl: {self.pool_impl!r}")

        # --- stacked blocks ---
        block_cls = GossipBlock
        if self.remat:
            # pool_fn is a plain function (not a pytree) -> static arg.
            block_cls = nn.remat(GossipBlock, static_argnums=(3,))
        for k in range(cfg.num_blocks):
            c = block_cls(cfg, num_g, name=f"block_{k}")(
                c, pool_inputs, pool_fn
            )

        logits = nn.Dense(1, name="head")(c)[..., 0]
        logits = jnp.where(valid, logits, PAD_LOGIT)
        if inv_perm is not None:
            logits = jnp.take_along_axis(logits, inv_perm, axis=-1)
        return logits


def rescore(params, model: GossipNet, boxes, scores, valid, classes=None):
    """Functional forward: new logits for ranking/thresholding.

    Mirrors the reference's inference pass (SURVEY.md §3.2): the logit IS
    the new score; thresholding it replaces NMS.
    """
    return model.apply({"params": params}, boxes, scores, valid, classes)
