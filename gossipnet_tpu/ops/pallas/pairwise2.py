"""Packed 2-D layout streaming pair kernel (v2, ROADMAP r2 #2).

Same function as ops/pallas/pairwise.py (the v1 kernel): the gossip pair
stage m_i = max_j relu(W2 relu(a_i + b_j + g_ij @ Wg) + b2) over
neighbor pairs, streamed in TI x TJ tiles so the O(N^2) pair tensor
never exists in HBM (reference: nms_net/network.py pair machinery,
materialized dynamically in-graph). Two structural changes, both driven
by the r2 per-tile ablation (BENCHMARKS.md: ~4.3 us/tile of the 6.8
hides in Mosaic relayouts around the dots):

1. SEPARABLE FEATURES FOLD OUT OF THE KERNEL. Of the paper's pair
   features g_ij (pair_features.py order: iou, dx/w_i, dy/h_i,
   dlog w, dlog h, dlog aspect, s_i, s_j[, class-match]), five are
   additively separable (g_k = alpha_k(i) + beta_k(j)) and the dx/dy
   i-halves are i-only, so their Wg contributions fold into the
   per-detection a/b terms as O(N) XLA matmuls BEFORE the kernel
   (fold_separable). In-kernel pairwise work shrinks to iou + two
   rank-1 products (cx_j/w_i, cy_j/h_i) + class-match — 3-4 feature
   rows instead of 8-9 planes.

2. ONE 2-D LAYOUT END TO END. All pair tensors are [R, M~] with
   R = P*pk rows (r = s*P + p: row-chunk s MAJOR, hidden p minor) and
   M~ = TI*TJ/pk lanes (chunk s covers detections i in
   [s*TI/pk, (s+1)*TI/pk), lane m' = t*TJ + j). pk=8 gives full f32
   sublane occupancy for the feature VPU math, weights pack to
   [R, .] block matrices so the dots run on full MXU shapes, and
   the [TI,TJ]->[1,M] feature flattens plus the [P,M]<->[P,TI,TJ]
   reshapes around the dots disappear. s-MAJOR is the key FLOP
   optimization (r3): the packed FC2 weight W2'[(s,po),(s',pi)] =
   w2[pi,po]*I[s==s'] is then block-diagonal in contiguous P-row
   blocks, so its off-diagonal 128x128 MXU quadrants are EXACTLY zero
   and FC2 runs as R/128 full-shape [128,128]x[128,M~] dots
   (_blockdiag_dot) — half the executed MACs of the r3-early p-major
   kron(W2, I_pk) form at the default P=32/pk=8 (the same halving
   applies to the backward's dh1 and dw2 dots). The per-detection b term also
   rides the FC1 dot (tiled [P, M~] rows stacked under the features
   against a 0/1 selector block in wgT8 — _kron_weights) rather than a
   separate [R, M~] tile + add, and the h2 relu fuses into the
   neighbor-mask select (_masked_relu). The per-tile relayouts left:
   the forward's ONCE-PER-ROW-TILE lane-group max reduce ([R, M~] ->
   [R, TI/pk, TJ] view), amortized across j-tiles via a VMEM
   running-max scratch.

The backward (flash-style full recompute, custom VJP) shares the
layout and removes the v1 zero-filled d_b partials buffer
([B, NI, P, NC] HBM traffic): d_b accumulates into a whole-[P, NC]
per-batch out block whose block index is constant within each batch
element (VMEM-resident, one DMA per b), weight grads accumulate as
full packed [R, .] blocks with the kron block-diagonals extracted
XLA-side afterwards, and inactive (block-sparse) tiles skip ALL
gradient work with no zero-fill writes.

Same documented VJP tie divergence as v1 (exact h2 == m ties each get
the full gradient); the packing is bitwise-transparent (per-element
contraction order is tile-size independent), so forward/backward may
even use different tile shapes.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise import (
    _flat_flag_index,
    _round_up,
    _safe_pad_cols,
    _tile_activity,
)

_EPS = 1e-6  # pf._EPS, the iou union clamp

# Measurement-only experiment switches (GNET_PAIR_EXP=...), kept
# env-gated so head-to-head timing never forks the kernel. Not part of
# the public config. r4 outcomes (scripts/pair_exp.py, BENCHMARKS.md):
#   jexp1       — one broadcast+tile over the stacked j-column plane;
#                 measured NEUTRAL (-0.3%/+0.1%/-0.6% across regimes),
#                 kept as a switch only.
#   validfold   — fold pair validity into the iou feature; measured a
#                 small consistent WIN (-1.2% dense4096, -3.0%
#                 clustered1024) and simplifies the neighbor chain, so
#                 it is now the DEFAULT; "novalidfold" restores the
#                 unfused 3x cmp + 2x and chain (bitwise-identical,
#                 pinned by tests/test_pair_exp_parity.py).
import os as _os
_EXP = frozenset(
    s for s in _os.environ.get("GNET_PAIR_EXP", "").split(",") if s)

# wg row indices (pair_features.py order) folded into the a (row) / b
# (col) terms outside the kernel, and the rows kept in-kernel.
_SEP_I = (1, 2, 3, 4, 5, 6)   # dx_i-half, dy_i-half, -dlogs, s_i
_SEP_J = (3, 4, 5, 7)         # +dlogs, s_j
_KERNEL_ROWS = (0, 1, 2)      # iou, cx_j * inv_w_i, cy_j * inv_h_i
_KERNEL_ROWS_MC = (0, 1, 2, 8)  # + class-match

# i-side derived column order in the colsI kernel input
_CI_FIELDS = ("x1", "y1", "x2", "y2", "area", "inv_w", "inv_h", "valid")
# j-side stacked column order in the colsJ kernel input
_CJ_FIELDS = ("x1", "y1", "x2", "y2", "area", "cx", "cy", "valid")


@dataclasses.dataclass(frozen=True)
class PoolSpec2:
    """Static v2 kernel configuration (hashable custom_vjp nondiff arg)."""

    neighbor_iou: float
    multiclass: bool
    p: int                # pairwise hidden width
    pk: int               # sublane pack (8 = full f32 occupancy)
    ti: int               # forward row tile
    tj: int               # forward col tile
    ti_b: int             # backward row tile (may differ; see module doc)
    tj_b: int
    interpret: bool
    compute_dtype: str = "bfloat16"
    block_sparse: bool = True
    # Streamed-tensor elementwise dtype (h1 / pre2 / masked-relu /
    # running-max + their VMEM scratches). bf16 halves the per-tile VPU
    # elementwise cost; requires bf16 dots (wrapper-validated). Grad
    # accumulation stays f32; the backward recomputes the forward's
    # elementwise path in the SAME dtype so the max-winner equality
    # stays exact (bf16 -> f32 casts are value-preserving).
    elementwise_dtype: str = "float32"

    @property
    def r(self) -> int:
        return self.p * self.pk

    @property
    def k(self) -> int:
        return 4 if self.multiclass else 3

    @property
    def ci(self) -> int:
        return len(_CI_FIELDS) + (1 if self.multiclass else 0)

    @property
    def cj(self) -> int:
        return len(_CJ_FIELDS) + (1 if self.multiclass else 0)


# ---------------------------------------------------------------------------
# XLA-side preparation
# ---------------------------------------------------------------------------


def _unstack(cols_stacked: Array, multiclass: bool):
    """[B, C(+1), N] stacked columns -> (DetColumns of [B, N], classes)."""
    cols = pf.unstack_columns(cols_stacked[:, : pf.NUM_COLUMNS, :])
    classes = cols_stacked[:, pf.NUM_COLUMNS, :] if multiclass else None
    return cols, classes


def fold_separable(
    wg: Array, a: Array, b: Array,
    row_stacked: Array, col_stacked: Array, multiclass: bool,
) -> tuple[Array, Array]:
    """Fold the separable pair-feature contributions into a and b.

    a' = a + [-cx/w, -cy/h, -log w, -log h, -log ar, s]_i @ wg[_SEP_I]
    b' = b + [log w, log h, log ar, s]_j @ wg[_SEP_J]

    Plain XLA (differentiable in wg; boxes/scores are non-trainable).
    """
    ci, _ = _unstack(row_stacked, multiclass)
    cj, _ = _unstack(col_stacked, multiclass)
    i_feats = jnp.stack(
        [-ci.cx / ci.w, -ci.cy / ci.h, -ci.log_w, -ci.log_h,
         -ci.log_aspect, ci.score], axis=-1)            # [B, NR, 6]
    j_feats = jnp.stack(
        [cj.log_w, cj.log_h, cj.log_aspect, cj.score], axis=-1)
    wg = wg.astype(jnp.float32)
    # Full f32 precision: TPU's DEFAULT matmul precision is bf16-level
    # (one MXU pass) and these O(N*P) folds feed the f32 pair stage —
    # measured 1e-3-relative forward error vs the dense path without
    # this (the fold is numerics the dense path computes in f32).
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    a2 = a + dot(i_feats, wg[jnp.asarray(_SEP_I), :])
    b2 = b + dot(j_feats, wg[jnp.asarray(_SEP_J), :])
    return a2, b2


def _cols_i_input(spec: PoolSpec2, row_stacked: Array, ti: int) -> Array:
    """Row-side derived columns, pre-arranged per row tile:
    [B, NI, CI, pk, TI/pk] with (s, t) <-> local detection s*TI/pk + t."""
    cols, classes = _unstack(row_stacked, spec.multiclass)
    fields = [cols.x1, cols.y1, cols.x2, cols.y2, cols.area,
              1.0 / cols.w, 1.0 / cols.h, cols.valid]
    if spec.multiclass:
        fields.append(classes)
    x = jnp.stack(fields, axis=1)                       # [B, CI, NR]
    b, c, nr = x.shape
    ni, tipk = nr // ti, ti // spec.pk
    return (x.reshape(b, c, ni, spec.pk, tipk)
            .transpose(0, 2, 1, 3, 4))                  # [B, NI, CI, pk, tipk]


def _cols_j_input(spec: PoolSpec2, col_stacked: Array) -> Array:
    """Col-side stacked columns [B, CJ, NC]."""
    cols, classes = _unstack(col_stacked, spec.multiclass)
    fields = [cols.x1, cols.y1, cols.x2, cols.y2, cols.area,
              cols.cx, cols.cy, cols.valid]
    if spec.multiclass:
        fields.append(classes)
    return jnp.stack(fields, axis=1)


def _pack_rows(spec: PoolSpec2, x: Array, ti: int) -> Array:
    """[B, NR, P] -> [B, NI, R, TI/pk] in the s-MAJOR kernel row layout
    (row s*P + p, lane t <-> local detection s*TI/pk + t)."""
    b, nr, p = x.shape
    pk = spec.pk
    ni, tipk = nr // ti, ti // pk
    return (x.reshape(b, ni, pk, tipk, p).transpose(0, 1, 2, 4, 3)
            .reshape(b, ni, pk * p, tipk))


def _unpack_rows(spec: PoolSpec2, y: Array) -> Array:
    """Inverse of :func:`_pack_rows` -> [B, NR, P]."""
    b, ni, r, tipk = y.shape
    pk = spec.pk
    p = r // pk
    return (y.reshape(b, ni, pk, p, tipk).transpose(0, 1, 2, 4, 3)
            .reshape(b, ni * pk * tipk, p))


def _kron_weights(spec: PoolSpec2, wg_k: Array, w2: Array, b2: Array):
    """s-major packed weights for the [R, M~] dots (f32).

    wgT8 [R, K*pk + P]: W1[(s,p), (k,s')] = wg[k,p]*I[s==s'] (feature
    cols stay k-major, matching the g8 concat order), plus an extra
    [R, P] 0/1 selector block (I[p(r) == p']) appended after the K*pk
    feature columns: contracting it against the tiled b-term rows
    stacked under g8 adds b on the MXU instead of a separate [R, M~]
    VPU tile + add (see _pair_mlp).

    w2T8 [R, R]: W2'[(s,po), (s',pi)] = w2[pi,po]*I[s==s'] — s-major
    rows AND cols make it block-diagonal in contiguous P-row blocks,
    the structure _blockdiag_dot exploits."""
    import numpy as np

    pk, p, r = spec.pk, spec.p, spec.r
    eye = jnp.eye(pk, dtype=jnp.float32)
    wgT = wg_k.T.astype(jnp.float32)                    # [P, K]
    wgT8 = (wgT[None, :, :, None] * eye[:, None, None, :]).reshape(
        r, wgT.shape[1] * pk)                           # [R, K*pk]
    # Pure-np constant: lowers inline, no device round trip at trace or
    # lowering time (KNOWN_ISSUES #4).
    b_sel = (np.arange(r)[:, None] % p
             == np.arange(p)[None, :]).astype(np.float32)  # [R, P]
    wgT8 = jnp.concatenate([wgT8, jnp.asarray(b_sel)], axis=1)
    w2f = w2.astype(jnp.float32)
    w2T8 = (w2f.T[None, :, None, :] * eye[:, None, :, None]).reshape(r, r)
    b28 = jnp.tile(b2.astype(jnp.float32), pk).reshape(r, 1)
    return wgT8, w2T8, b28


def _diag_extract(spec: PoolSpec2, full: Array, cols_per_block: int,
                  cols_s_major: bool = False) -> Array:
    """Accumulated packed-layout grad -> per-block diagonal sum
    (XLA-side). Rows are s-major (s, p). Feature cols (dwg) are
    k-major (k, s'); h1-space cols (dw2) are s-major (s', pi)."""
    p, pk = spec.p, spec.pk
    if cols_s_major:
        x = full.reshape(pk, p, pk, cols_per_block)
        return jnp.einsum("spsq->pq", x)
    x = full.reshape(pk, p, cols_per_block, pk)
    return jnp.einsum("spks->pk", x)


# ---------------------------------------------------------------------------
# in-kernel tile computation
# ---------------------------------------------------------------------------


def _lane_expand(x: Array, tj: int) -> Array:
    """[rows, T] -> [rows, T*tj], each lane value repeated tj times
    (the hoisted-once-per-row-tile broadcast)."""
    rows, t = x.shape
    return jnp.broadcast_to(x[:, :, None], (rows, t, tj)).reshape(
        rows, t * tj)


def _j_expand(row: Array, pk: int, tipk: int) -> Array:
    """[1, TJ] col-side row -> [pk, M~] (sublane broadcast + lane tile)."""
    tj = row.shape[-1]
    return jnp.tile(jnp.broadcast_to(row, (pk, tj)), (1, tipk))


def _tile_core(spec: PoolSpec2, ci_scr, colsJ_t, ti: int, tj: int):
    """Shared forward tile math -> (g8 [K*pk, M~], neighbor [pk, M~]).

    ci_scr: [CI, pk, M~] hoisted lane-expanded row-side columns.
    colsJ_t: [CJ, TJ] col-side stacked columns for this col tile.
    """
    pk, tipk = spec.pk, ti // spec.pk
    if "jexp1" in _EXP:
        # r4 exp: ONE broadcast+tile over the stacked [CJ(+cls), TJ]
        # plane instead of 8-9 per-field _j_expand ops (same lane
        # order). The multiclass class row rides the same expand (it
        # is row len(_CJ_FIELDS) of colsJ_t) so it is not re-expanded
        # below.
        nf = colsJ_t.shape[0]
        # At most ONE extra row (the multiclass class plane) may ride
        # after _CJ_FIELDS: the jx dict below keys by name, so a second
        # extra row would silently shadow the first (ADVICE r4).
        assert nf <= len(_CJ_FIELDS) + 1, (nf, _CJ_FIELDS)
        names = list(_CJ_FIELDS) + ["cls"] * (nf - len(_CJ_FIELDS))
        jall = jnp.tile(
            jnp.broadcast_to(colsJ_t[:, None, :],
                             (nf, pk, colsJ_t.shape[-1])), (1, 1, tipk))
        jx = {name: jall[c] for c, name in enumerate(names)}
    else:
        jx = {name: _j_expand(colsJ_t[c:c + 1, :], pk, tipk)
              for c, name in enumerate(_CJ_FIELDS)}
    ix1, iy1, ix2, iy2 = (ci_scr[c] for c in range(4))
    iarea, iinvw, iinvh, ivalid = (ci_scr[c] for c in range(4, 8))

    iw = jnp.maximum(jnp.minimum(ix2, jx["x2"]) - jnp.maximum(ix1, jx["x1"]),
                     0.0)
    ih = jnp.maximum(jnp.minimum(iy2, jx["y2"]) - jnp.maximum(iy1, jx["y1"]),
                     0.0)
    inter = iw * ih
    union = iarea + jx["area"] - inter
    if "novalidfold" not in _EXP and spec.neighbor_iou > 0.0:
        # Default (r4): fold the pair-validity gate into iou itself so
        # the neighbor chain is mul+mul+cmp instead of
        # cmp+cmp+cmp+and+and. Invalid pairs' iou FEATURE becomes 0 —
        # harmless: their contribution is masked out of the max and
        # their dpre2 is 0. Bitwise-identical to the unfused chain
        # (valid flags are exactly 0.0/1.0; x*1 == x for f32) and
        # measured slightly faster (BENCHMARKS.md r4).
        iou = (inter / jnp.maximum(union, _EPS)) * (ivalid * jx["valid"])
        neighbor = iou >= spec.neighbor_iou
    else:
        iou = inter / jnp.maximum(union, _EPS)          # [pk, M~]
        neighbor = ((iou >= spec.neighbor_iou)
                    & (ivalid > 0.0) & (jx["valid"] > 0.0))

    feats = [iou, jx["cx"] * iinvw, jx["cy"] * iinvh]
    if spec.multiclass:
        jcls = jx["cls"] if "cls" in jx else _j_expand(
            colsJ_t[len(_CJ_FIELDS):len(_CJ_FIELDS) + 1, :], pk, tipk)
        feats.append((ci_scr[8] == jcls).astype(jnp.float32))
    g8 = jnp.concatenate(feats, axis=0)                 # [K*pk, M~]
    return g8, neighbor




def _dot_precision(mm):
    """compute_dtype=float32 must MEAN f32: Mosaic's dot_general with f32
    inputs defaults to a single bf16 MXU pass (measured 1e-3-relative
    error on chip); HIGHEST forces the exact multi-pass f32 product.
    bf16 dots pin DEFAULT *explicitly* (not None): precision=None
    inherits an ambient ``jax.default_matmul_precision("highest")``
    context, and Mosaic rejects fp32 contract precision on bf16
    operands ("Bad lhs type", measured on chip)."""
    return (jax.lax.Precision.HIGHEST
            if mm == jnp.dtype(jnp.float32)
            else jax.lax.Precision.DEFAULT)

_QUAD = 128  # MXU quadrant edge


def _n_quadrants(spec: PoolSpec2) -> int:
    """Number of diagonal 128-row quadrants _blockdiag_dot can use, or
    0 when the structure doesn't align (fallback: one full dot)."""
    if spec.r % _QUAD == 0 and _QUAD % spec.p == 0:
        return spec.r // _QUAD
    return 0


def _blockdiag_dot(spec: PoolSpec2, w_ref, x, mm, prec,
                   out_dtype=jnp.float32):
    """w @ x for an s-major block-diagonal [R, R] weight (P-row blocks,
    see _kron_weights): every off-diagonal 128x128 quadrant is exactly
    zero, so only the R/128 diagonal quadrants are multiplied — each a
    full-shape [128,128]x[128,M~] MXU dot. Halves the executed MACs of
    the FC2/dh1 dots at the default P=32/pk=8 (measured r3)."""
    nq = _n_quadrants(spec)
    if nq == 0:
        return jax.lax.dot_general(
            w_ref[:].astype(mm), x.astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=out_dtype)
    parts = [
        jax.lax.dot_general(
            w_ref[g * _QUAD:(g + 1) * _QUAD,
                  g * _QUAD:(g + 1) * _QUAD].astype(mm),
            x[g * _QUAD:(g + 1) * _QUAD].astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=out_dtype)
        for g in range(nq)
    ]
    return jnp.concatenate(parts, axis=0) if nq > 1 else parts[0]


def _pair_mlp(spec: PoolSpec2, g8b, a_scr, wgT8_ref, w2T8_ref, b28_ref):
    """(h1, pre2) [R, M~] from the packed dots, in the elementwise
    dtype. Mosaic requires 32-bit matmul accumulators (bf16
    preferred_element_type is rejected — 'matmul acc must be 32-bit',
    measured on chip), so the dots emit f32 and the cast to ew happens
    right after; the casts pay for themselves because every later
    elementwise op (h1 relu, +b28, masked-relu, running max) then runs
    at 2x VPU lanes, and h1's FC2-input cast was needed anyway.

    g8b is the pair features STACKED WITH the tiled b-term rows
    ([K*pk + P, M~]); wgT8_ref carries the matching 0/1 selector block
    so the b contribution rides the FC1 MXU dot instead of a separate
    [R, M~] tile + add on the VPU (~0.5 us/tile, measured r3)."""
    mm = jnp.dtype(spec.compute_dtype)
    ew = jnp.dtype(spec.elementwise_dtype)
    prec = _dot_precision(mm)
    gw = jax.lax.dot_general(
        wgT8_ref[:].astype(mm), g8b.astype(mm),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )                                                   # [R, M~]
    h1 = jnp.maximum(a_scr + gw.astype(ew), 0.0)
    pre2 = (_blockdiag_dot(spec, w2T8_ref, h1, mm, prec).astype(ew)
            + b28_ref[:].astype(ew))
    return h1, pre2


def _acc_max(spec: PoolSpec2, neighbor: Array, pre2: Array, acc: Array):
    """Fused masked-relu + running-max tile epilogue.

    With the accumulator invariant acc >= 0 (init 0, only ever updated
    to a max against it), ``max(acc, masked_relu(pre2))`` is exactly
    ``where(neighbor, max(acc, pre2), acc)``: for a neighbor pair with
    pre2 <= 0, max(acc, pre2) == acc == max(acc, 0); for a non-neighbor,
    acc == max(acc, 0). Pure comparisons/selects — values are bitwise
    identical to the unfused chain — but 2 VPU passes ([R, M~] max +
    select) instead of 4 (cmp + and + select + max). bf16 falls back to
    the unfused arithmetic-masking path (_masked_relu doc: Mosaic
    rejects the 3-D i1 select under 16-bit values)."""
    if pre2.dtype == jnp.bfloat16:
        return jnp.maximum(acc, _masked_relu(spec, neighbor, pre2))
    if spec.p % 8 == 0:
        x3 = pre2.reshape(spec.pk, spec.p, pre2.shape[-1])
        a3 = acc.reshape(spec.pk, spec.p, acc.shape[-1])
        return jnp.where(neighbor[:, None], jnp.maximum(a3, x3),
                         a3).reshape(acc.shape)
    nb = jnp.repeat(neighbor, spec.p, axis=0)
    return jnp.where(nb, jnp.maximum(acc, pre2), acc)


def _masked_relu(spec: PoolSpec2, neighbor: Array, pre2: Array):
    """h2 = relu(pre2) and the neighbor mask fused into ONE select:
    max(pre2, 0) * neighbor[pk, M~] broadcast over p (s-major rows) —
    non-neighbor or non-positive entries map to 0, the dense path's
    no-neighbor fixup value, so max over masked tiles is exact.

    Uses the free major split [R, X] <-> [pk, P, X] when P % 8 == 0
    (each s-block is whole f32 vreg rows); otherwise expands
    explicitly."""
    if pre2.dtype == jnp.bfloat16:
        # Mosaic rejects the 3-D i1 select under 16-bit values (invalid
        # replicated-dim relayout for vector<pk x p x M~ xi1>, measured
        # on chip); arithmetic masking — relu then multiply by the 0/1
        # neighbor — avoids the boolean broadcast entirely and is
        # value-exact (x*1 == x, x*0 == 0 for finite bf16).
        nbf = neighbor.astype(pre2.dtype)
        if spec.p % 8 == 0:
            x3 = pre2.reshape(spec.pk, spec.p, pre2.shape[-1])
            return (jnp.maximum(x3, 0) * nbf[:, None]).reshape(pre2.shape)
        return jnp.maximum(pre2, 0) * jnp.repeat(nbf, spec.p, axis=0)
    if spec.p % 8 == 0:
        x3 = pre2.reshape(spec.pk, spec.p, pre2.shape[-1])
        out = jnp.where(neighbor[:, None] & (x3 > 0.0), x3, 0.0)
        return out.reshape(pre2.shape)
    nb = jnp.repeat(neighbor, spec.p, axis=0)
    return jnp.where(nb & (pre2 > 0.0), pre2, 0.0)


def _win_grad(spec: PoolSpec2, neighbor: Array, pre2: Array,
              m: Array, dmg: Array) -> Array:
    """dpre2: route dm to the max winners (fused backward gate).

    The unfused chain is ``masked = _masked_relu(neighbor, pre2)``
    then ``where(masked == m & masked > 0, dm, 0)``; that condition is
    exactly ``neighbor & (pre2 == m) & (m > 0)`` (masked > 0 forces
    neighbor, pre2 > 0 and masked == pre2; conversely pre2 == m > 0 on
    a neighbor survives the mask). The ``m > 0`` gate is loop-invariant
    per row tile and rides the dm hoist (dmg = where(m > 0, dm, 0) at
    j == 0), leaving one eq + one select per tile instead of the
    recompute's 7-pass mask/compare chain. Values bitwise identical.

    bf16 keeps the unfused chain: XLA's excess-precision pass elides
    the f32->bf16->f32 convert pair around the dot output, so
    ``pre2.astype(f32)`` can carry UNROUNDED f32 values while the
    forward's VMEM-stored bf16 accumulator was truly rounded — the
    fused equality then misses most winners (measured: 766 -> 136 on
    the parity test). The unfused max*mask ops materialize the
    rounding. The hoisted dm gate stays correct either way (a winner
    implies m == masked > 0)."""
    if pre2.dtype == jnp.bfloat16:
        masked = _masked_relu(spec, neighbor, pre2).astype(jnp.float32)
        return jnp.where((masked == m) & (masked > 0.0), dmg, 0.0)
    eq = pre2 == m
    if spec.p % 8 == 0:
        sh = (spec.pk, spec.p, pre2.shape[-1])
        return jnp.where(neighbor[:, None] & eq.reshape(sh),
                         dmg.reshape(sh), 0.0).reshape(pre2.shape)
    nb = jnp.repeat(neighbor, spec.p, axis=0)
    return jnp.where(nb & eq, dmg, 0.0)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(flags_ref, colsI_ref, colsJ_ref, aT8_ref, bT8_ref,
                wgT8_ref, w2T8_ref, b28_ref, out_ref, a_scr, ci_scr,
                acc_scr, *, spec: PoolSpec2):
    b_idx, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ni, nj = pl.num_programs(1), pl.num_programs(2)
    active = flags_ref[_flat_flag_index(b_idx, i, j, ni, nj)] > 0
    ti, tj = spec.ti, spec.tj
    tipk = ti // spec.pk

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros(acc_scr.shape, acc_scr.dtype)
        a_scr[:] = _lane_expand(aT8_ref[0, 0], tj).astype(a_scr.dtype)
        for c in range(spec.ci):
            ci_scr[c] = _lane_expand(colsI_ref[0, 0, c], tj)

    @pl.when(active)
    def _():
        g8, neighbor = _tile_core(spec, ci_scr, colsJ_ref[0], ti, tj)
        # b rides the FC1 dot: [P, TJ] block tiled to [P, M~] (1/8 the
        # old [R, M~] tile) stacked under g8 against wgT8's selector
        # columns (_kron_weights).
        g8b = jnp.concatenate(
            [g8, jnp.tile(bT8_ref[0], (1, tipk))], axis=0)
        _, pre2 = _pair_mlp(spec, g8b, a_scr[:],
                            wgT8_ref, w2T8_ref, b28_ref)
        # Accumulate the running max ELEMENTWISE in the pair layout:
        # the lane-group reduce below is a real Mosaic relayout
        # (~2.4 us/tile measured, the single dominant per-tile cost in
        # the r3 ablation) — max over j-tiles commutes with max within
        # a tile, so it runs once per ROW tile instead of every tile.
        # The h2 relu + neighbor mask fuse INTO the max (_acc_max).
        acc_scr[:] = _acc_max(spec, neighbor, pre2, acc_scr[:])

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 0] = jnp.max(
            acc_scr[:].reshape(spec.r, tipk, tj), axis=2,
        ).astype(jnp.float32)


def _in_specs(spec: PoolSpec2, ti: int, tj: int):
    r, pk = spec.r, spec.pk
    tipk = ti // pk
    return [
        pl.BlockSpec((1, 1, spec.ci, pk, tipk),
                     lambda b_, i, j, *_: (b_, i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, spec.cj, tj), lambda b_, i, j, *_: (b_, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r, tipk), lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, spec.p, tj), lambda b_, i, j, *_: (b_, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, spec.k * pk + spec.p),
                     lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, r), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 1), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _make_flags(spec: PoolSpec2, row_stacked, col_stacked, ti, tj) -> Array:
    b = row_stacked.shape[0]
    nr, nc = row_stacked.shape[2], col_stacked.shape[2]
    ni, nj = nr // ti, nc // tj
    if spec.block_sparse and spec.neighbor_iou > 0.0:
        # _tile_activity consumes v1's layouts: [B, NR, C] / [B, C, NC].
        return _tile_activity(
            jnp.swapaxes(row_stacked, 1, 2), col_stacked, ti, tj)
    return jnp.ones(b * ni * nj, jnp.int32)


def _forward(spec: PoolSpec2, row_stacked, col_stacked, a2, b2,
             wg_k, w2, b2bias) -> Array:
    bsz = row_stacked.shape[0]
    nr, nc = row_stacked.shape[2], col_stacked.shape[2]
    ti, tj = spec.ti, spec.tj
    ni, nj = nr // ti, nc // tj
    r, pk = spec.r, spec.pk
    tipk = ti // pk
    mt = tipk * tj

    flags = _make_flags(spec, row_stacked, col_stacked, ti, tj)
    colsI = _cols_i_input(spec, row_stacked, ti)
    colsJ = _cols_j_input(spec, col_stacked)
    aT8 = _pack_rows(spec, a2, ti)
    bT8 = jnp.swapaxes(b2, 1, 2)                        # [B, P, NC]
    wgT8, w2T8, b28 = _kron_weights(spec, wg_k, w2, b2bias)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, ni, nj),
        in_specs=_in_specs(spec, ti, tj),
        out_specs=pl.BlockSpec((1, 1, r, tipk),
                               lambda b_, i, j, *_: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((r, mt), jnp.dtype(spec.elementwise_dtype)),
            pltpu.VMEM((spec.ci, pk, mt), jnp.float32),
            # running-max accumulator
            pltpu.VMEM((r, mt), jnp.dtype(spec.elementwise_dtype)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct((bsz, ni, r, tipk), jnp.float32),
        grid_spec=grid_spec,
        interpret=spec.interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ) if not spec.interpret else None,
        cost_estimate=pl.CostEstimate(
            flops=bsz * nr * nc * (2 * spec.p * spec.p
                                   + (spec.k + 6) * spec.p),
            bytes_accessed=bsz * (nr + nc) * (spec.ci + 2 * spec.p) * 4,
            transcendentals=0,
        ),
    )(flags, colsI, colsJ, aT8, bT8, wgT8, w2T8, b28)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(flags_ref, colsI_ref, colsJ_ref, aT8_ref, bT8_ref,
                wgT8_ref, w2T8_ref, b28_ref, w28_ref, sel_ref, t_ref,
                m_ref, dm_ref,
                da_ref, db_ref, dwg_ref, dw2_ref, db2_ref,
                a_scr, ci_scr, m_scr, dm_scr, accg_scr,
                *, spec: PoolSpec2):
    """Fused backward: recompute tiles, route grads through max winners.

    Accumulators (all VMEM-resident across their index lifetime):
      da_ref  [1, 1, R, TI/pk]  per (b, i): dpre1 accumulates
                                 ELEMENTWISE in accg_scr (the lane-group
                                 reduce is the dominant per-tile relayout
                                 — see the forward); reduced once at the
                                 last j step
      db_ref  [1, P, NC]        per b, accumulated over (i, j), written
                                 at lane offset j*TJ per tile via two
                                 exact 0/1 selector matmuls (sel: sums
                                 the pk s-subrows; T: sums lane groups —
                                 reshape-reduces over sublane/lane groups
                                 are invalid/expensive Mosaic relayouts,
                                 MXU matmuls are not)
      dwg/dw2/db2               whole-grid packed [R, .] accumulators
    Inactive tiles skip everything (no zero-fill partials).
    """
    b_idx, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ni, nj = pl.num_programs(1), pl.num_programs(2)
    active = flags_ref[_flat_flag_index(b_idx, i, j, ni, nj)] > 0
    ti, tj = spec.ti_b, spec.tj_b
    pk, p, r = spec.pk, spec.p, spec.r
    tipk = ti // pk
    mm = jnp.dtype(spec.compute_dtype)
    prec = _dot_precision(mm)

    @pl.when(j == 0)
    def _():
        accg_scr[:] = jnp.zeros(accg_scr.shape, jnp.float32)
        a_scr[:] = _lane_expand(aT8_ref[0, 0], tj).astype(a_scr.dtype)
        m_row = _lane_expand(m_ref[0, 0], tj)
        m_scr[:] = m_row
        # dm gated by m > 0 once per row tile (_win_grad's hoisted half)
        dm_scr[:] = jnp.where(m_row > 0.0,
                              _lane_expand(dm_ref[0, 0], tj), 0.0)
        for c in range(spec.ci):
            ci_scr[c] = _lane_expand(colsI_ref[0, 0, c], tj)

    @pl.when((i == 0) & (j == 0))
    def _():
        db_ref[0] = jnp.zeros(db_ref.shape[1:], jnp.float32)

    @pl.when((b_idx == 0) & (i == 0) & (j == 0))
    def _():
        dwg_ref[:] = jnp.zeros(dwg_ref.shape, jnp.float32)
        dw2_ref[:] = jnp.zeros(dw2_ref.shape, jnp.float32)
        db2_ref[:] = jnp.zeros(db2_ref.shape, jnp.float32)

    @pl.when(active)
    def _():
        g8, neighbor = _tile_core(spec, ci_scr, colsJ_ref[0], ti, tj)
        g8b = jnp.concatenate(
            [g8, jnp.tile(bT8_ref[0], (1, tipk))], axis=0)
        h1, pre2 = _pair_mlp(spec, g8b, a_scr[:],
                             wgT8_ref, w2T8_ref, b28_ref)
        # Win mask: exact equality vs the streamed max (see v1 module
        # docstring for the tie-divergence note); the neighbor mask,
        # the h2 relu gate and the m > 0 gate all fold into _win_grad
        # (dm_scr arrives pre-gated by m > 0 from the j == 0 hoist).
        dpre2 = _win_grad(spec, neighbor, pre2, m_scr[:], dm_scr[:])
        # w28 is s-major block-diagonal like w2T8 (W2 transposed per
        # block): only the diagonal MXU quadrants multiply.
        dh1 = _blockdiag_dot(spec, w28_ref, dpre2, mm, prec)
        dpre1 = jnp.where(h1 > 0.0, dh1, 0.0)           # [R, M~]

        accg_scr[:] = accg_scr[:] + dpre1
        # db contribution: (sel @ dpre1) @ T — both selectors are 0/1
        # (bf16-exact), accumulation f32 on the MXU.
        db_rows = jax.lax.dot_general(
            sel_ref[:].astype(mm), dpre1.astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )                                               # [P, M~]
        db_ref[0, :, pl.ds(j * tj, tj)] = (
            db_ref[0, :, pl.ds(j * tj, tj)]
            + jax.lax.dot_general(
                db_rows.astype(mm), t_ref[:].astype(mm),
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32))
        dwg_ref[:] = dwg_ref[:] + jax.lax.dot_general(
            dpre1.astype(mm), g8.astype(mm),
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32,
        )                                               # [R, K*pk]
        # dw2_full only needs its diagonal quadrants (_diag_extract
        # reads s == s' entries only; off-diagonal quadrants stay at
        # their zero init) — same halving as the forward FC2.
        nq = _n_quadrants(spec)
        for g in range(nq if nq else 1):
            sl = (slice(g * _QUAD, (g + 1) * _QUAD)
                  if nq else slice(None))
            dw2_ref[sl, sl] = dw2_ref[sl, sl] + jax.lax.dot_general(
                dpre2[sl].astype(mm), h1[sl].astype(mm),
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )                                           # [R(out), R(in)]
        db2_ref[:] = db2_ref[:] + jnp.sum(dpre2, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        da_ref[0, 0] = jnp.sum(
            accg_scr[:].reshape(r, tipk, tj), axis=2)


def _backward(spec: PoolSpec2, residuals, dm):
    row_stacked, col_stacked, a2, b2, wg_k, w2, b2bias, m = residuals
    bsz = row_stacked.shape[0]
    nr, nc = row_stacked.shape[2], col_stacked.shape[2]
    ti, tj = spec.ti_b, spec.tj_b
    ni, nj = nr // ti, nc // tj
    r, pk, p = spec.r, spec.pk, spec.p
    tipk = ti // pk
    mt = tipk * tj

    flags = _make_flags(spec, row_stacked, col_stacked, ti, tj)
    colsI = _cols_i_input(spec, row_stacked, ti)
    colsJ = _cols_j_input(spec, col_stacked)
    aT8 = _pack_rows(spec, a2, ti)
    bT8 = jnp.swapaxes(b2, 1, 2)                        # [B, P, NC]
    wgT8, w2T8, b28 = _kron_weights(spec, wg_k, w2, b2bias)
    # dh1 weight, s-major rows (s, p_in) / cols (s', p_out):
    # block-diagonal like w2T8 (_blockdiag_dot).
    eye = jnp.eye(pk, dtype=jnp.float32)
    w2f = w2.astype(jnp.float32)
    w28 = (w2f[None, :, None, :] * eye[:, None, :, None]).reshape(r, r)
    m8 = _pack_rows(spec, m, ti)
    dm8 = _pack_rows(spec, dm, ti)

    # 0/1 selector constants for the db reduction matmuls (kernel doc).
    sel = (jnp.arange(r)[None, :] % p
           == jnp.arange(p)[:, None]).astype(jnp.float32)    # [P, R]
    t_sel = (jnp.arange(mt)[:, None] % tj
             == jnp.arange(tj)[None, :]).astype(jnp.float32)  # [M~, TJ]

    in_specs = _in_specs(spec, ti, tj) + [
        pl.BlockSpec((r, r), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p, r), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((mt, tj), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r, tipk), lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, r, tipk), lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    da8, db_t, dwg_full, dw2_full, db2_full = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ni, r, tipk), jnp.float32),
            jax.ShapeDtypeStruct((bsz, p, nc), jnp.float32),
            jax.ShapeDtypeStruct((r, spec.k * pk), jnp.float32),
            jax.ShapeDtypeStruct((r, r), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, ni, nj),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, r, tipk),
                             lambda b_, i, j, *_: (b_, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p, nc), lambda b_, i, j, *_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, spec.k * pk), lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, r), lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, 1), lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((r, mt), jnp.dtype(spec.elementwise_dtype)),
                pltpu.VMEM((spec.ci, pk, mt), jnp.float32),
                pltpu.VMEM((r, mt), jnp.float32),
                pltpu.VMEM((r, mt), jnp.float32),
                pltpu.VMEM((r, mt), jnp.float32),   # dpre1 accumulator
            ],
        ),
        interpret=spec.interpret,
        # The f32-HIGHEST dots (multi-pass) need extra stack on top of
        # the five scratches; the conservative 16 MB scoped default
        # OOMs by ~2 MB at ti_b=64/f32 while v5e VMEM has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if not spec.interpret else None,
    )(flags, colsI, colsJ, aT8, bT8, wgT8, w2T8, b28, w28, sel, t_sel,
      m8, dm8)

    da2 = _unpack_rows(spec, da8)                       # [B, NR, P]
    db2_grad = jnp.swapaxes(db_t, 1, 2)                 # [B, NC, P]
    dwg_k = _diag_extract(spec, dwg_full, spec.k).T     # [K, P]
    # dw2_full rows are pre2-space (s, p_out), cols h1-space
    # (s', p_in); diag-extract -> [P_out, P_in]; the primal w2 is
    # [P_in, P_out].
    dw2 = _diag_extract(spec, dw2_full, p, cols_s_major=True).T
    db2b = jnp.sum(db2_full.reshape(pk, p), axis=0)
    return (jnp.zeros_like(row_stacked), jnp.zeros_like(col_stacked),
            da2, db2_grad, dwg_k, dw2, db2b)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_pool2_p(spec: PoolSpec2, row_stacked, col_stacked, a2, b2,
                  wg_k, w2, b2bias):
    m8 = _forward(spec, row_stacked, col_stacked, a2, b2, wg_k, w2, b2bias)
    return _unpack_rows(spec, m8)


def _pair_pool2_fwd(spec, row_stacked, col_stacked, a2, b2, wg_k, w2,
                    b2bias):
    m8 = _forward(spec, row_stacked, col_stacked, a2, b2, wg_k, w2, b2bias)
    m = _unpack_rows(spec, m8)
    # m is saved UNPACKED; the backward repacks for its own tile shape —
    # bitwise-transparent (packing is a permutation; per-element
    # contraction order does not depend on the tile shape).
    return m, (row_stacked, col_stacked, a2, b2, wg_k, w2, b2bias, m)


def _pair_pool2_bwd(spec, residuals, dm):
    return _backward(spec, residuals, dm)


_pair_pool2_p.defvjp(_pair_pool2_fwd, _pair_pool2_bwd)


# ---------------------------------------------------------------------------
# public wrappers (signature-compatible with pairwise.py v1)
# ---------------------------------------------------------------------------


def pallas_pair_pool_rect_v2(
    row_cols: Array,         # [B, C, NR] stacked columns, ROW detections
    col_cols: Array,         # [B, C, NC] stacked columns, COL detections
    a_rows: Array,           # [B, NR, P] = r_rows @ Wa + b1
    b_cols: Array,           # [B, NC, P] = r_cols @ Wb
    params,                  # models.gossipnet.PairParams
    neighbor_iou: float,
    row_classes: Array | None = None,
    col_classes: Array | None = None,
    tile: int = 128,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    block_sparse: bool = True,
    tile_i: int | None = None,
    tile_j: int | None = None,
    pack: int = 8,
    bwd_tile_i: int | None = None,
    elementwise_dtype: str = "float32",
) -> Array:
    """Rectangular v2 streaming pair stage -> m [B, NR, P].

    Drop-in equivalent of pairwise.py's ``pallas_pair_pool_rect`` (same
    function of the same PairParams); see the module docstring for the
    v2 layout. ``pack`` is the sublane packing (8 = full f32 vreg
    occupancy). The separable-feature fold happens here in XLA, so wg
    gradients assemble from the fold matmuls + the kernel's cotangents.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if (elementwise_dtype == "bfloat16"
            and compute_dtype != "bfloat16"):
        raise ValueError(
            "elementwise_dtype=bfloat16 requires compute_dtype=bfloat16 "
            "(config.validate_config enforces the same)")
    multiclass = row_classes is not None
    bsz, c, nr = row_cols.shape
    nc = col_cols.shape[2]
    p = a_rows.shape[-1]
    if multiclass:
        row_cols = jnp.concatenate(
            [row_cols, row_classes[:, None, :].astype(jnp.float32)], axis=1)
        col_cols = jnp.concatenate(
            [col_cols, col_classes[:, None, :].astype(jnp.float32)], axis=1)

    # Separable fold BEFORE padding (padding rows are inert either way).
    wg = params.wg.astype(jnp.float32)
    a2, b2 = fold_separable(wg, a_rows.astype(jnp.float32),
                            b_cols.astype(jnp.float32),
                            row_cols, col_cols, multiclass)
    rows_idx = _KERNEL_ROWS_MC if multiclass else _KERNEL_ROWS
    wg_k = wg[jnp.asarray(rows_idx), :]                 # [K, P]

    pk = pack
    ti = min(tile_i or tile, _round_up(nr, pk))
    tj = min(tile_j or tile, _round_up(nc, 128))
    ti = _round_up(ti, pk)
    # The backward holds four [R, M~] f32 scratches (a/m/dm hoists +
    # the i-side columns) on top of the recompute live set; at
    # ti_b = 128 that lands ~0.4 MB over the 16 MB scoped-vmem limit
    # (measured), so the backward defaults to half the forward row
    # tile. Bitwise-safe: per-element values are tile-shape independent
    # (module docstring), only f32 summation order of the weight-grad
    # accumulators shifts.
    ti_b = bwd_tile_i or max(ti // 2 if ti >= 128 else ti, pk)
    nr_pad = _round_up(nr, math.lcm(ti, ti_b))
    nc_pad = _round_up(nc, tj)
    if nr_pad != nr:
        row_cols = _safe_pad_cols(row_cols, nr_pad - nr, multiclass)
        a2 = jnp.pad(a2, ((0, 0), (0, nr_pad - nr), (0, 0)))
    if nc_pad != nc:
        col_cols = _safe_pad_cols(col_cols, nc_pad - nc, multiclass)
        b2 = jnp.pad(b2, ((0, 0), (0, nc_pad - nc), (0, 0)))

    spec = PoolSpec2(
        neighbor_iou=float(neighbor_iou), multiclass=multiclass,
        p=p, pk=pk, ti=ti, tj=tj, ti_b=ti_b, tj_b=tj,
        interpret=bool(interpret), compute_dtype=compute_dtype,
        block_sparse=block_sparse, elementwise_dtype=elementwise_dtype,
    )
    m = _pair_pool2_p(
        spec, row_cols.astype(jnp.float32), col_cols.astype(jnp.float32),
        a2, b2, wg_k, params.w2.astype(jnp.float32),
        params.b2.astype(jnp.float32),
    )                                                   # [B, NR_pad, P]
    return m[:, :nr, :]


def pallas_pair_pool_v2(
    cols_stacked: Array,
    a: Array,
    b: Array,
    params,
    neighbor_iou: float,
    classes: Array | None = None,
    **kw,
) -> Array:
    """Square v2 wrapper (same signature family as v1's)."""
    return pallas_pair_pool_rect_v2(
        cols_stacked, cols_stacked, a, b, params, neighbor_iou,
        row_classes=classes, col_classes=classes, **kw,
    )
