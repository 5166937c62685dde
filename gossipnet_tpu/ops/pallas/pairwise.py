"""Tiled Pallas TPU kernel for the O(N^2) gossip pair stage.

This is the performance centerpiece of the rebuild (north-star
BASELINE.json:5): the reference materializes the full pair tensor in-graph
with dynamic shapes (reference: nms_net/network.py pair machinery); here
the [N, N, P] pair activations NEVER exist in HBM. The kernel streams
TI x TJ tiles through VMEM, recomputing geometry-derived pair features on
the fly from per-detection columns, and keeps a flash-attention-style
running elementwise max per detection row:

  for each row-tile i:                  (grid dim, j innermost)
    m[i] = -inf
    for each col-tile j:
      g_k    = pair_features(cols[i], cols[j])      # VPU, recomputed
      u1     = a[i] (+) b[j] (+) sum_k wg[k] * g_k  # pair FC1, split form
      h2     = relu(w2^T relu(u1) + b2)             # pair FC2 on MXU
      m[i]   = max(m[i], max_j masked(h2))          # streaming max
    m[i] = where(m[i] == -inf, 0)

Layout choice: all pair-stage tensors are [P, TI, TJ] with the detection
axes in (sublane, lane) positions, so a P=32 hidden width costs no lane
padding; per-detection tensors are carried transposed as [B, P, N]
(lane = detection axis, always a 128-multiple after bucket padding).

The backward pass is a custom VJP (flash style): nothing from the forward
is saved except the output m (kept in the packed kernel row layout so the
win-mask comparison h2 == m is exact); a single fused kernel recomputes
tiles and routes gradients through the max winners, accumulating row
gradients (d_a) + weight gradients over the j axis and writing partial
d_b blocks per (i, j) tile that XLA sums afterwards.

Measured v5e layout facts baked into this file (see git history r2):
- Broadcasting the row term [P, TI] across lanes is a Mosaic relayout
  worth ~1.9 us/tile — hoisted into VMEM scratch once per row tile.
- kron(I, W) block-diagonal weight packing (spec.packed) fixes the
  1/16 MXU utilization of the P=32 dots but measures 8% SLOWER end to
  end (dots overlap VPU work; packing adds concat relayouts) — kept
  available but off by default.
- Mosaic cannot lane-split inside a kernel ("unsupported shape cast"),
  so all row-layout packing happens XLA-side (_pack_rows_xla).

KNOWN (documented) VJP divergence on exact ties: the backward routes dm
to EVERY position where h2 == m (the win mask), so pair activations that
tie for the row max each receive the FULL gradient, where the dense
path's jnp.max VJP splits it evenly among the ties. Exact f32 ties of
strictly-positive activations are measure-zero for real detections
(parity-tested to rtol 5e-3 on random data, incl. on-chip
tests/test_tpu_hw.py); ties at exactly 0 are masked out of the gradient
by the relu factor (dpre2 keeps only h2 > 0). Accepted divergence per
ADVICE r1 — tie-splitting in-kernel would need a second winners pass per
tile for a case with no training-relevant mass.

Feature math is imported from ops/pair_features.py — the same definition
the dense path uses — so the two paths are parity-testable to float
tolerance (tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gossipnet_tpu.ops import pair_features as pf

NEG_INF = -1e30


def _dot_precision(mm):
    """compute_dtype=float32 must MEAN f32: Mosaic's dot_general with
    f32 inputs defaults to a single bf16 MXU pass (measured r3,
    pairwise2.py); HIGHEST forces the exact f32 product. bf16 dots pin
    DEFAULT *explicitly* (not None): precision=None inherits an ambient
    ``jax.default_matmul_precision("highest")`` context and Mosaic
    rejects fp32 contract precision on bf16 operands ("Bad lhs
    type")."""
    import jax as _jax

    return (_jax.lax.Precision.HIGHEST
            if mm == jnp.dtype(jnp.float32)
            else _jax.lax.Precision.DEFAULT)


@dataclasses.dataclass(frozen=True)
class PoolSpec:
    """Static kernel configuration (hashable; nondiff custom_vjp arg)."""

    neighbor_iou: float
    num_features: int      # 8 class-agnostic, 9 with class-match
    p: int                 # pairwise hidden width
    ti: int                # row tile
    tj: int                # col tile
    interpret: bool        # CPU interpreter mode (tests)
    # Matmul input dtype for the pair FCs. bfloat16 feeds the MXU at
    # native rate (f32 costs multiple passes) and is the perf default;
    # accumulation stays f32 either way. Geometry/features stay f32.
    compute_dtype: str = "bfloat16"
    # Block-sparsity: skip (i, j) tiles whose tile bounding boxes don't
    # intersect — no pair in such a tile can have IoU > 0, so with
    # neighbor_iou > 0 the result is EXACT. With spatially sorted
    # detections (ModelConfig.sort_detections) this is worth an honest
    # 1.2-2.1x depending on N and layout (BENCHMARKS.md) — COCO-scale
    # boxes keep most 128-detection tile bboxes overlapping.
    block_sparse: bool = True
    # MXU block-diagonal weight packing (forward): with P=32 the pair
    # FCs contract over 32 of 128 MXU rows (1/16 utilization). Packing
    # `128 // P` column-chunks of the tile into the row dimension against
    # kron(I, W) turns both dots into full-width [128, ...] matmuls.
    # The chunk reshapes are pure vreg renamings (lane index unchanged).
    packed: bool = False

    @property
    def pack(self) -> int:
        return 128 // self.p if self.packed else 1

    @property
    def hoist_a(self) -> bool:
        """Hoist the row-term broadcast into VMEM scratch (once per row
        tile) only while the scratch fits comfortably: at 256x256 tiles
        the [P, TI, TJ] f32 buffer alone is 8 MB and blows the ~16 MB
        scoped-vmem limit (measured compile OOM on v5e). Beyond the cap
        the kernels broadcast inline — slower, but they compile."""
        return self.p * self.ti * self.tj * 4 <= 4 * 1024 * 1024


def _tile_columns(ref_slice: Array, axis: int) -> pf.DetColumns:
    """Build DetColumns whose fields broadcast as rows/cols of a tile.

    axis=0: fields are [TI, 1] (from a [TI, C] slice of colsT).
    axis=1: fields are [1, TJ] (from a [C, TJ] slice of cols).
    """
    if axis == 0:
        return pf.DetColumns(
            *[ref_slice[:, k : k + 1] for k in range(pf.NUM_COLUMNS)]
        )
    return pf.DetColumns(
        *[ref_slice[k : k + 1, :] for k in range(pf.NUM_COLUMNS)]
    )


def _tile_forward(
    spec: PoolSpec, colsT_t, cols_t, aT_t, bT_t, wgT, w2T, b2c,
    a_bcast=None,
):
    """Shared tile computation -> (g_stack, neighbor mask, h1_3d, h2_3d).

    colsT_t: [TI, C_total]; cols_t: [C_total, TJ];
    aT_t: [pk*P, TI/pk] (pre-packed row layout, _pack_rows_xla);
    bT_t: [P, TJ]; wgT/w2T/b2c: kron(I_pk, .) packed weights.

    ``a_bcast`` ([pk*P, TI/pk, TJ]) is the row term already broadcast
    along the lane axis. Broadcasting aT_t (row index on lanes) into the
    pair tensor (row index on sublanes) is a Mosaic relayout — ~1.9
    us/tile measured on v5e, the single most expensive elementwise op in
    the kernel — so the streaming kernels hoist it into VMEM scratch
    once per row tile and pass it in; None recomputes inline.
    """
    ti, tj, p = spec.ti, spec.tj, spec.p
    ci = _tile_columns(colsT_t, 0)
    cj = _tile_columns(cols_t, 1)
    class_match = None
    if spec.num_features > pf.NUM_PAIR_FEATURES:
        cls_i = colsT_t[:, pf.NUM_COLUMNS : pf.NUM_COLUMNS + 1]
        cls_j = cols_t[pf.NUM_COLUMNS : pf.NUM_COLUMNS + 1, :]
        class_match = (cls_i == cls_j).astype(jnp.float32)
    iou = pf.pair_iou(ci, cj)
    feats = pf.pair_feature_list(ci, cj, iou=iou, class_match=class_match)

    mm = jnp.dtype(spec.compute_dtype)
    pk = spec.pack
    # Packed form (pk == 1 degenerates to the plain layout): fold `pk`
    # row-chunks of the tile into the MXU row dimension against
    # kron(I, W) weights — full-width [128, ...] dots instead of
    # 1/16-utilized [P, ...] ones. Only Mosaic-safe casts are used:
    # static sublane-boundary slices, (sublane, lane) minor-dim merges,
    # and major-axis concats — never a lane split. ``aT_t`` arrives
    # pre-packed [pk*P, TI/pk] (XLA-side, _pack_rows_xla).
    tipk, mp = ti // pk, (ti // pk) * tj
    # g_stack rows are ordered (chunk-major, feature-minor) to match
    # kron(I_pk, wgT)'s column blocks. Feature projection g @ Wg runs
    # on the MXU: one skinny matmul instead of G broadcast-FMA passes
    # over the [P, TI, TJ] tensor (the VPU bottleneck).
    g_stack = jnp.concatenate(
        [g[q * tipk:(q + 1) * tipk, :].reshape(1, mp)
         for q in range(pk) for g in feats],
        axis=0,
    )                                                   # [pk*G, M/pk]
    gw = jax.lax.dot_general(
        wgT.astype(mm), g_stack.astype(mm),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_dot_precision(mm),
        preferred_element_type=jnp.float32,
    ).reshape(pk * p, tipk, tj)
    if a_bcast is None:
        a_bcast = aT_t[:, :, None]                      # [pk*P, TI/pk, 1]
    b_term = (bT_t if pk == 1
              else jnp.tile(bT_t, (pk, 1)))[:, None, :]  # [pk*P, 1, TJ]
    h1 = jnp.maximum(a_bcast + b_term + gw, 0.0)        # [pk*P, TIpk, TJ]
    pre2 = (
        jax.lax.dot_general(
            w2T.astype(mm), h1.reshape(pk * p, mp).astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_dot_precision(mm),
            preferred_element_type=jnp.float32,
        )
        + b2c
    )
    h2 = jnp.maximum(pre2, 0.0).reshape(pk * p, tipk, tj)

    neighbor = (
        (iou >= spec.neighbor_iou)
        & (ci.valid > 0.0)
        & (cj.valid > 0.0)
    )                                                   # [TI, TJ]
    return g_stack, neighbor, h1, h2


def _pack_neighbor(spec: PoolSpec, neighbor):
    """[TI, TJ] mask -> packed [pk*P, TI/pk, TJ] (slices + major concat)."""
    pk, p, tipk = spec.pack, spec.p, spec.ti // spec.pack
    if pk == 1:
        return neighbor[None, :, :]
    return jnp.concatenate(
        [jnp.broadcast_to(
            neighbor[q * tipk:(q + 1) * tipk, :][None, :, :],
            (p, tipk, spec.tj))
         for q in range(pk)],
        axis=0,
    )


def _row_max(spec: PoolSpec, neighbor, h2):
    """Masked row max in the kernel row layout: [pk*P, TI/pk]."""
    masked = jnp.where(_pack_neighbor(spec, neighbor), h2, NEG_INF)
    return jnp.max(masked, axis=2)


# ---------------------------------------------------------------------------
# block-sparsity: tile activity flags
# ---------------------------------------------------------------------------


def _tile_activity(colsT: Array, cols: Array, ti: int, tj: int) -> Array:
    """Conservative per-tile-pair activity flags, flat int32 [B*NI*NJ].

    A tile pair is inactive when the bounding boxes of its (valid) row and
    column detections don't intersect: then no cross pair can have IoU > 0,
    so (with neighbor_iou > 0) skipping the tile is exact. Computed in XLA
    outside the kernel and fed via scalar prefetch.
    """
    big = 1e30
    # colsT: [B, NR, C]; cols: [B, C, NC] — stacked DetColumns order.
    x1r, y1r, x2r, y2r = (colsT[..., k] for k in range(4))     # [B, NR]
    vr = colsT[..., 13] > 0.0
    x1c, y1c, x2c, y2c = (cols[:, k, :] for k in range(4))     # [B, NC]
    vc = cols[:, 13, :] > 0.0

    def tmin(x, v, t):
        b, n = x.shape
        return jnp.where(v, x, big).reshape(b, n // t, t).min(-1)

    def tmax(x, v, t):
        b, n = x.shape
        return jnp.where(v, x, -big).reshape(b, n // t, t).max(-1)

    rx1, ry1 = tmin(x1r, vr, ti), tmin(y1r, vr, ti)            # [B, NI]
    rx2, ry2 = tmax(x2r, vr, ti), tmax(y2r, vr, ti)
    cx1, cy1 = tmin(x1c, vc, tj), tmin(y1c, vc, tj)            # [B, NJ]
    cx2, cy2 = tmax(x2c, vc, tj), tmax(y2c, vc, tj)

    ox = (rx1[:, :, None] < cx2[:, None, :]) & (cx1[:, None, :] < rx2[:, :, None])
    oy = (ry1[:, :, None] < cy2[:, None, :]) & (cy1[:, None, :] < ry2[:, :, None])
    return (ox & oy).astype(jnp.int32).reshape(-1)             # [B*NI*NJ]


def _flat_flag_index(b_idx, i, j, ni, nj):
    return (b_idx * ni + i) * nj + j


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _pack_rows_xla(spec: PoolSpec, x):
    """[B, P, NR] -> [B, NI, pk*P, TI/pk], the kernel's row layout.

    Row q*P + p of tile i holds detections [i*TI + q*TIpk, ...). Done in
    XLA: Mosaic cannot lane-split inside a kernel ("unsupported shape
    cast"), and pre-tiling also deletes the [P, TI] -> [P, TI, 1]
    transpose that used to run per row tile."""
    b, p, nr = x.shape
    pk, ti = spec.pack, spec.ti
    ni, tipk = nr // ti, ti // pk
    return (x.reshape(b, p, ni, pk, tipk).transpose(0, 2, 3, 1, 4)
            .reshape(b, ni, pk * p, tipk))


def _unpack_rows_xla(spec: PoolSpec, y):
    """Inverse of _pack_rows_xla: [B, NI, pk*P, TI/pk] -> [B, P, NR]."""
    b, ni, pkp, tipk = y.shape
    pk = spec.pack
    p = pkp // pk
    return (y.reshape(b, ni, pk, p, tipk).transpose(0, 3, 1, 2, 4)
            .reshape(b, p, ni * pk * tipk))


def _fwd_kernel(flags_ref, colsT_ref, cols_ref, aT_ref, bT_ref, wgT_ref,
                w2T_ref, b2_ref, out_ref, a_scr, *, spec: PoolSpec):
    b_idx, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ni, nj = pl.num_programs(1), pl.num_programs(2)
    active = flags_ref[_flat_flag_index(b_idx, i, j, ni, nj)] > 0

    @pl.when(j == 0)
    def _():
        out_ref[0, 0] = jnp.full(out_ref.shape[2:], NEG_INF, jnp.float32)
        if spec.hoist_a:
            # Row-term broadcast hoisted out of the j loop
            # (see _tile_forward).
            a_scr[:] = jnp.broadcast_to(
                aT_ref[0, 0][:, :, None], a_scr.shape)

    @pl.when(active)
    def _():
        _, neighbor, _, h2 = _tile_forward(
            spec, colsT_ref[0], cols_ref[0], aT_ref[0, 0], bT_ref[0],
            wgT_ref[:], w2T_ref[:], b2_ref[:],
            a_bcast=a_scr[:] if spec.hoist_a else None,
        )
        out_ref[0, 0] = jnp.maximum(
            out_ref[0, 0], _row_max(spec, neighbor, h2))

    @pl.when(j == nj - 1)
    def _():
        out_ref[0, 0] = jnp.where(
            out_ref[0, 0] <= NEG_INF / 2, 0.0, out_ref[0, 0])


def _pool_specs(spec: PoolSpec, c_total: int):
    p, ti, tj, pk = spec.p, spec.ti, spec.tj, spec.pack
    return [
        pl.BlockSpec((1, ti, c_total), lambda b_, i, j, *_: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_total, tj), lambda b_, i, j, *_: (b_, 0, j),
                     memory_space=pltpu.VMEM),
        # aT in the pre-packed row layout [B, NI, pk*P, TI/pk].
        pl.BlockSpec((1, 1, pk * p, ti // pk),
                     lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, tj), lambda b_, i, j, *_: (b_, 0, j),
                     memory_space=pltpu.VMEM),
        # Weight blocks are kron(I_pk, W) when packed (pk > 1).
        pl.BlockSpec((pk * p, pk * spec.num_features),
                     lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pk * p, pk * p), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pk * p, 1), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _packed_weights(spec: PoolSpec, wgT, w2T, b2c):
    """kron(I, W) block-diagonal weights for the packed dots."""
    pk = spec.pack
    if pk == 1:
        return wgT, w2T, b2c
    eye = jnp.eye(pk, dtype=wgT.dtype)
    return (jnp.kron(eye, wgT), jnp.kron(eye, w2T),
            jnp.tile(b2c, (pk, 1)))


def _make_flags(spec: PoolSpec, colsT, cols) -> Array:
    b, nr, _ = colsT.shape
    nc = cols.shape[2]
    ni, nj = nr // spec.ti, nc // spec.tj
    if spec.block_sparse and spec.neighbor_iou > 0.0:
        return _tile_activity(colsT, cols, spec.ti, spec.tj)
    return jnp.ones(b * ni * nj, jnp.int32)


def _forward(spec: PoolSpec, colsT, cols, aT, bT, wgT, w2T, b2c) -> Array:
    b, nr, c_total = colsT.shape
    nc = cols.shape[2]
    p, ti, tj = spec.p, spec.ti, spec.tj
    ni, nj = nr // ti, nc // tj
    flags = _make_flags(spec, colsT, cols)
    pk = spec.pack
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, ni, nj),
        in_specs=_pool_specs(spec, c_total),
        out_specs=pl.BlockSpec((1, 1, pk * p, ti // pk),
                               lambda b_, i, j, *_: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pk * p, ti // pk, tj) if spec.hoist_a else (8, 128),
                       jnp.float32)
        ],
    )
    wgT_in, w2T_in, b2_in = _packed_weights(spec, wgT, w2T, b2c)
    # Output stays in the packed row layout; _pair_pool_fwd keeps it for
    # the backward's exact h2 == m comparison and unpacks for the caller.
    return pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        out_shape=jax.ShapeDtypeStruct(
            (b, ni, pk * p, ti // pk), jnp.float32),
        grid_spec=grid_spec,
        interpret=spec.interpret,
        # b and i tiles are independent; j carries the streaming-max
        # accumulator, so it must stay sequential.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ) if not spec.interpret else None,
        cost_estimate=pl.CostEstimate(
            # per pair: FC2 matmul (2*P*P) + ~ (G+4)*P VPU work
            flops=b * nr * nc * (2 * p * p + (spec.num_features + 4) * p),
            bytes_accessed=b * (nr + nc) * (c_total + 2 * p) * 4,
            transcendentals=0,
        ),
    )(flags, colsT, cols, _pack_rows_xla(spec, aT), bT,
      wgT_in, w2T_in, b2_in)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _tile_backward_core(spec: PoolSpec, colsT_ref, cols_ref, aT_ref, bT_ref,
                        wgT_ref, w2T_ref, b2_ref, w2_ref, m_ref, dm_ref,
                        a_bcast=None):
    """Shared backward tile recompute -> (g_stack, h1_2d, dpre2, dpre1).

    MUST recompute h2 with the SAME layout (packed or not) as the
    forward: the win mask is an exact `h2 == m` comparison, and the
    packed dots group f32 sums differently, so a layout mismatch between
    forward and recompute silently zeroes almost every gradient.
    In packed mode all returned 2-D tensors are in the packed row order
    ([pk*P, M/pk] / [pk*G, M/pk]).
    """
    p, ti, tj, pk = spec.p, spec.ti, spec.tj, spec.pack
    g_stack, neighbor, h1, h2 = _tile_forward(
        spec, colsT_ref[0], cols_ref[0], aT_ref[0, 0], bT_ref[0],
        wgT_ref[:], w2T_ref[:], b2_ref[:], a_bcast=a_bcast,
    )
    mp = (ti // pk) * tj
    m_t = m_ref[0, 0]                                    # [pk*P, TI/pk]
    dm_t = dm_ref[0, 0]
    win = _pack_neighbor(spec, neighbor) & (h2 == m_t[:, :, None])
    dh2 = jnp.where(win, dm_t[:, :, None], 0.0)
    dpre2 = jnp.where(h2 > 0.0, dh2, 0.0).reshape(pk * p, mp)
    h1_2d = h1.reshape(pk * p, mp)
    mm = jnp.dtype(spec.compute_dtype)
    # dh1 = w2 @ dpre2 (w2_ref is kron(I, w2) when packed)
    dh1 = jax.lax.dot_general(
        w2_ref[:].astype(mm), dpre2.astype(mm),
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=_dot_precision(mm),
        preferred_element_type=jnp.float32,
    )
    dpre1 = jnp.where(h1_2d > 0.0, dh1, 0.0)             # [pk*P, M/pk]
    return g_stack, h1_2d, dpre2, dpre1


def _diag_blocks(spec: PoolSpec, full, cols_per_block: int):
    """Sum the diagonal [P, cols] blocks of a [pk*P, pk*cols] matrix
    (static slices — Mosaic-safe, and the operands are tiny)."""
    pk, p = spec.pack, spec.p
    acc = full[:p, :cols_per_block]
    for q in range(1, pk):
        acc = acc + full[q * p:(q + 1) * p,
                         q * cols_per_block:(q + 1) * cols_per_block]
    return acc


def _sum_row_chunks(spec: PoolSpec, x):
    """[pk*P, ...] -> [P, ...] summing the pk row chunks (static slices)."""
    pk, p = spec.pack, spec.p
    acc = x[:p]
    for q in range(1, pk):
        acc = acc + x[q * p:(q + 1) * p]
    return acc


def _bwd_row_kernel(flags_ref, colsT_ref, cols_ref, aT_ref, bT_ref, wgT_ref,
                    w2T_ref, b2_ref, w2_ref, m_ref, dm_ref,
                    da_ref, dwg_ref, dw2_ref, db2_ref, dbp_ref, a_scr,
                    *, spec: PoolSpec):
    """Single fused backward pass: grid (B, I, J), j innermost.

    Accumulates d_aT over j (block constant in j), the weight grads over
    the whole grid (block constant everywhere), and — instead of a second
    transposed-grid sweep — writes PARTIAL d_bT blocks per (i, j) tile
    (each written exactly once; XLA sums them over i afterwards).
    Inactive tiles (block-sparse flags) skip all compute.
    """
    b_idx, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ni, nj = pl.num_programs(1), pl.num_programs(2)
    p, ti, tj = spec.p, spec.ti, spec.tj
    active = flags_ref[_flat_flag_index(b_idx, i, j, ni, nj)] > 0

    pk = spec.pack
    tipk = ti // pk

    @pl.when(j == 0)
    def _():
        da_ref[0, 0] = jnp.zeros((pk * p, tipk), jnp.float32)
        if spec.hoist_a:
            # Row-term broadcast hoisted out of the j loop
            # (see _tile_forward).
            a_scr[:] = jnp.broadcast_to(
                aT_ref[0, 0][:, :, None], a_scr.shape)

    @pl.when((b_idx == 0) & (i == 0) & (j == 0))
    def _():
        dwg_ref[:] = jnp.zeros((p, spec.num_features), jnp.float32)
        dw2_ref[:] = jnp.zeros((p, p), jnp.float32)
        db2_ref[:] = jnp.zeros((p, 1), jnp.float32)

    @pl.when(active)
    def _():
        g_stack, h1_2d, dpre2, dpre1 = _tile_backward_core(
            spec, colsT_ref, cols_ref, aT_ref, bT_ref,
            wgT_ref, w2T_ref, b2_ref, w2_ref, m_ref, dm_ref,
            a_bcast=a_scr[:] if spec.hoist_a else None,
        )                  # all [pk*P / pk*G rows, M/pk] packed 2-D
        mm = jnp.dtype(spec.compute_dtype)
        dpre1_3d = dpre1.reshape(pk * p, tipk, tj)
        # d_a stays in the packed row layout; XLA unpacks afterwards.
        da_ref[0, 0] = da_ref[0, 0] + jnp.sum(dpre1_3d, axis=2)
        # d_b / d_b2 sum over the row axis — chunks contribute additively.
        dbp_ref[0, 0] = _sum_row_chunks(
            spec, jnp.sum(dpre1_3d, axis=1))             # [P, TJ]
        # dwgT[p, k] = sum_m dpre1[p, m] g_stack[k, m] — on the MXU; the
        # packed dot yields [pk*P, pk*G] whose diagonal blocks sum to it.
        dwg_ref[:] = dwg_ref[:] + _diag_blocks(
            spec,
            jax.lax.dot_general(
                dpre1.astype(mm), g_stack.astype(mm),
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_dot_precision(mm),
                preferred_element_type=jnp.float32,
            ),
            spec.num_features,
        )
        # dw2[p_in, q] = sum_m h1[p_in, m] dpre2[q, m]
        dw2_ref[:] = dw2_ref[:] + _diag_blocks(
            spec,
            jax.lax.dot_general(
                h1_2d.astype(mm), dpre2.astype(mm),
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=_dot_precision(mm),
                preferred_element_type=jnp.float32,
            ),
            p,
        )
        db2_ref[:] = db2_ref[:] + _sum_row_chunks(
            spec, jnp.sum(dpre2, axis=1, keepdims=True))

    @pl.when(jnp.logical_not(active))
    def _():
        dbp_ref[0, 0] = jnp.zeros((p, tj), jnp.float32)


def _backward(spec: PoolSpec, residuals, dm):
    colsT, cols, aT, bT, wgT, w2T, b2c, m = residuals
    b, nr, c_total = colsT.shape
    nc = cols.shape[2]
    p, ti, tj = spec.p, spec.ti, spec.tj
    ni, nj = nr // ti, nc // tj
    # The recompute must use the SAME (packed) layout as the forward —
    # the win mask is an exact h2 == m comparison (_tile_backward_core).
    wgT_in, w2T_in, b2_in = _packed_weights(spec, wgT, w2T, b2c)
    w2 = w2T.T
    if spec.pack > 1:
        w2 = jnp.kron(jnp.eye(spec.pack, dtype=w2.dtype), w2)
    # m is saved packed by _pair_pool_fwd; aT and dm pack here (XLA).
    aT_in = _pack_rows_xla(spec, aT)
    dm_in = _pack_rows_xla(spec, dm)
    flags = _make_flags(spec, colsT, cols)
    # The fused single-pass backward materializes per-row-tile partial
    # d_bT blocks [B, NI, P, NC] = B*N^2*P/TI bytes*4 — 8 MB at the
    # N=1024 training workload, 134 MB at N=4096*B=2; fine for the
    # supported bucket envelope (<= 4096).

    pk = spec.pack
    tipk = ti // pk
    row_specs = _pool_specs(spec, c_total) + [
        pl.BlockSpec((pk * p, pk * p), lambda b_, i, j, *_: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, pk * p, tipk),
                     lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, pk * p, tipk),
                     lambda b_, i, j, *_: (b_, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    da_p, dwgT, dw2, db2, db_part = pl.pallas_call(
        functools.partial(_bwd_row_kernel, spec=spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, ni, pk * p, tipk), jnp.float32),
            jax.ShapeDtypeStruct((p, spec.num_features), jnp.float32),
            jax.ShapeDtypeStruct((p, p), jnp.float32),
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, ni, p, nc), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, ni, nj),
            in_specs=row_specs,
            out_specs=(
                pl.BlockSpec((1, 1, pk * p, tipk),
                             lambda b_, i, j, *_: (b_, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, spec.num_features),
                             lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, p), lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((p, 1), lambda b_, i, j, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p, tj),
                             lambda b_, i, j, *_: (b_, i, 0, j),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((pk * p, tipk, tj) if spec.hoist_a else (8, 128),
                           jnp.float32)
            ],
        ),
        interpret=spec.interpret,
    )(flags, colsT, cols, aT_in, bT, wgT_in, w2T_in, b2_in, w2, m, dm_in)
    da = _unpack_rows_xla(spec, da_p)
    # d_bT: sum the per-row-tile partials (replaces the reference-free
    # second transposed-grid sweep; each partial was written exactly once).
    db = jnp.sum(db_part, axis=1)

    # colsT/cols carry no trainable inputs (box geometry + raw scores);
    # their cotangents are zero by design — parameters get exact grads.
    return (jnp.zeros_like(colsT), jnp.zeros_like(cols), da, db,
            dwgT, dw2, db2)


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_pool_p(spec: PoolSpec, colsT, cols, aT, bT, wgT, w2T, b2c):
    return _unpack_rows_xla(
        spec, _forward(spec, colsT, cols, aT, bT, wgT, w2T, b2c))


def _pair_pool_fwd(spec, colsT, cols, aT, bT, wgT, w2T, b2c):
    # Residuals keep m in the PACKED kernel layout: the backward's win
    # mask is an exact h2 == m comparison against the packed recompute.
    m_p = _forward(spec, colsT, cols, aT, bT, wgT, w2T, b2c)
    return (_unpack_rows_xla(spec, m_p),
            (colsT, cols, aT, bT, wgT, w2T, b2c, m_p))


def _pair_pool_bwd(spec, residuals, dm):
    colsT_g, cols_g, da, db, dwgT, dw2, db2 = _backward(spec, residuals, dm)
    # dw2 is the grad of w2 in [P_in, P_out]; the primal arg is w2T.
    return (colsT_g, cols_g, da, db, dwgT, dw2.T, db2)


_pair_pool_p.defvjp(_pair_pool_fwd, _pair_pool_bwd)


# ---------------------------------------------------------------------------
# public wrapper
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _safe_pad_cols(cols_stacked: Array, n_extra: int, with_class: bool) -> Array:
    """Append ``n_extra`` detection columns of a degenerate-but-SAFE box
    (what det_columns yields for a zero box: clamped w/h, valid=0) — raw
    zero columns would put w=0 into the feature divisions and give
    inf*0=NaN in the backward reductions."""
    bsz, c, _ = cols_stacked.shape
    safe = pf.stack_columns(pf.det_columns(
        jnp.zeros((1, 1, 4), jnp.float32),
        jnp.zeros((1, 1), jnp.float32),
        jnp.zeros((1, 1), bool),
    ))                                            # [1, NUM_COLUMNS, 1]
    if with_class:
        safe = jnp.concatenate(
            [safe, jnp.zeros((1, 1, 1), jnp.float32)], axis=1
        )
    pad_block = jnp.broadcast_to(safe, (bsz, c, n_extra))
    return jnp.concatenate([cols_stacked, pad_block], axis=2)


def pallas_pair_pool_rect(
    row_cols: Array,         # [B, C, NR] columns of the ROW detections
    col_cols: Array,         # [B, C, NC] columns of the COL detections
    a_rows: Array,           # [B, NR, P] = r_rows @ Wa + b1
    b_cols: Array,           # [B, NC, P] = r_cols @ Wb
    params: Any,             # models.gossipnet.PairParams
    neighbor_iou: float,
    row_classes: Array | None = None,
    col_classes: Array | None = None,
    tile: int = 128,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    block_sparse: bool = True,
    tile_i: int | None = None,
    tile_j: int | None = None,
    packed: bool | None = None,
) -> Array:
    """Rectangular streaming pair stage -> m [B, NR, P].

    ``tile_i``/``tile_j`` override the square ``tile`` (row/col tile
    shape; ModelConfig.pair_tile_i/j — swept in scripts/tile_sweep.py).

    The rectangular form is what detection-axis (pair-row) sharding uses:
    each device owns NR = N/n_det rows but sees all NC = N columns
    (parallel/sharding.py). ``pallas_pair_pool`` is the square wrapper.
    Both axes are padded to tile multiples internally; padding is inert.
    ``interpret`` defaults to True off-TPU so tests run on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, c, nr = row_cols.shape
    nc = col_cols.shape[2]
    p = a_rows.shape[-1]
    num_features = pf.NUM_PAIR_FEATURES
    if row_classes is not None:
        row_cols = jnp.concatenate(
            [row_cols, row_classes[:, None, :].astype(jnp.float32)], axis=1
        )
        col_cols = jnp.concatenate(
            [col_cols, col_classes[:, None, :].astype(jnp.float32)], axis=1
        )
        c += 1
        num_features = pf.NUM_PAIR_FEATURES_MC

    # Row tiles need sublane (8) granularity, col tiles lane (128).
    ti = min(tile_i or tile, _round_up(nr, 8))
    tj = min(tile_j or tile, _round_up(nc, 128))
    nr_pad = _round_up(nr, ti)
    nc_pad = _round_up(nc, tj)
    if nr_pad != nr:
        row_cols = _safe_pad_cols(row_cols, nr_pad - nr,
                                  row_classes is not None)
        a_rows = jnp.pad(a_rows, ((0, 0), (0, nr_pad - nr), (0, 0)))
    if nc_pad != nc:
        col_cols = _safe_pad_cols(col_cols, nc_pad - nc,
                                  row_classes is not None)
        b_cols = jnp.pad(b_cols, ((0, 0), (0, nc_pad - nc), (0, 0)))

    colsT = jnp.swapaxes(row_cols, 1, 2)         # [B, NR, C]
    aT = jnp.swapaxes(a_rows, 1, 2)              # [B, P, NR]
    bT = jnp.swapaxes(b_cols, 1, 2)              # [B, P, NC]
    wgT = params.wg.T.astype(jnp.float32)        # [P, G]
    w2T = params.w2.T.astype(jnp.float32)        # [P_out, P_in]
    b2c = params.b2[:, None].astype(jnp.float32)  # [P, 1]

    # MEASURED NEGATIVE (v5e, N=1024 B=8 dense tiles): packed=True is 8%
    # SLOWER (2.40 vs 2.19 ms/call) despite 4x better MXU utilization —
    # the dots overlap with VPU work and are not the critical path, while
    # the pk*G g_stack concat pieces add relayout time. Kept off by
    # default; the path stays correct + parity-tested for future tiles.
    if packed is None:
        packed = False
    packed = bool(packed) and p < 128 and 128 % p == 0 \
        and ti % (128 // p) == 0
    spec = PoolSpec(
        neighbor_iou=float(neighbor_iou),
        num_features=num_features,
        p=p, ti=ti, tj=tj, interpret=bool(interpret),
        compute_dtype=compute_dtype, block_sparse=block_sparse,
        packed=packed,
    )
    m = _pair_pool_p(
        spec, colsT.astype(jnp.float32), col_cols.astype(jnp.float32),
        aT.astype(jnp.float32), bT.astype(jnp.float32), wgT, w2T, b2c,
    )                                            # [B, P, NR_pad]
    return jnp.swapaxes(m, 1, 2)[:, :nr, :]


def pallas_pair_pool(
    cols_stacked: Array,     # [B, C, N] from pf.stack_columns
    a: Array,                # [B, N, P] = r @ Wa + b1
    b: Array,                # [B, N, P] = r @ Wb
    params: Any,             # models.gossipnet.PairParams
    neighbor_iou: float,
    classes: Array | None = None,
    tile: int = 128,
    interpret: bool | None = None,
    compute_dtype: str = "bfloat16",
    block_sparse: bool = True,
    tile_i: int | None = None,
    tile_j: int | None = None,
    packed: bool | None = None,
) -> Array:
    """Square streaming pair stage: returns m [B, N, P] = masked neighbor
    max. Computes the same function as models.gossipnet.pair_pool_dense
    but never materializes the pair tensor."""
    return pallas_pair_pool_rect(
        cols_stacked, cols_stacked, a, b, params, neighbor_iou,
        row_classes=classes, col_classes=classes,
        tile=tile, interpret=interpret, compute_dtype=compute_dtype,
        block_sparse=block_sparse, tile_i=tile_i, tile_j=tile_j,
        packed=packed,
    )
