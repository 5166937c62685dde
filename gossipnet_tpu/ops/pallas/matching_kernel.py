"""Pallas TPU kernel for the sequential greedy-matching scan.

The matching algorithm (ops/matching.py — the reference's
matching_module/det_matching.cc as on-device XLA) is inherently serial in
score order; as a lax.scan its per-step cost is dominated by XLA loop
latency (~1.4 us/step at B=8). This kernel runs the same loop inside one
Pallas invocation with the GT-taken state resident in VMEM, cutting the
per-step dependency chain to a handful of single-vreg VPU ops.

Exactness: identical tie-breaking to the XLA scan (first index among
maxima), parity-tested in tests/test_matching_kernel.py. Inputs are
pre-masked (invalid detections / non-real GTs have IoU rows zeroed, so
any threshold > 0 excludes them), matching ops/matching.py semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_ONE = -1.0


def _kernel(iou_ref, thr_ref, matched_ref, best_ref, taken_ref, *,
            n: int, g: int, t: int):
    # iou_ref: [N, G] f32 (pre-masked); thr_ref: [T, 1] f32
    # matched_ref: [T, N] f32; best_ref: [T, N] i32; taken_ref: [T, G] f32
    # N % 128 == 0 (wrapper pads): results accumulate in [T, 128]
    # register blocks (Mosaic allows dynamic-sublane loads but only
    # 128-aligned dynamic-lane stores).
    taken_ref[:] = jnp.zeros((t, g), jnp.float32)
    gt_idx = jax.lax.broadcasted_iota(jnp.int32, (t, g), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, 128), 1)
    thr = thr_ref[:]                                     # [T, 1]

    def outer(bi, _):
        base = pl.multiple_of(bi * 128, 128)

        def inner(j, carry):
            mblk, bblk = carry
            row = iou_ref[pl.ds(base + j, 1), :]         # [1, G]
            elig = (row >= thr) & (taken_ref[:] < 0.5)   # [T, G]
            cand = jnp.where(elig, row, NEG_ONE)
            mx = jnp.max(cand, axis=1, keepdims=True)    # [T, 1]
            matched = mx > NEG_ONE                       # [T, 1]
            # first index among maxima == jnp.argmax tie-breaking
            win = elig & (cand == mx)
            first = jnp.min(jnp.where(win, gt_idx, g), axis=1,
                            keepdims=True)
            take = matched & (gt_idx == first)
            taken_ref[:] = jnp.maximum(
                taken_ref[:], take.astype(jnp.float32)
            )
            sel = lane == j
            mblk = jnp.where(sel & matched, 1.0, mblk)
            bblk = jnp.where(sel, jnp.where(matched, first, -1), bblk)
            return mblk, bblk

        mblk, bblk = jax.lax.fori_loop(
            0, 128, inner,
            (jnp.zeros((t, 128), jnp.float32),
             jnp.full((t, 128), -1, jnp.int32)),
        )
        matched_ref[:, pl.ds(base, 128)] = mblk
        best_ref[:, pl.ds(base, 128)] = bblk
        return 0

    jax.lax.fori_loop(0, n // 128, outer, 0)


def greedy_scan_pallas(
    iou_masked: Array,       # [N, G] f32, rows of invalid dets / cols of
                             # non-real GTs already zeroed
    thresholds: Array,       # [T] f32, all > 0
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Sequential greedy pass -> (matched [N, T] bool, best [N, T] i32)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, g = iou_masked.shape
    n_pad = ((n + 127) // 128) * 128
    if n_pad != n:
        # padded rows have zero IoU -> never match (thresholds > 0)
        iou_masked = jnp.pad(iou_masked, ((0, n_pad - n), (0, 0)))
    t = thresholds.shape[0]
    thr_col = thresholds.astype(jnp.float32)[:, None]
    matched_tn, best_tn = pl.pallas_call(
        functools.partial(_kernel, n=n_pad, g=g, t=t),
        out_shape=(
            jax.ShapeDtypeStruct((t, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((t, n_pad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((t, g), jnp.float32)],
        interpret=bool(interpret),
    )(iou_masked.astype(jnp.float32), thr_col)
    return matched_tn.T[:n] > 0.5, best_tn.T[:n]


def _kernel_batched(iou_ref, thr_ref, matched_ref, best_ref, taken_ref, *,
                    b: int, n: int, g: int, t: int):
    # iou_ref: [B, N, G]; thr_ref: [T, 1]; matched_ref: [B, T, N] f32;
    # best_ref: [B, T, N] i32; taken_ref: [B, T, G] f32.
    # All B problems advance together each step (the serial dependency is
    # only within a problem), so per-step work stays fully vectorized —
    # this is what vmap-of-pallas_call cannot do (it serializes B over
    # the grid).
    taken_ref[:] = jnp.zeros((b, t, g), jnp.float32)
    gt_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t, g), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, t, 128), 2)
    thr = thr_ref[:][None, :, :]                         # [1, T, 1]

    def outer(bi, _):
        base = pl.multiple_of(bi * 128, 128)

        def inner(j, carry):
            mblk, bblk = carry
            row = iou_ref[:, pl.ds(base + j, 1), :]      # [B, 1, G]
            elig = (row >= thr) & (taken_ref[:] < 0.5)   # [B, T, G]
            cand = jnp.where(elig, row, NEG_ONE)
            mx = jnp.max(cand, axis=2, keepdims=True)    # [B, T, 1]
            matched = mx > NEG_ONE
            win = elig & (cand == mx)
            first = jnp.min(jnp.where(win, gt_idx, g), axis=2,
                            keepdims=True)
            take = matched & (gt_idx == first)
            taken_ref[:] = jnp.maximum(
                taken_ref[:], take.astype(jnp.float32)
            )
            sel = lane == j
            mblk = jnp.where(sel & matched, 1.0, mblk)
            bblk = jnp.where(sel, jnp.where(matched, first, -1), bblk)
            return mblk, bblk

        mblk, bblk = jax.lax.fori_loop(
            0, 128, inner,
            (jnp.zeros((b, t, 128), jnp.float32),
             jnp.full((b, t, 128), -1, jnp.int32)),
        )
        matched_ref[:, :, pl.ds(base, 128)] = mblk
        best_ref[:, :, pl.ds(base, 128)] = bblk
        return 0

    jax.lax.fori_loop(0, n // 128, outer, 0)


def greedy_scan_pallas_batched(
    iou_masked: Array,       # [B, N, G] f32, pre-masked
    thresholds: Array,       # [T] f32, all > 0
    interpret: bool | None = None,
) -> tuple[Array, Array]:
    """Batched greedy pass -> (matched [B, N, T] bool, best [B, N, T])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, g = iou_masked.shape
    n_pad = ((n + 127) // 128) * 128
    if n_pad != n:
        iou_masked = jnp.pad(iou_masked, ((0, 0), (0, n_pad - n), (0, 0)))
    t = thresholds.shape[0]
    thr_col = thresholds.astype(jnp.float32)[:, None]
    matched_btn, best_btn = pl.pallas_call(
        functools.partial(_kernel_batched, b=b, n=n_pad, g=g, t=t),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t, n_pad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((b, t, g), jnp.float32)],
        interpret=bool(interpret),
    )(iou_masked.astype(jnp.float32), thr_col)
    return (
        jnp.swapaxes(matched_btn, 1, 2)[:, :n] > 0.5,
        jnp.swapaxes(best_btn, 1, 2)[:, :n],
    )
