"""Pallas pair-pool kernel parity vs the dense path (SURVEY.md §4.2).

Runs in interpreter mode on the CPU test mesh; the same kernel compiles
natively on TPU (exercised by bench.py and the TPU-marked tests).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gossipnet_tpu.models.gossipnet import PairParams, pair_pool_dense
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise import pallas_pair_pool
from tests.conftest import random_boxes

P = 16
NEIGHBOR_IOU = 0.2


def _problem(rng, b=2, n=96, n_valid=None, clusters=True, num_classes=0):
    """Boxes with heavy overlap (clusters) so the neighbor graph is rich."""
    all_boxes = []
    for _ in range(b):
        if clusters:
            centers = random_boxes(rng, max(n // 6, 1), scale=200.0,
                                   min_size=20, max_size=60)
            idx = rng.integers(0, len(centers), size=n)
            jit = rng.normal(0, 6.0, size=(n, 4)).astype(np.float32)
            bx = centers[idx] + jit
            bx[:, 2:] = np.maximum(bx[:, 2:], bx[:, :2] + 1.0)
        else:
            bx = random_boxes(rng, n)
        all_boxes.append(bx)
    boxes = jnp.asarray(np.stack(all_boxes))
    scores = jnp.asarray(rng.uniform(0, 1, size=(b, n)).astype(np.float32))
    valid = np.ones((b, n), bool)
    if n_valid is not None:
        valid[:, n_valid:] = False
    valid = jnp.asarray(valid)
    classes = None
    if num_classes:
        classes = jnp.asarray(rng.integers(0, num_classes, size=(b, n)))
    return boxes, scores, valid, classes


def _params(rng, num_features=pf.NUM_PAIR_FEATURES, p=P):
    def w(*shape):
        return jnp.asarray(rng.normal(0, 0.5, size=shape).astype(np.float32))

    return PairParams(
        wa=w(p, p), wb=w(p, p), wg=w(num_features, p),
        b1=w(p), w2=w(p, p), b2=w(p),
    )


def _both_paths(boxes, scores, valid, classes, params):
    cols = pf.det_columns(boxes, scores, valid)
    b, n = scores.shape
    p = params.wa.shape[1]
    rng = np.random.default_rng(5)
    r = jnp.asarray(rng.normal(0, 1, size=(b, n, p)).astype(np.float32))
    a = r @ params.wa + params.b1
    bb = r @ params.wb

    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU, classes=classes)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)

    kernel = pallas_pair_pool(
        pf.stack_columns(cols), a, bb, params, NEIGHBOR_IOU,
        classes=classes, interpret=True, compute_dtype="float32",
    )
    return dense, kernel, (cols, a, bb, r)


def test_forward_parity(rng):
    boxes, scores, valid, _ = _problem(rng)
    dense, kernel, _ = _both_paths(boxes, scores, valid, None, _params(rng))
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(kernel), rtol=1e-5, atol=1e-5
    )


def test_forward_parity_with_padding(rng):
    """N not a tile multiple + invalid tail rows."""
    boxes, scores, valid, _ = _problem(rng, b=1, n=100, n_valid=70)
    dense, kernel, _ = _both_paths(boxes, scores, valid, None, _params(rng))
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(kernel), rtol=1e-5, atol=1e-5
    )


def test_forward_parity_multiclass(rng):
    boxes, scores, valid, classes = _problem(rng, num_classes=4)
    params = _params(rng, num_features=pf.NUM_PAIR_FEATURES_MC)
    dense, kernel, _ = _both_paths(boxes, scores, valid, classes, params)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(kernel), rtol=1e-5, atol=1e-5
    )


def test_forward_parity_multiple_tiles(rng):
    """N spanning several tiles exercises the streaming max accumulator."""
    boxes, scores, valid, _ = _problem(rng, b=1, n=96)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    r = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (1, 96, P)).astype(np.float32)
    )
    a = r @ params.wa + params.b1
    bb = r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
    kernel = pallas_pair_pool(
        pf.stack_columns(cols), a, bb, params, NEIGHBOR_IOU,
        tile=32, interpret=True, compute_dtype="float32",
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(kernel), rtol=1e-5, atol=1e-5
    )


def test_gradient_parity(rng):
    """Parameter + a/b gradients match the dense path's autodiff."""
    boxes, scores, valid, _ = _problem(rng, b=1, n=64)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    b, n = scores.shape
    r = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (b, n, P)).astype(np.float32)
    )
    cols_stacked = pf.stack_columns(cols)
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)

    def loss_dense(params, r):
        a = r @ params.wa + params.b1
        bb = r @ params.wb
        m = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
        return jnp.sum(jnp.sin(m))

    def loss_kernel(params, r):
        a = r @ params.wa + params.b1
        bb = r @ params.wb
        m = pallas_pair_pool(cols_stacked, a, bb, params, NEIGHBOR_IOU,
                             interpret=True, compute_dtype="float32")
        return jnp.sum(jnp.sin(m))

    gd = jax.grad(loss_dense, argnums=(0, 1))(params, r)
    gk = jax.grad(loss_kernel, argnums=(0, 1))(params, r)
    for name in PairParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gd[0], name)), np.asarray(getattr(gk[0], name)),
            rtol=2e-4, atol=2e-4, err_msg=f"grad mismatch: {name}",
        )
    np.testing.assert_allclose(
        np.asarray(gd[1]), np.asarray(gk[1]), rtol=2e-4, atol=2e-4,
        err_msg="grad mismatch: r",
    )


def test_model_dense_vs_pallas_forward(rng):
    """Full-model parity: GossipNet(pool_impl='pallas') == dense."""
    from gossipnet_tpu.config import ModelConfig
    from gossipnet_tpu.models.gossipnet import GossipNet

    boxes, scores, valid, _ = _problem(rng, b=2, n=64)
    cfg = ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                      pairwise_dim=16, pair_matmul_dtype="float32")
    dense_model = GossipNet(cfg, pool_impl="dense")
    pallas_model = GossipNet(cfg, pool_impl="pallas")
    params = dense_model.init(jax.random.key(0), boxes, scores, valid)[
        "params"
    ]
    out_d = dense_model.apply({"params": params}, boxes, scores, valid)
    out_p = pallas_model.apply({"params": params}, boxes, scores, valid)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=1e-4, atol=1e-4
    )


def test_forward_bf16_close_to_f32(rng):
    """bf16 matmul path (the perf default) stays close to f32."""
    boxes, scores, valid, _ = _problem(rng)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    b, n = scores.shape
    r = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (b, n, P)).astype(np.float32)
    )
    a = r @ params.wa + params.b1
    bb = r @ params.wb
    cs = pf.stack_columns(cols)
    f32 = pallas_pair_pool(cs, a, bb, params, NEIGHBOR_IOU,
                           interpret=True, compute_dtype="float32")
    bf16 = pallas_pair_pool(cs, a, bb, params, NEIGHBOR_IOU,
                            interpret=True, compute_dtype="bfloat16")
    scale = float(jnp.max(jnp.abs(f32))) + 1e-9
    rel = float(jnp.max(jnp.abs(f32 - bf16))) / scale
    assert rel < 3e-2, rel


def test_packed_dots_forward_and_grad_parity(rng):
    """spec.packed=True (kron block-diagonal MXU packing) must match the
    dense path bit-for-bit in f32 forward and to autodiff tolerance in
    gradients. Off by default (measured 8% slower on v5e) but kept
    correct for future tile/width configurations."""
    boxes, scores, valid, _ = _problem(rng, b=1, n=64)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    b, n = scores.shape
    cols_stacked = pf.stack_columns(cols)
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)

    def loss_dense(params, r):
        a = r @ params.wa + params.b1
        bb = r @ params.wb
        m = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
        return jnp.sum(jnp.sin(m)), m

    def loss_packed(params, r):
        a = r @ params.wa + params.b1
        bb = r @ params.wb
        m = pallas_pair_pool(cols_stacked, a, bb, params, NEIGHBOR_IOU,
                             interpret=True, compute_dtype="float32",
                             packed=True)
        return jnp.sum(jnp.sin(m)), m

    r = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (b, n, P)).astype(np.float32))
    (_, md), gd = jax.value_and_grad(loss_dense, argnums=(0, 1),
                                     has_aux=True)(params, r)
    (_, mk), gk = jax.value_and_grad(loss_packed, argnums=(0, 1),
                                     has_aux=True)(params, r)
    np.testing.assert_allclose(np.asarray(md), np.asarray(mk),
                               rtol=1e-5, atol=1e-5)
    for name in PairParams._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(gd[0], name)), np.asarray(getattr(gk[0], name)),
            rtol=2e-4, atol=2e-4, err_msg=f"packed grad mismatch: {name}")
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gk[1]),
                               rtol=2e-4, atol=2e-4)


def test_big_tile_inline_broadcast_parity(rng):
    """tile 256x256 at P=32 exceeds the 4MB scratch cap (PoolSpec.hoist_a
    False -> inline row broadcast; the hoisted variant OOMed v5e's scoped
    vmem at this shape). Both kernels must agree with the dense path."""
    from gossipnet_tpu.ops.pallas.pairwise import PoolSpec

    spec = PoolSpec(neighbor_iou=0.2, num_features=pf.NUM_PAIR_FEATURES,
                    p=32, ti=256, tj=256, interpret=True)
    assert not spec.hoist_a
    assert PoolSpec(neighbor_iou=0.2, num_features=pf.NUM_PAIR_FEATURES,
                    p=32, ti=128, tj=128, interpret=True).hoist_a

    boxes, scores, valid, _ = _problem(rng, b=1, n=256)
    params = _params(rng, p=32)
    cols = pf.det_columns(boxes, scores, valid)
    r = jnp.asarray(
        np.random.default_rng(5).normal(0, 1, (1, 256, 32)).astype(np.float32))
    a = r @ params.wa + params.b1
    bb = r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
    kernel = pallas_pair_pool(
        pf.stack_columns(cols), a, bb, params, NEIGHBOR_IOU,
        tile=256, interpret=True, compute_dtype="float32",
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(kernel), rtol=1e-5, atol=1e-5)
