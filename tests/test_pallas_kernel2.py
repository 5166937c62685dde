"""v2 packed-layout pair kernel parity vs the dense path
(ops/pallas/pairwise2.py; VERDICT r2 directive #1).

Interpreter mode on CPU; the same kernel compiles natively on TPU
(bench.py + the TPU-marked suite). Tolerances are slightly looser than
v1's: the separable-feature fold changes f32 summation order by design.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gossipnet_tpu.models.gossipnet import PairParams, pair_pool_dense
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise2 import (
    pallas_pair_pool_rect_v2,
    pallas_pair_pool_v2,
)
from tests.test_pallas_kernel import NEIGHBOR_IOU, P, _params, _problem

RTOL, ATOL = 1e-4, 1e-4


def _both(boxes, scores, valid, classes, params, **kw):
    cols = pf.det_columns(boxes, scores, valid)
    b, n = scores.shape
    p = params.wa.shape[1]
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, size=(b, n, p)).astype(np.float32))
    a = r @ params.wa + params.b1
    bb = r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU, classes=classes)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
    kernel = pallas_pair_pool_v2(
        pf.stack_columns(cols), a, bb, params, NEIGHBOR_IOU,
        classes=classes, interpret=True, compute_dtype="float32", **kw)
    return dense, kernel, (cols, a, bb)


def test_v2_forward_parity(rng):
    boxes, scores, valid, _ = _problem(rng)
    dense, kernel, _ = _both(boxes, scores, valid, None, _params(rng))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(kernel),
                               rtol=RTOL, atol=ATOL)


def test_v2_forward_parity_padding_and_odd_n(rng):
    boxes, scores, valid, _ = _problem(rng, b=1, n=101, n_valid=67)
    dense, kernel, _ = _both(boxes, scores, valid, None, _params(rng))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(kernel),
                               rtol=RTOL, atol=ATOL)


def test_v2_forward_parity_multiclass(rng):
    boxes, scores, valid, classes = _problem(rng, num_classes=4)
    params = _params(rng, num_features=pf.NUM_PAIR_FEATURES_MC)
    dense, kernel, _ = _both(boxes, scores, valid, classes, params)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(kernel),
                               rtol=RTOL, atol=ATOL)


def test_v2_multiple_tiles_and_pack4(rng):
    """Several tiles exercises the streaming max; pack=4 the non-default
    sublane packing (explicit tile path in _masked_relu)."""
    boxes, scores, valid, _ = _problem(rng, b=1, n=96)
    params = _params(rng)
    for pack in (8, 4):
        dense, kernel, _ = _both(boxes, scores, valid, None, params,
                                 tile=32, pack=pack)
        np.testing.assert_allclose(np.asarray(dense), np.asarray(kernel),
                                   rtol=RTOL, atol=ATOL, err_msg=f"pk={pack}")


def test_v2_block_sparse_exact(rng):
    """Tile skipping is exact: sparse == dense-tiles bitwise."""
    boxes, scores, valid, _ = _problem(rng, b=2, n=96)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (2, 96, P)).astype(np.float32))
    a, bb = r @ params.wa + params.b1, r @ params.wb
    m_sp = pallas_pair_pool_v2(cs, a, bb, params, NEIGHBOR_IOU, tile=32,
                               interpret=True, compute_dtype="float32",
                               block_sparse=True)
    m_ns = pallas_pair_pool_v2(cs, a, bb, params, NEIGHBOR_IOU, tile=32,
                               interpret=True, compute_dtype="float32",
                               block_sparse=False)
    np.testing.assert_array_equal(np.asarray(m_sp), np.asarray(m_ns))


def test_v2_gradient_parity(rng):
    """Full VJP vs the dense path's autodiff: a, b, and every pair
    parameter (wg assembles from the fold matmuls + kernel cotangents)."""
    boxes, scores, valid, _ = _problem(rng, b=2, n=64)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (2, 64, P)).astype(np.float32))
    a, bb = r @ params.wa + params.b1, r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)

    def loss_dense(a, bb, prm):
        m = pair_pool_dense(a, bb, prm.wg, prm.w2, prm.b2, g, mask)
        return jnp.sum(jnp.sin(m * 0.7))

    def loss_v2(a, bb, prm):
        m = pallas_pair_pool_v2(cs, a, bb, prm, NEIGHBOR_IOU,
                                interpret=True, compute_dtype="float32")
        return jnp.sum(jnp.sin(m * 0.7))

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(a, bb, params)
    gv = jax.grad(loss_v2, argnums=(0, 1, 2))(a, bb, params)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(gv[0]),
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd[1]), np.asarray(gv[1]),
                               rtol=5e-3, atol=1e-4)
    for f in gd[2]._fields:
        x, y = np.asarray(getattr(gd[2], f)), np.asarray(getattr(gv[2], f))
        sc = max(1.0, np.abs(x).max())
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=5e-3 * sc,
                                   err_msg=f)


def test_v2_gradient_multiclass_and_bwd_tile(rng):
    """MC grads + backward-tile independence (packing is a permutation;
    weight grads differ only by f32 summation order)."""
    boxes, scores, valid, classes = _problem(rng, b=1, n=64, num_classes=3)
    params = _params(rng, num_features=pf.NUM_PAIR_FEATURES_MC)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (1, 64, P)).astype(np.float32))
    a, bb = r @ params.wa + params.b1, r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU, classes=classes)

    def loss_dense(prm):
        m = pair_pool_dense(a, bb, prm.wg, prm.w2, prm.b2, g, mask)
        return jnp.sum(jnp.cos(m))

    def loss_v2(prm, bt):
        m = pallas_pair_pool_v2(cs, a, bb, prm, NEIGHBOR_IOU,
                                classes=classes, interpret=True,
                                compute_dtype="float32", tile=32,
                                bwd_tile_i=bt)
        return jnp.sum(jnp.cos(m))

    gd = jax.grad(loss_dense)(params)
    gv = jax.grad(lambda p: loss_v2(p, None))(params)
    gv16 = jax.grad(lambda p: loss_v2(p, 16))(params)
    for f in gd._fields:
        x = np.asarray(getattr(gd, f))
        sc = max(1.0, np.abs(x).max())
        np.testing.assert_allclose(x, np.asarray(getattr(gv, f)),
                                   rtol=5e-3, atol=5e-3 * sc, err_msg=f)
        np.testing.assert_allclose(
            np.asarray(getattr(gv, f)), np.asarray(getattr(gv16, f)),
            rtol=1e-5, atol=1e-5 * sc, err_msg=f"bwd-tile {f}")


def test_v2_rect_parity(rng):
    """Rectangular (detection-sharded) form: rows = a slice of cols."""
    boxes, scores, valid, _ = _problem(rng, b=2, n=64)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (2, 64, P)).astype(np.float32))
    a, bb = r @ params.wa + params.b1, r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)
    nr = 40
    m_rect = pallas_pair_pool_rect_v2(
        cs[:, :, :nr], cs, a[:, :nr], bb, params, NEIGHBOR_IOU,
        interpret=True, compute_dtype="float32")
    np.testing.assert_allclose(np.asarray(dense[:, :nr]),
                               np.asarray(m_rect), rtol=RTOL, atol=ATOL)


def test_v2_model_forward_matches_dense(rng):
    """Full GossipNet with pair_kernel=2 vs the dense model path."""
    from gossipnet_tpu.config import ModelConfig
    from gossipnet_tpu.models.gossipnet import GossipNet

    boxes, scores, valid, _ = _problem(rng, b=2, n=48)
    mc = ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                     pairwise_dim=16, pair_matmul_dtype="float32",
                     pair_kernel=2)
    dense = GossipNet(mc, pool_impl="dense")
    pallas = GossipNet(mc, pool_impl="pallas")
    params = dense.init(jax.random.key(0), boxes, scores, valid)["params"]
    out_d = dense.apply({"params": params}, boxes, scores, valid)
    out_p = pallas.apply({"params": params}, boxes, scores, valid)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_p),
                               rtol=2e-4, atol=2e-4)


def test_v2_bf16_elementwise_parity(rng):
    """bf16 streamed-tensor path (pair_elementwise_dtype) vs the f32
    dense oracle: bf16-level tolerance on the forward, and finite grads
    within bf16 tolerance of the f32-elementwise kernel (the win-mask
    equality must survive the dtype change — a broken equality zeroes
    grads, which this would catch)."""
    boxes, scores, valid, _ = _problem(rng, b=2, n=64)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    r = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (2, 64, P)).astype(np.float32))
    a, bb = r @ params.wa + params.b1, r @ params.wb
    g, mask = pf.dense_pair_tensor(cols, NEIGHBOR_IOU)
    dense = pair_pool_dense(a, bb, params.wg, params.w2, params.b2, g, mask)

    def pool(ew):
        return pallas_pair_pool_v2(
            cs, a, bb, params, NEIGHBOR_IOU, interpret=True,
            compute_dtype="bfloat16", elementwise_dtype=ew)

    out_bf = pool("bfloat16")
    assert out_bf.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(dense))) + 1e-9
    rel = float(jnp.max(jnp.abs(out_bf - dense))) / scale
    assert rel < 3e-2, f"bf16-ew forward rel err {rel:.3e}"

    def loss(prm, ew):
        m = pallas_pair_pool_v2(cs, a, bb, prm, NEIGHBOR_IOU,
                                interpret=True, compute_dtype="bfloat16",
                                elementwise_dtype=ew)
        return jnp.sum(jnp.sin(m * 0.7))

    g32 = jax.grad(loss)(params, "float32")
    gbf = jax.grad(loss)(params, "bfloat16")
    # bf16 rounding can legitimately FLIP individual max winners (ties
    # resolve differently at coarser precision), moving grad mass
    # between entries — so compare in aggregate, not elementwise. The
    # regression this must catch is a broken win-mask equality, which
    # zeroes the kernel-side grads entirely.
    for f in g32._fields:
        x, y = np.asarray(getattr(g32, f)), np.asarray(getattr(gbf, f))
        assert np.isfinite(y).all(), f
        nx = np.linalg.norm(x)
        rel = np.linalg.norm(x - y) / (nx + 1e-9)
        assert rel < 0.15, f"{f}: grad L2 rel err {rel:.3e}"
        if nx > 1e-3:
            assert np.linalg.norm(y) > 0.1 * nx, f"{f}: grads collapsed"


def test_v2_bf16_elementwise_requires_bf16_dots(rng):
    """f32 dots + bf16 elementwise is refused (would silently discard
    the f32 precision the config asked for); config load enforces the
    same combination."""
    import pytest

    from gossipnet_tpu.config import Config, ModelConfig, validate_config

    boxes, scores, valid, _ = _problem(rng, b=1, n=16)
    params = _params(rng)
    cols = pf.det_columns(boxes, scores, valid)
    cs = pf.stack_columns(cols)
    a = jnp.zeros((1, 16, P)); bb = jnp.zeros((1, 16, P))
    with pytest.raises(ValueError, match="bfloat16"):
        pallas_pair_pool_v2(cs, a, bb, params, NEIGHBOR_IOU,
                            interpret=True, compute_dtype="float32",
                            elementwise_dtype="bfloat16")
    with pytest.raises(ValueError, match="bfloat16"):
        validate_config(Config(model=ModelConfig(
            pair_matmul_dtype="float32",
            pair_elementwise_dtype="bfloat16")))
    with pytest.raises(ValueError, match="pair_elementwise_dtype"):
        validate_config(Config(model=ModelConfig(
            pair_elementwise_dtype="float16")))
