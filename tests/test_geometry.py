"""Unit tests for box geometry against pure-numpy oracles (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from gossipnet_tpu.ops import geometry
from tests.conftest import random_boxes


def np_iou(a, b):
    """O(N*M) loop oracle."""
    out = np.zeros((len(a), len(b)), np.float64)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix1, iy1 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix2, iy2 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            area_i = max(bi[2] - bi[0], 0) * max(bi[3] - bi[1], 0)
            area_j = max(bj[2] - bj[0], 0) * max(bj[3] - bj[1], 0)
            union = area_i + area_j - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_iou_matches_loop_oracle(rng):
    a = random_boxes(rng, 37)
    b = random_boxes(rng, 23)
    got = np.asarray(geometry.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np_iou(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_bounds_symmetry_diag(rng):
    a = random_boxes(rng, 50)
    iou = np.asarray(geometry.pairwise_iou(jnp.asarray(a), jnp.asarray(a)))
    assert (iou >= 0).all() and (iou <= 1 + 1e-6).all()
    np.testing.assert_allclose(iou, iou.T, rtol=1e-6)
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)


def test_degenerate_boxes_are_inert(rng):
    a = random_boxes(rng, 10)
    a[3] = 0.0                       # zero box
    a[7] = [50, 50, 50, 80]          # zero width
    iou = np.asarray(geometry.pairwise_iou(jnp.asarray(a), jnp.asarray(a)))
    assert (iou[3] == 0).all() and (iou[:, 3] == 0).all()
    assert (iou[7] == 0).all() and (iou[:, 7] == 0).all()
    assert not np.isnan(iou).any()


def test_iof_is_fraction_of_first_argument():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.asarray([[0.0, 0.0, 5.0, 10.0]])
    # Half of `a` is covered by b; all of b is inside a.
    assert np.isclose(float(geometry.pairwise_iof(a, b)[0, 0]), 0.5)
    assert np.isclose(float(geometry.pairwise_iof(b, a)[0, 0]), 1.0)


def test_xywh_roundtrip(rng):
    a = random_boxes(rng, 20)
    back = geometry.xywh_to_xyxy(geometry.xyxy_to_xywh(jnp.asarray(a)))
    np.testing.assert_allclose(np.asarray(back), a, rtol=1e-6)
