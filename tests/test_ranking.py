"""Sort-based score rank: exact parity with the old O(N^2) formula, and
no [N, N] intermediate in the pallas-path forward (VERDICT r1 item 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gossipnet_tpu.ops.ranking import score_rank


def _rank_oracle(scores, valid, classes=None):
    """The round-1 O(N^2) broadcast formula, in numpy."""
    key = np.where(valid, scores, -np.inf)
    if classes is not None:
        peer = (classes[..., :, None] == classes[..., None, :]) \
            & valid[..., None, :]
    else:
        peer = np.broadcast_to(valid[..., None, :],
                               valid.shape + valid.shape[-1:])
    higher = (key[..., None, :] > key[..., :, None]) & peer
    rank = higher.sum(-1).astype(np.float32)
    denom = np.maximum(peer.sum(-1).astype(np.float32), 1.0)
    return rank / denom


@pytest.mark.parametrize("n,frac_valid", [(16, 1.0), (64, 0.6), (128, 0.0)])
def test_rank_agnostic_matches_oracle(rng, n, frac_valid):
    scores = rng.uniform(0, 1, size=(4, n)).astype(np.float32)
    valid = rng.uniform(size=(4, n)) < frac_valid
    got = np.asarray(score_rank(jnp.asarray(scores), jnp.asarray(valid)))
    np.testing.assert_allclose(got, _rank_oracle(scores, valid), atol=1e-6)


def test_rank_with_ties_matches_oracle(rng):
    """Tied scores (quantized) must count strictly-greater only."""
    scores = (rng.integers(0, 5, size=(3, 48)) / 5.0).astype(np.float32)
    valid = rng.uniform(size=(3, 48)) < 0.8
    got = np.asarray(score_rank(jnp.asarray(scores), jnp.asarray(valid)))
    np.testing.assert_allclose(got, _rank_oracle(scores, valid), atol=1e-6)


@pytest.mark.parametrize("num_classes", [1, 4, 17])
def test_rank_multiclass_matches_oracle(rng, num_classes):
    scores = (rng.integers(0, 9, size=(3, 96)) / 9.0).astype(np.float32)
    classes = rng.integers(0, num_classes, size=(3, 96)).astype(np.int32)
    valid = rng.uniform(size=(3, 96)) < 0.7
    got = np.asarray(score_rank(
        jnp.asarray(scores), jnp.asarray(valid), jnp.asarray(classes),
        num_classes=num_classes,
    ))
    np.testing.assert_allclose(
        got, _rank_oracle(scores, valid, classes), atol=1e-6)


def test_rank_padding_invariance(rng):
    """Appending padding never changes real detections' ranks."""
    scores = rng.uniform(0, 1, size=(2, 32)).astype(np.float32)
    valid = np.ones((2, 32), bool)
    base = np.asarray(score_rank(jnp.asarray(scores), jnp.asarray(valid)))
    scores_p = np.concatenate(
        [scores, rng.uniform(0, 1, size=(2, 16)).astype(np.float32)], -1)
    valid_p = np.concatenate([valid, np.zeros((2, 16), bool)], -1)
    padded = np.asarray(score_rank(jnp.asarray(scores_p),
                                   jnp.asarray(valid_p)))
    np.testing.assert_allclose(padded[:, :32], base, atol=1e-6)


def _collect_big_shapes(jaxpr, n, out):
    """Walk a jaxpr; record eqn primitives producing >= [n, n] outputs,
    skipping the interior of pallas_call (tiles by design)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            continue
        for var in eqn.outvars:
            shape = getattr(var.aval, "shape", ())
            if sum(1 for d in shape if d >= n) >= 2:
                out.append((eqn.primitive.name, shape))
        for param in eqn.params.values():
            inner = getattr(param, "jaxpr", None)
            if inner is not None:
                _collect_big_shapes(inner, n, out)


def test_no_nxn_tensor_outside_kernel_at_4096():
    """The pallas-path forward at N=4096 must stage NO tensor with two
    detection-sized axes outside pallas_call — the 'pair tensor never
    exists in HBM' design claim, now including the rank feature."""
    from gossipnet_tpu.config import ModelConfig
    from gossipnet_tpu.models.gossipnet import GossipNet

    n = 4096
    cfg = ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                      pairwise_dim=16)
    model = GossipNet(cfg, pool_impl="pallas")
    boxes = jnp.zeros((1, n, 4), jnp.float32)
    scores = jnp.zeros((1, n), jnp.float32)
    valid = jnp.ones((1, n), bool)
    params = jax.eval_shape(
        lambda: model.init(jax.random.key(0), boxes, scores, valid)
    )["params"]

    def fwd(params):
        return model.apply({"params": params}, boxes, scores, valid)

    jaxpr = jax.make_jaxpr(fwd)(params)
    offenders: list = []
    _collect_big_shapes(jaxpr.jaxpr, n, offenders)
    assert not offenders, offenders
