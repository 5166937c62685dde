"""Model tests: shapes, padding invariance, jit parity (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.models.gossipnet import GossipNet, PAD_LOGIT
from tests.conftest import random_boxes


def _batch(rng, b=2, n=64, n_valid=None, num_classes=1):
    boxes = np.stack([random_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0.01, 1.0, size=(b, n)).astype(np.float32)
    valid = np.ones((b, n), bool)
    if n_valid is not None:
        valid[:, n_valid:] = False
    classes = rng.integers(0, num_classes, size=(b, n))
    return (
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        jnp.asarray(classes),
    )


def _small_cfg(**kw):
    base = dict(num_blocks=2, feature_dim=32, reduced_dim=16, pairwise_dim=16)
    base.update(kw)
    return ModelConfig(**base)


def test_forward_shapes(rng):
    boxes, scores, valid, _ = _batch(rng)
    model = GossipNet(_small_cfg())
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    logits = model.apply({"params": params}, boxes, scores, valid)
    assert logits.shape == scores.shape
    assert np.isfinite(np.asarray(logits)).all()


def test_padding_gets_pad_logit_and_is_inert(rng):
    """Real detections' logits must not change when padding is appended."""
    b, n, n_valid = 2, 48, 32
    boxes, scores, valid, _ = _batch(rng, b=b, n=n, n_valid=n_valid)
    model = GossipNet(_small_cfg())
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    logits = model.apply({"params": params}, boxes, scores, valid)
    # padded entries pinned
    np.testing.assert_array_equal(np.asarray(logits[:, n_valid:]), PAD_LOGIT)
    # truncate padding entirely -> same logits for real dets
    logits_trunc = model.apply(
        {"params": params},
        boxes[:, :n_valid], scores[:, :n_valid], valid[:, :n_valid],
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, :n_valid]), np.asarray(logits_trunc),
        rtol=2e-4, atol=2e-5,
    )


def test_padding_content_irrelevant(rng):
    """Garbage in padded rows must not leak into real outputs."""
    b, n, n_valid = 1, 40, 24
    boxes, scores, valid, _ = _batch(rng, b=b, n=n, n_valid=n_valid)
    model = GossipNet(_small_cfg())
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    base = model.apply({"params": params}, boxes, scores, valid)
    boxes2 = boxes.at[:, n_valid:].set(
        jnp.asarray(random_boxes(np.random.default_rng(7), n - n_valid))
    )
    scores2 = scores.at[:, n_valid:].set(0.999)
    got = model.apply({"params": params}, boxes2, scores2, valid)
    np.testing.assert_allclose(
        np.asarray(base[:, :n_valid]), np.asarray(got[:, :n_valid]),
        rtol=1e-6,
    )


def test_multiclass_forward(rng):
    boxes, scores, valid, classes = _batch(rng, num_classes=5)
    model = GossipNet(_small_cfg(num_classes=5))
    params = model.init(jax.random.key(0), boxes, scores, valid, classes)[
        "params"
    ]
    logits = model.apply({"params": params}, boxes, scores, valid, classes)
    assert logits.shape == scores.shape
    assert np.isfinite(np.asarray(logits)).all()


def test_jit_matches_eager(rng):
    boxes, scores, valid, _ = _batch(rng, b=1, n=32)
    model = GossipNet(_small_cfg())
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    eager = model.apply({"params": params}, boxes, scores, valid)
    jitted = jax.jit(model.apply)({"params": params}, boxes, scores, valid)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=1e-5, atol=1e-6
    )


def test_gradients_flow(rng):
    """Every parameter receives a nonzero gradient on a generic input."""
    boxes, scores, valid, _ = _batch(rng, b=2, n=32)
    model = GossipNet(_small_cfg())
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, boxes, scores, valid)
        return jnp.sum(jax.nn.sigmoid(out) ** 2)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree.flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    nonzero = [float(jnp.max(jnp.abs(g))) > 0 for g in flat]
    assert all(nonzero), "some parameters got zero gradient"
