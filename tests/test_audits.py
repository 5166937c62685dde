"""Cross-cutting audits (SURVEY.md §5 'race detection' rebuild note):
determinism, jit-vs-eager, padding invariance across shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, ParallelConfig, TrainConfig,
)
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.train import train
from tests.conftest import random_boxes


def test_training_is_deterministic(tmp_path):
    """Same seed + data -> bit-identical parameters across fresh runs."""
    def run(tag):
        cfg = Config(
            model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                              pairwise_dim=16),
            train=TrainConfig(batch_size=4, max_steps=8, seed=3,
                              log_every=100, snapshot_every=0, eval_every=0,
                              checkpoint_dir=str(tmp_path / tag)),
            data=DataConfig(bucket_sizes=(64,)),
            parallel=ParallelConfig(enable="off"),
        )
        return train(cfg, synthetic_roidb(num_images=8, seed=0)).params

    pa, pb = run("a"), run("b")
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("n,n_valid", [(32, 20), (96, 50), (130, 96)])
def test_padding_invariance_sweep(rng, n, n_valid):
    """Logits of real detections identical for any amount of padding."""
    cfg = ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                      pairwise_dim=16)
    model = GossipNet(cfg)
    boxes = np.zeros((1, n, 4), np.float32)
    boxes[0, :n_valid] = random_boxes(rng, n_valid)
    scores = np.zeros((1, n), np.float32)
    scores[0, :n_valid] = rng.uniform(0.1, 1, n_valid)
    valid = np.zeros((1, n), bool)
    valid[0, :n_valid] = True
    params = model.init(jax.random.key(0), jnp.asarray(boxes),
                        jnp.asarray(scores), jnp.asarray(valid))["params"]
    full = model.apply({"params": params}, jnp.asarray(boxes),
                       jnp.asarray(scores), jnp.asarray(valid))
    tight = model.apply(
        {"params": params},
        jnp.asarray(boxes[:, :n_valid]), jnp.asarray(scores[:, :n_valid]),
        jnp.asarray(valid[:, :n_valid]),
    )
    np.testing.assert_allclose(
        np.asarray(full[:, :n_valid]), np.asarray(tight),
        rtol=5e-4, atol=5e-5,
    )


def test_batch_invariance(rng):
    """An image's logits don't depend on its batch neighbors."""
    cfg = ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                      pairwise_dim=16)
    model = GossipNet(cfg)
    b1 = np.stack([random_boxes(rng, 40) for _ in range(3)])
    scores = rng.uniform(0.1, 1, (3, 40)).astype(np.float32)
    valid = np.ones((3, 40), bool)
    params = model.init(jax.random.key(0), jnp.asarray(b1),
                        jnp.asarray(scores), jnp.asarray(valid))["params"]
    batched = model.apply({"params": params}, jnp.asarray(b1),
                          jnp.asarray(scores), jnp.asarray(valid))
    solo = model.apply({"params": params}, jnp.asarray(b1[1:2]),
                       jnp.asarray(scores[1:2]), jnp.asarray(valid[1:2]))
    np.testing.assert_allclose(np.asarray(batched[1:2]), np.asarray(solo),
                               rtol=1e-5, atol=1e-6)
