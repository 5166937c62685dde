"""Training tests: loss sanity, learns-at-all, checkpoint resume
(SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gossipnet_tpu.config import (
    Config, DataConfig, LossConfig, MatchingConfig, ModelConfig,
    ParallelConfig, TrainConfig,
)
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.evaluate import evaluate_model, evaluate_raw_scores
from gossipnet_tpu.losses import detection_weights, weighted_logistic_loss
from gossipnet_tpu.ops.matching import MatchResult
from gossipnet_tpu.train import (
    batch_to_device, build_model, create_train_state, train, train_step,
)


def _tiny_cfg(tmp_path=None, **train_kw):
    base_train = dict(
        learning_rate=3e-3, batch_size=4, max_steps=120,
        log_every=1000, snapshot_every=0, eval_every=0, seed=0,
        checkpoint_dir=str(tmp_path / "ckpt") if tmp_path else "ckpt",
    )
    base_train.update(train_kw)
    return Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        matching=MatchingConfig(thresholds=(0.5,)),
        loss=LossConfig(),
        train=TrainConfig(**base_train),
        data=DataConfig(bucket_sizes=(64, 128)),
        parallel=ParallelConfig(enable="off"),
    )


def test_detection_weights_balanced():
    labels = jnp.asarray([[1.0, 0, 0, 0, 1, 0]])  # [T=1, N=6]
    ignore = jnp.asarray([[False] * 5 + [True]])
    w = detection_weights(labels, ignore, LossConfig())
    w = np.asarray(w[0])
    assert w[5] == 0.0                        # ignored
    assert np.isclose(w.sum(), 1.0)
    assert np.isclose(w[[0, 4]].sum(), 0.5)   # positives half the mass
    assert np.isclose(w[1:4].sum(), 0.5)      # negatives the other half


def test_loss_decreases_on_perfect_logits():
    labels = jnp.asarray([[1.0, 0, 1, 0]])
    ignore = jnp.zeros((1, 4), bool)
    match = MatchResult(labels=labels, ignore=ignore,
                        matched_gt=jnp.zeros((1, 4), jnp.int32))
    bad = jnp.asarray([-5.0, 5.0, -5.0, 5.0])
    good = jnp.asarray([5.0, -5.0, 5.0, -5.0])
    l_bad, _ = weighted_logistic_loss(bad, match, LossConfig())
    l_good, _ = weighted_logistic_loss(good, match, LossConfig())
    assert float(l_good) < 0.05 < float(l_bad)


def test_train_step_runs_and_loss_drops(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    roidb = synthetic_roidb(num_images=16, seed=0)
    it = BatchIterator(roidb, cfg.train.batch_size, cfg.data.bucket_sizes,
                       seed=0)
    model = build_model(cfg)
    state = create_train_state(cfg, model, next(it))
    batch = batch_to_device(next(it))
    losses = []
    for _ in range(30):
        state, m = train_step(state, batch, cfg)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


@pytest.mark.slow
def test_learns_to_beat_raw_scores(tmp_path):
    """The north-star smoke test (SURVEY.md §4.4): on synthetic clustered
    detections with IoU-uncorrelated scores, a briefly-trained GossipNet
    must beat raw-score AP."""
    cfg = _tiny_cfg(tmp_path, max_steps=150)
    roidb = synthetic_roidb(num_images=48, seed=0)
    val = synthetic_roidb(num_images=16, seed=99)
    state = train(cfg, roidb, pool_impl="dense", max_steps=150)
    model = build_model(cfg)
    ap_model = evaluate_model(
        state.params, model, val,
        batch_size=4, bucket_sizes=cfg.data.bucket_sizes,
    )["AP"]
    ap_raw = evaluate_raw_scores(val)["AP"]
    assert ap_model > ap_raw + 0.03, (ap_model, ap_raw)


def test_checkpoint_resume_reproduces_stream(tmp_path):
    """Train 40 steps straight vs 20 + resume + 20 -> identical params."""
    roidb = synthetic_roidb(num_images=16, seed=0)

    cfg_a = _tiny_cfg(tmp_path, max_steps=40, snapshot_every=0,
                      checkpoint_dir=str(tmp_path / "a"))
    state_a = train(cfg_a, roidb, max_steps=40)

    cfg_b = _tiny_cfg(tmp_path, max_steps=40, snapshot_every=20,
                      checkpoint_dir=str(tmp_path / "b"))
    train(cfg_b, roidb, max_steps=20)
    state_b = train(cfg_b, roidb, max_steps=40)  # resumes from step 20

    la, ta = jax.tree.flatten(state_a.params)
    lb, tb = jax.tree.flatten(state_b.params)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)


def test_preemption_stop_checkpoints_and_resumes_bit_exact(tmp_path):
    """A ``stop`` signal mid-run (the CLI's SIGTERM path) checkpoints
    cleanly — params + iterator cursor — and a rerun of the same config
    resumes to the SAME final params as an uninterrupted run."""
    roidb = synthetic_roidb(num_images=16, seed=0)

    cfg_a = _tiny_cfg(tmp_path, max_steps=24, snapshot_every=0,
                      checkpoint_dir=str(tmp_path / "a"))
    state_a = train(cfg_a, roidb, max_steps=24)

    # Interrupted arm: stop fires after a handful of drawn batches
    # (deterministic: the callable is polled once per batch), then the
    # SAME command runs again and must resume from the snapshot.
    cfg_b = _tiny_cfg(tmp_path, max_steps=24, snapshot_every=0,
                      checkpoint_dir=str(tmp_path / "b"))
    polls = iter(range(1000))
    state_mid = train(cfg_b, roidb, max_steps=24,
                      stop=lambda: next(polls) >= 9)
    mid_step = int(state_mid.step)
    assert 0 < mid_step < 24          # stopped early...
    from gossipnet_tpu.utils.checkpoint import CheckpointManager

    assert CheckpointManager(cfg_b.train.checkpoint_dir
                             ).latest_step() == mid_step  # ...with a save
    state_b = train(cfg_b, roidb, max_steps=24)   # plain rerun resumes
    assert int(state_b.step) == 24

    la, ta = jax.tree.flatten(state_a.params)
    lb, tb = jax.tree.flatten(state_b.params)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
