"""Scanned multi-step training: parity with single-step training."""

import numpy as np
import jax
import pytest

from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import train


def _cfg(tmp_path, spc, max_steps=12, snapshot_every=0):
    return Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        train=TrainConfig(
            batch_size=4, learning_rate=1e-3, max_steps=max_steps,
            steps_per_call=spc, log_every=1000,
            snapshot_every=snapshot_every, eval_every=0, seed=0,
            checkpoint_dir=str(tmp_path / f"ck{spc}_{snapshot_every}"),
        ),
        data=DataConfig(bucket_sizes=(64,)),
    )


def test_scanned_matches_single(tmp_path):
    roidb = synthetic_roidb(num_images=16, seed=0)
    s1 = train(_cfg(tmp_path, 1), roidb)
    s4 = train(_cfg(tmp_path, 4), roidb)
    assert int(s1.step) == int(s4.step) == 12
    fa, ta = jax.tree.flatten(s1.params)
    fb, tb = jax.tree.flatten(s4.params)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_scanned_resume_reproducible(tmp_path):
    """spc=3 with snapshots: straight run == snapshot + resume."""
    roidb = synthetic_roidb(num_images=16, seed=0)

    cfg_a = _cfg(tmp_path, 3, max_steps=18, snapshot_every=0)
    state_a = train(cfg_a, roidb)

    cfg_b = _cfg(tmp_path, 3, max_steps=18, snapshot_every=9)
    train(cfg_b, roidb, max_steps=9)
    state_b = train(cfg_b, roidb, max_steps=18)

    fa, _ = jax.tree.flatten(state_a.params)
    fb, _ = jax.tree.flatten(state_b.params)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)
