"""Scanned multi-step training: parity with single-step training."""

import numpy as np
import jax
import pytest

from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, ParallelConfig, TrainConfig,
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
        parallel=ParallelConfig(enable="off"),
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


def test_tail_flush_trains_every_batch(tmp_path):
    """max_steps not divisible by spc: the queued tail still trains.

    Pre-fix, batches drawn into a partially-filled queue at max_steps
    were silently dropped (trained steps < max_steps and the saved
    iterator state claimed they had trained). With a single bucket the
    stream order is identical, so spc=8 must bit-match spc=1.
    """
    roidb = synthetic_roidb(num_images=16, seed=0)
    s1 = train(_cfg(tmp_path, 1, max_steps=10), roidb)
    s8 = train(_cfg(tmp_path, 8, max_steps=10), roidb)
    assert int(s1.step) == int(s8.step) == 10
    fa, _ = jax.tree.flatten(s1.params)
    fb, _ = jax.tree.flatten(s8.params)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


def test_scanned_mixed_gt_padding(tmp_path):
    """Batches in one detection bucket but different padded_g must not
    crash the scanned path (queues key on BOTH padded shapes).

    Images alternate 4 vs 20 GT boxes -> padded_g 16 vs 32 within the
    same 256-detection bucket; np.stack across them raised ValueError
    before the fix (COCO images routinely exceed 16 GTs).
    """
    from gossipnet_tpu.data.roidb import Roidb
    from gossipnet_tpu.data.synthetic import synthetic_record

    rng = np.random.default_rng(0)
    records = [
        synthetic_record(rng, image_id=i, num_gt=(20 if i % 2 else 4))
        for i in range(8)
    ]
    roidb = Roidb(records=records, class_names=["class_0"], cat_ids=[1])
    gs = {len(r.gt_classes) for r in records}
    assert gs == {4, 20}

    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        train=TrainConfig(
            batch_size=2, learning_rate=1e-3, max_steps=8,
            steps_per_call=2, log_every=1000, snapshot_every=0,
            eval_every=0, seed=0,
            checkpoint_dir=str(tmp_path / "ck_mixed"),
        ),
        data=DataConfig(bucket_sizes=(256,)),
        parallel=ParallelConfig(enable="off"),
    )
    state = train(cfg, roidb)
    assert int(state.step) == 8


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
