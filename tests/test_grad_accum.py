"""Gradient accumulation (train.grad_accum_steps / optax.MultiSteps):
k accumulated micro-batches must equal one big-batch step, params must
not move between update boundaries, and the knob must ride the scanned
and mesh train paths unchanged."""
import dataclasses

import jax
import numpy as np
import pytest

from gossipnet_tpu.config import (Config, DataConfig, LossConfig,
                                  MatchingConfig, ModelConfig,
                                  ParallelConfig, TrainConfig, load_config)
from gossipnet_tpu.data.bucketing import make_batch
from gossipnet_tpu.data.synthetic import synthetic_record
from gossipnet_tpu.train import (batch_to_device, build_model,
                                 create_train_state, train_step)


def _cfg(**train_kw):
    base = dict(optimizer="sgd", learning_rate=1e-2, lr_schedule="constant",
                batch_size=2, max_steps=8, seed=0, snapshot_every=0,
                eval_every=0, log_every=100)
    base.update(train_kw)
    return Config(
        model=ModelConfig(num_blocks=1, feature_dim=16, reduced_dim=8,
                          pairwise_dim=8, pair_matmul_dtype="float32"),
        matching=MatchingConfig(thresholds=(0.5,)),
        loss=LossConfig(normalize="per_image"),
        train=TrainConfig(**base),
        data=DataConfig(bucket_sizes=(64,)),
        parallel=ParallelConfig(enable="off"),
    )


def _batches(n_images, per_batch, n=64, seed=5):
    rng = np.random.default_rng(seed)
    recs = [synthetic_record(rng, i, num_gt=4, dets_per_gt=3, num_clutter=4)
            for i in range(n_images)]
    return [batch_to_device(make_batch(recs[i:i + per_batch], padded_n=n))
            for i in range(0, n_images, per_batch)]


def _flat(params):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(params)])


def test_accumulated_equals_big_batch():
    """SGD: 2 accumulated micro-batches of 2 == 1 step on the 4-image
    batch (per_image normalize makes the mean-of-means exact)."""
    cfg_acc = _cfg(grad_accum_steps=2)
    cfg_big = _cfg(batch_size=4)
    model = build_model(cfg_acc, "dense")

    micro = _batches(4, 2)
    big = _batches(4, 4)
    state_a = create_train_state(cfg_acc, model, _sample(cfg_acc))
    state_b = create_train_state(cfg_big, model, _sample(cfg_big))
    # identical init (same seed/model/shapes)
    np.testing.assert_array_equal(_flat(state_a.params),
                                  _flat(state_b.params))

    for b in micro:
        state_a, _ = train_step(state_a, b, cfg_acc)
    state_b, _ = train_step(state_b, big[0], cfg_big)
    np.testing.assert_allclose(_flat(state_a.params),
                               _flat(state_b.params), rtol=1e-5, atol=1e-7)


def _sample(cfg):
    rng = np.random.default_rng(0)
    recs = [synthetic_record(rng, i, num_gt=4, dets_per_gt=3, num_clutter=4)
            for i in range(cfg.train.batch_size)]
    return make_batch(recs, padded_n=64)


def test_params_frozen_between_boundaries():
    cfg = _cfg(grad_accum_steps=4)
    model = build_model(cfg, "dense")
    state = create_train_state(cfg, model, _sample(cfg))
    before = _flat(state.params)
    for i, b in enumerate(_batches(8, 2), start=1):
        state, _ = train_step(state, b, cfg)
        moved = not np.array_equal(_flat(state.params), before)
        assert moved == (i % 4 == 0), f"micro-step {i}: moved={moved}"
        if moved:
            before = _flat(state.params)


def test_schedule_horizon_scales():
    from gossipnet_tpu.train import make_lr_schedule

    cfg = _cfg(lr_schedule="cosine", max_steps=100, grad_accum_steps=4,
               learning_rate=1.0)
    sched = make_lr_schedule(cfg)
    # 100 micro-steps -> 25 updates; the cosine must be fully decayed
    # at update 25, not update 100.
    assert float(sched(25)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(12)) < 0.6


def test_train_loop_and_mesh_smoke(tmp_path):
    """grad_accum_steps rides train() (scanned path) and the 8-device
    mesh step without special-casing."""
    import optax

    from gossipnet_tpu.parallel.sharding import (make_mesh,
                                                 make_sharded_train_step)
    from gossipnet_tpu.train import make_optimizer, train
    from gossipnet_tpu.data.synthetic import synthetic_roidb

    cfg = _cfg(grad_accum_steps=2, max_steps=4, steps_per_call=2,
               checkpoint_dir=str(tmp_path / "ckpt"))
    db = synthetic_roidb(num_images=8, seed=0, num_gt=4, dets_per_gt=3,
                         num_clutter=4)
    state = train(cfg, db, pool_impl="dense")
    assert int(state.step) == 4

    mesh = make_mesh(4, 2)
    tx = make_optimizer(cfg)
    model = build_model(cfg, "dense")
    st = create_train_state(cfg, model, _sample(cfg))
    step = make_sharded_train_step(cfg, mesh, tx, interpret=True)
    opt_state = tx.init(st.params)
    arrays = _batches(4, 4)[0]   # batch must tile the data axis (4)
    params, opt_state, metrics = step(st.params, opt_state, arrays)
    assert np.isfinite(float(metrics["loss"]))
    # first micro-step of 2: params must be unchanged
    np.testing.assert_array_equal(_flat(params), _flat(st.params))


def test_config_validates_accum():
    with pytest.raises(ValueError, match="grad_accum_steps"):
        load_config(None, overrides={"train": {"grad_accum_steps": 0}})


def test_resume_mid_accumulation_window(tmp_path):
    """Checkpointing at a step where gradients are HALF-accumulated
    (grad_accum_steps=4, snapshot at step 6) must resume
    bit-reproducibly: the MultiSteps state (mini-step counter +
    accumulated grads) rides the checkpoint."""
    from gossipnet_tpu.data.synthetic import synthetic_roidb
    from gossipnet_tpu.train import train

    db = synthetic_roidb(num_images=16, seed=0, num_gt=4, dets_per_gt=3,
                         num_clutter=4)

    def cfg_for(ckpt, snap):
        return _cfg(grad_accum_steps=4, max_steps=12, snapshot_every=snap,
                    learning_rate=3e-3,
                    checkpoint_dir=str(tmp_path / ckpt))

    state_a = train(cfg_for("a", 0), db, pool_impl="dense", max_steps=12)

    cfg_b = cfg_for("b", 6)   # 6 % 4 != 0: mid-window snapshot
    train(cfg_b, db, pool_impl="dense", max_steps=6)
    state_b = train(cfg_b, db, pool_impl="dense", max_steps=12)

    la = _flat(state_a.params)
    lb = _flat(state_b.params)
    np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)


def test_step_schedule_boundaries_compound_on_collision():
    """lr_decay_steps that collide after the 1/k scaling must compound
    their decay factors, not silently drop one."""
    from gossipnet_tpu.train import make_lr_schedule

    cfg = _cfg(lr_schedule="step", learning_rate=1.0,
               lr_decay_steps=(1000, 1002), lr_decay_rate=0.1,
               grad_accum_steps=4)
    sched = make_lr_schedule(cfg)
    assert float(sched(249)) == pytest.approx(1.0)
    assert float(sched(251)) == pytest.approx(0.01)  # both decays applied
