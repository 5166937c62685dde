"""ParallelConfig drives the FRAMEWORK path (train() / Rescorer), not
just library helpers — VERDICT r1 item 1.

All tests run on the simulated 8-device CPU mesh (tests/conftest.py).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, ParallelConfig, TrainConfig,
)
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.parallel.sharding import mesh_from_config
from gossipnet_tpu.train import train

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def _cfg(tmp_path, tag, parallel, max_steps=6, snapshot_every=0, **model_kw):
    model = dict(num_blocks=2, feature_dim=32, reduced_dim=16,
                 pairwise_dim=16, pair_matmul_dtype="float32")
    model.update(model_kw)
    return Config(
        model=ModelConfig(**model),
        train=TrainConfig(batch_size=4, learning_rate=1e-3,
                          max_steps=max_steps, log_every=1,
                          snapshot_every=snapshot_every, eval_every=0,
                          seed=0, checkpoint_dir=str(tmp_path / tag)),
        data=DataConfig(bucket_sizes=(64, 128)),
        parallel=parallel,
    )


def test_mesh_from_config_modes():
    cfg_off = Config(parallel=ParallelConfig(enable="off"))
    assert mesh_from_config(cfg_off) is None
    cfg_auto = Config(parallel=ParallelConfig(enable="auto"))
    # 8 devices visible, but they are CPU: 'auto' must NOT engage (the
    # sharded Pallas path would run interpret-mode at huge slowdown);
    # only accelerator fleets auto-mesh. 'on' remains explicit opt-in.
    assert mesh_from_config(cfg_auto) is None
    cfg_on = Config(parallel=ParallelConfig(enable="on", data_axis=2,
                                            det_axis=2))
    mesh = mesh_from_config(cfg_on)
    assert mesh.shape == {"data": 2, "det": 2}
    with pytest.raises(ValueError, match="auto|on|off"):
        mesh_from_config(Config(parallel=ParallelConfig(enable="maybe")))


def test_mesh_from_config_validation():
    bad_batch = Config(
        train=TrainConfig(batch_size=3),
        parallel=ParallelConfig(enable="on", data_axis=2),
    )
    with pytest.raises(ValueError, match="batch_size"):
        mesh_from_config(bad_batch)
    bad_bucket = Config(
        data=DataConfig(bucket_sizes=(100,)),
        parallel=ParallelConfig(enable="on", data_axis=1, det_axis=8),
    )
    with pytest.raises(ValueError, match="bucket"):
        mesh_from_config(bad_bucket)
    too_many = Config(parallel=ParallelConfig(enable="on", data_axis=16))
    with pytest.raises(ValueError, match="devices"):
        mesh_from_config(too_many)


def test_train_on_mesh_via_config(tmp_path):
    """The ONE-YAML-knob path: train() builds the (4, 2) mesh itself."""
    roidb = synthetic_roidb(num_images=16, seed=0)
    par = ParallelConfig(enable="on", data_axis=4, det_axis=2)
    cfg = _cfg(tmp_path, "mesh_run", par)
    state = train(cfg, roidb,
                  metrics_path=str(tmp_path / "mesh_metrics.jsonl"))
    assert int(state.step) == 6
    rows = [json.loads(l) for l in open(tmp_path / "mesh_metrics.jsonl")]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(v) for v in losses)

    # Off-mesh run on the same stream: same loss trajectory (pallas
    # interpret path vs dense differ only in float assoc, and matching
    # runs on identical logits) within loose tolerance.
    cfg_off = _cfg(tmp_path, "local_run", ParallelConfig(enable="off"))
    state_off = train(cfg_off, roidb,
                      metrics_path=str(tmp_path / "local_metrics.jsonl"))
    for x, y in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state_off.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-4)


def test_train_on_mesh_resume_bit_exact(tmp_path):
    """Snapshot + resume ON THE MESH PATH reproduces the straight run."""
    roidb = synthetic_roidb(num_images=16, seed=0)
    par = ParallelConfig(enable="on", data_axis=4, det_axis=2)

    cfg_a = _cfg(tmp_path, "mesh_straight", par, max_steps=6)
    state_a = train(cfg_a, roidb)

    cfg_b = _cfg(tmp_path, "mesh_resumed", par, max_steps=6,
                 snapshot_every=3)
    train(cfg_b, roidb, max_steps=3)
    state_b = train(cfg_b, roidb, max_steps=6)

    assert int(state_a.step) == int(state_b.step) == 6
    for x, y in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_rescorer_uses_mesh_and_matches_local():
    cfg = Config(
        model=ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16, pair_matmul_dtype="float32"),
        data=DataConfig(bucket_sizes=(64,)),
        parallel=ParallelConfig(enable="on", data_axis=4, det_axis=2),
    )
    rng = np.random.default_rng(0)
    from gossipnet_tpu.data.bucketing import make_batch
    from gossipnet_tpu.data.synthetic import synthetic_record
    from gossipnet_tpu.train import build_model, create_train_state

    sample = make_batch([synthetic_record(rng, 0)], padded_n=64)
    model = build_model(cfg)
    state = create_train_state(cfg, model, sample)

    images = []
    for i in range(5):   # 5 images: forces row padding to the data axis
        rec = synthetic_record(rng, i)
        images.append((rec.det_boxes, rec.det_scores, None))

    sharded = Rescorer(cfg, state.params, pool_impl="dense")
    assert sharded.mesh is not None and sharded.mesh.shape == {
        "data": 4, "det": 2}
    local = Rescorer(cfg, state.params, pool_impl="dense", mesh=None)
    got = sharded.rescore_batch(images)
    ref = local.rescore_batch(images)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_rescorer_multiclass_requires_classes():
    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16, num_classes=4),
        data=DataConfig(bucket_sizes=(64,)),
        parallel=ParallelConfig(enable="off"),
    )
    from gossipnet_tpu.data.bucketing import make_batch
    from gossipnet_tpu.data.synthetic import synthetic_record
    from gossipnet_tpu.train import build_model, create_train_state

    rng = np.random.default_rng(0)
    sample = make_batch([synthetic_record(rng, 0, num_classes=4)],
                        padded_n=64)
    model = build_model(cfg)
    state = create_train_state(cfg, model, sample)
    r = Rescorer(cfg, state.params, pool_impl="dense")
    rec = synthetic_record(rng, 1, num_classes=4)
    with pytest.raises(ValueError, match="class ids"):
        r.rescore_batch([(rec.det_boxes, rec.det_scores, None)])
    out = r.rescore_batch(
        [(rec.det_boxes, rec.det_scores, rec.det_classes)])
    assert out[0].shape == rec.det_scores.shape


def test_rescorer_oversize_raises_or_pads():
    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        data=DataConfig(bucket_sizes=(32,)),
        parallel=ParallelConfig(enable="off"),
    )
    from gossipnet_tpu.data.bucketing import make_batch
    from gossipnet_tpu.data.synthetic import synthetic_record
    from gossipnet_tpu.train import build_model, create_train_state

    rng = np.random.default_rng(0)
    sample = make_batch([synthetic_record(rng, 0)], padded_n=32)
    model = build_model(cfg)
    state = create_train_state(cfg, model, sample)
    r = Rescorer(cfg, state.params, pool_impl="dense")

    rec = synthetic_record(rng, 1, num_gt=8, dets_per_gt=6, num_clutter=8)
    n = len(rec.det_scores)
    assert n > 32
    with pytest.raises(ValueError, match="bucket"):
        r.rescore_batch([(rec.det_boxes, rec.det_scores, None)])
    out = r.rescore_batch([(rec.det_boxes, rec.det_scores, None)],
                          truncate=True)
    assert out[0].shape == (n,)          # aligned with the input order
    # Truncation is SCORE-RANKED (api.py Rescorer._pack): the top-32
    # detections by input score are rescored and scattered back to
    # their original positions; the dropped (lowest-score) ones read
    # exactly 0. Rescored values are sigmoids, never exactly 0.
    keep = np.argsort(-rec.det_scores, kind="stable")[:32]
    dropped = np.setdiff1d(np.arange(n), keep)
    assert np.all(out[0][dropped] == 0.0)
    assert np.all(out[0][keep] != 0.0)


def test_per_batch_normalize_refused_on_data_sharded_mesh():
    """loss.normalize='per_batch' pools weighting across the whole batch;
    a data-sharded mesh only sees its local shard, so the combination is
    refused instead of silently computing mesh-dependent gradients."""
    import optax

    from gossipnet_tpu.config import LossConfig
    from gossipnet_tpu.parallel.sharding import (
        make_mesh, make_sharded_train_step,
    )

    cfg = Config(loss=LossConfig(normalize="per_batch"))
    tx = optax.adam(1e-3)
    with pytest.raises(ValueError, match="per_batch"):
        make_sharded_train_step(cfg, make_mesh(n_data=4, n_det=2), tx)
    # det-only sharding keeps whole-batch semantics and is allowed.
    make_sharded_train_step(
        cfg, make_mesh(n_data=1, n_det=2, devices=jax.devices()[:2]), tx)
