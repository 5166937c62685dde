"""Multi-device sharding tests on the 8-device CPU mesh (SURVEY.md §4.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, TrainConfig,
)
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.parallel.sharding import (
    make_mesh, make_sharded_grads, make_sharded_inference,
    make_sharded_train_step,
)
from gossipnet_tpu.parallel.spmd import gossipnet_sharded_forward
from gossipnet_tpu.train import (
    batch_to_device, build_model, create_train_state, make_optimizer,
    train_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 simulated devices"
)


def _cfg(**model_kw):
    model = dict(num_blocks=2, feature_dim=32, reduced_dim=16,
                 pairwise_dim=16, pair_matmul_dtype="float32")
    model.update(model_kw)
    return Config(
        model=ModelConfig(**model),
        train=TrainConfig(batch_size=8, learning_rate=1e-3, seed=0),
        data=DataConfig(bucket_sizes=(64, 128)),
    )


def _setup(cfg, n_images=16):
    roidb = synthetic_roidb(num_images=n_images, seed=0,
                            num_classes=cfg.model.num_classes)
    it = BatchIterator(roidb, cfg.train.batch_size, cfg.data.bucket_sizes,
                       seed=0)
    batch = next(it)
    model = build_model(cfg)
    state = create_train_state(cfg, model, batch)
    return model, state, batch_to_device(batch)


def test_sharded_forward_matches_module_single_shard():
    cfg = _cfg()
    model, state, arrays = _setup(cfg)
    ref = model.apply({"params": state.params}, arrays["boxes"],
                      arrays["scores"], arrays["valid"])
    got = gossipnet_sharded_forward(
        state.params, cfg.model, arrays["boxes"], arrays["scores"],
        arrays["valid"], num_shards=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_sharded_forward_matches_across_det_shards():
    """mesh (1, 2): row-sharded pair stage == unsharded forward."""
    cfg = _cfg()
    model, state, arrays = _setup(cfg)
    mesh = make_mesh(n_data=1, n_det=2, devices=jax.devices()[:2])
    fwd = make_sharded_inference(cfg, mesh, interpret=True)
    got = fwd(state.params, {k: arrays[k] for k in
                             ("boxes", "scores", "valid", "classes")})
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params}, arrays["boxes"], arrays["scores"],
        arrays["valid"],
    ))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_sharded_inference_dp_and_det():
    """Full 4x2 mesh: batch split over data, rows over det."""
    cfg = _cfg()
    model, state, arrays = _setup(cfg)
    mesh = make_mesh(n_data=4, n_det=2)
    fwd = make_sharded_inference(cfg, mesh, interpret=True)
    got = fwd(state.params, {k: arrays[k] for k in
                             ("boxes", "scores", "valid", "classes")})
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params}, arrays["boxes"], arrays["scores"],
        arrays["valid"],
    ))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_sharded_train_step_matches_local():
    """One SPMD step on a 2x2 mesh == one local (dense-path) step."""
    cfg = _cfg()
    model, state, arrays = _setup(cfg)
    mesh = make_mesh(n_data=2, n_det=2, devices=jax.devices()[:4])
    tx = make_optimizer(cfg)
    step_fn = make_sharded_train_step(cfg, mesh, tx, interpret=True)
    opt_state = tx.init(state.params)
    new_params, _, metrics = step_fn(state.params, opt_state, arrays)

    local_state, local_metrics = train_step(state, arrays, cfg)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(local_metrics["loss"]),
        rtol=1e-4,
    )
    flat_a, _ = jax.tree.flatten(new_params)
    flat_b, _ = jax.tree.flatten(local_state.params)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("n_data,n_det", [(1, 2), (2, 2), (4, 1)])
def test_sharded_raw_grads_match_local(n_data, n_det):
    """RAW gradients (pre-optimizer) under det-sharding == local grads.

    Guards the pmean-over-'det' closure (ADVICE r1, high): the all_gather
    transpose already sums cotangents across det ranks, so a psum there
    overscales every gradient by n_det — invisible to Adam (scale
    invariant) but wrong for SGD/adamw/grad-clip and the grad_norm
    metric. This test compares gradients, not Adam-updated params.
    """
    import jax

    from gossipnet_tpu.train import loss_and_metrics

    cfg = _cfg()
    model, state, arrays = _setup(cfg)
    mesh = make_mesh(n_data=n_data, n_det=n_det,
                     devices=jax.devices()[: n_data * n_det])
    grad_fn = make_sharded_grads(cfg, mesh, interpret=True)
    grads, metrics = grad_fn(state.params, arrays)

    def local_loss(p):
        loss, _ = loss_and_metrics(p, model.apply, arrays, cfg)
        return loss

    ref_grads = jax.grad(local_loss)(state.params)
    flat_a, _ = jax.tree.flatten(grads)
    flat_b, _ = jax.tree.flatten(ref_grads)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-6)


def test_sharded_forward_multiclass():
    cfg = _cfg(num_classes=4)
    model, state, arrays = _setup(cfg)
    mesh = make_mesh(n_data=2, n_det=2, devices=jax.devices()[:4])
    fwd = make_sharded_inference(cfg, mesh, interpret=True)
    got = fwd(state.params, {k: arrays[k] for k in
                             ("boxes", "scores", "valid", "classes")})
    ref = jax.nn.sigmoid(model.apply(
        {"params": state.params}, arrays["boxes"], arrays["scores"],
        arrays["valid"], arrays["classes"],
    ))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def test_mesh_eval_matches_single_device_eval():
    """evaluate_model through sharded_forward_fn on the 8-device mesh
    must reproduce the single-device eval stats exactly (VERDICT r2 #4:
    periodic train-time eval rides the training mesh)."""
    from gossipnet_tpu.evaluate import evaluate_model, sharded_forward_fn

    cfg = _cfg()
    roidb = synthetic_roidb(num_images=12, seed=7)
    model = build_model(cfg)
    it = BatchIterator(roidb, cfg.train.batch_size, cfg.data.bucket_sizes,
                       seed=0)
    state = create_train_state(cfg, model, next(it))

    local = evaluate_model(
        state.params, model, roidb,
        batch_size=cfg.train.batch_size, bucket_sizes=cfg.data.bucket_sizes)
    mesh = make_mesh(4, 2)
    fwd = sharded_forward_fn(cfg, mesh, state.params, interpret=True)
    sharded = evaluate_model(
        state.params, model, roidb,
        batch_size=cfg.train.batch_size, bucket_sizes=cfg.data.bucket_sizes,
        forward_fn=fwd)
    assert set(local) == set(sharded)
    for k in local:
        np.testing.assert_allclose(local[k], sharded[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
