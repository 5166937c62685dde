"""Coverage for config variants: multi-threshold matching loss, bf16
model dtype, class-aware training, no-sort/no-sparse paths."""

import numpy as np
import jax
import jax.numpy as jnp

from gossipnet_tpu.config import (
    Config, DataConfig, LossConfig, MatchingConfig, ModelConfig, TrainConfig,
)
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.train import (
    batch_to_device, build_model, create_train_state, train_step,
)
from tests.conftest import random_boxes


def _run_steps(cfg, num_classes=1, steps=4):
    roidb = synthetic_roidb(num_images=8, seed=0, num_classes=num_classes)
    it = BatchIterator(roidb, cfg.train.batch_size, cfg.data.bucket_sizes,
                       seed=0)
    model = build_model(cfg)
    state = create_train_state(cfg, model, next(it))
    metrics = None
    for _ in range(steps):
        state, metrics = train_step(state, batch_to_device(next(it)), cfg)
    return state, metrics


def test_multi_threshold_matching_loss():
    """COCO 0.5:0.95 multi-threshold matching variant (paper §4)."""
    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        matching=MatchingConfig(
            thresholds=tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))
        ),
        train=TrainConfig(batch_size=4),
        data=DataConfig(bucket_sizes=(64,)),
    )
    _, metrics = _run_steps(cfg)
    assert np.isfinite(float(metrics["loss"]))


def test_class_aware_training():
    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16, num_classes=4),
        matching=MatchingConfig(class_aware=True),
        train=TrainConfig(batch_size=4),
        data=DataConfig(bucket_sizes=(64,)),
    )
    _, metrics = _run_steps(cfg, num_classes=4)
    assert np.isfinite(float(metrics["loss"]))


def test_bf16_model_dtype(rng):
    """cfg.model.dtype='bfloat16' forward runs and stays close to f32."""
    boxes = jnp.asarray(np.stack([random_boxes(rng, 48)]))
    scores = jnp.asarray(rng.uniform(0, 1, (1, 48)).astype(np.float32))
    valid = jnp.ones((1, 48), bool)
    cfg32 = ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                        pairwise_dim=16)
    cfg16 = ModelConfig(num_blocks=2, feature_dim=32, reduced_dim=16,
                        pairwise_dim=16, dtype="bfloat16")
    m32, m16 = GossipNet(cfg32), GossipNet(cfg16)
    params = m32.init(jax.random.key(0), boxes, scores, valid)["params"]
    out32 = np.asarray(m32.apply({"params": params}, boxes, scores, valid))
    out16 = np.asarray(m16.apply({"params": params}, boxes, scores, valid))
    scale = np.abs(out32).max() + 1e-9
    assert np.max(np.abs(out32 - out16)) / scale < 0.1


def test_no_sort_no_sparse_pallas_matches_default(rng):
    """Perf knobs off vs on: same function."""
    boxes = jnp.asarray(np.stack([random_boxes(rng, 64)]))
    scores = jnp.asarray(rng.uniform(0, 1, (1, 64)).astype(np.float32))
    valid = jnp.ones((1, 64), bool)
    base = ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                       pairwise_dim=16, pair_matmul_dtype="float32")
    off = ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                      pairwise_dim=16, pair_matmul_dtype="float32",
                      block_sparse=False, sort_detections=False)
    m_on = GossipNet(base, pool_impl="pallas")
    m_off = GossipNet(off, pool_impl="pallas")
    params = m_on.init(jax.random.key(0), boxes, scores, valid)["params"]
    a = np.asarray(m_on.apply({"params": params}, boxes, scores, valid))
    b = np.asarray(m_off.apply({"params": params}, boxes, scores, valid))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
