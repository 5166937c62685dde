"""Edge cases: images with no GT, no detections, single detection."""

import numpy as np
import jax.numpy as jnp

from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import make_batch
from gossipnet_tpu.data.roidb import ImageRecord
from gossipnet_tpu.data.synthetic import synthetic_record
from gossipnet_tpu.train import (
    batch_to_device, build_model, create_train_state, train_step,
)


def _record_no_gt(rng, image_id):
    rec = synthetic_record(rng, image_id, num_gt=4, dets_per_gt=5,
                           num_clutter=6)
    return ImageRecord(
        image_id=rec.image_id, det_boxes=rec.det_boxes,
        det_scores=rec.det_scores, det_classes=rec.det_classes,
        gt_boxes=np.zeros((0, 4), np.float32),
        gt_classes=np.zeros(0, np.int32), gt_crowd=np.zeros(0, bool),
    )


def _record_no_dets(image_id):
    return ImageRecord(
        image_id=image_id,
        det_boxes=np.zeros((0, 4), np.float32),
        det_scores=np.zeros(0, np.float32),
        det_classes=np.zeros(0, np.int32),
        gt_boxes=np.asarray([[0, 0, 50, 50]], np.float32),
        gt_classes=np.zeros(1, np.int32),
        gt_crowd=np.zeros(1, bool),
    )


def _record_single_det(rng, image_id):
    rec = synthetic_record(rng, image_id, num_gt=1, dets_per_gt=1,
                           num_clutter=0)
    return rec


def test_train_step_with_degenerate_images():
    """A batch mixing no-GT, no-det, and 1-det images trains finitely."""
    rng = np.random.default_rng(0)
    records = [
        _record_no_gt(rng, 0),
        _record_no_dets(1),
        _record_single_det(rng, 2),
        synthetic_record(rng, 3),
    ]
    batch = make_batch(records, padded_n=128)
    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16),
        train=TrainConfig(batch_size=4),
        data=DataConfig(bucket_sizes=(128,)),
    )
    model = build_model(cfg)
    state = create_train_state(cfg, model, batch)
    arrays = batch_to_device(batch)
    import jax

    for _ in range(3):
        state, metrics = train_step(state, arrays, cfg)
        assert np.isfinite(float(metrics["loss"])), metrics
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(state.params))


def test_forward_with_all_padding_image():
    """An entirely-invalid image inside a batch yields PAD_LOGITs."""
    import jax

    from gossipnet_tpu.models.gossipnet import GossipNet, PAD_LOGIT

    rng = np.random.default_rng(0)
    rec = synthetic_record(rng, 0)
    batch = make_batch([rec], padded_n=64)
    boxes = jnp.asarray(np.concatenate(
        [batch.boxes, np.zeros_like(batch.boxes)]))
    scores = jnp.asarray(np.concatenate(
        [batch.scores, np.zeros_like(batch.scores)]))
    valid = jnp.asarray(np.concatenate(
        [batch.valid, np.zeros_like(batch.valid)]))
    model = GossipNet(ModelConfig(num_blocks=1, feature_dim=32,
                                  reduced_dim=16, pairwise_dim=16))
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    out = np.asarray(model.apply({"params": params}, boxes, scores, valid))
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[1], PAD_LOGIT)
