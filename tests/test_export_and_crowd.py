"""Params NPZ export/import roundtrip + crowd (PETS-analog) data tests."""

import numpy as np
import jax

from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.data.synthetic import crowd_roidb
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.utils.export import load_params_npz, save_params_npz


def test_params_npz_roundtrip(tmp_path, rng):
    from tests.conftest import random_boxes
    import jax.numpy as jnp

    boxes = jnp.asarray(random_boxes(rng, 32)[None])
    scores = jnp.asarray(rng.uniform(0, 1, (1, 32)).astype(np.float32))
    valid = jnp.ones((1, 32), bool)
    model = GossipNet(ModelConfig(num_blocks=2, feature_dim=32,
                                  reduced_dim=16, pairwise_dim=16))
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    path = tmp_path / "params.npz"
    save_params_npz(path, params)
    loaded = load_params_npz(path)

    out_a = model.apply({"params": params}, boxes, scores, valid)
    out_b = model.apply({"params": loaded}, boxes, scores, valid)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_crowd_roidb_is_heavily_occluded():
    db = crowd_roidb(num_images=4, seed=0, num_people=25, occlusion=0.6)
    from tests.test_geometry import np_iou

    for rec in db.records[:2]:
        iou = np_iou(rec.gt_boxes, rec.gt_boxes)
        np.fill_diagonal(iou, 0.0)
        # every person overlaps some neighbor substantially
        assert (iou.max(axis=1) > 0.3).mean() > 0.8
        assert rec.num_dets >= 8 * len(rec.gt_boxes) * 0.9


def test_crowd_raw_scores_are_bad_baseline():
    """In the crowd regime, raw scores give terrible AP (many dups)."""
    from gossipnet_tpu.evaluate import evaluate_raw_scores

    db = crowd_roidb(num_images=8, seed=0)
    stats = evaluate_raw_scores(db)
    assert stats["AP"] < 0.5
