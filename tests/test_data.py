"""Data pipeline tests: bucketing, batching, iterator determinism."""

import numpy as np

from gossipnet_tpu.data.bucketing import (
    BatchIterator, bucket_for, eval_batches, make_batch,
)
from gossipnet_tpu.data.synthetic import synthetic_roidb


def test_bucket_selection():
    sizes = (256, 512, 1024)
    assert bucket_for(1, sizes) == 256
    assert bucket_for(256, sizes) == 256
    assert bucket_for(257, sizes) == 512
    assert bucket_for(5000, sizes) == 1024  # capped


def test_make_batch_padding():
    roidb = synthetic_roidb(num_images=3, seed=0)
    recs = roidb.records
    batch = make_batch(recs, padded_n=128)
    assert batch.boxes.shape == (3, 128, 4)
    for i, r in enumerate(recs):
        n = r.num_dets
        assert batch.valid[i, :n].all() and not batch.valid[i, n:].any()
        np.testing.assert_array_equal(batch.boxes[i, :n], r.det_boxes)
        g = len(r.gt_classes)
        assert batch.gt_valid[i, :g].all() and not batch.gt_valid[i, g:].any()


def test_iterator_deterministic_and_resumable():
    roidb = synthetic_roidb(num_images=20, seed=0)
    kw = dict(batch_size=4, bucket_sizes=(64, 128), seed=3)
    a = BatchIterator(roidb, **kw)
    seq_a = [next(a).image_ids.tolist() for _ in range(12)]

    # replay from scratch -> identical stream
    b = BatchIterator(roidb, **kw)
    seq_b = [next(b).image_ids.tolist() for _ in range(12)]
    assert seq_a == seq_b

    # resume from saved state mid-stream
    c = BatchIterator(roidb, **kw)
    for _ in range(5):
        next(c)
    saved = c.get_state()
    tail_c = [next(c).image_ids.tolist() for _ in range(7)]
    d = BatchIterator(roidb, **kw)
    d.set_state(saved)
    tail_d = [next(d).image_ids.tolist() for _ in range(7)]
    assert tail_c == tail_d


def test_epoch_covers_all_images():
    roidb = synthetic_roidb(num_images=17, seed=0)
    it = BatchIterator(roidb, batch_size=4, bucket_sizes=(64,), seed=0)
    seen = set()
    # one epoch = ceil(17/4)=5 batches (last repeat-padded)
    for _ in range(5):
        seen.update(next(it).image_ids.tolist())
    assert seen == {r.image_id for r in roidb.records}


def test_eval_batches_cover_once():
    roidb = synthetic_roidb(num_images=10, seed=0)
    ids = []
    for b in eval_batches(roidb, batch_size=4, bucket_sizes=(64, 128)):
        ids.extend(b.image_ids.tolist())
    # all images present; duplicates only from tail padding
    assert {r.image_id for r in roidb.records} <= set(ids)


def test_score_corr_zero_is_bitwise_default():
    """score_corr=0.0 must reproduce the historical generator
    BIT-FOR-BIT (VERDICT r4 #3): same rng draw sequence, and
    0*iou + 1*noise == noise exactly — every quality margin measured
    before the knob existed stays valid for the default."""
    from gossipnet_tpu.data.synthetic import synthetic_record

    a = synthetic_record(np.random.default_rng(7), 0, num_gt=12,
                         dets_per_gt=5, num_clutter=9, num_classes=3)
    b = synthetic_record(np.random.default_rng(7), 0, num_gt=12,
                         dets_per_gt=5, num_clutter=9, num_classes=3,
                         score_corr=0.0)
    assert (a.det_scores == b.det_scores).all()
    assert (a.det_boxes == b.det_boxes).all()
    assert (a.det_classes == b.det_classes).all()
    assert (a.gt_boxes == b.gt_boxes).all()


def test_score_corr_controls_score_quality_correlation():
    """Raising score_corr must raise the corr(score, maxIoU-vs-GT):
    ~0 at the default, strongly positive at 0.8 — the knob that moves
    the generator from the maximally-rescoring-favorable regime toward
    a realistic detector whose raw ranking is informative."""
    from gossipnet_tpu.data.synthetic import (_iou_one_many,
                                              synthetic_record)

    def corr(alpha):
        rec = synthetic_record(np.random.default_rng(0), 0, num_gt=20,
                               dets_per_gt=6, num_clutter=20,
                               score_corr=alpha)
        q = np.array([_iou_one_many(b, rec.gt_boxes)
                      for b in rec.det_boxes])
        return np.corrcoef(rec.det_scores, q)[0, 1]

    assert abs(corr(0.0)) < 0.3
    assert corr(0.5) > 0.5
    assert corr(0.8) > 0.9
