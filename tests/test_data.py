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
