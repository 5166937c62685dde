"""Evaluate CLI smoke test (config-1-style CPU-runnable slice)."""

import yaml

from gossipnet_tpu import evaluate as eval_mod


def test_evaluate_cli_smoke(tmp_path, capsys, monkeypatch):
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "model": {"num_blocks": 1, "feature_dim": 32, "reduced_dim": 16,
                  "pairwise_dim": 16},
        "data": {"dataset": "synthetic", "bucket_sizes": [64, 128]},
        "train": {"batch_size": 4, "checkpoint_dir": str(tmp_path / "none")},
    }))
    from gossipnet_tpu.data.synthetic import synthetic_roidb as real

    monkeypatch.setattr(
        "gossipnet_tpu.data.synthetic.synthetic_roidb",
        lambda num_images, seed, num_classes=1, **kw:
            real(num_images=6, seed=seed, num_classes=num_classes),
    )
    eval_mod.main(["-c", str(cfg_file), "--pool-impl", "dense"])
    out = capsys.readouterr().out
    assert '"gossipnet"' in out and '"raw_scores"' in out
    assert '"greedy_nms"' in out


def test_evaluate_cli_best_checkpoint(tmp_path, capsys, monkeypatch):
    """--best restores checkpoints/best (what serving loads); and it
    refuses loudly when no best checkpoint exists."""
    import numpy as np
    import pytest

    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.data.bucketing import make_batch
    from gossipnet_tpu.data.synthetic import synthetic_record
    from gossipnet_tpu.train import build_model, create_train_state
    from gossipnet_tpu.utils.checkpoint import CheckpointManager

    ck = tmp_path / "ck"
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(yaml.safe_dump({
        "model": {"num_blocks": 1, "feature_dim": 32, "reduced_dim": 16,
                  "pairwise_dim": 16},
        "data": {"dataset": "synthetic", "bucket_sizes": [64]},
        "train": {"batch_size": 4, "checkpoint_dir": str(ck)},
    }))
    cfg = load_config(str(cfg_file))
    sample = make_batch(
        [synthetic_record(np.random.default_rng(0), 0)], padded_n=64)
    state = create_train_state(cfg, build_model(cfg, "dense"), sample)
    mgr = CheckpointManager(str(ck))
    assert mgr.maybe_save_best(0.5, state)
    mgr.close()

    from gossipnet_tpu.data.synthetic import synthetic_roidb as real

    monkeypatch.setattr(
        "gossipnet_tpu.data.synthetic.synthetic_roidb",
        lambda num_images, seed, num_classes=1, **kw:
            real(num_images=4, seed=seed, num_classes=num_classes),
    )
    eval_mod.main(["-c", str(cfg_file), "--pool-impl", "dense", "--best"])
    out = capsys.readouterr().out
    assert "restored best-AP checkpoint" in out and '"gossipnet"' in out

    with pytest.raises(SystemExit, match="no best checkpoint"):
        eval_mod.main(["-c", str(cfg_file), "--pool-impl", "dense",
                       "--best", "--checkpoint-dir", str(tmp_path / "x")])
