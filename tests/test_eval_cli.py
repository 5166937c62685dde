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
