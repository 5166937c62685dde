"""The consolidated quality-demo script builds valid configs and data
for every family (the actual quality numbers are RESULTS.md's TPU runs;
this pins the configs those numbers are reproduced from)."""
import importlib.util
import pathlib

import pytest

_PATH = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "quality_demo.py"
spec = importlib.util.spec_from_file_location("quality_demo", str(_PATH))
qd = importlib.util.module_from_spec(spec)
spec.loader.exec_module(qd)


@pytest.mark.parametrize("family", sorted(qd.FAMILIES))
def test_family_config_and_data(family, tmp_path):
    steps = 2400 if family == "long" else 600
    cfg = qd.family_config(family, steps, str(tmp_path / family))
    assert cfg.train.max_steps == steps
    assert cfg.data.bucket_sizes == (512,)
    # multiclass family must flip both the model width and the matcher
    maker, mk, _, _ = qd.FAMILIES[family]
    if mk.get("num_classes", 1) > 1:
        assert cfg.model.num_classes == mk["num_classes"]
        assert cfg.matching.class_aware
    else:
        assert cfg.model.num_classes == 1
        assert not cfg.matching.class_aware
    # the data maker produces a non-empty seeded roidb at the pinned knobs
    db = maker(num_images=2, seed=0, **mk)
    assert len(db) == 2
    rec = db.records[0]
    assert len(rec.det_boxes) > 0 and len(rec.gt_boxes) > 0


def test_long_family_uses_periodic_eval():
    cfg = qd.family_config("long", 2400, "/tmp/x")
    assert cfg.train.eval_every == 800
    assert cfg.train.snapshot_every == 800
    assert cfg.train.steps_per_call == 8
