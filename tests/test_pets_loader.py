"""PETS loader tests: CVML XML GT, MOT CSV / CVML / NPZ detections,
frame realignment, and an end-to-end CLI drive on PETS-format files.

Reference parity: the paper's third benchmark (SURVEY.md §0, arXiv
1705.02950 §5) is the PETS crowded-pedestrian dataset; the reference
loads it through its dataset layer into the same roidb shape as COCO.
"""

import subprocess
import sys

import numpy as np
import pytest

from gossipnet_tpu.data.pets import (
    build_pets_roidb, load_cvml, load_mot_csv, load_pets_detections,
)

CVML_GT = """<?xml version="1.0"?>
<dataset name="PETS2009-S2L1">
  <frame number="0">
    <objectlist>
      <object id="1"><box xc="50" yc="60" w="20" h="40"/></object>
      <object id="2"><box xc="120" yc="62" w="22" h="44"/></object>
    </objectlist>
  </frame>
  <frame number="1">
    <objectlist>
      <object id="1"><box xc="52" yc="60" w="20" h="40"/></object>
    </objectlist>
  </frame>
  <frame number="2">
    <objectlist/>
  </frame>
</dataset>
"""

# MOT rows: frame(1-based), id, x, y, w, h, score, [world coords...]
MOT_DETS = """1,-1,38.0,38.0,24.0,44.0,0.92,-1,-1,-1
1,-1,40.0,42.0,20.0,40.0,0.55
1,-1,107.0,38.0,24.0,46.0,0.88,-1,-1,-1
2,-1,41.0,39.0,21.0,41.0,0.81
3,-1,300.0,300.0,10.0,20.0,0.30
"""

CVML_DETS = """<?xml version="1.0"?>
<dataset name="dets">
  <frame number="0">
    <objectlist>
      <object id="0" confidence="0.9">
        <box xc="50" yc="60" w="24" h="44"/>
      </object>
    </objectlist>
  </frame>
  <frame number="1">
    <objectlist>
      <object id="0"><box xc="51" yc="60" w="20" h="40"/></object>
    </objectlist>
  </frame>
</dataset>
"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_load_cvml_gt(tmp_path):
    frames = load_cvml(_write(tmp_path, "gt.xml", CVML_GT))
    assert sorted(frames) == [0, 1, 2]
    np.testing.assert_allclose(
        frames[0]["boxes"][0], [40.0, 40.0, 60.0, 80.0])  # center->xyxy
    assert frames[0]["scores"] == [1.0, 1.0]   # GT has no confidence
    assert frames[2]["boxes"] == []


def test_load_mot_csv(tmp_path):
    frames = load_mot_csv(_write(tmp_path, "dets.csv", MOT_DETS))
    assert sorted(frames) == [1, 2, 3]
    assert len(frames[1]["boxes"]) == 3
    np.testing.assert_allclose(
        frames[1]["boxes"][0], [38.0, 38.0, 62.0, 82.0])  # tlwh->xyxy
    assert frames[1]["scores"][0] == pytest.approx(0.92)


def test_cvml_detections_confidence(tmp_path):
    frames = load_pets_detections(_write(tmp_path, "d.xml", CVML_DETS))
    assert frames[0]["scores"] == [0.9]
    assert frames[1]["scores"] == [1.0]        # missing confidence -> 1.0


def test_npz_detections(tmp_path):
    p = tmp_path / "d.npz"
    np.savez(p, image_ids=np.array([0, 0, 1]),
             boxes=np.array([[0, 0, 5, 5], [1, 1, 6, 6], [2, 2, 7, 7]],
                            np.float32),
             scores=np.array([0.5, 0.4, 0.3], np.float32),
             classes=np.zeros(3, np.int32))
    frames = load_pets_detections(str(p))
    assert len(frames[0]["boxes"]) == 2 and len(frames[1]["boxes"]) == 1


def test_build_roidb_realigns_mot_frames(tmp_path):
    """MOT CSV is 1-based, CVML GT 0-based: dets frames {1,2,3} over GT
    frames {0,1,2} must realign so frame-1 dets meet frame-0 GT."""
    roidb = build_pets_roidb(
        _write(tmp_path, "gt.xml", CVML_GT),
        _write(tmp_path, "dets.csv", MOT_DETS),
    )
    assert roidb.num_classes == 1 and roidb.class_names == ["person"]
    by_id = {r.image_id: r for r in roidb.records}
    assert sorted(by_id) == [0, 1, 2]
    assert by_id[0].num_dets == 3 and len(by_id[0].gt_boxes) == 2
    assert by_id[1].num_dets == 1 and len(by_id[1].gt_boxes) == 1
    assert by_id[2].num_dets == 1 and len(by_id[2].gt_boxes) == 0
    assert (by_id[0].det_classes == 0).all()
    assert not by_id[0].gt_crowd.any()


def test_build_roidb_realigns_with_missing_first_frame(tmp_path):
    """1-based det file with NO detections in its first frame: frames
    {2,3} over GT {0,1,2}. The old min/max heuristic required both ends
    to line up and silently skipped the shift; overlap scoring picks
    offset 1 ({1,2} matches 2 GT frames vs 1 verbatim)."""
    dets = "\n".join(MOT_DETS.strip().splitlines()[3:])  # frames 2,3 only
    with pytest.warns(UserWarning, match="realigned by -1"):
        roidb = build_pets_roidb(
            _write(tmp_path, "gt.xml", CVML_GT),
            _write(tmp_path, "dets.csv", dets),
        )
    by_id = {r.image_id: r for r in roidb.records}
    assert by_id[1].num_dets == 1 and len(by_id[1].gt_boxes) == 1
    assert by_id[2].num_dets == 1 and len(by_id[2].gt_boxes) == 0


def test_build_roidb_explicit_frame_offset(tmp_path):
    """frame_offset=0 forces verbatim matching even for 1-based dets."""
    roidb = build_pets_roidb(
        _write(tmp_path, "gt.xml", CVML_GT),
        _write(tmp_path, "dets.csv", MOT_DETS),
        frame_offset=0,
    )
    by_id = {r.image_id: r for r in roidb.records}
    # Frame-1 dets (3 of them) now sit with frame-1 GT (1 box).
    assert by_id[1].num_dets == 3 and len(by_id[1].gt_boxes) == 1
    assert by_id[3].num_dets == 1 and len(by_id[3].gt_boxes) == 0


def test_build_roidb_verbatim_when_aligned(tmp_path):
    """CVML dets share the GT's 0-based frames: no shift applied."""
    roidb = build_pets_roidb(
        _write(tmp_path, "gt.xml", CVML_GT),
        _write(tmp_path, "d.xml", CVML_DETS),
    )
    by_id = {r.image_id: r for r in roidb.records}
    assert sorted(by_id) == [0, 1]
    assert len(by_id[0].gt_boxes) == 2


def test_capping(tmp_path):
    rows = "\n".join(
        f"1,-1,{10 + i},{10 + i},20,40,{1.0 - i * 0.01}" for i in range(30)
    )
    roidb = build_pets_roidb(
        _write(tmp_path, "gt.xml", CVML_GT),
        _write(tmp_path, "dets.csv", rows),
        max_dets=8,
    )
    # Frame 0 has GT only (kept for the recall denominator); the single
    # det frame (no realign heuristics) must be capped to 8.
    (rec,) = [r for r in roidb.records if r.num_dets > 0]
    assert rec.num_dets == 8
    assert rec.det_scores[0] == rec.det_scores.max()


def test_gt_only_frames_kept_for_eval(tmp_path):
    """A frame with ground truth but no detections must still enter the
    roidb — dropping it would shrink the AP recall denominator and
    inflate AP vs pycocotools."""
    roidb = build_pets_roidb(
        _write(tmp_path, "gt.xml", CVML_GT),
        _write(tmp_path, "dets.csv", "2,-1,40,40,20,40,0.9\n"),
    )
    by_id = {r.image_id: r for r in roidb.records}
    # GT frames 0 and 1 have no detections but carry boxes.
    assert 0 in by_id and by_id[0].num_dets == 0
    assert len(by_id[0].gt_boxes) == 2
    assert 1 in by_id and len(by_id[1].gt_boxes) == 1
    # frame 2: empty GT list + det -> det record
    assert by_id[2].num_dets == 1


@pytest.mark.slow
def test_pets_cli_end_to_end(tmp_path):
    """Train a few steps + evaluate from the CLIs on PETS-format files
    (dense pool, CPU): exercises the full dataset->train->eval path the
    reference drove for its PETS experiments."""
    rng = np.random.default_rng(0)
    # 12 frames, ~3 pedestrians each, jittered duplicate detections.
    gt_frames, det_rows = [], []
    for fr in range(12):
        objs = []
        for pid in range(3):
            xc, yc = rng.uniform(40, 400), rng.uniform(40, 200)
            w, h = rng.uniform(18, 26), rng.uniform(40, 55)
            objs.append(
                f'<object id="{pid}">'
                f'<box xc="{xc:.1f}" yc="{yc:.1f}" w="{w:.1f}" h="{h:.1f}"/>'
                "</object>")
            for _ in range(4):  # duplicates around each GT
                dx, dy = rng.normal(0, 3, 2)
                det_rows.append(
                    f"{fr + 1},-1,{xc - w / 2 + dx:.1f},"
                    f"{yc - h / 2 + dy:.1f},{w:.1f},{h:.1f},"
                    f"{rng.uniform(0.3, 0.99):.2f}")
        gt_frames.append(
            f'<frame number="{fr}"><objectlist>{"".join(objs)}'
            "</objectlist></frame>")
    gt_xml = ('<?xml version="1.0"?><dataset name="t">'
              + "".join(gt_frames) + "</dataset>")
    gt_p = _write(tmp_path, "gt.xml", gt_xml)
    det_p = _write(tmp_path, "dets.csv", "\n".join(det_rows))
    cfg_p = _write(tmp_path, "pets_tiny.yaml", f"""
model:
  num_blocks: 2
  feature_dim: 32
  reduced_dim: 16
  pairwise_dim: 16
  num_classes: 1
train:
  max_steps: 6
  batch_size: 2
  snapshot_every: 6
  eval_every: 6
  log_every: 2
  checkpoint_dir: {tmp_path}/ckpt
data:
  dataset: pets
  ann_file: {gt_p}
  det_file: {det_p}
  val_ann_file: {gt_p}
  val_det_file: {det_p}
  max_detections: 64
  bucket_sizes: [64]
""")
    env = {
        "PYTHONPATH": "/root/repo",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin",
        "HOME": str(tmp_path),
    }
    r = subprocess.run(
        [sys.executable, "-m", "gossipnet_tpu.train", "-c", cfg_p,
         "--metrics", str(tmp_path / "m.jsonl")],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # val_ann_file/val_det_file knob: periodic eval must have run and
    # logged a finite val AP (and the best-AP checkpoint with it).
    import json as _json

    rows = [_json.loads(x)
            for x in (tmp_path / "m.jsonl").read_text().splitlines()]
    val_rows = [row for row in rows if "val_AP" in row]
    assert val_rows and np.isfinite(val_rows[-1]["val_AP"])
    r = subprocess.run(
        [sys.executable, "-m", "gossipnet_tpu.evaluate", "-c", cfg_p,
         "--pool-impl", "dense"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"AP"' in r.stdout
