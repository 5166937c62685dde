"""Scale-readiness drill (VERDICT r1 item 8).

Real-COCO AP parity is blocked on data in this zero-egress environment,
but the *pipeline* must be proven at realistic scale before data ever
appears. This script:

1. ``gen``  — writes a REAL-FORMAT dataset to data/scale_drill/
   (git-ignored): COCO annotations JSON (5k images, the 80 COCO
   category ids incl. crowds) + a COCO-results detections JSON
   (~100 dets/image, jittered around GT like an actual detector dump,
   person-heavy category mix like COCO).
2. ``run``  — drives configs 1-3 END TO END from the CLIs against those
   files: config-1 eval (persons, 1-block), config-2 train N steps +
   full eval + results export, config-3 multiclass train + eval.
   Each phase runs as a subprocess; wall time and peak RSS are
   recorded and printed as JSON (goes into BASELINE.md).
3. ``eval5k`` — times the 5k-image numpy-fallback COCOEvaluator
   (< 60 s target without the C++ .so).

Usage: python scripts/scale_drill.py [gen|run|eval5k|all]
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json
import os
import resource
import subprocess
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
DATA = ROOT / "data" / "scale_drill"
N_IMAGES = 5000
CANVAS_W, CANVAS_H = 640, 480

# COCO-like category mix: person (id 1) ~30% of instances, the rest
# spread over 79 other ids (real COCO ids are non-contiguous; use a
# representative non-contiguous id set to exercise the remapping).
CAT_IDS = [1] + [i for i in range(2, 91) if i not in
                 (12, 26, 29, 30, 45, 66, 68, 69, 71, 83)][:79]


def _max_iou_same_cat_many(dets, det_cats, gts):
    """Per-det max IoU (xywh boxes) vs an image's same-category GTs.

    ``dets`` [D][4], ``det_cats`` [D], ``gts`` list of (cid, xywh) ->
    [D] float64. One [D, G] broadcast per image replaces the former
    per-(det, GT) Python loop (~4x faster at drill density) while
    staying BIT-IDENTICAL to it: every surviving pair evaluates the
    same f64 expression chain, masked pairs contribute 0.0, and max is
    exact. Verified equal on 20k random + adversarial cases."""
    D = len(dets)
    if D == 0 or len(gts) == 0:
        return np.zeros(D)
    d = np.asarray(dets, np.float64).reshape(D, 4)
    g = np.asarray([b for _, b in gts], np.float64).reshape(len(gts), 4)
    cat_ok = (np.asarray(det_cats)[:, None]
              == np.asarray([c for c, _ in gts])[None, :])
    ix = (np.minimum((d[:, 0] + d[:, 2])[:, None],
                     (g[:, 0] + g[:, 2])[None, :])
          - np.maximum(d[:, 0][:, None], g[:, 0][None, :]))
    iy = (np.minimum((d[:, 1] + d[:, 3])[:, None],
                     (g[:, 1] + g[:, 3])[None, :])
          - np.maximum(d[:, 1][:, None], g[:, 1][None, :]))
    inter = ix * iy
    u = ((d[:, 2] * d[:, 3])[:, None]
         + (g[:, 2] * g[:, 3])[None, :] - inter)
    ok = (ix > 0) & (iy > 0) & (u > 0) & cat_ok
    # guard the masked lanes so the division never raises, then zero them
    iou = np.where(ok, inter, 0.0) / np.where(ok, u, 1.0)
    return iou.max(axis=1, initial=0.0)


def gen(n_images=N_IMAGES, seed=0, prefix="",
        gt_range=(2, 22), dets_per_gt=(3, 8), fp_range=(10, 30),
        person_p=0.3, score_corr=0.0):
    """score_corr (alpha, VERDICT r4 #3) blends detector scores with
    localization quality: score = clip(alpha*maxIoU(det, same-cat GT)
    + (1-alpha)*noise). alpha=0 reproduces the historical generator
    BIT-FOR-BIT (same rng draw sequence; 0*iou + 1*noise == noise);
    alpha~0.5-0.8 models a real detector whose raw scores already rank
    informatively — the regime where learned rescoring has the least
    headroom over swept GreedyNMS."""
    DATA.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    cat_p = np.full(len(CAT_IDS), (1.0 - person_p) / (len(CAT_IDS) - 1))
    cat_p[0] = person_p

    images, annotations, detections = [], [], []
    ann_id = 1
    for img_id in range(1, n_images + 1):
        images.append({"id": img_id, "width": CANVAS_W,
                       "height": CANVAS_H,
                       "file_name": f"drill_{img_id:06d}.jpg"})
        n_gt = int(rng.integers(*gt_range))
        img_gts = []          # (cid, xywh) incl. crowds
        pending = []          # (cid, xywh bbox, raw noise) dets
        for _ in range(n_gt):
            cid = int(rng.choice(CAT_IDS, p=cat_p))
            w = float(rng.uniform(12, 200)); h = float(rng.uniform(12, 200))
            x = float(rng.uniform(0, CANVAS_W - w))
            y = float(rng.uniform(0, CANVAS_H - h))
            crowd = int(rng.uniform() < 0.04)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": cid,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": crowd,
            })
            ann_id += 1
            img_gts.append((cid, [x, y, w, h]))
            # detector dump: jittered dets per (non-crowd) GT. Scores
            # finalize at image end (all GTs known) — the rng draw
            # sequence is unchanged, so alpha=0 is bit-for-bit.
            if not crowd:
                for _ in range(int(rng.integers(*dets_per_gt))):
                    jit = rng.normal(0, 0.12 * min(w, h), size=4)
                    bw = max(w + jit[2], 4.0); bh = max(h + jit[3], 4.0)
                    pending.append((cid, [x + jit[0], y + jit[1], bw, bh],
                                    float(rng.normal(0.55, 0.22))))
        # background false positives
        for _ in range(int(rng.integers(*fp_range))):
            cid = int(rng.choice(CAT_IDS, p=cat_p))
            w = float(rng.uniform(12, 160)); h = float(rng.uniform(12, 160))
            pending.append((cid,
                            [float(rng.uniform(0, CANVAS_W - w)),
                             float(rng.uniform(0, CANVAS_H - h)), w, h],
                            float(rng.normal(0.35, 0.2))))
        qs = (_max_iou_same_cat_many([b for _, b, _ in pending],
                                     [c for c, _, _ in pending], img_gts)
              if score_corr else np.zeros(len(pending)))
        for (cid, bbox, noise), q in zip(pending, qs):
            detections.append({
                "image_id": img_id, "category_id": cid,
                "bbox": bbox,
                "score": float(np.clip(
                    score_corr * q + (1.0 - score_corr) * noise,
                    0.01, 0.999)),
            })

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"cat_{c}" if c != 1 else "person",
                        "supercategory": "drill"} for c in CAT_IDS],
    }
    (DATA / f"{prefix}annotations.json").write_text(json.dumps(ann))
    (DATA / f"{prefix}detections.json").write_text(json.dumps(detections))
    print(f"gen: {n_images} images, {len(annotations)} anns, "
          f"{len(detections)} dets -> {DATA}/{prefix}*", flush=True)


def _yaml(name: str, text: str) -> str:
    p = DATA / name
    p.write_text(text)
    return str(p)


def _run_phase(name: str, argv: list[str], env=None) -> dict:
    t0 = time.monotonic()
    # Per-phase peak RSS: os.wait4 returns THIS child's own rusage
    # (RUSAGE_CHILDREN.ru_maxrss is a cumulative high-water mark over
    # all prior children and would misattribute the largest phase's
    # peak to every later phase).
    proc = subprocess.Popen(argv, cwd=ROOT, env=env or os.environ.copy(),
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    out = proc.stdout.read()
    _, status, ru = os.wait4(proc.pid, 0)
    proc.wait()
    wall = time.monotonic() - t0
    rss = ru.ru_maxrss  # KiB on Linux
    ok = os.waitstatus_to_exitcode(status) == 0
    tail = "\n".join(out.splitlines()[-12:])
    print(f"--- {name}: {'ok' if ok else 'FAILED'} wall={wall:.1f}s "
          f"peak_rss={rss/1e6:.2f}GB\n{tail if not ok else ''}", flush=True)
    if not ok:
        raise SystemExit(f"{name} failed")
    return {"wall_s": round(wall, 1), "peak_rss_gb": round(rss / 1e6, 2),
            "tail": out.splitlines()[-40:]}


def run(train_steps=300):
    ann = str(DATA / "annotations.json")
    det = str(DATA / "detections.json")
    common_data = (
        f"data:\n  dataset: coco\n  ann_file: {ann}\n  det_file: {det}\n"
        "  max_detections: 1024\n  bucket_sizes: [256, 512, 1024]\n"
    )
    y1 = _yaml("cfg1.yaml", (
        "model: {num_blocks: 1, feature_dim: 128, reduced_dim: 32, "
        "pairwise_dim: 32, num_classes: 1}\n"
        f"{common_data}  person_only: true\n"
        f"train: {{batch_size: 8, checkpoint_dir: {DATA}/ck1}}\n"
    ))
    y2 = _yaml("cfg2.yaml", (
        "model: {num_blocks: 16, feature_dim: 128, reduced_dim: 32, "
        "pairwise_dim: 32, num_classes: 1}\n"
        "matching: {thresholds: [0.5], crowd_as_ignore: true}\n"
        f"{common_data}  person_only: true\n"
        "train: {optimizer: adam, learning_rate: 1.0e-4, "
        f"max_steps: {train_steps}, batch_size: 8, grad_clip_norm: 10.0, "
        "snapshot_every: 0, eval_every: 0, log_every: 100, "
        f"checkpoint_dir: {DATA}/ck2}}\n"
    ))
    y3 = _yaml("cfg3.yaml", (
        "model: {num_blocks: 16, feature_dim: 128, reduced_dim: 32, "
        "pairwise_dim: 32, num_classes: 80, class_embed_dim: 32}\n"
        "matching: {thresholds: [0.5], class_aware: true}\n"
        f"{common_data}  person_only: false\n"
        "train: {optimizer: adam, learning_rate: 1.0e-4, "
        f"max_steps: {max(train_steps * 2 // 3, 100)}, batch_size: 8, "
        "grad_clip_norm: 10.0, snapshot_every: 0, eval_every: 0, "
        f"log_every: 100, checkpoint_dir: {DATA}/ck3}}\n"
    ))
    py = sys.executable
    out = {
        "config1_eval_persons": _run_phase(
            "config-1 eval (persons, 1-block, 5k images)",
            [py, "-m", "gossipnet_tpu.evaluate", "-c", y1]),
        "config2_train_persons": _run_phase(
            f"config-2 train (persons, 16-block, {train_steps} steps)",
            [py, "-m", "gossipnet_tpu.train", "-c", y2,
             "--metrics", str(DATA / "m2.jsonl")]),
        "config2_eval": _run_phase(
            "config-2 eval (trained ckpt, 5k images)",
            [py, "-m", "gossipnet_tpu.evaluate", "-c", y2]),
        "config3_train_80cls": _run_phase(
            "config-3 train (80-class, 16-block)",
            [py, "-m", "gossipnet_tpu.train", "-c", y3,
             "--metrics", str(DATA / "m3.jsonl")]),
        "config3_eval": _run_phase(
            "config-3 eval (80-class, 5k images)",
            [py, "-m", "gossipnet_tpu.evaluate", "-c", y3]),
    }
    print(json.dumps(out), flush=True)


# Reference detection density (SURVEY §5 long-context note): hundreds
# to 1024 dets/image, N=1024 bucket dominant. ~50x11 GT-clustered dets
# + ~140 background FPs => mean ~690/image, tail above the 1024 cap.
DENSE = dict(gt_range=(30, 71), dets_per_gt=(8, 15), fp_range=(80, 201))
# Persons arm: person_only filters to category 1, so the density must
# land AFTER filtering — person-dominant mix + higher dets/GT keeps the
# per-image PERSON count in the 1024 bucket (~700 mean).
DENSE_P = dict(gt_range=(30, 71), dets_per_gt=(10, 17),
               fp_range=(80, 201), person_p=0.95)
# Config-4 regime: thousands of detections/image so the N=4096 bucket
# dominates TRAINING (the serving/eval 4096 path is benched separately;
# this proves the matching kernel + pair-kernel backward at N=4096
# end to end). ~170 GT x ~13.5 dets + ~300 FPs => mean ~2600
# person dets/image, tail above the 4096 cap.
DENSE_4K = dict(gt_range=(120, 221), dets_per_gt=(10, 17),
                fp_range=(200, 401), person_p=0.95)


def full(train_steps=3000, lr=1e-3, schedule="constant", tag="full",
         multiclass=False, prefix="", n_images=N_IMAGES, density=None,
         mt=False, batch_size=8, buckets="[256, 512, 1024]",
         max_dets=1024):
    """Full-budget config-2 training on the drill dataset (round 3).

    The 300-step OAT calibration (PARITY.md) left two open questions:
    does LR 1e-3 still dominate at full budget, and were the decaying
    schedules' losses a short-horizon artifact? This runs config-2
    (persons, 16 blocks) for ``train_steps`` with a held-out val split
    (600 images, seed 1) driving periodic val-AP eval + best-AP
    checkpointing through the REAL train CLI path, then evaluates the
    best checkpoint on the 5k train-distribution images with the
    swept-GreedyNMS baseline. One JSON line per phase -> RESULTS.md.
    """
    density = density or {}
    if not (DATA / f"{prefix}annotations.json").exists():
        gen(n_images=n_images, prefix=prefix, **density)
    if not (DATA / f"{prefix}val_annotations.json").exists():
        gen(n_images=max(n_images // 8, 100), seed=1,
            prefix=f"{prefix}val_", **density)
    ann = str(DATA / f"{prefix}annotations.json")
    det = str(DATA / f"{prefix}detections.json")
    ck = DATA / f"ck_{tag}"
    # COCO-style multi-threshold matching (0.5:0.95) — +6.7 AP at full
    # budget on the 75-dets drill (RESULTS.md); `mt` runs the same
    # labels at reference density.
    thr = ("[0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]"
           if mt else "[0.5]")
    model = ("model: {num_blocks: 16, feature_dim: 128, reduced_dim: 32, "
             "pairwise_dim: 32, num_classes: 80, class_embed_dim: 32}\n"
             f"matching: {{thresholds: {thr}, class_aware: true, "
             "crowd_as_ignore: true}\n" if multiclass else
             "model: {num_blocks: 16, feature_dim: 128, reduced_dim: 32, "
             "pairwise_dim: 32, num_classes: 1}\n"
             f"matching: {{thresholds: {thr}, crowd_as_ignore: true}}\n")
    y = _yaml(f"cfg_{tag}.yaml", (
        model
        + f"data:\n  dataset: coco\n  ann_file: {ann}\n  det_file: {det}\n"
        f"  val_ann_file: {DATA / (prefix + 'val_annotations.json')}\n"
        f"  val_det_file: {DATA / (prefix + 'val_detections.json')}\n"
        f"  max_detections: {max_dets}\n  bucket_sizes: {buckets}\n"
        f"  person_only: {'false' if multiclass else 'true'}\n"
        f"train: {{optimizer: adam, learning_rate: {lr}, "
        f"lr_schedule: {schedule}, "
        f"max_steps: {train_steps}, batch_size: {batch_size}, "
        "grad_clip_norm: 10.0, "
        "snapshot_every: 1000, eval_every: 500, log_every: 100, "
        f"checkpoint_dir: {ck}}}\n"
    ))
    py = sys.executable
    out = {
        f"{tag}_train": _run_phase(
            f"{tag} train ({train_steps} steps, lr={lr}, {schedule})",
            [py, "-m", "gossipnet_tpu.train", "-c", y,
             "--metrics", str(DATA / f"m_{tag}.jsonl")]),
        f"{tag}_eval": _run_phase(
            f"{tag} eval ({n_images} train-dist images, swept-NMS baseline)",
            [py, "-m", "gossipnet_tpu.evaluate", "-c", y, "--nms-sweep"]),
    }
    print(json.dumps(out), flush=True)


def gen_pets(n_frames=800, seed=0, prefix="", score_corr=0.0):
    """Real-format PETS files: CVML XML ground truth (0-based frames,
    center-form boxes — the PETS2009 distribution schema) + MOT-style
    CSV detections (1-based frames, top-left boxes), deliberately
    exercising data/pets.py's frame-base auto-realignment. Crowd
    statistics follow the PETS surveillance regime: 768x576 frames,
    15-55 pedestrians partly in occluding rows, 4-9 jittered
    detections per person, plus background false positives.

    score_corr (alpha) blends detector scores with localization
    quality exactly like ``gen``: score = clip(alpha*maxIoU(det,
    frame GTs) + (1-alpha)*noise). Scores finalize at frame end (all
    GTs known) but the rng draw sequence is unchanged, so alpha=0
    reproduces the historical generator BIT-FOR-BIT."""
    DATA.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    W, H = 768, 576
    xml = ['<dataset name="drill_pets">']
    csv = []
    for fr in range(n_frames):
        xml.append(f'  <frame number="{fr}">\n    <objectlist>')
        n_people = int(rng.integers(15, 56))
        placed = 0
        oid = 0
        frame_gts = []   # (cat, xywh) for _max_iou_same_cat_many
        pending = []     # (xywh bbox, raw noise) dets, frame order
        while placed < n_people:
            # occlusion row: 2-6 people shoulder-to-shoulder
            row = min(int(rng.integers(2, 7)), n_people - placed)
            w = float(rng.uniform(24, 44))
            h = float(rng.uniform(58, 112))
            xc = float(rng.uniform(w, W - row * 0.55 * w - w))
            yc = float(rng.uniform(h / 2 + 2, H - h / 2 - 2))
            for k in range(row):
                cx = xc + k * 0.55 * w   # ~0.45 width overlap
                cy = yc + float(rng.normal(0, 2.5))
                xml.append(f'      <object id="{oid}">\n        '
                           f'<box xc="{cx:.1f}" yc="{cy:.1f}" '
                           f'w="{w:.1f}" h="{h:.1f}"/>\n      </object>')
                oid += 1
                frame_gts.append((1, [cx - w / 2, cy - h / 2, w, h]))
                for _ in range(int(rng.integers(4, 10))):
                    jit = rng.normal(0, 0.1 * w, size=4)
                    bw = max(w + jit[2], 6.0)
                    bh = max(h + jit[3], 12.0)
                    x = cx - w / 2 + jit[0]
                    y = cy - h / 2 + jit[1]
                    pending.append(([x, y, bw, bh],
                                    float(rng.normal(0.55, 0.22))))
            placed += row
        for _ in range(int(rng.integers(5, 20))):   # background FPs
            w = float(rng.uniform(18, 70)); h = float(rng.uniform(30, 130))
            x = float(rng.uniform(0, W - w)); y = float(rng.uniform(0, H - h))
            pending.append(([x, y, w, h], float(rng.normal(0.35, 0.2))))
        qs = (_max_iou_same_cat_many([b for b, _ in pending],
                                     [1] * len(pending), frame_gts)
              if score_corr else np.zeros(len(pending)))
        for (bbox, noise), q in zip(pending, qs):
            s = float(np.clip(score_corr * q + (1.0 - score_corr) * noise,
                              0.01, 0.999))
            csv.append(f"{fr + 1},-1,{bbox[0]:.1f},{bbox[1]:.1f},"
                       f"{bbox[2]:.1f},{bbox[3]:.1f},{s:.3f}")
        xml.append("    </objectlist>\n  </frame>")
    xml.append("</dataset>")
    (DATA / f"{prefix}pets_gt.xml").write_text("\n".join(xml))
    (DATA / f"{prefix}pets_dets.csv").write_text("\n".join(csv) + "\n")
    print(f"gen_pets: {n_frames} frames, {len(csv)} det rows -> "
          f"{DATA}/{prefix}pets_*", flush=True)


def full_pets(train_steps=3000, lr=1e-3, schedule="cosine", tag="pets",
              mt=False, alpha=0.0):
    """Full-budget PETS-family run through the real-format loaders:
    CVML GT + MOT CSV dets via ``dataset: pets`` in both CLIs, val
    split on held-out frames, best-AP checkpointing, swept-NMS
    baseline — the crowd-benchmark analog of full(). alpha (score_corr)
    prefixes the generated files AND suffixes the tag/checkpoint dir
    INTERNALLY, so no caller can train on alpha data while clobbering
    the baseline arm's checkpoints (r5 review)."""
    lab = _alpha_label(alpha)
    pre = f"{lab}_" if lab else ""
    if lab and not tag.endswith(lab):
        tag = f"{tag}_{lab}"
    if not (DATA / f"{pre}pets_gt.xml").exists():
        gen_pets(prefix=pre, score_corr=alpha)
    if not (DATA / f"val_{pre}pets_gt.xml").exists():
        gen_pets(n_frames=200, seed=1, prefix=f"val_{pre}",
                 score_corr=alpha)
    ck = DATA / f"ck_{tag}"
    thr = ("[0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]"
           if mt else "[0.5]")
    y = _yaml(f"cfg_{tag}.yaml", (
        "model: {num_blocks: 16, feature_dim: 128, reduced_dim: 32, "
        "pairwise_dim: 32, num_classes: 1}\n"
        f"matching: {{thresholds: {thr}}}\n"
        f"data:\n  dataset: pets\n  ann_file: {DATA / (pre + 'pets_gt.xml')}\n"
        f"  det_file: {DATA / (pre + 'pets_dets.csv')}\n"
        f"  val_ann_file: {DATA / ('val_' + pre + 'pets_gt.xml')}\n"
        f"  val_det_file: {DATA / ('val_' + pre + 'pets_dets.csv')}\n"
        "  max_detections: 1024\n  bucket_sizes: [256, 512, 1024]\n"
        f"train: {{optimizer: adam, learning_rate: {lr}, "
        f"lr_schedule: {schedule}, "
        f"max_steps: {train_steps}, batch_size: 8, grad_clip_norm: 10.0, "
        "snapshot_every: 1000, eval_every: 500, log_every: 100, "
        f"checkpoint_dir: {ck}}}\n"
    ))
    py = sys.executable
    out = {
        f"{tag}_train": _run_phase(
            f"{tag} train ({train_steps} steps, lr={lr}, {schedule})",
            [py, "-m", "gossipnet_tpu.train", "-c", y,
             "--metrics", str(DATA / f"m_{tag}.jsonl")]),
        f"{tag}_eval": _run_phase(
            f"{tag} eval (best ckpt, 800 frames, swept-NMS baseline)",
            [py, "-m", "gossipnet_tpu.evaluate", "-c", y,
             "--best", "--nms-sweep"]),
    }
    print(json.dumps(out), flush=True)


def eval5k():
    """numpy-fallback COCOEvaluator over the full 5k drill images."""
    from gossipnet_tpu.data.roidb import build_roidb
    from gossipnet_tpu.eval.cocoeval import COCOEvaluator

    roidb = build_roidb(str(DATA / "annotations.json"),
                        str(DATA / "detections.json"),
                        person_only=False, max_dets=1024)
    ev = COCOEvaluator(num_classes=roidb.num_classes, force_numpy=True)
    for rec in roidb:
        ev.add_arrays(rec.image_id, rec.det_boxes, rec.det_scores,
                      rec.det_classes, rec.gt_boxes, rec.gt_classes,
                      rec.gt_crowd)
    t0 = time.monotonic()
    stats = ev.summarize()
    dt = time.monotonic() - t0
    print(json.dumps({"images": len(roidb), "eval_wall_s": round(dt, 1),
                      "numpy_fallback": True, "AP": round(stats["AP"], 4),
                      "AP50": round(stats["AP50"], 4)}), flush=True)
    assert dt < 60.0, f"5k numpy-fallback eval took {dt:.1f}s (target <60s)"


def _parse_arm_args(argv, default_schedule):
    """Parse ``[steps] [lr] [schedule]`` with a literal ``mt`` flag and
    an ``alpha=X`` score-correlation knob accepted at ANY position ->
    (steps, lr, schedule, mt, alpha, extra). Extracting the flags
    before positional binding means `dense 3000 1e-3 mt alpha=0.5`
    works in any order instead of silently binding schedule='mt'
    (which used to clobber the real mt arm's YAML and crash only after
    minutes of dataset generation). ``extra`` is any positionals
    beyond the first three (the full/full80 arm reads its tag there)."""
    mt = "mt" in argv
    alpha = 0.0
    a = []
    for x in argv:
        if x == "mt":
            continue
        if x.startswith("alpha="):
            alpha = float(x[6:])
            continue
        a.append(x)
    return (int(a[0]) if a else 3000,
            float(a[1]) if len(a) > 1 else 1e-3,
            a[2] if len(a) > 2 else default_schedule,
            mt, alpha, a[3:])


def _alpha_label(alpha) -> str:
    """Filename/tag-safe label for alpha: '' at 0, 'a80' when the
    2-digit percent form is EXACT, else full precision ('a0p804') —
    two distinct alphas can never silently share a dataset prefix,
    tag, or checkpoint dir through rounding."""
    if not alpha:
        return ""
    pct = alpha * 100
    if abs(pct - round(pct)) < 1e-9 and 0 < round(pct) < 1000:
        return f"a{int(round(pct)):02d}"
    return "a" + repr(float(alpha)).replace(".", "p").replace("-", "m")


def _with_alpha(density, alpha) -> dict:
    d = dict(density or {})
    if alpha:
        d["score_corr"] = alpha
    return d


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("gen", "all"):
        gen()
    if what in ("eval5k", "all"):
        eval5k()
    if what in ("run", "all"):
        run()
    if what in ("full", "full80"):
        # full[80] [steps] [lr] [schedule] [tag] [mt] [alpha=X] — now
        # through _parse_arm_args like every other arm: 'mt'/'alpha=X'
        # tokens used to be silently swallowed as tag/lr/schedule and
        # run a mislabeled baseline (r5 review).
        steps, lr, schedule, mt, alpha, extra = _parse_arm_args(
            sys.argv[2:], "constant")
        lab = _alpha_label(alpha)
        tag = ((extra[0] if extra else
                ("full80" if what == "full80" else "full"))
               + ("_mt" if mt else "") + (f"_{lab}" if lab else ""))
        full(train_steps=steps, lr=lr, schedule=schedule, tag=tag,
             multiclass=what == "full80", mt=mt,
             prefix=f"{lab}_" if lab else "",
             density=_with_alpha(None, alpha))
    if what == "pets":
        # pets [steps] [lr] [schedule] [mt] [alpha=X] — full_pets
        # appends the alpha label to the tag itself.
        steps, lr, schedule, mt, alpha, _ = _parse_arm_args(
            sys.argv[2:], "cosine")
        full_pets(train_steps=steps, lr=lr, schedule=schedule,
                  tag="pets_mt" if mt else "pets", mt=mt, alpha=alpha)
    if what in ("dense", "dense80"):
        # dense[80] [steps] [lr] [schedule] [mt] [alpha=X]:
        # reference-density arm (VERDICT r3 item 7) — 300-1024
        # dets/image, N=1024 bucket dominant, full budget. alpha=X
        # (VERDICT r4 #3) blends scores with localization quality; the
        # tag AND dataset prefix carry alpha so arms never collide on
        # checkpoint dirs or generated files.
        mc = what == "dense80"
        steps, lr, schedule, mt, alpha, _ = _parse_arm_args(
            sys.argv[2:], "constant")
        lab = _alpha_label(alpha)
        asuf = f"_{lab}" if lab else ""
        tag = ("dense80" if mc else "densep") + (
            "" if schedule == "constant" else f"_{schedule}") + (
            "_mt" if mt else "") + asuf
        full(train_steps=steps, lr=lr, schedule=schedule, tag=tag,
             multiclass=mc, mt=mt,
             prefix=("dense" if mc else "densep") + asuf + "_",
             n_images=2000,
             density=_with_alpha(DENSE if mc else DENSE_P, alpha))
    if what == "dense4k":
        # dense4k [steps] [lr] [schedule] [mt] [alpha=X]: config-4
        # TRAINING arm — N=4096-dominant bucketing at batch 2
        # (RESULTS.md). alpha must flow through like the dense arms —
        # discarding it here would silently run the alpha=0 baseline
        # under an alpha-labeled invocation.
        steps, lr, schedule, mt, alpha, _ = _parse_arm_args(
            sys.argv[2:], "cosine")
        lab = _alpha_label(alpha)
        asuf = f"_{lab}" if lab else ""
        tag = "dense4k" + ("" if schedule == "cosine" else f"_{schedule}"
                           ) + ("_mt" if mt else "") + asuf
        full(train_steps=steps, lr=lr, schedule=schedule, tag=tag, mt=mt,
             prefix="dense4k" + asuf + "_", n_images=600,
             density=_with_alpha(DENSE_4K, alpha),
             batch_size=2, buckets="[1024, 2048, 4096]", max_dets=4096)
