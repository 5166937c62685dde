"""AP-parity calibration sweep (the playbook for the 0.1-AP target).

The north-star's accuracy half (BASELINE.json:2,5) is COCO-persons AP
within 0.1 of the TF reference. The reference mount and real data are
absent in this environment, so exact-parity calibration must happen the
day data exists; this script IS that procedure, runnable today on the
synthetic proxy to validate the harness end to end.

It trains short runs over the calibration knobs SURVEY.md/ROADMAP.md
prescribe — the knobs whose reference settings are MEDIUM-confidence
paper-derived guesses — and reports val AP per cell:

  - matching thresholds: single 0.5 vs COCO multi-threshold 0.5:0.95
  - positive/negative weighting: balanced vs none
  - loss normalization: per_image vs per_batch
  - score-rank input feature: on vs off
  - learning rate x schedule (VERDICT r2 #5)
  - num_blocks (model capacity)

Two modes:

  default (one-at-a-time): vary each knob off the base config alone and
  report the AP DELTA per knob — the sensitivity playbook PARITY.md
  records. O(sum of options) runs.
  --grid: full cartesian product over the four reference-ambiguity
  knobs (the r2 behavior). O(product) runs — use for the final
  fine-grained search around the OAT winner.

Usage::

  python scripts/calibrate.py                      # synthetic, 300 steps
  python scripts/calibrate.py -c experiments/coco_persons_full.yaml \
      --steps 20000                                # real data, when present

Output: one JSON line per cell + a ranked table; the argmax cell is the
config to train fully for the parity claim.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import dataclasses
import itertools
import json
import tempfile

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--pool-impl", default=None)
    p.add_argument("--grid", action="store_true",
                   help="full cartesian product over the 4 ambiguity "
                        "knobs instead of the one-at-a-time sweep")
    p.add_argument("--blocks-axis", type=int, nargs="*",
                   default=[8, 16, 24],
                   help="num_blocks options for the OAT sweep")
    args = p.parse_args(argv)

    import jax

    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.evaluate import evaluate_model, evaluate_raw_scores
    from gossipnet_tpu.train import build_model, train

    base = load_config(args.config)
    pool_impl = args.pool_impl or (
        "pallas" if jax.default_backend() == "tpu" else "dense")

    if base.data.dataset == "synthetic":
        from gossipnet_tpu.data.synthetic import synthetic_roidb

        train_db = synthetic_roidb(num_images=128, seed=0,
                                   num_classes=base.model.num_classes)
        val_db = synthetic_roidb(num_images=32, seed=1,
                                 num_classes=base.model.num_classes)
    elif base.data.dataset == "pets":
        from gossipnet_tpu.data.pets import build_pets_roidb

        db = build_pets_roidb(base.data.ann_file, base.data.det_file,
                              max_dets=base.data.max_detections)
        cut = max(len(db.records) * 4 // 5, 1)
        train_db = dataclasses.replace(db, records=db.records[:cut])
        val_db = dataclasses.replace(db, records=db.records[cut:])
    else:
        from gossipnet_tpu.data.roidb import build_roidb

        train_db = build_roidb(base.data.ann_file, base.data.det_file,
                               person_only=base.data.person_only,
                               max_dets=base.data.max_detections)
        # Val split: reference used minival; point ann/det at it via a
        # second config if available, else hold out 10%.
        cut = max(len(train_db.records) * 9 // 10, 1)
        val_db = dataclasses.replace(
            train_db, records=train_db.records[cut:])
        train_db = dataclasses.replace(
            train_db, records=train_db.records[:cut])

    # The four reference-ambiguity knobs (r2 grid) + the r3 additions
    # (VERDICT #5: LR/schedule and capacity axes).
    grid = {
        "matching.thresholds": [
            (0.5,), tuple(np.round(np.arange(0.5, 1.0, 0.05), 2).tolist())],
        "loss.pos_weight_mode": ["balanced", "none"],
        "loss.normalize": ["per_image", "per_batch"],
        "model.score_rank_feature": [True, False],
    }
    oat_extra = {
        "train.learning_rate": [3e-5, 1e-4, 3e-4, 1e-3],
        "train.lr_schedule": ["constant", "cosine", "step"],
        "model.num_blocks": args.blocks_axis,
    }
    raw = evaluate_raw_scores(val_db)
    print(json.dumps({"cell": "raw-scores-baseline", "AP": raw["AP"]}),
          flush=True)

    def run_cell(cell: dict) -> dict:
        overrides: dict = {}
        for k, v in cell.items():
            sect, field = k.split(".")
            overrides.setdefault(sect, {})[field] = v
        cfg = load_config(args.config, overrides=overrides)
        tmp = tempfile.mkdtemp(prefix="gnet_cal_")
        tr_over = dict(max_steps=args.steps, checkpoint_dir=f"{tmp}/ck",
                       eval_every=0, snapshot_every=0,
                       log_every=max(args.steps, 1))
        if cfg.train.lr_schedule == "step" and not cfg.train.lr_decay_steps:
            tr_over["lr_decay_steps"] = (args.steps * 2 // 3,)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **tr_over))
        state = train(cfg, train_db, pool_impl=pool_impl,
                      metrics_path=f"{tmp}/m.jsonl")
        model = build_model(cfg, pool_impl)
        return evaluate_model(
            state.params, model, val_db,
            batch_size=cfg.train.batch_size,
            bucket_sizes=cfg.data.bucket_sizes)

    def show(cell):
        return {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in cell.items()}

    results = []
    if args.grid:
        keys = list(grid)
        for combo in itertools.product(*grid.values()):
            cell = dict(zip(keys, combo))
            stats = run_cell(cell)
            results.append((stats["AP"], show(cell), stats))
            print(json.dumps({"cell": show(cell), "AP": stats["AP"],
                              "AP50": stats["AP50"]}), flush=True)
    else:
        # One-at-a-time sensitivity: base config once, then each knob
        # option alone. The per-knob AP delta IS the parity playbook.
        base_stats = run_cell({})
        print(json.dumps({"cell": "BASE", "AP": base_stats["AP"],
                          "AP50": base_stats["AP50"]}), flush=True)
        results.append((base_stats["AP"], {"BASE": True}, base_stats))
        base_vals = {
            "matching.thresholds": tuple(base.matching.thresholds),
            "loss.pos_weight_mode": base.loss.pos_weight_mode,
            "loss.normalize": base.loss.normalize,
            "model.score_rank_feature": base.model.score_rank_feature,
            "train.learning_rate": base.train.learning_rate,
            "train.lr_schedule": base.train.lr_schedule,
            "model.num_blocks": base.model.num_blocks,
        }
        for key, options in {**grid, **oat_extra}.items():
            for v in options:
                if v == base_vals.get(key):
                    continue
                cell = {key: v}
                stats = run_cell(cell)
                delta = stats["AP"] - base_stats["AP"]
                results.append((stats["AP"], show(cell), stats))
                print(json.dumps({"cell": show(cell), "AP": stats["AP"],
                                  "AP50": stats["AP50"],
                                  "delta_vs_base": round(delta, 4)}),
                      flush=True)

    results.sort(key=lambda r: -r[0])
    print("\n=== ranked (best first) ===")
    for ap, cell, _ in results:
        print(f"AP {ap:.4f}  {cell}")
    best_ap, best_cell, _ = results[0]
    print(f"\nbest cell: {best_cell} (AP {best_ap:.4f}, "
          f"raw baseline {raw['AP']:.4f})")


if __name__ == "__main__":
    main()
