"""Config 1 (BASELINE.json:7): 1-block GossipNet inference, CPU-runnable.

End-to-end minimum slice: load (or synthesize) detections, rescore with a
1-block model, evaluate COCO AP, export COCO-results JSON — the exact
workflow of the reference's eval pass, runnable with no TPU and no
external data. Point --ann/--dets at real COCO files to run the true
config 1.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json

import jax

from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.evaluate import (
    evaluate_model, evaluate_raw_scores, export_coco_results, rescore_roidb,
)
from gossipnet_tpu.train import build_model, create_train_state


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ann", default=None, help="COCO annotation json")
    p.add_argument("--dets", default=None, help="detections json/npz")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--out", default="rescored_results.json")
    args = p.parse_args()

    cfg = Config(
        model=ModelConfig(num_blocks=1, feature_dim=128, reduced_dim=32,
                          pairwise_dim=32),
        data=DataConfig(bucket_sizes=(256, 512, 1024)),
        train=TrainConfig(batch_size=8),
    )
    if args.ann and args.dets:
        from gossipnet_tpu.data.roidb import build_roidb

        roidb = build_roidb(args.ann, args.dets, person_only=True)
    else:
        from gossipnet_tpu.data.synthetic import synthetic_roidb

        print("no --ann/--dets given; using the synthetic fixture set")
        roidb = synthetic_roidb(num_images=16, seed=5)

    model = build_model(
        cfg, "pallas" if jax.default_backend() == "tpu" else "dense"
    )
    it = BatchIterator(roidb, cfg.train.batch_size, cfg.data.bucket_sizes)
    state = create_train_state(cfg, model, next(it))
    params = state.params
    if args.checkpoint_dir:
        from gossipnet_tpu.utils.checkpoint import CheckpointManager

        state, _ = CheckpointManager(args.checkpoint_dir).restore(state)
        params = state.params

    stats = evaluate_model(params, model, roidb,
                           batch_size=cfg.train.batch_size,
                           bucket_sizes=cfg.data.bucket_sizes)
    raw = evaluate_raw_scores(roidb)
    rescored = rescore_roidb(params, model, roidb,
                             cfg.train.batch_size, cfg.data.bucket_sizes)
    n = export_coco_results(roidb, rescored, args.out)
    print(json.dumps({"gossipnet": stats, "raw_scores": raw,
                      "exported": n, "out": args.out}, indent=2))


if __name__ == "__main__":
    main()
