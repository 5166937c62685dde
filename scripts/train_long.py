"""Longer stability run: crowd data, periodic eval + best-AP checkpoint."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import numpy as np
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import Config, DataConfig, LossConfig, MatchingConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.synthetic import crowd_roidb
from gossipnet_tpu.evaluate import evaluate_model, evaluate_greedy_nms, evaluate_raw_scores
from gossipnet_tpu.train import build_model, train

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2400
cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32,
                      pairwise_dim=32),
    matching=MatchingConfig(thresholds=(0.5,)),
    loss=LossConfig(),
    train=TrainConfig(batch_size=8, learning_rate=3e-4, lr_schedule="cosine",
                      max_steps=STEPS, log_every=200, snapshot_every=800,
                      eval_every=800, grad_clip_norm=10.0, seed=0,
                      steps_per_call=8, keep_checkpoints=2,
                      checkpoint_dir="/tmp/long_ckpt"),
    data=DataConfig(bucket_sizes=(512,)),
)
mk = dict(num_people=40, dets_per_person=10, occlusion=0.6)
train_db = crowd_roidb(num_images=512, seed=0, **mk)
val_db = crowd_roidb(num_images=64, seed=777, **mk)

t0 = time.time()
state = train(cfg, train_db, val_roidb=val_db, pool_impl="pallas",
              metrics_path="/tmp/long_metrics.jsonl")
wall = time.time() - t0
print(f"trained {STEPS} steps in {wall:.0f}s ({STEPS/wall:.1f} steps/s)", flush=True)

model = build_model(cfg, pool_impl="pallas")
out = {
  "gossipnet": evaluate_model(state.params, model, val_db, batch_size=8,
                              bucket_sizes=cfg.data.bucket_sizes),
  "raw": evaluate_raw_scores(val_db),
  "steps": STEPS, "wall_s": wall,
}
best = None
for t in np.arange(0.25, 0.75, 0.05):
    s = evaluate_greedy_nms(val_db, float(t))
    if best is None or s["AP"] > best[1]["AP"]:
        best = (round(float(t),2), s)
out["greedy_nms"] = {"thr": best[0], **best[1]}
print(json.dumps(out, indent=2), flush=True)
json.dump(out, open("/tmp/long_results.json","w"))
print("DONE", flush=True)
