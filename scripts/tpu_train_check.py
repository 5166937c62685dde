import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import batch_to_device, build_model, create_train_state, train_step

cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32),
    train=TrainConfig(batch_size=8, learning_rate=1e-4),
    data=DataConfig(bucket_sizes=(1024,)),
)
roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100, dets_per_gt=8, num_clutter=200)
it = BatchIterator(roidb, 8, (1024,), seed=0)
batch = next(it)
print("padded N:", batch.padded_n, "valid/img:", batch.valid.sum(1)[:3], flush=True)
model = build_model(cfg, pool_impl="pallas")
state = create_train_state(cfg, model, batch)
arrays = batch_to_device(batch)
t0=time.time()
state, metrics = train_step(state, arrays, cfg)
print(f"train_step compile+run: {time.time()-t0:.1f}s loss={float(metrics['loss']):.4f}", flush=True)
losses=[]
t0=time.perf_counter()
K=20
for k in range(K):
    state, metrics = train_step(state, arrays, cfg)
losses.append(float(metrics["loss"]))  # readback forces chain
dt=(time.perf_counter()-t0)/K
print(f"train step: {dt*1e3:.1f} ms ({8*1024/dt:,.0f} dets/s trained), loss={losses[-1]:.4f} grad_norm={float(metrics['grad_norm']):.3f}", flush=True)
# loss decreasing over fresh batches
for k in range(30):
    state, metrics = train_step(state, batch_to_device(next(it)), cfg)
print("after 50 steps loss:", float(metrics["loss"]), flush=True)
print("DONE", flush=True)
