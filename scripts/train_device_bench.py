import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import (batch_to_device, build_model, create_train_state,
                                 loss_and_metrics, make_optimizer)
import optax

cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32),
    train=TrainConfig(batch_size=8), data=DataConfig(bucket_sizes=(1024,)),
)
roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100, dets_per_gt=8, num_clutter=200)
batch = next(BatchIterator(roidb, 8, (1024,), seed=0))
model = build_model(cfg, pool_impl="pallas")
state = create_train_state(cfg, model, batch)
arrays = batch_to_device(batch)
tx = make_optimizer(cfg)
opt0 = tx.init(state.params)

def one_step(carry, _):
    params, opt_state = carry
    def loss_fn(p):
        return loss_and_metrics(p, model.apply, arrays, cfg)[0]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return (params, opt_state), loss

@partial(jax.jit, static_argnums=2)
def steps(params, opt_state, K):
    (params, opt_state), losses = jax.lax.scan(
        one_step, (params, opt_state), None, length=K)
    return params, opt_state, losses

for K in (5, 25):
    p, o, losses = steps(state.params, opt0, K)
    float(losses[-1])  # compile+run
    t0 = time.perf_counter()
    p, o, losses = steps(state.params, opt0, K)
    v = float(losses[-1])
    print(f"K={K}: total {(time.perf_counter()-t0)*1e3:.1f} ms (last loss {v:.4f})", flush=True)
print("DONE", flush=True)
