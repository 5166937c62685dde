import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp, optax
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import crowd_roidb
from gossipnet_tpu.train import (batch_to_device, build_model, create_train_state,
                                 loss_and_metrics, make_optimizer)

cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32),
    train=TrainConfig(batch_size=2), data=DataConfig(bucket_sizes=(4096,)),
)
# dense crowd at N=4096: ~400 people x 10 dets
roidb = crowd_roidb(num_images=8, seed=0, num_people=380, dets_per_person=10)
batch = next(BatchIterator(roidb, 2, (4096,), seed=0))
print("N:", batch.padded_n, "valid:", batch.valid.sum(1), "G:", batch.gt_boxes.shape, flush=True)
model = build_model(cfg, pool_impl="pallas")
state = create_train_state(cfg, model, batch)
arrays = batch_to_device(batch)
tx = make_optimizer(cfg)
opt0 = tx.init(state.params)

def one_step(carry, _):
    params, opt_state = carry
    loss, grads = jax.value_and_grad(
        lambda p: loss_and_metrics(p, model.apply, arrays, cfg)[0])(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return (optax.apply_updates(params, updates), opt_state), loss

@partial(jax.jit, static_argnums=2)
def steps(params, opt_state, K):
    (p, o), losses = jax.lax.scan(one_step, (params, opt_state), None, length=K)
    return p, o, losses

t0=time.time()
for K in (3, 13):
    p, o, losses = steps(state.params, opt0, K)
    l0 = float(losses[0]); lK = float(losses[-1])
    if K == 3:
        print(f"compile+first: {time.time()-t0:.0f}s loss {l0:.4f}->{lK:.4f}", flush=True)
    t0=time.perf_counter()
    p, o, losses = steps(state.params, opt0, K)
    float(losses[-1])
    print(f"K={K}: total {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
print("DONE", flush=True)
