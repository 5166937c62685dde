import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import batch_to_device, build_model, create_train_state, loss_and_metrics
from gossipnet_tpu.ops.matching import greedy_match_batch

cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32),
    train=TrainConfig(batch_size=8), data=DataConfig(bucket_sizes=(1024,)),
)
roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100, dets_per_gt=8, num_clutter=200)
it = BatchIterator(roidb, 8, (1024,), seed=0)
batch = next(it)
model = build_model(cfg, pool_impl="pallas")
state = create_train_state(cfg, model, batch)
arrays = batch_to_device(batch)

# every fn takes scores and returns something score-shaped -> chainable
@jax.jit
def fwd_chain(s):
    return jax.nn.sigmoid(model.apply({"params": state.params}, arrays["boxes"], s, arrays["valid"]))

@jax.jit
def match_chain(s):
    lab = greedy_match_batch(arrays["boxes"], s, arrays["valid"], arrays["gt_boxes"],
                             arrays["gt_valid"], arrays["gt_crowd"], jnp.asarray([0.5])).labels
    return s * 0.999 + 0.001 * lab[:, 0]

def loss_of(p, s):
    arr = dict(arrays); arr["scores"] = s
    return loss_and_metrics(p, model.apply, arr, cfg)[0]

@jax.jit
def grad_chain(s):
    g = jax.grad(loss_of)(state.params, s)
    return s + 1e-9 * jnp.sum(g["head"]["kernel"])  # depend on grad

def timeit(name, f, K=15):
    s = arrays["scores"]
    float(jnp.sum(f(s)))
    t0 = time.perf_counter()
    for _ in range(K):
        s = f(s)
    float(jnp.sum(s))
    print(f"{name}: {(time.perf_counter()-t0)/K*1e3:.1f} ms", flush=True)

timeit("forward (chained)", fwd_chain)
timeit("matching (chained)", match_chain)
timeit("grad (chained)", grad_chain, K=10)
print("DONE", flush=True)
