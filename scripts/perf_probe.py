import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.config import Config, ModelConfig
from gossipnet_tpu.train import build_model
from gossipnet_tpu.models.gossipnet import PairParams
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise import pallas_pair_pool

B, N, P = 8, 1024, 32
rng = np.random.default_rng(0)
data = _synthetic_arrays(batch=B, n=N, seed=0)
boxes = jnp.asarray(data.boxes); scores = jnp.asarray(data.scores); valid = jnp.asarray(data.valid)

def timed(name, fn, chain_in, K=30):
    x = chain_in
    float(jnp.sum(fn(x)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(K):
        x = fn(x)
    s = float(jnp.sum(x))
    dt = (time.perf_counter()-t0)/K
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt

# pool-only
params = PairParams(*[jnp.asarray(rng.normal(0,0.3,s).astype(np.float32)) for s in
                      [(P,P),(P,P),(8,P),(P,),(P,P),(P,)]])
cols = pf.det_columns(boxes, scores, valid)
cs = pf.stack_columns(cols)
bb = jnp.asarray(rng.normal(0,1,(B,N,P)).astype(np.float32))
pool = jax.jit(lambda a: pallas_pair_pool(cs, a, bb, params, 0.2))
timed("pool-only (1 block's pair stage)", pool, bb)

# model scaling in blocks
for nb in (1, 2, 4):
    cfg = Config(model=ModelConfig(num_blocks=nb, feature_dim=128, reduced_dim=32, pairwise_dim=32))
    model = build_model(cfg, pool_impl="pallas")
    prms = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    f = jax.jit(lambda sc: model.apply({"params": prms}, boxes, sc, valid))
    timed(f"model {nb} blocks", f, scores, K=20)
print("DONE", flush=True)
