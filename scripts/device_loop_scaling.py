import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.train import build_model

cfg = _flagship_cfg()
model = build_model(cfg, pool_impl="pallas")
d = _synthetic_arrays(batch=8, n=1024, seed=0)
boxes = jnp.asarray(d.boxes); scores = jnp.asarray(d.scores); valid = jnp.asarray(d.valid)
params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

@partial(jax.jit, static_argnums=1)
def loop(s, K):
    def body(k, s):
        out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
        return out + k * 1e-7
    return jax.lax.fori_loop(0, K, body, s)

rng = np.random.default_rng(1)
for K in (10, 50, 100):
    s0 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
    float(jnp.sum(loop(s0, K)))  # compile per K
    s1 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
    t0 = time.perf_counter()
    v = float(jnp.sum(loop(s1, K)))
    total = time.perf_counter() - t0
    print(f"K={K}: total {total*1e3:.1f} ms, {total/K*1e3:.2f} ms/iter", flush=True)
print("DONE", flush=True)
