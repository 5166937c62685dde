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

@jax.jit
def step(s, k):
    out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
    return out + k * 1e-7

@partial(jax.jit, static_argnums=1)
def loop(s, K):
    return jax.lax.fori_loop(
        0, K, lambda k, s: step_inner(s, k), s)

def step_inner(s, k):
    out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
    return out + k * 1e-7

K = 10
# host chain
s = scores
for k in range(K):
    s = step(s, float(k))
host_val = np.asarray(s)
# device loop
dev_val = np.asarray(loop(scores, K))
print("host vs device loop max diff:", np.max(np.abs(host_val - dev_val)), flush=True)
print("host sample:", host_val[0,:3], "dev sample:", dev_val[0,:3], flush=True)

# honest single-call timing with unique inputs (no chaining, full readback)
rng = np.random.default_rng(7)
times = []
for trial in range(8):
    s0 = jnp.asarray(rng.uniform(0,1,scores.shape).astype(np.float32))
    t0 = time.perf_counter()
    v = float(jnp.sum(step(s0, 0.0)))
    times.append(time.perf_counter()-t0)
print("single fwd+readback ms:", [round(t*1e3,1) for t in times], flush=True)
print("DONE", flush=True)
