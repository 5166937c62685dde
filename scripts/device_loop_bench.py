import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.train import build_model

cfg = _flagship_cfg()
model = build_model(cfg, pool_impl="pallas")
d = _synthetic_arrays(batch=8, n=1024, seed=0)
boxes = jnp.asarray(d.boxes); scores = jnp.asarray(d.scores); valid = jnp.asarray(d.valid)
params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

K = 50
@jax.jit
def loop(s):
    def body(k, s):
        out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
        return out + k * 1e-7  # distinct every iteration
    return jax.lax.fori_loop(0, K, body, s)

float(jnp.sum(loop(scores)))  # compile + warm
for trial in range(3):
    t0 = time.perf_counter()
    v = float(jnp.sum(loop(scores)))
    dt = (time.perf_counter() - t0) / K
    print(f"device-loop fwd: {dt*1e3:.2f} ms/iter -> {8*1024/dt:,.0f} dets/s (sum={v:.2f})", flush=True)
print("DONE", flush=True)
