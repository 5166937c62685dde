import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.train import build_model

cfg = _flagship_cfg()
model = build_model(cfg, pool_impl="pallas")
for B in (16, 32):
    d = _synthetic_arrays(batch=B, n=1024, seed=0)
    boxes = jnp.asarray(d.boxes); scores = jnp.asarray(d.scores); valid = jnp.asarray(d.valid)
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    @partial(jax.jit, static_argnums=1)
    def loop(s, K, boxes=boxes, valid=valid, params=params):
        def body(k, s):
            out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
            return out + k * 1e-7
        return jax.lax.fori_loop(0, K, body, s)
    rng = np.random.default_rng(7)
    def run(k):
        s0 = jnp.asarray(rng.uniform(0,1,scores.shape).astype(np.float32))
        float(jnp.sum(loop(s0, k)))
        s1 = jnp.asarray(rng.uniform(0,1,scores.shape).astype(np.float32))
        t0 = time.perf_counter(); float(jnp.sum(loop(s1, k)))
        return time.perf_counter()-t0
    ts, tl = run(10), run(50)
    per = (tl-ts)/40
    print(f"B={B}: {per*1e3:.3f} ms/fwd -> {B*1024/per:,.0f} dets/s", flush=True)
print("DONE", flush=True)
