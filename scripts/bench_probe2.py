import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.train import build_model

cfg = _flagship_cfg()
model = build_model(cfg, pool_impl="pallas")
params = None
for B in (8, 32):
    data = _synthetic_arrays(batch=B, n=1024, seed=0)
    boxes = jnp.asarray(data.boxes); scores = jnp.asarray(data.scores); valid = jnp.asarray(data.valid)
    if params is None:
        params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    @jax.jit
    def rescore(params, boxes, scores, valid):
        return jax.nn.sigmoid(model.apply({"params": params}, boxes, scores, valid))

    t0 = time.time(); v0 = float(jnp.sum(rescore(params, boxes, scores, valid)))
    print(f"B={B} compile+first: {time.time()-t0:.1f}s sum={v0:.3f}", flush=True)
    for K in (10, 40):
        sc = scores
        t0 = time.perf_counter()
        for i in range(K):
            sc = rescore(params, boxes, sc, valid)
        v = float(jnp.sum(sc))   # host readback forces the whole chain
        dt = (time.perf_counter() - t0) / K
        print(f"B={B} K={K} chained+readback: {dt*1e3:.2f} ms/iter -> {B*1024/dt:,.0f} dets/s (sum={v:.3f})", flush=True)
print("DONE", flush=True)
