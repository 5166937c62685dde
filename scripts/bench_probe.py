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

    t0 = time.time(); jax.block_until_ready(rescore(params, boxes, scores, valid))
    print(f"B={B} compile+first: {time.time()-t0:.1f}s", flush=True)
    sc = scores
    K = 15
    t0 = time.perf_counter()
    for i in range(K):
        sc = rescore(params, boxes, sc, valid)
    jax.block_until_ready(sc)
    dt = (time.perf_counter() - t0) / K
    print(f"B={B} chained: {dt*1e3:.2f} ms/iter -> {B*1024/dt:,.0f} dets/s", flush=True)
    rings = [jax.device_put(jnp.asarray(_synthetic_arrays(batch=B, n=1024, seed=s).scores)) for s in range(4)]
    outs = [None] * 4
    jax.block_until_ready(rings)
    t0 = time.perf_counter()
    for i in range(K):
        outs[i % 4] = rescore(params, boxes, rings[i % 4], valid)
    for o in outs:
        if o is not None:
            jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / K
    print(f"B={B} ring: {dt*1e3:.2f} ms/iter -> {B*1024/dt:,.0f} dets/s", flush=True)
print("DONE", flush=True)
