"""Tile-size sweep for the pair kernel (VERDICT r1 item 9 / ROADMAP #3).

Sweeps TI x TJ over {128, 256}^2 on the two regimes that bound the
kernel: dense tiles at N=4096 (the worst-case floor — every tile
computed) and block-sparse clustered N=4096 (the crowd-stress headline).
The forward now also carries dimension_semantics=(parallel, parallel,
arbitrary). Winning shape becomes ModelConfig.pair_tile_i/j's default.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, json
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _synthetic_arrays
from gossipnet_tpu.config import Config, ModelConfig
from gossipnet_tpu.train import build_model

rng = np.random.default_rng(7)

def measure(model, params, boxes, scores, valid, k_small=6, k_large=24):
    # args, not closure: closure-captured device arrays in a fori_loop
    # lower as inline constants with per-array RPC readback
    # (KNOWN_ISSUES #4).
    @partial(jax.jit, static_argnums=0)
    def loop(K, params, boxes, valid, s):
        def body(k, s):
            out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
            return out + k * 1e-7
        return jax.lax.fori_loop(0, K, body, s)
    def run(K):
        s0 = jnp.asarray(rng.uniform(0,1,scores.shape).astype(np.float32))
        float(jnp.sum(loop(K, params, boxes, valid, s0)))
        s1 = jnp.asarray(rng.uniform(0,1,scores.shape).astype(np.float32))
        t0=time.perf_counter(); v=float(jnp.sum(loop(K, params, boxes, valid, s1)))
        assert np.isfinite(v)
        return time.perf_counter()-t0
    return min((run(k_large)-run(k_small))/(k_large-k_small) for _ in range(2))

FLAG = dict(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32)
B, N = 2, 4096
d = _synthetic_arrays(batch=B, n=N, seed=0)
boxes = jnp.asarray(d.boxes); scores = jnp.asarray(d.scores); valid = jnp.asarray(d.valid)

results = {}
for regime, extra in (("dense", dict(block_sparse=False, sort_detections=False)),
                      ("sparse", {})):
    for ti in (128, 256):
        for tj in (128, 256):
            mcfg = ModelConfig(**FLAG, pair_tile_i=ti, pair_tile_j=tj, **extra)
            model = build_model(Config(model=mcfg), pool_impl="pallas")
            key = f"{regime} {ti}x{tj}"
            try:
                params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
                per = measure(model, params, boxes, scores, valid)
            except Exception as e:  # big tiles can exceed scoped VMEM
                print(key, f"FAILED: {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            results[key] = {"ms_per_fwd": round(per*1e3, 3),
                            "dets_per_sec": round(B*N/per, 0)}
            print(key, results[key], flush=True)
print(json.dumps(results), flush=True)
print("DONE", flush=True)
