import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _flagship_cfg, _synthetic_arrays
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import batch_to_device, build_model
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise import _tile_activity

cfg = _flagship_cfg()
model = build_model(cfg, pool_impl="pallas")

# dataset A: bench.py style
dA = _synthetic_arrays(batch=8, n=1024, seed=0)
A = {k: jnp.asarray(getattr(dA, k)) for k in ("boxes","scores","valid")}
# dataset B: breakdown style
roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100, dets_per_gt=8, num_clutter=200)
dB = next(BatchIterator(roidb, 8, (1024,), seed=0))
B = {k: jnp.asarray(getattr(dB, k)) for k in ("boxes","scores","valid")}

params = model.init(jax.random.key(0), A["boxes"], A["scores"], A["valid"])["params"]

def activity(d):
    # emulate model's sort then compute tile flags
    key = jnp.where(d["valid"], 0.5*(d["boxes"][...,0]+d["boxes"][...,2]), jnp.inf)
    perm = jnp.argsort(key, axis=-1)
    boxes = jnp.take_along_axis(d["boxes"], perm[...,None], axis=-2)
    scores = jnp.take_along_axis(d["scores"], perm, axis=-1)
    valid = jnp.take_along_axis(d["valid"], perm, axis=-1)
    cs = pf.stack_columns(pf.det_columns(boxes, scores, valid))
    csT = jnp.swapaxes(cs, 1, 2)
    fl = _tile_activity(csT, cs, 128, 128)
    return float(jnp.mean(fl.astype(jnp.float32)))

print("tile activity A (bench):", activity(A), flush=True)
print("tile activity B (breakdown):", activity(B), flush=True)

@jax.jit
def fwd(s, boxes, valid, k):
    return jax.nn.sigmoid(model.apply({"params": params}, boxes, s + k*1e-7, valid))

for name, d in (("A/bench", A), ("B/breakdown", B)):
    s = d["scores"]
    float(jnp.sum(fwd(s, d["boxes"], d["valid"], 0.0)))
    t0=time.perf_counter(); K=20
    for k in range(K):
        s = fwd(s, d["boxes"], d["valid"], float(k+1))
    float(jnp.sum(s))
    print(f"{name}: {(time.perf_counter()-t0)/K*1e3:.2f} ms/iter", flush=True)
print("DONE", flush=True)
