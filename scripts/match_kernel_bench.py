import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.train import batch_to_device
from gossipnet_tpu.ops.matching import greedy_match_batch

roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100, dets_per_gt=8, num_clutter=200)
batch = next(BatchIterator(roidb, 8, (1024,), seed=0))
arrays = batch_to_device(batch)

for impl in ("scan", "pallas"):
    @partial(jax.jit, static_argnums=1)
    def match_loop(s, K, impl=impl):
        def body(k, s):
            lab = greedy_match_batch(arrays["boxes"], s + k*1e-7, arrays["valid"],
                                     arrays["gt_boxes"], arrays["gt_valid"],
                                     arrays["gt_crowd"], jnp.asarray([0.5]),
                                     impl=impl).labels
            return s * 0.999 + 0.001 * lab[:, 0]
        return jax.lax.fori_loop(0, K, body, s)
    # value parity first
    va = None
    for K in (5, 25):
        s0 = jnp.asarray(np.random.default_rng(K).uniform(0,1,arrays["scores"].shape).astype(np.float32))
        float(jnp.sum(match_loop(s0, K)))
        s1 = jnp.asarray(np.random.default_rng(99).uniform(0,1,arrays["scores"].shape).astype(np.float32))
        t0=time.perf_counter(); v=float(jnp.sum(match_loop(s1, K)))
        print(f"{impl} K={K}: total {(time.perf_counter()-t0)*1e3:.1f} ms (v={v:.4f})", flush=True)
print("DONE", flush=True)
