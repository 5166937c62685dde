"""Head-to-head timing for the GNET_PAIR_EXP kernel experiments (r4).

OUTCOME (2026-08-19, BENCHMARKS.md): validity-folding won (-1.2%
dense4096, -3.0% clustered1024) and is now the kernel DEFAULT; the
old unfused neighbor chain is behind GNET_PAIR_EXP=novalidfold.
"jexp1" (one broadcast+tile over the stacked [CJ, TJ] j-column plane
instead of 8 per-field expands) measured neutral and stays a switch.
Both targeted the measured VPU elementwise gap (BENCHMARKS.md "speed
of light": ~3.1 us/tile vs the 1.36 us/tile MXU floor).

GNET_PAIR_EXP is read at module import, so each setting needs a fresh
process: this script measures ONE setting (from the env) over the
three regimes that bound the kernel, using tile_sweep.py's marginal
fori_loop methodology (min over 2 reps of (t24 - t6) / 18). Run via:

    for e in "" jexp1 novalidfold jexp1,novalidfold; do
        GNET_PAIR_EXP=$e python scripts/pair_exp.py; done
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, os, time
from functools import partial

import numpy as np
import jax, jax.numpy as jnp

from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from __graft_entry__ import _synthetic_arrays
from gossipnet_tpu.config import Config, ModelConfig
from gossipnet_tpu.data.synthetic import layout_batch
from gossipnet_tpu.train import build_model

rng = np.random.default_rng(7)
FLAG = dict(num_blocks=16, feature_dim=128, reduced_dim=32, pairwise_dim=32)


def measure(model, params, boxes, scores, valid, k_small=6, k_large=24):
    # args, not closure (KNOWN_ISSUES #4: closure-captured device arrays
    # in a fori_loop lower as inline constants with per-array readback).
    @partial(jax.jit, static_argnums=0)
    def loop(K, params, boxes, valid, s):
        def body(k, s):
            out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
            return out + k * 1e-7
        return jax.lax.fori_loop(0, K, body, s)

    def run(K):
        s0 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
        float(jnp.sum(loop(K, params, boxes, valid, s0)))
        s1 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
        t0 = time.perf_counter()
        v = float(jnp.sum(loop(K, params, boxes, valid, s1)))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    return min((run(k_large) - run(k_small)) / (k_large - k_small)
               for _ in range(2))


REGIMES = (
    # (name, B, N, layout or None->synthetic blob, model extras)
    ("dense4096", 2, 4096, None,
     dict(block_sparse=False, sort_detections=False)),
    ("clustered4096", 2, 4096, "clustered", {}),
    ("clustered1024", 8, 1024, "clustered", {}),
)

exp = os.environ.get("GNET_PAIR_EXP", "")
out = {"exp": exp or "baseline"}
for name, B, N, layout, extra in REGIMES:
    if layout is None:
        d = _synthetic_arrays(batch=B, n=N, seed=0)
    else:
        d = layout_batch(layout, batch=B, n=N, seed=0)
    boxes = jnp.asarray(d.boxes)
    scores = jnp.asarray(d.scores)
    valid = jnp.asarray(d.valid)
    model = build_model(Config(model=ModelConfig(**FLAG, **extra)),
                        pool_impl="pallas")
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
    per = measure(model, params, boxes, scores, valid)
    out[name] = round(per * 1e3, 2)
    print(f"[{out['exp']}] {name}: {per * 1e3:.2f} ms/fwd", flush=True)
print(json.dumps(out), flush=True)
