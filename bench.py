"""Benchmark: rescoring throughput (detections/sec/chip) at N=1024.

North-star target (BASELINE.json:5): >= 50,000 detections/sec rescored
per TPU v5e chip at N=1024 with the flagship 16-block model. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology (validated against several failure modes of the remote-TPU
execution stack):
- sustained throughput is measured with K iterations of the full forward
  chained INSIDE one jitted ``lax.fori_loop`` (each iteration's output
  feeds the next input, plus an iteration-dependent perturbation so no
  two iterations are identical), ended by a host value readback;
- the marginal per-iteration cost comes from two loop lengths (removes
  the fixed per-call dispatch/RPC overhead, ~25-30 ms through the test
  harness's tunnel, which is not part of the framework);
- the loop was verified bit-exact against a host-level chained loop of
  the same jitted step, so all iterations demonstrably execute;
- CORRECTNESS of the measured computation itself is enforced separately
  by the on-chip parity suite (GNET_TPU=1 pytest -m tpu). This matters:
  round 1's numbers passed every consistency check above while an
  XLA:TPU constant-folding miscompile (docs/KNOWN_ISSUES.md) collapsed
  the kernel's actual work — consistency is not correctness. The model
  now guards itself with an optimization barrier; see BENCHMARKS.md
  "Round-2 correction".
"""

import argparse
import json
import time

import numpy as np

TARGET = 50_000.0


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from gossipnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship_cfg, _synthetic_arrays
    from gossipnet_tpu.data.synthetic import BENCH_LAYOUTS, layout_batch
    from gossipnet_tpu.train import build_model

    p = argparse.ArgumentParser()
    p.add_argument("--layout", default="clustered", choices=BENCH_LAYOUTS,
                   help="spatial detection layout (scripts/bench_suite.py "
                        "reports all of them; BENCHMARKS.md has the table)")
    args = p.parse_args(argv)

    on_tpu = jax.default_backend() == "tpu"
    n = 1024 if on_tpu else 256
    batch = 8 if on_tpu else 1

    cfg = _flagship_cfg()
    model = build_model(cfg, pool_impl="pallas" if on_tpu else "dense")
    if args.layout == "clustered":
        data = _synthetic_arrays(batch=batch, n=n, seed=0)
    else:
        data = layout_batch(args.layout, batch=batch, n=n, seed=0)
    boxes = jnp.asarray(data.boxes)
    scores = jnp.asarray(data.scores)
    valid = jnp.asarray(data.valid)
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    # params/boxes/valid are jit ARGUMENTS, not closure captures: inside
    # a fori_loop, closure-captured device arrays lower as inline MLIR
    # constants, and each one is read back device->host at lowering —
    # ~20 min per compile through this harness's RPC tunnel (measured
    # r3). Arguments lower as function parameters, no readback. (Also
    # the safer pattern against the r1 constant-folding miscompile,
    # docs/KNOWN_ISSUES.md #1.)
    @partial(jax.jit, static_argnums=0)
    def loop(k_iters, params, boxes, valid, s):
        def body(k, s):
            out = jax.nn.sigmoid(
                model.apply({"params": params}, boxes, s, valid)
            )
            return out + k * 1e-7  # distinct input every iteration
        return jax.lax.fori_loop(0, k_iters, body, s)

    k_small, k_large = (20, 100) if on_tpu else (2, 6)
    rng = np.random.default_rng(7)

    def run(k):
        s0 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
        float(jnp.sum(loop(k, params, boxes, valid, s0)))  # compile/warm
        s1 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
        t0 = time.perf_counter()
        checksum = float(jnp.sum(loop(k, params, boxes, valid, s1)))
        assert np.isfinite(checksum)
        return time.perf_counter() - t0

    # Repeat the marginal measurement and keep the best estimate: the
    # shared remote chip shows run-to-run variance, and the fastest
    # observation is the least contended one.
    per_iter = min(
        (run(k_large) - run(k_small)) / (k_large - k_small)
        for _ in range(3)
    )
    dets_per_sec = batch * n / per_iter

    print(json.dumps({
        "metric": f"rescored detections/sec/chip @ N={n}, "
                  f"16-block GossipNet ({jax.default_backend()}), "
                  f"layout={args.layout}, sustained on-device",
        "value": round(dets_per_sec, 1),
        "unit": "dets/sec",
        "vs_baseline": round(dets_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
