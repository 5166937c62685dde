"""Benchmark: rescoring throughput (detections/sec/chip) at N=1024.

North-star target (BASELINE.json:5): >= 50,000 detections/sec rescored
per TPU v5e chip at N=1024 with the flagship 16-block model. Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

TARGET = 50_000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gossipnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship_cfg, _synthetic_arrays
    from gossipnet_tpu.train import build_model

    on_tpu = jax.default_backend() == "tpu"
    n = 1024
    batch = 8 if on_tpu else 1
    if not on_tpu:
        n = 256  # CPU fallback so the bench always produces a number

    cfg = _flagship_cfg()
    model = build_model(cfg, pool_impl="pallas" if on_tpu else "dense")
    data = _synthetic_arrays(batch=batch, n=n, seed=0)
    boxes = jnp.asarray(data.boxes)
    scores = jnp.asarray(data.scores)
    valid = jnp.asarray(data.valid)
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    @jax.jit
    def rescore(params, boxes, scores, valid):
        return jax.nn.sigmoid(
            model.apply({"params": params}, boxes, scores, valid)
        )

    # Warmup/compile. NB: through remote-execution stacks,
    # block_until_ready alone is not a reliable completion barrier — only
    # a host VALUE READBACK proves the work ran. The timed section chains
    # each iteration's output into the next input (true data dependency)
    # and ends with a readback, so elapsed time covers every iteration.
    float(jnp.sum(rescore(params, boxes, scores, valid)))

    iters = 40 if on_tpu else 5
    sc = scores
    t0 = time.perf_counter()
    for _ in range(iters):
        sc = rescore(params, boxes, sc, valid)
    checksum = float(jnp.sum(sc))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    dets_per_sec = batch * n * iters / dt
    print(json.dumps({
        "metric": f"rescored detections/sec/chip @ N={n}, "
                  f"16-block GossipNet ({jax.default_backend()})",
        "value": round(dets_per_sec, 1),
        "unit": "dets/sec",
        "vs_baseline": round(dets_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
