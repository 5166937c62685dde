"""Consolidated measurement/validation probe (VERDICT r2 #8).

One tool replacing the r1/r2 one-off probes (bench_probe*, perf_probe,
step_breakdown*, ab_compare, device_loop_*, loop_verify, match_*_bench,
tpu_parity_check, tpu_train_check, check_4096_training,
train_device_bench — see git history for the originals; their findings
are recorded in BENCHMARKS.md and docs/DESIGN.md §5).

Modes:
  forward   chained forward timing (model or pool-only) at --batch/--n
  step      train-step decomposition: forward / matching / grad
  train     scanned train steps at --n, marginal ms/step + finite loss
  match     greedy matching scan-vs-pallas device-loop timing
  parity    dense vs pallas forward max-abs-diff (quick on-chip check)
  loop      device-loop vs host-chain bit-exactness + single-call times
  activity  block-sparse tile activity fraction for a layout

Timing methodology (docs/DESIGN.md §5): iteration-dependent input
perturbation chained through jit keeps XLA from collapsing repeated
work; `train`/`match` run K inside one lax.fori_loop/scan and report
the marginal time between two loop lengths to remove fixed RPC latency.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gossipnet_tpu.utils.cache import enable_compilation_cache


def _impl(args):
    """'pallas1'/'pallas2' select the kernel version explicitly;
    plain 'pallas' uses the config default. Returns (pool_impl, kernel)."""
    if args.impl in ("pallas1", "pallas2"):
        return "pallas", int(args.impl[-1])
    return args.impl, None


def _model_and_data(args):
    from gossipnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from gossipnet_tpu.data.bucketing import BatchIterator
    from gossipnet_tpu.data.synthetic import crowd_roidb, layout_batch, synthetic_roidb
    from gossipnet_tpu.train import build_model, batch_to_device

    pool_impl, kernel = _impl(args)
    kernel_kw = {} if kernel is None else {"pair_kernel": kernel}
    cfg = Config(
        model=ModelConfig(num_blocks=args.blocks, feature_dim=128,
                          reduced_dim=32, pairwise_dim=32,
                          pair_matmul_dtype=args.dtype,
                          pair_elementwise_dtype=args.ew_dtype,
                          **kernel_kw),
        train=TrainConfig(batch_size=args.batch),
        data=DataConfig(bucket_sizes=(args.n,)),
    )
    if args.layout != "bucketed":
        d = layout_batch(args.layout, batch=args.batch, n=args.n, seed=0)
        arrays = {"boxes": jnp.asarray(d.boxes),
                  "scores": jnp.asarray(d.scores),
                  "valid": jnp.asarray(d.valid)}
    else:
        if args.n >= 4096:
            roidb = crowd_roidb(num_images=8, seed=0, num_people=380,
                                dets_per_person=10)
        else:
            roidb = synthetic_roidb(num_images=32, seed=0, num_gt=100,
                                    dets_per_gt=8, num_clutter=200)
        batch = next(BatchIterator(roidb, args.batch, (args.n,), seed=0))
        arrays = batch_to_device(batch)
        arrays["_batch"] = batch
    model = build_model(cfg, pool_impl=pool_impl)
    return cfg, model, arrays


def _chain_time(name, fn, x0, k_iters):
    # Host readback, not block_until_ready: the latter does not block
    # through the axon tunnel (BENCHMARKS.md, remote-harness pitfalls).
    x = fn(x0, 0.0)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for k in range(k_iters):
        x = fn(x, float(k + 1))
    float(jnp.sum(x))
    dt = (time.perf_counter() - t0) / k_iters * 1e3
    print(f"{name}: {dt:.2f} ms/iter", flush=True)
    return dt


def mode_forward(args):
    cfg, model, arrays = _model_and_data(args)
    boxes, valid = arrays["boxes"], arrays["valid"]
    params = model.init(jax.random.key(0), boxes, arrays["scores"], valid)["params"]

    @jax.jit
    def fwd(s, k):
        return jax.nn.sigmoid(
            model.apply({"params": params}, boxes, s + k * 1e-7, valid))

    dt = _chain_time(
        f"forward B={args.batch} N={args.n} blocks={args.blocks} "
        f"layout={args.layout}", fwd, arrays["scores"], args.iters)
    dets = args.batch * args.n / (dt / 1e3)
    print(f"  -> {dets:,.0f} dets/sec/chip", flush=True)


def mode_step(args):
    from gossipnet_tpu.ops.matching import greedy_match_batch
    from gossipnet_tpu.train import loss_and_metrics

    args.layout = "bucketed"
    cfg, model, arrays = _model_and_data(args)
    arrays.pop("_batch", None)
    boxes, valid = arrays["boxes"], arrays["valid"]
    params = model.init(jax.random.key(0), boxes, arrays["scores"], valid)["params"]

    @jax.jit
    def fwd(s, k):
        return jax.nn.sigmoid(
            model.apply({"params": params}, boxes, s + k * 1e-7, valid))

    @jax.jit
    def match(s, k):
        lab = greedy_match_batch(
            boxes, s + k * 1e-7, valid, arrays["gt_boxes"],
            arrays["gt_valid"], arrays["gt_crowd"],
            jnp.asarray([0.5])).labels
        return s * 0.999 + 0.001 * lab[:, 0]

    def loss_of(p, s):
        arr = dict(arrays)
        arr["scores"] = s
        return loss_and_metrics(p, model.apply, arr, cfg)[0]

    @jax.jit
    def grad(s, k):
        g = jax.grad(loss_of)(params, s)
        return s + 1e-9 * jnp.sum(g["head"]["kernel"])

    _chain_time("forward", fwd, arrays["scores"], args.iters)
    _chain_time("forward+matching", match, arrays["scores"], args.iters)
    _chain_time("forward+backward (grad)", grad, arrays["scores"],
                max(args.iters // 2, 3))


def mode_train(args):
    import optax

    from gossipnet_tpu.train import create_train_state, loss_and_metrics, make_optimizer

    args.layout = "bucketed"
    cfg, model, arrays = _model_and_data(args)
    batch = arrays.pop("_batch")
    state = create_train_state(cfg, model, batch)
    tx = make_optimizer(cfg)
    opt0 = tx.init(state.params)

    def one(jitter):
        def step(carry, _):
            params, opt_state = carry
            arr = dict(arrays)
            arr["scores"] = arrays["scores"] + jitter * 1e-7
            loss, grads = jax.value_and_grad(
                lambda p: loss_and_metrics(p, model.apply, arr, cfg)[0]
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        return step

    @partial(jax.jit, static_argnums=3)
    def steps(params, opt_state, jitter, k):
        (p, o), losses = jax.lax.scan(
            one(jitter), (params, opt_state), None, length=k)
        return p, o, losses

    # The remote stack caches identical (executable, inputs) requests
    # and block_until_ready does not block through the axon tunnel
    # (BENCHMARKS.md): every timed call carries a fresh jitter, and the
    # float(losses[-1]) readback is the completion barrier. Best-of-3
    # per K, like bench.py.
    totals = {}
    jit_counter = [0.0]
    for k in (5, 25):
        _, _, losses = steps(state.params, opt0, jit_counter[0], k)
        float(losses[-1])                        # compile + drain
        best = None
        for _ in range(3):
            jit_counter[0] += 1.0
            t0 = time.perf_counter()
            _, _, losses = steps(state.params, opt0, jit_counter[0], k)
            l_last = float(losses[-1])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        totals[k] = best
        print(f"K={k}: total {totals[k] * 1e3:.1f} ms  "
              f"loss {float(losses[0]):.4f}->{l_last:.4f}", flush=True)
        assert np.isfinite(l_last), "non-finite loss"
    marginal = (totals[25] - totals[5]) / 20 * 1e3
    print(f"marginal train step: {marginal:.1f} ms "
          f"({args.batch * args.n / marginal * 1e3:,.0f} dets/s trained)",
          flush=True)


def mode_match(args):
    from gossipnet_tpu.ops.matching import greedy_match_batch

    args.layout = "bucketed"
    _, _, arrays = _model_and_data(args)
    arrays.pop("_batch", None)

    for impl in ("scan", "pallas"):
        @partial(jax.jit, static_argnums=1)
        def match_loop(s, k_iters, impl=impl):
            def body(k, s):
                lab = greedy_match_batch(
                    arrays["boxes"], s + k * 1e-7, arrays["valid"],
                    arrays["gt_boxes"], arrays["gt_valid"],
                    arrays["gt_crowd"], jnp.asarray([0.5]),
                    impl=impl).labels
                return s * 0.999 + 0.001 * lab[:, 0]
            return jax.lax.fori_loop(0, k_iters, body, s)

        totals = {}
        for k in (5, 25):
            # Warm, then time the MEDIAN of 3 calls with FRESH inputs
            # each (the remote stack caches identical requests, and the
            # first timed call pays tunnel jitter — BENCHMARKS.md).
            warm = jnp.asarray(np.random.default_rng(999 + k).uniform(
                0, 1, arrays["scores"].shape).astype(np.float32))
            jax.block_until_ready(match_loop(warm, k))
            ts = []
            for rep in range(3):
                s0 = jnp.asarray(np.random.default_rng(
                    10 * k + rep).uniform(
                    0, 1, arrays["scores"].shape).astype(np.float32))
                t0 = time.perf_counter()
                v = float(jnp.sum(match_loop(s0, k)))
                ts.append(time.perf_counter() - t0)
            totals[k] = sorted(ts)[1]
            print(f"{impl} K={k}: median {totals[k] * 1e3:.1f} ms of "
                  f"{[round(t * 1e3, 1) for t in ts]} (v={v:.4f})",
                  flush=True)
        print(f"{impl} marginal: {(totals[25] - totals[5]) / 20 * 1e3:.2f} "
              "ms/step", flush=True)


def mode_parity(args):
    from gossipnet_tpu.config import ModelConfig
    from gossipnet_tpu.data.synthetic import layout_batch
    from gossipnet_tpu.models.gossipnet import GossipNet

    d = layout_batch(args.layout if args.layout != "bucketed" else "clustered",
                     batch=args.batch, n=args.n, seed=3)
    boxes, scores, valid = (jnp.asarray(d.boxes), jnp.asarray(d.scores),
                            jnp.asarray(d.valid))
    pool_impl, kernel = _impl(args)
    kernel_kw = {} if kernel is None else {"pair_kernel": kernel}
    mc = ModelConfig(num_blocks=min(args.blocks, 2), feature_dim=64,
                     reduced_dim=32, pairwise_dim=32,
                     pair_matmul_dtype="float32", **kernel_kw)
    dense = GossipNet(mc, pool_impl="dense")
    pallas = GossipNet(mc, pool_impl=pool_impl)
    params = dense.init(jax.random.key(0), boxes, scores, valid)["params"]
    out_d = jax.jit(dense.apply)({"params": params}, boxes, scores, valid)
    out_p = jax.jit(pallas.apply)({"params": params}, boxes, scores, valid)
    diff = float(jnp.max(jnp.abs(out_d - out_p)))
    print(f"dense vs {args.impl}: max abs diff {diff:.3e}", flush=True)
    assert diff < 2e-2, "parity failure"


def mode_loop(args):
    cfg, model, arrays = _model_and_data(args)
    arrays.pop("_batch", None)
    boxes, valid = arrays["boxes"], arrays["valid"]
    scores = arrays["scores"]
    params = model.init(jax.random.key(0), boxes, scores, valid)["params"]

    def step_inner(s, k):
        out = jax.nn.sigmoid(model.apply({"params": params}, boxes, s, valid))
        return out + k * 1e-7

    step = jax.jit(step_inner)

    @partial(jax.jit, static_argnums=1)
    def loop(s, k_iters):
        return jax.lax.fori_loop(0, k_iters, lambda k, s: step_inner(s, k), s)

    k_iters = 10
    s = scores
    for k in range(k_iters):
        s = step(s, float(k))
    host_val = np.asarray(s)
    dev_val = np.asarray(loop(scores, k_iters))
    print("host vs device loop max diff:",
          np.max(np.abs(host_val - dev_val)), flush=True)
    rng = np.random.default_rng(7)
    times = []
    for _ in range(8):
        s0 = jnp.asarray(rng.uniform(0, 1, scores.shape).astype(np.float32))
        t0 = time.perf_counter()
        float(jnp.sum(step(s0, 0.0)))
        times.append(time.perf_counter() - t0)
    print("single fwd+readback ms:",
          [round(t * 1e3, 1) for t in times], flush=True)


def mode_activity(args):
    from gossipnet_tpu.ops import pair_features as pf
    from gossipnet_tpu.ops.pallas.pairwise import _tile_activity

    cfg, model, arrays = _model_and_data(args)
    arrays.pop("_batch", None)
    d = arrays
    key = jnp.where(d["valid"],
                    0.5 * (d["boxes"][..., 0] + d["boxes"][..., 2]), jnp.inf)
    perm = jnp.argsort(key, axis=-1)
    boxes = jnp.take_along_axis(d["boxes"], perm[..., None], axis=-2)
    scores = jnp.take_along_axis(d["scores"], perm, axis=-1)
    valid = jnp.take_along_axis(d["valid"], perm, axis=-1)
    cs = pf.stack_columns(pf.det_columns(boxes, scores, valid))
    fl = _tile_activity(jnp.swapaxes(cs, 1, 2), cs, 128, 128)
    print(f"tile activity ({args.layout}, x-sorted): "
          f"{float(jnp.mean(fl.astype(jnp.float32))):.3f}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["forward", "step", "train", "match",
                                    "parity", "loop", "activity"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--blocks", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--impl", default="pallas",
                   help="pool impl: pallas (config-default kernel) | "
                        "pallas1 | pallas2 | dense")
    p.add_argument("--layout", default="bucketed",
                   help="bucketed | clustered | uniform | mixed | blob")
    p.add_argument("--dtype", default="bfloat16",
                   help="pair_matmul_dtype: bfloat16 | float32")
    p.add_argument("--ew-dtype", default="float32",
                   help="pair_elementwise_dtype: float32 | bfloat16")
    args = p.parse_args(argv)
    enable_compilation_cache()
    globals()[f"mode_{args.mode}"](args)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
