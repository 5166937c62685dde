"""Training: jitted optax step, matching-driven loss, checkpoint, eval.

Reference training loop (SURVEY.md §3.1, reference: train.py): per-image
``sess.run`` with Adam, periodic Saver snapshots and mAP evals. TPU-first
redesign: batched static-shape steps (one jit specialization per detection
bucket), the det<->GT matching runs *inside* the jitted step on device
(the reference round-trips to a C++ CPU op every step), deterministic
resumable checkpoints, JSONL metrics.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from gossipnet_tpu.config import Config
from gossipnet_tpu.data.bucketing import Batch, BatchIterator
from gossipnet_tpu.data.roidb import Roidb
from gossipnet_tpu.losses import matching_loss
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.utils.checkpoint import CheckpointManager
from gossipnet_tpu.utils.metrics import MetricsLogger, StepTimer


class TrainState(train_state.TrainState):
    """flax TrainState + PRNG key for any stochastic model extensions."""

    rng: jax.Array = None


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    t = cfg.train
    # Schedule horizons are configured in MICRO-steps but the schedule's
    # count advances once per parameter UPDATE (optax.MultiSteps applies
    # the inner chain every grad_accum_steps micro-steps), so horizons
    # scale by 1/k here. k=1 is the identity.
    k = max(t.grad_accum_steps, 1)
    if t.lr_schedule == "constant":
        sched = optax.constant_schedule(t.learning_rate)
    elif t.lr_schedule == "step":
        # Boundaries that collide after the 1/k scaling must COMPOUND
        # their decay factors, not silently drop one (dict keys would).
        bounds: dict = {}
        for s in t.lr_decay_steps:
            key = max(int(s) // k, 1)
            bounds[key] = bounds.get(key, 1.0) * t.lr_decay_rate
        sched = optax.piecewise_constant_schedule(t.learning_rate, bounds)
    elif t.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            t.learning_rate, max(t.max_steps // k, 1))
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
    if t.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, t.learning_rate,
                                     max(t.warmup_steps // k, 1))
        sched = optax.join_schedules([warm, sched],
                                     [max(t.warmup_steps // k, 1)])
    return sched


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    sched = make_lr_schedule(cfg)
    if t.optimizer == "adam":
        opt = optax.adam(sched)
    elif t.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=t.weight_decay)
    elif t.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {t.optimizer!r}")
    chain = []
    if t.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(t.grad_clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain)
    if t.grad_accum_steps > 1:
        # Average grads over k micro-batches, then apply the whole
        # chain once (clipping sees the accumulated mean, matching the
        # big-batch step it emulates). Works unchanged inside the
        # scanned multi-step path and the shard_map mesh step — the
        # MultiSteps state is just more (replicated) optimizer pytree.
        tx = optax.MultiSteps(tx, every_k_schedule=t.grad_accum_steps)
    return tx


def build_model(cfg: Config, pool_impl: str = "dense") -> GossipNet:
    return GossipNet(cfg.model, pool_impl=pool_impl,
                     remat=cfg.train.remat_blocks)


def create_train_state(
    cfg: Config, model: GossipNet, sample: Batch, seed: int | None = None
) -> TrainState:
    seed = cfg.train.seed if seed is None else seed
    rng, init_rng = jax.random.split(jax.random.key(seed))
    multiclass = cfg.model.num_classes > 1
    params = model.init(
        init_rng,
        jnp.asarray(sample.boxes), jnp.asarray(sample.scores),
        jnp.asarray(sample.valid),
        jnp.asarray(sample.classes) if multiclass else None,
    )["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=make_optimizer(cfg), rng=rng
    )


def loss_and_metrics(
    params, apply_fn, batch_arrays: dict, cfg: Config
) -> tuple[jax.Array, dict]:
    """Forward + matching + weighted logistic loss, all on device.

    Matching consumes the *current* logits (stop-gradient: labels are
    targets, the reference op likewise defines no gradient). The
    matching/loss tail is shared with the det-sharded step
    (losses.matching_loss).
    """
    multiclass = cfg.model.num_classes > 1
    logits = apply_fn(
        {"params": params},
        batch_arrays["boxes"], batch_arrays["scores"],
        batch_arrays["valid"],
        batch_arrays["classes"] if multiclass else None,
    )
    return matching_loss(logits, batch_arrays, cfg)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(state: TrainState, batch_arrays: dict, cfg: Config):
    """One optimizer step. cfg is hashable (frozen dataclass) -> static."""
    def loss_fn(params):
        return loss_and_metrics(params, state.apply_fn, batch_arrays, cfg)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    metrics["grad_norm"] = optax.global_norm(grads)
    return state.apply_gradients(grads=grads), metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_steps_scanned(state: TrainState, stacked_arrays: dict,
                        cfg: Config):
    """K optimizer steps in one device call: lax.scan over a leading
    steps axis of pre-stacked same-shape batches. Amortizes host dispatch
    latency (the reference pays a full sess.run round trip per image;
    here K steps cost one). Returned metrics are means over the K steps
    (grad_norm: last step)."""
    def one(st, arrays):
        def loss_fn(params):
            return loss_and_metrics(params, st.apply_fn, arrays, cfg)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(st.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        return st.apply_gradients(grads=grads), metrics

    state, metrics = jax.lax.scan(one, state, stacked_arrays)
    out = jax.tree.map(jnp.mean, metrics)
    out["grad_norm"] = jax.tree.map(lambda x: x[-1], metrics)["grad_norm"]
    return state, out


def batch_to_device(batch: Batch) -> dict:
    return {
        "boxes": jnp.asarray(batch.boxes),
        "scores": jnp.asarray(batch.scores),
        "valid": jnp.asarray(batch.valid),
        "classes": jnp.asarray(batch.classes),
        "gt_boxes": jnp.asarray(batch.gt_boxes),
        "gt_classes": jnp.asarray(batch.gt_classes),
        "gt_valid": jnp.asarray(batch.gt_valid),
        "gt_crowd": jnp.asarray(batch.gt_crowd),
    }


def train(
    cfg: Config,
    roidb: Roidb,
    val_roidb: Roidb | None = None,
    pool_impl: str = "dense",
    metrics_path: str | None = None,
    max_steps: int | None = None,
    eval_fn=None,
    profile_dir: str | None = None,
    tb_dir: str | None = None,
    stop=None,
) -> TrainState:
    """Full training loop with checkpoint/resume and periodic eval.

    ``eval_fn(state) -> dict`` overrides the default COCO eval (tests use
    this). Resumes automatically from ``cfg.train.checkpoint_dir``.
    ``profile_dir`` enables a jax.profiler trace of steps 10-15.

    ``stop``: optional zero-arg callable polled once per drawn batch —
    when it returns True, training stops EARLY but CLEANLY: queued
    batches flush as single steps, a checkpoint (params + opt state +
    PRNG + iterator cursor) is written, and the state returns as if
    max_steps had been reached. A later ``train()`` against the same
    checkpoint dir resumes bit-exactly (the existing resume guarantee).
    This is the preemption path: the CLI wires SIGTERM/SIGINT to it, so
    a preempted pod job loses at most the in-flight group.
    """
    t = cfg.train
    max_steps = max_steps if max_steps is not None else t.max_steps
    model = build_model(cfg, pool_impl)
    it = BatchIterator(
        roidb, t.batch_size, cfg.data.bucket_sizes,
        seed=t.seed, shuffle=cfg.data.shuffle,
    )
    sample = next(it)
    it.set_state({"epoch": 0, "cursor": 0, "seed": t.seed})  # rewind
    state = create_train_state(cfg, model, sample)

    # --- device mesh (ParallelConfig): the CLI-reachable SPMD path.
    # parallel.enable='auto' puts training on a ('data', 'det') mesh
    # whenever >1 device is visible; 'off' forces the local step.
    from gossipnet_tpu.parallel.sharding import (
        make_sharded_train_step, mesh_from_config,
    )

    mesh = mesh_from_config(cfg)
    sharded_step = None
    if mesh is not None:
        sharded_step = make_sharded_train_step(cfg, mesh, state.tx)
        print(f"training on mesh {dict(mesh.shape)}", flush=True)

    def one_step(state, batch: Batch):
        arrays = batch_to_device(batch)
        if sharded_step is None:
            return train_step(state, arrays, cfg)
        params, opt_state, metrics = sharded_step(
            state.params, state.opt_state, arrays
        )
        return (
            state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state),
            metrics,
        )

    ckpt = CheckpointManager(t.checkpoint_dir, max_to_keep=t.keep_checkpoints)
    if ckpt.latest_step() is not None:
        state, host_state = ckpt.restore(state)
        if "iterator" in host_state:
            it.set_state(host_state["iterator"])
        print(f"resumed from step {int(state.step)}", flush=True)
    if mesh is not None:
        # Restored (or freshly-initialized) arrays may be committed to a
        # single device; replicate them over the mesh before stepping.
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        state = state.replace(
            params=jax.device_put(state.params, rep),
            opt_state=jax.device_put(state.opt_state, rep),
        )

    logger = MetricsLogger(metrics_path, tb_dir=tb_dir)
    timer = StepTimer()
    from gossipnet_tpu.utils.profiling import StepProfiler

    profiler = StepProfiler(profile_dir or "profile",
                            enabled=bool(profile_dir))

    def default_eval(st):
        if val_roidb is None:
            return {}
        from gossipnet_tpu.evaluate import evaluate_model, sharded_forward_fn

        fwd = None
        if mesh is not None:
            # Periodic eval runs the SAME mesh as training — without
            # this, the val pass would run on chip 0 while the rest of
            # the pod idles every eval_every steps (VERDICT r2 #4).
            fwd = sharded_forward_fn(cfg, mesh, st.params)
            print(f"eval on mesh {dict(mesh.shape)}", flush=True)
        return evaluate_model(
            st.params, model, val_roidb,
            batch_size=t.batch_size, bucket_sizes=cfg.data.bucket_sizes,
            forward_fn=fwd,
        )

    eval_fn = eval_fn or default_eval

    spc = max(int(t.steps_per_call), 1)
    # Queues key on BOTH padded shapes: batches in the same detection
    # bucket can carry different padded_g (gt padding rounds to gt_align
    # multiples per batch), and np.stack needs a single static shape.
    queues: dict[tuple[int, int], list[Batch]] = {}

    def run_group(state, group: list[Batch]):
        if len(group) == 1 or sharded_step is not None:
            # The mesh path runs each batch as one SPMD step: same
            # stream order, identical math; scanning is a single-device
            # host-dispatch amortization only.
            mlist = []
            for b in group:
                state, m = one_step(state, b)
                mlist.append(m)
            if len(mlist) == 1:
                return state, mlist[0]
            # Log the per-group MEAN like the scanned path does —
            # otherwise the same config produces a last-batch-sample
            # metric series on a mesh vs a group-mean series on a
            # single device. tree_map stays lazy (no host sync here).
            return state, jax.tree.map(
                lambda *xs: jnp.mean(jnp.stack(xs)), *mlist)
        stacked = {
            k: jnp.asarray(np.stack([getattr(b, k) for b in group]))
            for k in ("boxes", "scores", "valid", "classes",
                      "gt_boxes", "gt_classes", "gt_valid", "gt_crowd")
        }
        return train_steps_scanned(state, stacked, cfg)

    def flush_queues(state):
        """Train every queued batch as single steps (deterministic order)
        so the iterator state always matches the trained stream — run
        before every checkpoint save and at max_steps (no tail-drop)."""
        nonlocal host_step
        for key in sorted(queues):
            for b in queues[key]:
                state, _ = one_step(state, b)
                host_step += 1
            queues[key] = []
        return state

    # The step counter is tracked HOST-SIDE (every one_step call advances
    # exactly one step): reading int(state.step) after each group is a
    # device->host sync that through a remote-PJRT tunnel costs a full
    # RPC round trip (~25-30 ms, BENCHMARKS.md methodology) and stalls
    # the async-dispatch pipeline between device calls. Checkpoint saves
    # still read the authoritative device value (they synchronize anyway).
    host_step = int(state.step)

    def planned_steps() -> int:
        return host_step + sum(len(v) for v in queues.values())

    preempted = False
    while planned_steps() < max_steps:
        if stop is not None and stop():
            preempted = True
            break
        batch = next(it)
        key = (batch.padded_n, batch.padded_g)
        queues.setdefault(key, []).append(batch)
        group = queues[key]
        if len(group) < spc:
            continue
        queues[key] = []
        state, metrics = run_group(state, group)
        host_step += len(group)
        step = host_step
        for b in group:
            timer.tick(int(np.sum(b.valid)))
        profiler.step(step)

        if step % t.log_every < spc or step >= max_steps:
            logger.log(
                step,
                steps_per_sec=timer.steps_per_sec,
                dets_per_sec=timer.dets_per_sec,
                **{k: float(v) for k, v in metrics.items()},
            )
        if t.snapshot_every and step % t.snapshot_every < spc:
            state = flush_queues(state)
            step = int(state.step)
            ckpt.save(step, state, {"iterator": it.get_state()})
        if t.eval_every and step % t.eval_every < spc:
            stats = eval_fn(state)
            if stats:
                logger.log(step, **{f"val_{k}": v for k, v in stats.items()})
                if "AP" in stats:
                    ckpt.maybe_save_best(stats["AP"], state)

    # Tail: batches already drawn from the iterator but still queued
    # train as single steps before the final save, so exactly max_steps
    # batches train and resume state matches the trained stream. The
    # preemption path exits through the same code: flush, save, return.
    state = flush_queues(state)
    profiler.close()
    ckpt.save(int(state.step), state, {"iterator": it.get_state()})
    ckpt.close()
    if preempted:
        print(f"preempted: snapshot at step {int(state.step)}; "
              f"rerun to resume", flush=True)
    return state


def main(argv: list[str] | None = None) -> None:
    """CLI: python -m gossipnet_tpu.train -c experiments/foo.yaml"""
    import argparse

    from gossipnet_tpu.config import load_config

    p = argparse.ArgumentParser(description="Train GossipNet (TPU-native)")
    p.add_argument("-c", "--config", default=None, help="YAML config")
    p.add_argument("--metrics", default="train_metrics.jsonl")
    p.add_argument("--pool-impl", default=None,
                   choices=[None, "dense", "pallas"],
                   help="default: pallas on TPU, dense elsewhere")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="dump a jax.profiler trace of steps 10-15 to DIR")
    p.add_argument("--tensorboard", default=None, metavar="DIR",
                   help="also mirror scalars to TensorBoard summaries")
    args = p.parse_args(argv)

    import jax

    from gossipnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pool_impl = args.pool_impl or (
        "pallas" if jax.default_backend() == "tpu" else "dense"
    )

    cfg = load_config(args.config)
    if cfg.data.dataset == "synthetic":
        from gossipnet_tpu.data.synthetic import synthetic_roidb

        roidb = synthetic_roidb(
            num_images=256, seed=cfg.train.seed,
            num_classes=cfg.model.num_classes,
        )
        val = synthetic_roidb(
            num_images=32, seed=cfg.train.seed + 1,
            num_classes=cfg.model.num_classes,
        )
    elif cfg.data.dataset == "pets":
        from gossipnet_tpu.data.pets import build_pets_roidb

        roidb = build_pets_roidb(
            cfg.data.ann_file, cfg.data.det_file,
            max_dets=cfg.data.max_detections,
        )
        val = (build_pets_roidb(cfg.data.val_ann_file,
                                cfg.data.val_det_file,
                                max_dets=cfg.data.max_detections)
               if cfg.data.val_ann_file else None)
    else:
        from gossipnet_tpu.data.roidb import build_roidb

        roidb = build_roidb(
            cfg.data.ann_file, cfg.data.det_file,
            person_only=cfg.data.person_only,
            max_dets=cfg.data.max_detections,
        )
        val = (build_roidb(cfg.data.val_ann_file, cfg.data.val_det_file,
                           person_only=cfg.data.person_only,
                           max_dets=cfg.data.max_detections)
               if cfg.data.val_ann_file else None)
    # Preemption safety: TPU pod jobs get SIGTERM'd (spot reclaim,
    # scheduler migration). First signal -> finish the in-flight group,
    # flush queued batches, checkpoint (incl. iterator cursor), exit 0;
    # rerunning the same command resumes bit-exactly. A second signal
    # falls through to the default handler (hard kill) in case the
    # graceful path is stuck in a long device call.
    import signal
    import threading

    stop_ev = threading.Event()

    def _preempt(signum, frame):
        del frame
        if stop_ev.is_set():
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)
        print("signal received: checkpointing, then exiting "
              "(signal again to kill)", flush=True)
        stop_ev.set()

    signal.signal(signal.SIGTERM, _preempt)
    signal.signal(signal.SIGINT, _preempt)

    train(cfg, roidb, val_roidb=val, pool_impl=pool_impl,
          metrics_path=args.metrics, profile_dir=args.profile,
          tb_dir=args.tensorboard, stop=stop_ev.is_set)


if __name__ == "__main__":
    main()
