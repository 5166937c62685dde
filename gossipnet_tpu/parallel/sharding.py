"""Device-mesh execution: (data, det) sharded training and inference.

The reference is strictly single-device (SURVEY.md §2.3: no DP/TP/PP, no
collectives). The TPU rebuild scales along two axes of a
``jax.sharding.Mesh``:

- ``data``: batch data-parallelism — batches shard across chips, gradients
  pmean over ICI (the XLA-collectives replacement for what NCCL would do
  in a torch port).
- ``det``: detection-axis model parallelism — rows of the O(N^2) pair
  matrix shard across chips (parallel/spmd.py), the sequence-parallel
  analog SURVEY.md §2.3 prescribes for crowded-scene N=4096 workloads.

Everything is expressed with ``jax.shard_map`` over the mesh; XLA inserts
the all-gathers/psums and schedules them on ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gossipnet_tpu.config import Config
from gossipnet_tpu.losses import matching_loss
from gossipnet_tpu.parallel.spmd import DET_AXIS, gossipnet_sharded_forward

DATA_AXIS = "data"


def make_mesh(
    n_data: int | None = None, n_det: int = 1, devices=None
) -> Mesh:
    """Build a ('data', 'det') mesh. n_data defaults to
    len(devices) // n_det."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_det
    assert n_data * n_det == len(devices), (n_data, n_det, len(devices))
    return Mesh(devices.reshape(n_data, n_det), (DATA_AXIS, DET_AXIS))


def mesh_from_config(cfg: Config, devices=None,
                     for_training: bool = True) -> Mesh | None:
    """Build the ('data', 'det') mesh ParallelConfig describes, or None
    for the single-device path.

    This is the ONE decision point the train CLI, train(), and
    api.Rescorer all route through, so a YAML knob
    (``parallel.enable/data_axis/det_axis``) is sufficient to move a
    run onto a mesh. 'auto' uses a mesh iff >1 ACCELERATOR device is
    visible — it never auto-engages on a multi-device CPU host, where
    the sharded Pallas path would silently run in interpret mode at
    orders-of-magnitude slowdown (use 'on' explicitly for CPU-mesh
    tests).
    """
    p = cfg.parallel
    enable = p.enable
    if isinstance(enable, bool):   # YAML 1.1 parses on/off as booleans
        enable = "on" if enable else "off"
    if enable not in ("auto", "on", "off"):
        raise ValueError(f"parallel.enable must be auto|on|off, "
                         f"got {p.enable!r}")
    p = dataclasses.replace(p, enable=enable)
    devices = list(devices if devices is not None else jax.devices())
    if p.enable == "off":
        return None
    if p.enable == "auto" and (
        len(devices) <= 1
        or any(d.platform not in ("tpu", "gpu") for d in devices)
    ):
        return None
    n_det = max(int(p.det_axis), 1)
    if p.data_axis:
        n_data = int(p.data_axis)
    else:
        # data_axis=0 = "use what fits": all remaining devices, but for
        # training never more than evenly divides the batch (auto mode
        # must not reject configs that work single-device).
        n_data = max(len(devices) // n_det, 1)
        if for_training:
            while cfg.train.batch_size % n_data != 0:
                n_data -= 1
    if n_data * n_det > len(devices):
        raise ValueError(
            f"parallel config needs {n_data}x{n_det} devices, "
            f"only {len(devices)} visible"
        )
    if n_data * n_det == 1 and p.enable == "auto":
        return None
    _validate_shapes(cfg, n_data, n_det, for_training)
    return make_mesh(n_data, n_det, devices=devices[: n_data * n_det])


def _validate_shapes(
    cfg: Config, n_data: int, n_det: int, for_training: bool
) -> None:
    # Serving (Rescorer) pads its own batch rows to a data-axis
    # multiple, so only training checks batch_size.
    if for_training and cfg.train.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size {cfg.train.batch_size} not divisible by "
            f"data axis {n_data}"
        )
    bad = [b for b in cfg.data.bucket_sizes if b % n_det != 0]
    if bad:
        raise ValueError(
            f"bucket sizes {bad} not divisible by det axis {n_det}"
        )


def _batch_specs() -> dict[str, P]:
    return {k: P(DATA_AXIS) for k in (
        "boxes", "scores", "valid", "classes",
        "gt_boxes", "gt_classes", "gt_valid", "gt_crowd",
    )}


def _sharded_loss(params, arrays, cfg: Config, n_det: int, interpret):
    multiclass = cfg.model.num_classes > 1
    logits = gossipnet_sharded_forward(
        params, cfg.model,
        arrays["boxes"], arrays["scores"], arrays["valid"],
        arrays["classes"] if multiclass else None,
        num_shards=n_det, interpret=interpret,
        remat=cfg.train.remat_blocks,
    )
    return matching_loss(logits, arrays, cfg)


def _local_grads(params, arrays, cfg: Config, n_det: int, interpret):
    """Per-rank value_and_grad + cross-rank reduction -> replicated grads.

    Every 'det' rank computes the FULL loss from the all-gathered logits
    (parallel/spmd.py), so reverse-mode AD through the all_gather
    (transpose = psum_scatter) already sums the cotangents of all n_det
    identical loss copies: each rank's raw grad is d(n_det * L)/dtheta
    restricted to its local compute. The correct closure over 'det' is
    therefore pmean — psum would double-count by another factor of n_det
    (total n_det^2/n_det = n_det overscale, verified empirically at
    n_det=2; see tests/test_sharding.py::test_sharded_raw_grads_match_local).
    """
    def loss_fn(p):
        return _sharded_loss(p, arrays, cfg, n_det, interpret)

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    if n_det > 1:
        grads = jax.lax.pmean(grads, DET_AXIS)
    grads = jax.lax.pmean(grads, DATA_AXIS)
    metrics = jax.lax.pmean(metrics, DATA_AXIS)
    return grads, metrics


def make_sharded_grads(
    cfg: Config, mesh: Mesh, interpret: bool | None = None,
):
    """Returns jitted (params, arrays) -> (grads, metrics) over the mesh.

    grads are the exact gradients of the global batch-mean loss
    (replicated on every device) — bit-comparable against the
    single-device ``jax.grad`` of the same loss. Exposed so optimizers
    with scale-sensitive behavior (SGD, grad clipping, weight decay) and
    the grad_norm metric see correctly-scaled gradients under
    det-sharding.
    """
    n_det = mesh.shape[DET_AXIS]
    sharded = jax.shard_map(
        partial(_local_grads, cfg=cfg, n_det=n_det, interpret=interpret),
        mesh=mesh,
        in_specs=(P(), _batch_specs()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_train_step(
    cfg: Config, mesh: Mesh, tx: optax.GradientTransformation,
    interpret: bool | None = None,
):
    """Returns jitted (params, opt_state, arrays) -> (params, opt_state,
    metrics) running SPMD over the mesh.

    Parameters and optimizer state are replicated; batches shard over
    'data'; the pair stage shards over 'det'. Gradients close with
    pmean over both axes (see _local_grads for why 'det' is a mean).
    """
    if cfg.loss.normalize == "per_batch" and mesh.shape[DATA_AXIS] > 1:
        # Inside shard_map the loss only sees its local batch shard, so
        # 'per_batch' would silently pool pos/neg weighting per SHARD —
        # gradients would change with the mesh shape while claiming
        # whole-batch semantics. Refuse rather than lie; 'per_image' is
        # mesh-invariant (each image normalizes independently).
        raise ValueError(
            "loss.normalize='per_batch' pools the whole batch into one "
            "weighting problem, which a data-sharded mesh cannot honor "
            f"(data axis = {mesh.shape[DATA_AXIS]}); use "
            "loss.normalize='per_image' or parallel.det_axis-only "
            "sharding")
    n_det = mesh.shape[DET_AXIS]

    def local_step(params, opt_state, arrays):
        grads, metrics = _local_grads(params, arrays, cfg, n_det, interpret)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), _batch_specs()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_inference(
    cfg: Config, mesh: Mesh, interpret: bool | None = None,
):
    """Returns jitted (params, arrays) -> rescored sigmoid scores [B, N],
    batch sharded over 'data', pair rows over 'det'.

    This is the config-5 serving path (BASELINE.json:11): shape-bucketed
    batches stream through one compiled executable per bucket.
    """
    n_det = mesh.shape[DET_AXIS]
    multiclass = cfg.model.num_classes > 1

    def local_fwd(params, arrays):
        logits = gossipnet_sharded_forward(
            params, cfg.model,
            arrays["boxes"], arrays["scores"], arrays["valid"],
            arrays["classes"] if multiclass else None,
            num_shards=n_det, interpret=interpret,
        )
        return jax.nn.sigmoid(logits)

    spec = {k: P(DATA_AXIS) for k in ("boxes", "scores", "valid", "classes")}
    sharded = jax.shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), spec),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
