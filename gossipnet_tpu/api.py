"""High-level serving API: rescore raw detections, NMS-free.

The reference's public surface is "feed detections (boxes, scores,
classes) through the trained Gnet, threshold the new scores"
(SURVEY.md §0; north-star BASELINE.json:5 'Public API mirrors the
reference'). ``Rescorer`` packages that: it loads a trained checkpoint,
pads inputs to shape buckets (one jit specialization per bucket), runs
the Pallas path on TPU, and returns per-detection rescored probabilities
aligned with the input order.

    rescorer = Rescorer.from_checkpoint(cfg, "checkpoints/")
    new_scores = rescorer(boxes, scores)            # one image
    kept = boxes[new_scores > 0.5]                  # thresholding IS NMS

    results = rescorer.rescore_batch(list_of_images)  # bucketed batches
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gossipnet_tpu.config import Config
from gossipnet_tpu.data.bucketing import bucket_for


def _scatter_scores(host_row: np.ndarray, n: int, keep) -> np.ndarray:
    """Map one padded device-output row back to input length ``n``.

    ``keep`` is the kept-index array ``_pack`` produced for this row
    (indices into the ORIGINAL input, ascending) when the image was
    truncated to the bucket size, or None when it fit. Truncated-away
    detections get score 0.0 — "suppressed", matching the documented
    ``truncate=True`` contract (output length always equals input
    length).
    """
    if keep is None:
        return np.asarray(host_row[:n], np.float32)
    out = np.zeros(n, np.float32)
    out[keep] = host_row[: len(keep)]
    return out


class Rescorer:
    """Thread-compatible, jit-caching detection rescorer.

    With a multi-device ``cfg.parallel`` (or an explicit ``mesh``),
    inference runs SPMD over the ('data', 'det') mesh — batches shard
    across chips, pair-matrix rows across the det axis — through the
    same sharded forward the training CLI uses.
    """

    def __init__(self, cfg: Config, params, pool_impl: str | None = None,
                 mesh="config"):
        self.cfg = cfg
        self.params = params
        if pool_impl is None:
            pool_impl = "pallas" if jax.default_backend() == "tpu" else "dense"
        from gossipnet_tpu.train import build_model

        self.model = build_model(cfg, pool_impl)
        if mesh == "config":
            from gossipnet_tpu.parallel.sharding import mesh_from_config

            mesh = mesh_from_config(cfg, for_training=False)
        self.mesh = mesh
        self._jitted = {}
        self._sharded_fn = None

    # --- constructors ---
    @staticmethod
    def load_checkpoint_params(cfg: Config, checkpoint_dir: str,
                               best: bool = True):
        """Just the trained params from the best-AP (or latest periodic)
        checkpoint — no model build, no mesh (tools that only need
        weights, e.g. the artifact export CLI, use this so they run on
        hosts without the training config's device topology)."""
        import orbax.checkpoint as ocp
        from pathlib import Path

        from gossipnet_tpu.data.bucketing import make_batch
        from gossipnet_tpu.data.synthetic import synthetic_record
        from gossipnet_tpu.train import build_model, create_train_state
        from gossipnet_tpu.utils.checkpoint import CheckpointManager

        sample = make_batch(
            [synthetic_record(np.random.default_rng(0), 0,
                              num_classes=cfg.model.num_classes)],
            padded_n=min(cfg.data.bucket_sizes),
        )
        model = build_model(cfg, "dense")
        template = create_train_state(cfg, model, sample)
        best_dir = Path(checkpoint_dir) / "best"
        if best and best_dir.exists():
            restored = ocp.StandardCheckpointer().restore(
                best_dir.absolute(), template
            )
        else:
            restored, _ = CheckpointManager(checkpoint_dir).restore(template)
        return restored.params

    @classmethod
    def from_checkpoint(cls, cfg: Config, checkpoint_dir: str,
                        pool_impl: str | None = None,
                        best: bool = True) -> "Rescorer":
        """Load the best-AP (or latest periodic) checkpoint."""
        params = cls.load_checkpoint_params(cfg, checkpoint_dir, best=best)
        return cls(cfg, params, pool_impl)

    # --- internals ---
    def _fn(self, b: int, n: int):
        key = (b, n)
        if key not in self._jitted:
            multiclass = self.cfg.model.num_classes > 1

            @jax.jit
            def fn(params, boxes, scores, valid, classes):
                logits = self.model.apply(
                    {"params": params}, boxes, scores, valid,
                    classes if multiclass else None,
                )
                return jax.nn.sigmoid(logits)

            self._jitted[key] = fn
        return self._jitted[key]

    def _dispatch(self, boxes_a, scores_a, valid_a, classes_a):
        """Enqueue one padded batch on device; returns (device_array,
        row_count). JAX dispatch is asynchronous — the caller can keep
        packing host batches while this one computes.

        The batch dimension is padded to the next power of two (inert
        rows: valid=False) so the set of compiled shapes is bounded at
        (log2(batch_size)+1) x len(bucket_sizes) — otherwise every
        distinct partial-batch size JIT-compiles its own executable and
        serving latency p99 becomes compile time (measured: 6.5 s p99
        on a 96-request mixed stream vs ~40 ms steady state)."""
        b = scores_a.shape[0]
        b_pad = self._pad_batch(b)
        if b_pad != b:
            pad = ((0, b_pad - b),)
            boxes_a = np.pad(boxes_a, pad + ((0, 0), (0, 0)))
            scores_a = np.pad(scores_a, pad + ((0, 0),))
            valid_a = np.pad(valid_a, pad + ((0, 0),))
            classes_a = np.pad(classes_a, pad + ((0, 0),))
        if self.mesh is None:
            fn = self._fn(*scores_a.shape)
            return fn(
                self.params, jnp.asarray(boxes_a), jnp.asarray(scores_a),
                jnp.asarray(valid_a), jnp.asarray(classes_a),
            ), b
        if self._sharded_fn is None:
            from gossipnet_tpu.parallel.sharding import make_sharded_inference

            self._sharded_fn = make_sharded_inference(self.cfg, self.mesh)
        return self._sharded_fn(self.params, {
            "boxes": jnp.asarray(boxes_a), "scores": jnp.asarray(scores_a),
            "valid": jnp.asarray(valid_a), "classes": jnp.asarray(classes_a),
        }), b

    def _pad_batch(self, b: int) -> int:
        """The padded batch size a b-image group dispatches at (next
        power of two; see _dispatch). Overridden by ArtifactRescorer,
        whose shape set is fixed at export time."""
        b_pad = 1 << max(b - 1, 0).bit_length()         # next pow2 >= b
        if self.mesh is not None:
            # Batch rows must also tile the 'data' mesh axis.
            n_data = self.mesh.shape["data"]
            b_pad = -(-b_pad // n_data) * n_data
        return b_pad

    def reload(self, params=None, *, checkpoint_dir: str | None = None,
               best: bool = True) -> None:
        """Swap serving weights with zero downtime.

        Pass new ``params`` directly, or ``checkpoint_dir`` to load the
        best-AP (or latest) checkpoint from disk. Params are jit
        ARGUMENTS, not closure captures (see ``_fn``/``_dispatch``), so
        no recompilation happens and the swap is one atomic reference
        assignment: batches dispatched before the call finish on the
        old weights, every later dispatch uses the new ones. Safe to
        call from a signal handler or admin thread while a TcpServer
        is serving — this is the production weight-update path
        (``python -m gossipnet_tpu.serving --tcp`` reloads on SIGHUP).
        """
        if (params is None) == (checkpoint_dir is None):
            raise ValueError(
                "pass exactly one of params / checkpoint_dir")
        if checkpoint_dir is not None:
            params = self.load_checkpoint_params(
                self.cfg, checkpoint_dir, best=best)
        else:
            template = jax.tree.structure(self.params)
            got = jax.tree.structure(params)
            if got != template:
                raise ValueError(
                    f"new params tree does not match the serving model: "
                    f"{got} != {template}")
        self.params = params

    def warmup(self, batch_size: int = 8) -> None:
        """Pre-compile every (batch, bucket) shape reachable for
        requests served at ``batch_size`` — after this, no real request
        pays JIT-compile latency (cold-start SLO). Shapes: batch padded
        to powers of two (see _dispatch), one per size bucket."""
        batches = sorted({1 << max(b - 1, 0).bit_length()
                          for b in range(1, batch_size + 1)})
        for n in self.cfg.data.bucket_sizes:
            for b in batches:
                self._run(np.zeros((b, n, 4), np.float32),
                          np.zeros((b, n), np.float32),
                          np.zeros((b, n), bool),
                          np.zeros((b, n), np.int32))

    def _run(self, boxes_a, scores_a, valid_a, classes_a) -> np.ndarray:
        """Dispatch one padded batch and block for the result."""
        out, b = self._dispatch(boxes_a, scores_a, valid_a, classes_a)
        return np.asarray(out)[:b]

    def _check_image(self, idx, scores, classes, truncate):
        if self.cfg.model.num_classes > 1 and classes is None:
            raise ValueError(
                f"image {idx}: multiclass config "
                f"(num_classes={self.cfg.model.num_classes}) requires "
                "per-detection class ids; got classes=None"
            )
        if classes is not None and len(classes) != len(scores):
            # Caught here (not in _pack) so servers answer a per-request
            # error instead of failing the whole co-batched group.
            raise ValueError(
                f"image {idx}: classes length {len(classes)} != "
                f"detections {len(scores)}"
            )
        max_bucket = max(self.cfg.data.bucket_sizes)
        if len(scores) > max_bucket and not truncate:
            raise ValueError(
                f"image {idx} has {len(scores)} detections > largest "
                f"bucket {max_bucket}; raise data.bucket_sizes or pass "
                "truncate=True (lowest-scored overflow gets score 0.0)"
            )

    def _pack(self, group, padded_n):
        """group: list of (idx, boxes, scores, classes) -> padded arrays
        plus one kept-index array (or None) per row.

        An oversized image (n > padded_n) keeps its TOP ``padded_n``
        detections BY SCORE — the same capping rule the training loader
        applies (data/roidb.py score capping, mirroring the reference's
        per-image detection cap) — not an arbitrary input prefix, which
        would silently drop high-scoring detections whenever a caller's
        input is not score-sorted. Selection is a stable sort, so ties
        resolve to the earliest input index, deterministically; the kept
        indices stay in input order so results scatter straight back.
        """
        b = len(group)
        boxes_a = np.zeros((b, padded_n, 4), np.float32)
        scores_a = np.zeros((b, padded_n), np.float32)
        valid_a = np.zeros((b, padded_n), bool)
        classes_a = np.zeros((b, padded_n), np.int32)
        keeps: list = []
        for row, (_, bx, sc, cl) in enumerate(group):
            bx = np.asarray(bx, np.float32)
            sc = np.asarray(sc, np.float32)
            cl = None if cl is None else np.asarray(cl, np.int32)
            keep = None
            if len(sc) > padded_n:
                keep = np.sort(
                    np.argsort(-sc, kind="stable")[:padded_n])
                bx, sc = bx[keep], sc[keep]
                cl = None if cl is None else cl[keep]
            keeps.append(keep)
            n = len(sc)
            boxes_a[row, :n] = bx
            scores_a[row, :n] = sc
            valid_a[row, :n] = True
            if cl is not None:
                classes_a[row, :n] = cl
        return (boxes_a, scores_a, valid_a, classes_a), keeps

    # --- public API ---
    def __call__(self, boxes, scores, classes=None) -> np.ndarray:
        """Rescore one image's detections -> new scores [n] in [0, 1]."""
        return self.rescore_batch([(boxes, scores, classes)])[0]

    def rescore_stream(
        self, images, batch_size: int = 8, truncate: bool = False,
    ):
        """Generator over (index, new_scores) in INPUT ORDER with
        double-buffered dispatch: while the device computes batch k, the
        host packs batch k+1 (JAX dispatch is async; only the yield of
        batch k blocks). Consecutive images sharing a shape bucket are
        batched together up to ``batch_size``.

        Use this for serving pipelines; ``rescore_batch`` is simpler for
        offline lists (it groups globally by bucket instead).
        """
        pending = None   # (device_out, row_count, metas)

        def emit(entry):
            out, b, metas = entry
            host = np.asarray(out)[:b]
            for row, (idx, n, keep) in enumerate(metas):
                yield idx, _scatter_scores(host[row], n, keep)

        def dispatch(group, padded_n):
            arrays, keeps = self._pack(group, padded_n)
            out, b = self._dispatch(*arrays)
            metas = [(idx, len(sc), keeps[row])
                     for row, (idx, _, sc, _) in enumerate(group)]
            return out, b, metas

        cur: list = []
        cur_bucket = None
        for idx, (bx, sc, cl) in enumerate(images):
            self._check_image(idx, sc, cl, truncate)
            bkt = bucket_for(len(sc), self.cfg.data.bucket_sizes)
            if cur and (bkt != cur_bucket or len(cur) == batch_size):
                entry = dispatch(cur, cur_bucket)
                if pending is not None:
                    yield from emit(pending)
                pending = entry
                cur = []
            cur_bucket = bkt
            cur.append((idx, bx, sc, cl))
        if cur:
            entry = dispatch(cur, cur_bucket)
            if pending is not None:
                yield from emit(pending)
            pending = entry
        if pending is not None:
            yield from emit(pending)

    def rescore_async(
        self, images: Sequence[tuple], padded_n: int | None = None,
        truncate: bool = False,
    ) -> "AsyncBatch":
        """Dispatch ONE batch (all images must share a shape bucket)
        without blocking for the result.

        JAX dispatch is asynchronous: this returns as soon as the padded
        batch is enqueued on the device, so a serving pipeline can keep
        packing/dispatching batch k+1 while batch k computes and a
        separate consumer blocks on :meth:`AsyncBatch.wait`. This is the
        building block scripts/serve.py's pipelined TCP server uses.

        ``padded_n``: the shape bucket to pad to (default: smallest
        configured bucket that fits the largest image in the batch).
        """
        for idx, (_, scores, classes) in enumerate(images):
            self._check_image(idx, scores, classes, truncate)
            if (padded_n is not None and len(scores) > padded_n
                    and not truncate):
                raise ValueError(
                    f"image {idx} has {len(scores)} detections > explicit "
                    f"padded_n={padded_n}; pick a larger bucket or pass "
                    "truncate=True (lowest-scored overflow gets score 0.0)"
                )
        if padded_n is None:
            padded_n = bucket_for(max(len(sc) for _, sc, _ in images),
                                  self.cfg.data.bucket_sizes)
        group = [(i,) + tuple(img) for i, img in enumerate(images)]
        arrays, keeps = self._pack(group, padded_n)
        out, b = self._dispatch(*arrays)
        metas = [(len(sc), keeps[i]) for i, (_, sc, _) in enumerate(images)]
        return AsyncBatch(out, b, metas)

    def rescore_batch(
        self, images: Sequence[tuple], batch_size: int = 8,
        truncate: bool = False,
    ) -> list[np.ndarray]:
        """Rescore many images; images grouped by shape bucket.

        Each element is (boxes [n,4] xyxy, scores [n], classes [n] | None;
        classes are REQUIRED for a multiclass config — a missing class id
        raises rather than silently rescoring as class 0).
        Returns new scores aligned with each image's input order.

        Images with more detections than the largest configured bucket
        raise by default. With ``truncate=True`` the top-bucket-size
        detections BY SCORE are rescored (stable ties, input order
        preserved — see ``_pack``) and the overflow gets score 0.0
        (output length always matches input length).
        """
        buckets: dict[int, list[int]] = {}
        for idx, (boxes, scores, classes) in enumerate(images):
            self._check_image(idx, scores, classes, truncate)
            buckets.setdefault(
                bucket_for(len(scores), self.cfg.data.bucket_sizes), []
            ).append(idx)

        out: list[np.ndarray | None] = [None] * len(images)
        for padded_n, idxs in buckets.items():
            for s in range(0, len(idxs), batch_size):
                group = [(idx,) + tuple(images[idx])
                         for idx in idxs[s : s + batch_size]]
                arrays, keeps = self._pack(group, padded_n)
                new_scores = self._run(*arrays)
                for row, (idx, _, sc, _) in enumerate(group):
                    out[idx] = _scatter_scores(
                        new_scores[row], len(sc), keeps[row])
        return out  # type: ignore[return-value]


class AsyncBatch:
    """Handle for one in-flight :meth:`Rescorer.rescore_async` batch.

    ``wait()`` blocks on the device result (the only synchronizing
    operation on this serving path — a host readback, which also blocks
    correctly through remote-PJRT tunnels where ``block_until_ready``
    does not; BENCHMARKS.md methodology notes) and returns per-image
    new-score arrays aligned with the dispatched image order.
    """

    def __init__(self, device_out, row_count: int, metas):
        self._out = device_out
        self._b = row_count
        self._metas = metas

    def wait(self) -> list[np.ndarray]:
        host = np.asarray(self._out)[: self._b]
        return [_scatter_scores(host[row], n, keep)
                for row, (n, keep) in enumerate(self._metas)]
