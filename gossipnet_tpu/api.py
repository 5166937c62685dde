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


class Rescorer:
    """Thread-compatible, jit-caching detection rescorer."""

    def __init__(self, cfg: Config, params, pool_impl: str | None = None):
        self.cfg = cfg
        self.params = params
        if pool_impl is None:
            pool_impl = "pallas" if jax.default_backend() == "tpu" else "dense"
        from gossipnet_tpu.train import build_model

        self.model = build_model(cfg, pool_impl)
        self._jitted = {}

    # --- constructors ---
    @classmethod
    def from_checkpoint(cls, cfg: Config, checkpoint_dir: str,
                        pool_impl: str | None = None,
                        best: bool = True) -> "Rescorer":
        """Load the best-AP (or latest periodic) checkpoint."""
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
        return cls(cfg, restored.params, pool_impl)

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

    # --- public API ---
    def __call__(self, boxes, scores, classes=None) -> np.ndarray:
        """Rescore one image's detections -> new scores [n] in [0, 1]."""
        return self.rescore_batch([(boxes, scores, classes)])[0]

    def rescore_batch(
        self, images: Sequence[tuple], batch_size: int = 8
    ) -> list[np.ndarray]:
        """Rescore many images; images grouped by shape bucket.

        Each element is (boxes [n,4] xyxy, scores [n], classes [n] | None).
        Returns new scores aligned with each image's input order.
        """
        buckets: dict[int, list[int]] = {}
        for idx, (boxes, scores, _) in enumerate(images):
            n = len(scores)
            buckets.setdefault(
                bucket_for(n, self.cfg.data.bucket_sizes), []
            ).append(idx)

        out: list[np.ndarray | None] = [None] * len(images)
        for padded_n, idxs in buckets.items():
            for s in range(0, len(idxs), batch_size):
                group = idxs[s : s + batch_size]
                b = len(group)
                boxes_a = np.zeros((b, padded_n, 4), np.float32)
                scores_a = np.zeros((b, padded_n), np.float32)
                valid_a = np.zeros((b, padded_n), bool)
                classes_a = np.zeros((b, padded_n), np.int32)
                for row, idx in enumerate(group):
                    bx, sc, cl = images[idx]
                    n = min(len(sc), padded_n)
                    boxes_a[row, :n] = np.asarray(bx, np.float32)[:n]
                    scores_a[row, :n] = np.asarray(sc, np.float32)[:n]
                    valid_a[row, :n] = True
                    if cl is not None:
                        classes_a[row, :n] = np.asarray(cl, np.int32)[:n]
                fn = self._fn(b, padded_n)
                new_scores = np.asarray(fn(
                    self.params, jnp.asarray(boxes_a), jnp.asarray(scores_a),
                    jnp.asarray(valid_a), jnp.asarray(classes_a),
                ))
                for row, idx in enumerate(group):
                    n = len(images[idx][1])
                    out[idx] = new_scores[row, :n]
        return out  # type: ignore[return-value]
