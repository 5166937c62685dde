"""Evaluation: rescore a roidb with a trained model and compute COCO AP.

Mirrors the reference's eval pass (SURVEY.md §3.2): forward-only over the
val set, collect (boxes, new_scores, classes), run COCO AP. No NMS is
applied — thresholding/ranking by the rescored output IS the suppression.
Also provides the two baselines the paper compares against: raw detector
scores (no suppression) and tuned GreedyNMS.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import numpy as np

from gossipnet_tpu.data.bucketing import eval_batches
from gossipnet_tpu.data.roidb import Roidb
from gossipnet_tpu.eval.cocoeval import COCOEvaluator
from gossipnet_tpu.models.gossipnet import GossipNet


_SHARDED_INF_CACHE: dict = {}


def sharded_forward_fn(cfg, mesh, params, interpret: bool | None = None):
    """(boxes, scores, valid, classes) -> sigmoid scores over the mesh.

    Adapter putting :func:`make_sharded_inference` behind the
    ``forward_fn`` hook of :func:`rescore_roidb`, so periodic train-time
    eval and the eval CLI run SPMD instead of leaving every chip but
    one idle (VERDICT r2 #4). ``cfg.train.batch_size`` must tile the
    mesh 'data' axis — eval batches are always full-size.

    The jitted executable is CACHED per (config, mesh): params flow in
    as a call argument, so periodic train-time eval reuses one compiled
    function across evals instead of paying a full retrace + compile
    every ``eval_every`` steps.
    """
    import json as _json

    from gossipnet_tpu.config import config_to_dict
    from gossipnet_tpu.parallel.sharding import make_sharded_inference

    key = (mesh, interpret,
           _json.dumps(config_to_dict(cfg), sort_keys=True, default=str))
    fn = _SHARDED_INF_CACHE.get(key)
    if fn is None:
        fn = make_sharded_inference(cfg, mesh, interpret=interpret)
        _SHARDED_INF_CACHE[key] = fn

    def forward(boxes, scores, valid, classes):
        n_data = mesh.shape["data"]
        if boxes.shape[0] % n_data:
            raise ValueError(
                f"eval batch size {boxes.shape[0]} does not tile the "
                f"mesh data axis ({n_data})")
        import jax.numpy as jnp

        return fn(params, {
            "boxes": jnp.asarray(boxes), "scores": jnp.asarray(scores),
            "valid": jnp.asarray(valid), "classes": jnp.asarray(classes),
        })

    return forward


_LOCAL_FWD_CACHE: dict[int, tuple] = {}


def _local_forward(model):
    """Jitted (params, boxes, scores, valid, classes) -> sigmoid scores,
    cached per model INSTANCE. Params are a call argument — closing
    over them would bake the arrays into the jaxpr as constants and
    force a full retrace on every periodic train-time eval (the model
    object is stable across a training run; its params are not)."""
    ent = _LOCAL_FWD_CACHE.get(id(model))
    if ent is not None and ent[0] is model:
        return ent[1]
    multiclass = model.cfg.num_classes > 1

    @jax.jit
    def fwd(params, boxes, scores, valid, classes):
        logits = model.apply(
            {"params": params}, boxes, scores, valid,
            classes if multiclass else None,
        )
        return jax.nn.sigmoid(logits)

    if len(_LOCAL_FWD_CACHE) >= 8:   # bound: tests build many models
        _LOCAL_FWD_CACHE.pop(next(iter(_LOCAL_FWD_CACHE)))
    _LOCAL_FWD_CACHE[id(model)] = (model, fwd)
    return fwd


def rescore_roidb(
    params,
    model: GossipNet,
    roidb: Roidb,
    batch_size: int = 8,
    bucket_sizes: Sequence[int] = (256, 512, 1024),
    forward_fn=None,
) -> dict[int, np.ndarray]:
    """New scores per image id: sigmoid(logit), aligned with the record's
    detection order. One jit specialization per bucket shape.

    ``forward_fn(boxes, scores, valid, classes) -> scores`` overrides
    the local jitted forward (the mesh path passes
    :func:`sharded_forward_fn`, the artifact path an exported call);
    ``model`` may be None when it is given.
    """
    if forward_fn is None:
        fwd = _local_forward(model)

        def forward_fn(boxes, scores, valid, classes):
            return fwd(params, boxes, scores, valid, classes)

    out: dict[int, np.ndarray] = {}
    for batch in eval_batches(roidb, batch_size, bucket_sizes):
        new_scores = np.asarray(forward_fn(
            batch.boxes, batch.scores, batch.valid, batch.classes
        ))
        for i, img_id in enumerate(batch.image_ids):
            if int(img_id) in out:   # repeat-padded tail
                continue
            n_valid = int(batch.valid[i].sum())
            out[int(img_id)] = new_scores[i, :n_valid]
    return out


def _evaluator_for(
    roidb: Roidb, scores_by_image: dict[int, np.ndarray] | None = None,
    keep_by_image: dict[int, np.ndarray] | None = None,
) -> COCOEvaluator:
    ev = COCOEvaluator(num_classes=roidb.num_classes)
    for rec in roidb:
        scores = rec.det_scores
        boxes, classes = rec.det_boxes, rec.det_classes
        if scores_by_image is not None:
            scores = scores_by_image[rec.image_id]
        if keep_by_image is not None:
            keep = keep_by_image[rec.image_id]
            boxes, scores, classes = boxes[keep], scores[keep], classes[keep]
        ev.add_arrays(
            rec.image_id, boxes, scores, classes,
            rec.gt_boxes, rec.gt_classes, rec.gt_crowd,
        )
    return ev


def evaluate_model(
    params, model: GossipNet, roidb: Roidb,
    batch_size: int = 8, bucket_sizes: Sequence[int] = (256, 512, 1024),
    forward_fn=None,
) -> dict[str, float]:
    """COCO stats for the rescored detections."""
    rescored = rescore_roidb(params, model, roidb, batch_size, bucket_sizes,
                             forward_fn=forward_fn)
    return _evaluator_for(roidb, scores_by_image=rescored).summarize()


def export_coco_results(
    roidb: Roidb, scores_by_image: dict[int, np.ndarray], path: str,
    score_threshold: float = 0.0,
) -> int:
    """Write rescored detections as COCO results JSON (the reference's
    eval interchange format — SURVEY.md §3.2 'write COCO-format json').
    Returns the number of exported detections."""
    import json

    results = []
    for rec in roidb:
        new_scores = scores_by_image[rec.image_id]
        for i in range(rec.num_dets):
            s = float(new_scores[i])
            if s < score_threshold:
                continue
            x1, y1, x2, y2 = (float(v) for v in rec.det_boxes[i])
            results.append({
                "image_id": int(rec.image_id),
                "category_id": int(roidb.cat_ids[int(rec.det_classes[i])]),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "score": s,
            })
    with open(path, "w") as f:
        json.dump(results, f)
    return len(results)


def evaluate_raw_scores(roidb: Roidb) -> dict[str, float]:
    """Baseline: rank by raw detector scores, no suppression at all."""
    return _evaluator_for(roidb).summarize()


def evaluate_greedy_nms(
    roidb: Roidb, iou_threshold: float = 0.5
) -> dict[str, float]:
    """Baseline: classic per-class GreedyNMS at the given threshold
    (the reference tunes this threshold; sweep externally)."""
    return evaluate_greedy_nms_sweep(roidb, [iou_threshold])[0][1]


def evaluate_greedy_nms_sweep(
    roidb: Roidb, thresholds: Sequence[float]
) -> list[tuple[float, dict[str, float]]]:
    """GreedyNMS baseline stats at each threshold, sharing one IoU
    matrix + score-ordered scan per (image, class) across the whole
    sweep (:func:`greedy_nms_host`: native C++ ``greedy_nms_multi``
    when the .so is loadable, shared-IoU numpy otherwise; both f64,
    bit-identical keep sets) — the tuned-baseline sweep in one roidb
    pass instead of T."""
    from gossipnet_tpu.ops.nms import greedy_nms_host

    thr = np.asarray(list(thresholds), np.float64)
    keeps: list[dict[int, np.ndarray]] = [{} for _ in thr]
    for rec in roidb:
        keep_mask = np.zeros((len(thr), rec.num_dets), bool)
        for cls in np.unique(rec.det_classes):
            sel = np.where(rec.det_classes == cls)[0]
            kept = greedy_nms_host(
                rec.det_boxes[sel], rec.det_scores[sel], thr
            )
            for k in range(len(thr)):
                keep_mask[k, sel[kept[k]]] = True
        for k in range(len(thr)):
            keeps[k][rec.image_id] = np.where(keep_mask[k])[0]
    return [
        (float(thr[k]),
         _evaluator_for(roidb, keep_by_image=keeps[k]).summarize())
        for k in range(len(thr))
    ]


def main(argv=None) -> None:
    """CLI: rescore a val set with a trained checkpoint and print COCO AP
    alongside the raw-score and (tuned) GreedyNMS baselines — the eval
    pass of the reference's train.py (SURVEY.md §3.2) as a standalone
    tool."""
    import argparse
    import json as _json

    import jax

    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.data.bucketing import BatchIterator
    from gossipnet_tpu.train import build_model, create_train_state
    from gossipnet_tpu.utils.cache import enable_compilation_cache
    from gossipnet_tpu.utils.checkpoint import CheckpointManager

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Evaluate GossipNet rescoring")
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--checkpoint-dir", default=None,
                   help="override cfg.train.checkpoint_dir")
    p.add_argument("--nms-sweep", action="store_true",
                   help="sweep GreedyNMS thresholds for the tuned baseline")
    p.add_argument("--best", action="store_true",
                   help="evaluate the best-val-AP checkpoint (what "
                        "serving loads by default) instead of the "
                        "latest periodic snapshot")
    p.add_argument("--pool-impl", default=None)
    p.add_argument("--artifact", default=None,
                   help="evaluate an exported AOT serving artifact "
                        "(utils/model_artifact.py) instead of a "
                        "checkpoint; -c still selects the eval dataset "
                        "(defaults to the artifact's embedded config)")
    args = p.parse_args(argv)

    artifact = None
    if args.artifact:
        from gossipnet_tpu.utils.model_artifact import ArtifactRescorer

        artifact = ArtifactRescorer(args.artifact)
    if args.config:
        cfg = load_config(args.config)
    elif artifact is not None:
        cfg = artifact.cfg
    else:
        cfg = load_config(None)
    if cfg.data.dataset == "synthetic":
        from gossipnet_tpu.data.synthetic import synthetic_roidb

        roidb = synthetic_roidb(num_images=64, seed=123,
                                num_classes=cfg.model.num_classes)
    elif cfg.data.dataset == "pets":
        from gossipnet_tpu.data.pets import build_pets_roidb

        roidb = build_pets_roidb(cfg.data.ann_file, cfg.data.det_file,
                                 max_dets=cfg.data.max_detections)
    else:
        from gossipnet_tpu.data.roidb import build_roidb

        roidb = build_roidb(cfg.data.ann_file, cfg.data.det_file,
                            person_only=cfg.data.person_only,
                            max_dets=cfg.data.max_detections)

    if artifact is not None:
        # eval_batches pads every batch to exactly batch_size, and the
        # artifact serves only exported (b, n) shapes — so batch_size
        # must BE an exported batch: the largest one <= the configured
        # batch (else the smallest exported).
        exported_bs = sorted({b for b, _ in artifact.exported_shapes()})
        fitting = [b for b in exported_bs if b <= cfg.train.batch_size]
        batch_size = fitting[-1] if fitting else exported_bs[0]
        bucket_sizes = tuple(artifact.cfg.data.bucket_sizes)
        params, model = None, None
        fwd = artifact.forward

        print(f"evaluating artifact {args.artifact} "
              f"({len(artifact.meta['shapes'])} shapes)")
    else:
        batch_size = cfg.train.batch_size
        bucket_sizes = cfg.data.bucket_sizes
        pool_impl = args.pool_impl or (
            "pallas" if jax.default_backend() == "tpu" else "dense"
        )
        model = build_model(cfg, pool_impl)
        it = BatchIterator(roidb, batch_size, bucket_sizes)
        state = create_train_state(cfg, model, next(it))
        ckpt_dir = args.checkpoint_dir or cfg.train.checkpoint_dir
        ckpt = CheckpointManager(ckpt_dir)
        best_dir = Path(ckpt_dir) / "best"
        if args.best and best_dir.exists():
            import orbax.checkpoint as ocp

            state = ocp.StandardCheckpointer().restore(
                best_dir.absolute(), state)
            print(f"restored best-AP checkpoint (step {int(state.step)}) "
                  f"from {best_dir}")
        elif args.best:
            raise SystemExit(f"--best: no best checkpoint in {ckpt_dir} "
                             "(training saves one when a val split is "
                             "configured)")
        elif ckpt.latest_step() is not None:
            state, _ = ckpt.restore(state)
            print(f"restored step {int(state.step)} from {ckpt_dir}")
        else:
            print(f"WARNING: no checkpoint in {ckpt_dir}; evaluating init")
        params = state.params

        from gossipnet_tpu.parallel.sharding import mesh_from_config

        mesh = mesh_from_config(cfg, for_training=False)
        fwd = None
        if mesh is not None:
            fwd = sharded_forward_fn(cfg, mesh, params)
            print(f"evaluating on mesh {dict(mesh.shape)}")
    out = {
        "gossipnet": evaluate_model(
            params, model, roidb,
            batch_size=batch_size,
            bucket_sizes=bucket_sizes,
            forward_fn=fwd,
        ),
        "raw_scores": evaluate_raw_scores(roidb),
    }
    thrs = np.arange(0.3, 0.75, 0.05) if args.nms_sweep else [0.5]
    best = max(evaluate_greedy_nms_sweep(roidb, [float(t) for t in thrs]),
               key=lambda ts: ts[1]["AP"])
    out["greedy_nms"] = {"iou_threshold": best[0], **best[1]}
    print(_json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
