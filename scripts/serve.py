"""Persistent rescoring server example (ROADMAP serving polish).

Two modes over a loaded checkpoint (api.Rescorer):

JSON-lines stream (default) — one image per line on stdin, responses on
stdout, double-buffered through ``Rescorer.rescore_stream`` (device
computes batch k while the host packs k+1)::

    echo '{"id": 7, "boxes": [[0,0,10,10],[1,1,11,11]],
           "scores": [0.9, 0.8]}' \
      | python scripts/serve.py -c experiments/serving_bucketed.yaml \
            --checkpoint-dir checkpoints

    -> {"id": 7, "new_scores": [0.93, 0.04], "keep": [0]}

COCO-results file mode — rescore a standard COCO detection-results JSON
in one call and write the same format back with updated scores::

    python scripts/serve.py -c cfg.yaml --checkpoint-dir ck \
        --input dets.json --output rescored.json

``--random-init`` builds an untrained model (smoke tests / latency
probes only).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json

import numpy as np

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import load_config


def _build(args) -> Rescorer:
    cfg = load_config(args.config) if args.config else load_config(None)
    if args.random_init:
        import jax
        from gossipnet_tpu.train import build_model

        model = build_model(
            cfg, "pallas" if jax.default_backend() == "tpu" else "dense")
        n0 = cfg.data.bucket_sizes[0]
        params = model.init(
            jax.random.key(0),
            np.zeros((1, n0, 4), np.float32),
            np.zeros((1, n0), np.float32),
            np.ones((1, n0), bool),
            *([np.zeros((1, n0), np.int32)]
              if cfg.model.num_classes > 1 else []),
        )["params"]
        return Rescorer(cfg, params)
    return Rescorer.from_checkpoint(cfg, args.checkpoint_dir)


def serve_stream(rescorer: Rescorer, threshold: float,
                 inp=sys.stdin, out=sys.stdout, sync: bool = False) -> int:
    """JSON-lines loop; returns number of images served.

    Default: double-buffered batching (max throughput; responses may
    trail requests by one batch). ``sync``: answer each request
    immediately (interactive latency, no batching).
    """
    def requests():
        for line in inp:
            line = line.strip()
            if not line:
                continue
            req = json.loads(line)
            yield req

    def respond(req, idx, new_scores):
        keep = np.nonzero(new_scores > threshold)[0]
        out.write(json.dumps({
            "id": req.get("id", idx),
            "new_scores": [round(float(s), 6) for s in new_scores],
            "keep": keep.tolist(),
        }) + "\n")
        out.flush()

    if sync:
        n = 0
        for idx, req in enumerate(requests()):
            new_scores = rescorer(
                np.asarray(req["boxes"], np.float32).reshape(-1, 4),
                np.asarray(req["scores"], np.float32),
                (np.asarray(req["classes"], np.int32)
                 if "classes" in req else None))
            respond(req, idx, new_scores)
            n += 1
        return n

    # Keyed by stream index and popped on response so a long-running
    # server holds at most the in-flight window of requests.
    reqs: dict = {}

    def images():
        for i, req in enumerate(requests()):
            reqs[i] = req
            yield (np.asarray(req["boxes"], np.float32).reshape(-1, 4),
                   np.asarray(req["scores"], np.float32),
                   (np.asarray(req["classes"], np.int32)
                    if "classes" in req else None))

    n = 0
    for idx, new_scores in rescorer.rescore_stream(images()):
        respond(reqs.pop(idx), idx, new_scores)
        n += 1
    return n


# TcpServer lives in the package (gossipnet_tpu/serving.py); re-exported
# here so `from serve import TcpServer`-style uses keep working.
from gossipnet_tpu.serving import TcpServer  # noqa: E402


def _training_cat_ids(rescorer: Rescorer, categories: str | None) -> list:
    """The TRAINING category-id list (label k = cat_ids[k]).

    Labels must be assigned exactly as the training roidb assigned them
    (contiguous index into the annotation file's full category list —
    data/roidb.py:load_coco_gt); deriving them from the det file's own
    category subset would silently shift labels. Sources, in order:
    ``--categories`` (a JSON list of category ids, or a COCO annotation
    JSON with a ``categories`` section), else ``cfg.data.ann_file``.
    """
    src = categories or rescorer.cfg.data.ann_file
    if not src:
        raise ValueError(
            "multiclass file mode needs the training category list to "
            "map category_id -> model label; pass --categories (JSON "
            "list of ids, or the training annotation file) or set "
            "data.ann_file in the config")
    with open(src) as f:
        doc = json.load(f)
    if isinstance(doc, list):
        cat_ids = [int(c) for c in doc]
    else:
        from gossipnet_tpu.data.roidb import coco_cat_ids

        cat_ids = coco_cat_ids(
            doc, person_only=rescorer.cfg.data.person_only)
    if len(cat_ids) != rescorer.cfg.model.num_classes:
        raise ValueError(
            f"category list from {src} has {len(cat_ids)} entries but "
            f"the model has {rescorer.cfg.model.num_classes} classes")
    return cat_ids


def serve_file(rescorer: Rescorer, in_path: str, out_path: str,
               categories: str | None = None) -> int:
    """COCO-results JSON in -> same format out with rescored scores."""
    with open(in_path) as f:
        dets = json.load(f)
    by_image: dict = {}
    for k, d in enumerate(dets):
        by_image.setdefault(int(d["image_id"]), []).append(k)
    images, order = [], []
    multiclass = rescorer.cfg.model.num_classes > 1
    cat_to_label = {}
    if multiclass:
        cat_ids = _training_cat_ids(rescorer, categories)
        cat_to_label = {int(c): i for i, c in enumerate(cat_ids)}
        unknown = {int(d["category_id"]) for d in dets} - set(cat_to_label)
        if unknown:
            raise ValueError(
                f"detection file has category ids {sorted(unknown)[:10]} "
                "not in the training category list; filter the file to "
                "the model's categories first")
    for img_id, idxs in sorted(by_image.items()):
        b = np.asarray(
            [dets[k]["bbox"] for k in idxs], np.float32).reshape(-1, 4)
        boxes = b.copy()
        boxes[:, 2] = b[:, 0] + b[:, 2]
        boxes[:, 3] = b[:, 1] + b[:, 3]
        scores = np.asarray([dets[k]["score"] for k in idxs], np.float32)
        classes = (np.asarray(
            [cat_to_label[int(dets[k]["category_id"])] for k in idxs],
            np.int32) if multiclass else None)
        images.append((boxes, scores, classes))
        order.append(idxs)
    results = rescorer.rescore_batch(images)
    for idxs, new_scores in zip(order, results):
        for k, s in zip(idxs, new_scores):
            dets[k]["score"] = round(float(s), 6)
    with open(out_path, "w") as f:
        json.dump(dets, f)
    return len(images)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--input", default=None, help="COCO-results JSON in")
    p.add_argument("--output", default=None, help="rescored JSON out")
    p.add_argument("--categories", default=None,
                   help="training category list for multiclass file mode "
                        "(JSON list of category ids, or the training COCO "
                        "annotation file); defaults to cfg.data.ann_file")
    p.add_argument("--random-init", action="store_true",
                   help="untrained weights (smoke tests only)")
    p.add_argument("--sync", action="store_true",
                   help="answer each stdin request immediately "
                        "(interactive latency, no batching)")
    p.add_argument("--tcp", type=int, default=None, metavar="PORT",
                   help="serve concurrent clients over TCP on PORT "
                        "(JSON lines per connection; 0 = ephemeral)")
    p.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)
    rescorer = _build(args)
    if args.tcp is not None:
        server = TcpServer(rescorer, host=args.host, port=args.tcp,
                           threshold=args.threshold).start()
        print(f"serving on {args.host}:{server.port}", file=sys.stderr,
              flush=True)
        server.serve_forever()
    elif args.input:
        if args.output:
            out_path = args.output
        else:
            inp = pathlib.Path(args.input)
            out_path = str(inp.with_name(
                inp.stem + "_rescored" + (inp.suffix or ".json")))
        if pathlib.Path(out_path).resolve() == \
                pathlib.Path(args.input).resolve():
            raise SystemExit(
                f"refusing to overwrite input file {args.input}; "
                "pass --output")
        n = serve_file(rescorer, args.input, out_path,
                       categories=args.categories)
        print(f"rescored {n} images", file=sys.stderr)
    else:
        n = serve_stream(rescorer, args.threshold, sync=args.sync)
        print(f"served {n} images", file=sys.stderr)


if __name__ == "__main__":
    main()
