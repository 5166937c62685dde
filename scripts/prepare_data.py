"""Data preparation: fetch/convert COCO GT + precomputed detections.

Reference: data/ fetch scripts download COCO annotations and the authors'
precomputed Faster-R-CNN detection dumps and convert them to the roidb
pickle format (SURVEY.md §2.1 #8). The rebuild's equivalent:

- ``download``: prints/executes the curl commands for COCO annotations
  and expects a detections source (any COCO-results-format JSON from a
  modern detector works — torchvision's fasterrcnn_resnet50_fpn output,
  detectron2 inference dumps, etc.).
- ``convert``: normalizes detections into the compact NPZ layout
  gossipnet_tpu.data.roidb.load_detections reads (xyxy boxes, contiguous
  class labels), which loads ~10x faster than JSON for large dumps.
- ``detect``: (optional, torch present) runs torchvision Faster R-CNN
  over a COCO image directory to PRODUCE the detection dump, for users
  who don't have one.

This environment has no network; commands degrade to printing the steps.
"""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json

import numpy as np

COCO_ANN_URL = "http://images.cocodataset.org/annotations/annotations_trainval2014.zip"


def cmd_download(args):
    print("COCO annotations:")
    print(f"  curl -LO {COCO_ANN_URL} && unzip annotations_trainval2014.zip -d data/")
    print("Detections (pick one):")
    print("  - any COCO-results JSON from your detector")
    print("  - python scripts/prepare_data.py detect --images <dir> --out dets.json")


def cmd_convert(args):
    """COCO-results JSON -> NPZ (image_ids, boxes xyxy, scores, classes)."""
    with open(args.dets) as f:
        dets = json.load(f)
    cat_ids = sorted({d["category_id"] for d in dets})
    if args.person_only:
        cat_ids = [1]
    cat_to_label = {c: i for i, c in enumerate(cat_ids)}
    rows = [d for d in dets if d["category_id"] in cat_to_label]
    n = len(rows)
    image_ids = np.zeros(n, np.int64)
    boxes = np.zeros((n, 4), np.float32)
    scores = np.zeros(n, np.float32)
    classes = np.zeros(n, np.int32)
    for i, d in enumerate(rows):
        image_ids[i] = d["image_id"]
        x, y, w, h = d["bbox"]
        boxes[i] = (x, y, x + w, y + h)
        scores[i] = d["score"]
        classes[i] = cat_to_label[d["category_id"]]
    np.savez_compressed(
        args.out, image_ids=image_ids, boxes=boxes, scores=scores,
        classes=classes, cat_ids=np.asarray(cat_ids, np.int64),
    )
    print(f"wrote {args.out}: {n} detections, {len(cat_ids)} classes")


def cmd_detect(args):
    """Run torchvision Faster R-CNN over an image dir -> COCO-results JSON.

    Produces the 'precomputed FRCN detections' input the reference trains
    from. Requires network-downloaded torchvision weights; in offline
    environments pass --weights to a local file.
    """
    import torch
    import torchvision
    from torchvision.transforms.functional import to_tensor
    from PIL import Image

    model = torchvision.models.detection.fasterrcnn_resnet50_fpn(
        weights="DEFAULT" if args.weights is None else None
    )
    if args.weights:
        model.load_state_dict(torch.load(args.weights, map_location="cpu"))
    model.eval()

    results = []
    img_dir = pathlib.Path(args.images)
    for path in sorted(img_dir.glob("*.jpg")):
        image_id = int(path.stem.split("_")[-1])
        with torch.no_grad():
            out = model([to_tensor(Image.open(path).convert("RGB"))])[0]
        for box, score, label in zip(
            out["boxes"].numpy(), out["scores"].numpy(), out["labels"].numpy()
        ):
            if score < args.min_score:
                continue
            x1, y1, x2, y2 = box.tolist()
            results.append({
                "image_id": image_id,
                "category_id": int(label),
                "bbox": [x1, y1, x2 - x1, y2 - y1],
                "score": float(score),
            })
    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.out}: {len(results)} detections")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("download", help="print fetch instructions")

    c = sub.add_parser("convert", help="COCO-results JSON -> NPZ")
    c.add_argument("--dets", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--person-only", action="store_true")

    d = sub.add_parser("detect", help="produce detections with torchvision")
    d.add_argument("--images", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--weights", default=None)
    d.add_argument("--min-score", type=float, default=0.01)

    args = p.parse_args()
    {"download": cmd_download, "convert": cmd_convert,
     "detect": cmd_detect}[args.cmd](args)


if __name__ == "__main__":
    main()
