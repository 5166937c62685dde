"""Import a reference (TF-1.x GossipNet) checkpoint into this framework.

Readiness tool for real-data AP parity (VERDICT r2 "missing #2"): maps
the reference's TF variables onto this framework's parameter tree and
writes the portable NPZ format ``utils/export.py`` defines, which
``Rescorer``/``evaluate`` consume directly::

    # inspect what's inside a checkpoint first
    python scripts/import_weights.py --src /path/to/model.ckpt --list

    # import with the default (guessed) name rules
    python scripts/import_weights.py --src model.ckpt -c experiments/\
coco_persons_full.yaml --out imported.npz

    # real checkpoints will likely need a corrected rule map:
    python scripts/import_weights.py --src model.ckpt -c cfg.yaml \
        --map rules.json --fc1-order ri,rj,g --out imported.npz

The importer hard-fails on any unassigned/duplicated/mis-shaped leaf and
prints the full source-variable inventory, so a wrong guess against a
real checkpoint is a loud error to iterate on, never silent garbage.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True,
                   help=".npz variable dump or TF checkpoint prefix")
    p.add_argument("-c", "--config", default=None)
    p.add_argument("--out", default=None, help="output params .npz")
    p.add_argument("--map", dest="rule_map", default=None,
                   help="JSON rule list overriding the default guesses")
    p.add_argument("--fc1-order", default="ri,rj,g",
                   help="reference FC1 input concat order "
                        "(comma list of ri,rj,g)")
    p.add_argument("--list", action="store_true",
                   help="print the source variable inventory and exit")
    args = p.parse_args(argv)

    from gossipnet_tpu.utils import import_weights as iw

    if args.list:
        # shapes only — never materializes a multi-GB checkpoint
        shapes = iw.load_variable_shapes(args.src)
        for name in sorted(shapes):
            print(f"{name}: {shapes[name]}")
        return
    variables = iw.load_variables(args.src)

    import jax

    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.data.bucketing import make_batch
    from gossipnet_tpu.data.synthetic import synthetic_record
    from gossipnet_tpu.train import build_model

    cfg = load_config(args.config)
    model = build_model(cfg, "dense")
    sample = make_batch(
        [synthetic_record(np.random.default_rng(0), 0,
                          num_classes=cfg.model.num_classes)],
        padded_n=min(cfg.data.bucket_sizes))
    template = model.init(
        jax.random.PRNGKey(0), sample.boxes, sample.scores, sample.valid,
        *([sample.classes] if cfg.model.num_classes > 1 else []),
    )["params"]

    rules = (iw.rules_from_json(args.rule_map) if args.rule_map
             else iw.DEFAULT_RULES)
    params, report = iw.import_params(
        template, variables, rules,
        fc1_order=tuple(args.fc1_order.split(",")))
    print(report.summary())

    out = args.out or "imported_params.npz"
    from gossipnet_tpu.utils.export import save_params_npz

    save_params_npz(out, params)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
