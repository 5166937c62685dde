"""Reference-checkpoint importer (utils/import_weights.py).

The reference mount is empty (SURVEY.md preamble), so these tests build
SYNTHETIC reference-style checkpoints by inverting the mapping: our
known params tree is re-emitted under guessed TF1 variable names
(pair FC1 re-concatenated from wa/wb/wg), imported back, and compared
exactly. That proves the split/assignment machinery; the name guesses
themselves stay MEDIUM confidence until a real checkpoint exists.
"""

import numpy as np
import pytest

import jax

from gossipnet_tpu.config import Config, ModelConfig
from gossipnet_tpu.train import build_model
from gossipnet_tpu.utils import import_weights as iw


def _template(num_blocks=2, num_classes=1):
    cfg = Config(model=ModelConfig(num_blocks=num_blocks,
                                   num_classes=num_classes))
    model = build_model(cfg, "dense")
    n = 32
    args = [np.zeros((1, n, 4), np.float32), np.zeros((1, n), np.float32),
            np.ones((1, n), bool)]
    if num_classes > 1:
        args.append(np.zeros((1, n), np.int32))
    return model.init(jax.random.PRNGKey(0), *args)["params"]


def _randomized(template, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda x: rng.normal(0, 1, x.shape).astype(np.float32), template)


def _to_reference_vars(params, fc1_order=("ri", "rj", "g"),
                       prefix="gnet/"):
    """Inverse mapping: our tree -> TF1-style flat variable dict."""
    out = {}
    flat = iw._flatten(iw.jax_to_numpy(params))
    blocks = sorted({p.split("/")[0] for p in flat
                     if p.startswith("block_")})
    part = {"ri": "pair_wa", "rj": "pair_wb", "g": "pair_wg"}
    for b in blocks:
        k = b.split("_")[1]
        out[f"{prefix}block{k}/pair_fc1/weights"] = np.concatenate(
            [flat[f"{b}/{part[o]}"] for o in fc1_order], axis=0)
        out[f"{prefix}block{k}/pair_fc1/biases"] = flat[f"{b}/pair_b1"]
        out[f"{prefix}block{k}/pair_fc2/weights"] = flat[f"{b}/pair_w2"]
        out[f"{prefix}block{k}/pair_fc2/biases"] = flat[f"{b}/pair_b2"]
        out[f"{prefix}block{k}/reduce/weights"] = flat[f"{b}/reduce/kernel"]
        out[f"{prefix}block{k}/reduce/biases"] = flat[f"{b}/reduce/bias"]
        out[f"{prefix}block{k}/expand_1/weights"] = flat[f"{b}/expand/kernel"]
        out[f"{prefix}block{k}/expand_1/biases"] = flat[f"{b}/expand/bias"]
        out[f"{prefix}block{k}/expand_2/weights"] = \
            flat[f"{b}/expand_out/kernel"]
        out[f"{prefix}block{k}/expand_2/biases"] = \
            flat[f"{b}/expand_out/bias"]
    out[f"{prefix}init_fc/weights"] = flat["init_fc/kernel"]
    out[f"{prefix}init_fc/biases"] = flat["init_fc/bias"]
    out[f"{prefix}logits/weights"] = flat["head/kernel"]
    out[f"{prefix}logits/biases"] = flat["head/bias"]
    return out


def _assert_trees_equal(a, b):
    fa, fb = iw._flatten(iw.jax_to_numpy(a)), iw._flatten(iw.jax_to_numpy(b))
    assert sorted(fa) == sorted(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_roundtrip_default_rules():
    template = _template()
    truth = _randomized(template)
    variables = _to_reference_vars(truth)
    # Adam slots and bookkeeping must be skipped silently.
    variables["gnet/block0/reduce/weights/Adam"] = np.zeros((128, 32))
    variables["gnet/block0/reduce/weights/Adam_1"] = np.zeros((128, 32))
    variables["global_step"] = np.asarray(1000)
    variables["beta1_power"] = np.asarray(0.9)
    imported, report = iw.import_params(template, variables)
    _assert_trees_equal(imported, truth)
    assert len(report.skipped_slots) == 4
    assert report.unmatched_sources == []


def test_fc1_order_changes_split():
    template = _template(num_blocks=1)
    truth = _randomized(template, seed=1)
    variables = _to_reference_vars(truth, fc1_order=("g", "ri", "rj"))
    # Importing with the WRONG order must not equal truth...
    wrong, _ = iw.import_params(template, variables)
    flat_w = iw._flatten(wrong)
    flat_t = iw._flatten(iw.jax_to_numpy(truth))
    assert not np.array_equal(flat_w["block_0/pair_wg"],
                              flat_t["block_0/pair_wg"])
    # ...and with the matching order must round-trip exactly.
    right, _ = iw.import_params(template, variables,
                                fc1_order=("g", "ri", "rj"))
    _assert_trees_equal(right, truth)


def test_missing_leaf_raises_with_inventory():
    template = _template(num_blocks=1)
    variables = _to_reference_vars(_randomized(template))
    del variables["gnet/logits/weights"]
    with pytest.raises(ValueError) as e:
        iw.import_params(template, variables)
    msg = str(e.value)
    assert "head/kernel" in msg            # the unassigned leaf
    assert "gnet/init_fc/weights" in msg   # the inventory


def test_shape_mismatch_raises():
    template = _template(num_blocks=1)
    variables = _to_reference_vars(_randomized(template))
    variables["gnet/logits/weights"] = np.zeros((64, 1), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        iw.import_params(template, variables)


def test_custom_rules_and_transpose(tmp_path):
    """A --map JSON with transpose handles [out, in]-stored kernels."""
    import json

    template = _template(num_blocks=1)
    truth = _randomized(template, seed=2)
    variables = _to_reference_vars(truth)
    variables["gnet/logits/weights"] = variables["gnet/logits/weights"].T
    rules_path = tmp_path / "rules.json"
    rules_path.write_text(json.dumps(
        [{"pattern": r"gnet/logits/weights", "target": "head/kernel",
          "transpose": True}]
        + [{"pattern": r.pattern, "target": r.target}
           for r in iw.DEFAULT_RULES]))
    imported, _ = iw.import_params(
        template, variables, iw.rules_from_json(rules_path))
    _assert_trees_equal(imported, truth)


def test_npz_variable_loading(tmp_path):
    template = _template(num_blocks=1)
    truth = _randomized(template, seed=3)
    variables = _to_reference_vars(truth)
    path = tmp_path / "vars.npz"
    np.savez(path, **variables)
    loaded = iw.load_variables(path)
    imported, _ = iw.import_params(template, loaded)
    _assert_trees_equal(imported, truth)


def test_cli_end_to_end(tmp_path):
    """scripts/import_weights.py: NPZ vars in -> Rescorer-loadable
    params NPZ out, and the imported model produces identical scores to
    the source parameters."""
    import subprocess
    import sys

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.utils.export import load_params_npz

    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(
        "model:\n  num_blocks: 2\ndata:\n  bucket_sizes: [32]\n")
    template = _template(num_blocks=2)
    truth = _randomized(template, seed=4)
    src = tmp_path / "ref_vars.npz"
    np.savez(src, **_to_reference_vars(truth))
    out = tmp_path / "imported.npz"
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": str(tmp_path), "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    r = subprocess.run(
        [sys.executable, "/root/repo/scripts/import_weights.py",
         "--src", str(src), "-c", str(cfg_path), "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    assert "assigned" in r.stdout

    cfg = load_config(str(cfg_path))
    rng = np.random.default_rng(7)
    xy = rng.uniform(0, 100, (10, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 15], axis=1)
    scores = rng.uniform(0, 1, 10).astype(np.float32)
    got = Rescorer(cfg, load_params_npz(out), pool_impl="dense",
                   mesh=None)(boxes, scores)
    want = Rescorer(cfg, truth, pool_impl="dense", mesh=None)(boxes, scores)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tf_checkpoint_loading(tmp_path):
    """load_variables against a GENUINE TF checkpoint (written with
    tf.train.Checkpoint here; tf.train.load_checkpoint reads TF1 Saver
    checkpoints through the same API)."""
    tf = pytest.importorskip("tensorflow")

    v1 = tf.Variable(np.arange(6, dtype=np.float32).reshape(2, 3),
                     name="gnet/logits/weights")
    v2 = tf.Variable(np.ones((3,), np.float32), name="gnet/logits/biases")
    ckpt = tf.train.Checkpoint(w=v1, b=v2)
    prefix = ckpt.save(str(tmp_path / "ref"))
    variables = iw.load_variables(prefix)
    arrays = {tuple(np.shape(v)) for v in variables.values()}
    assert (2, 3) in arrays and (3,) in arrays
