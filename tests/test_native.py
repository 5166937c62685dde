"""Native C++ library parity vs pure-python/XLA implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from gossipnet_tpu import native
from gossipnet_tpu.ops.matching import greedy_match as xla_greedy_match
from gossipnet_tpu.ops.nms import greedy_nms_np
from tests.conftest import random_boxes
from tests.test_matching import _random_problem


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        assert native.build(), "native build failed (g++ required)"
        # reset the load cache after building
        native._load_failed = False
    assert native.available()


def test_greedy_match_parity_with_xla(rng):
    for _ in range(4):
        boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng)
        thrs = np.array([0.5, 0.75], np.float32)
        labels_c, ignore_c, matched_c = native.greedy_match(
            boxes, scores, valid, gt, gt_valid, gt_crowd, thrs
        )
        res = xla_greedy_match(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
            jnp.asarray(thrs),
        )
        np.testing.assert_array_equal(labels_c, np.asarray(res.labels))
        np.testing.assert_array_equal(ignore_c, np.asarray(res.ignore))
        np.testing.assert_array_equal(matched_c, np.asarray(res.matched_gt))


def test_greedy_match_parity_class_aware_at_zero_threshold(rng):
    """The scan — the documented t <= 0 implementation — must agree
    with the C++ oracle for class-aware matching at threshold 0: it
    used to admit wrong-class GTs through masked 0.0 IoUs (0 >= 0) and
    to crowd-ignore every unmatched det via the zero-folded max
    (r5 review). Thresholds here bypass the config loader's t > 0
    refusal on purpose — the functions are public API."""
    for _ in range(4):
        boxes, scores, valid, gt, gt_valid, gt_crowd = _random_problem(rng)
        det_cls = rng.integers(0, 3, size=len(scores)).astype(np.int32)
        gt_cls = rng.integers(0, 3, size=len(gt_valid)).astype(np.int32)
        thrs = np.array([0.0, 0.3], np.float32)
        labels_c, ignore_c, matched_c = native.greedy_match(
            boxes, scores, valid, gt, gt_valid, gt_crowd, thrs,
            det_classes=det_cls, gt_classes=gt_cls,
        )
        res = xla_greedy_match(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(gt_crowd),
            jnp.asarray(thrs), jnp.asarray(det_cls), jnp.asarray(gt_cls),
            impl="scan",
        )
        np.testing.assert_array_equal(labels_c, np.asarray(res.labels))
        np.testing.assert_array_equal(ignore_c, np.asarray(res.ignore))
        np.testing.assert_array_equal(matched_c, np.asarray(res.matched_gt))


def test_greedy_nms_multi_nan_scores_sort_last(rng):
    """NaN scores: both paths order NaN last (np.argsort semantics);
    the C++ comparator used to be UB with NaN (r5 review). Entry points
    other than greedy_nms_host have no finite-score guard."""
    from gossipnet_tpu.ops.nms import greedy_nms_multi_np

    boxes = random_boxes(rng, 40, scale=80)
    scores = rng.uniform(0, 1, 40)
    scores[[3, 17, 29]] = np.nan
    thrs = np.array([0.3, 0.5, 0.7])
    keep_c = native.greedy_nms_multi(boxes, scores, thrs)
    keep_np = greedy_nms_multi_np(boxes, scores, thrs)
    for a, b in zip(keep_c, keep_np):
        np.testing.assert_array_equal(a, b)


def test_nms_parity(rng):
    boxes = random_boxes(rng, 200, scale=150)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    keep_c = native.greedy_nms(boxes, scores, 0.5)
    keep_py = greedy_nms_np(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep_c), np.sort(keep_py))


def test_eval_match_drives_identical_ap(rng):
    """COCOEvaluator stats identical with and without the native path."""
    from gossipnet_tpu.eval import cocoeval
    from gossipnet_tpu.data.synthetic import synthetic_roidb

    roidb = synthetic_roidb(num_images=8, seed=0, crowd_prob=0.2)

    def run():
        ev = cocoeval.COCOEvaluator(num_classes=1)
        for rec in roidb:
            ev.add_arrays(rec.image_id, rec.det_boxes, rec.det_scores,
                          rec.det_classes, rec.gt_boxes, rec.gt_classes,
                          rec.gt_crowd)
        return ev.summarize()

    with_native = run()
    # Force the numpy fallback.
    saved = native._lib, native._load_failed
    native._lib, native._load_failed = None, True
    try:
        without = run()
    finally:
        native._lib, native._load_failed = saved
    for k in with_native:
        assert np.isclose(with_native[k], without[k]), (k, with_native, without)


def test_build_clears_load_failure_latch(monkeypatch):
    """A probe before the library exists latches _load_failed; a later
    successful build() must clear it so the process picks up the fresh
    .so instead of running numpy fallbacks forever (r5 review)."""
    from gossipnet_tpu import native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_failed", True)
    assert native_mod.available() is False      # latched
    assert native_mod.build()                   # make succeeds (no-op)
    assert native_mod._load_failed is False     # latch cleared
    assert native_mod.available() is True       # fresh load works


def test_loader_falls_through_bad_candidates(tmp_path, monkeypatch):
    """A typo'd GOSSIP_NATIVE_LIB or an unloadable .so must WARN and
    fall through to the next candidate instead of silently disabling
    every native fast path (r5 review finding)."""
    import warnings

    from gossipnet_tpu import native as native_mod

    if native_mod._find_lib() is None:
        pytest.skip("native lib not built")
    # 1. env var points nowhere -> warn, fall through to the real lib.
    monkeypatch.setenv("GOSSIP_NATIVE_LIB", str(tmp_path / "typo.so"))
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_failed", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert native_mod._load() is not None
    assert any("GOSSIP_NATIVE_LIB" in str(x.message) for x in w)
    # 2. env var points at a non-library file -> dlopen fails, warn,
    #    still fall through.
    bad = tmp_path / "bad.so"
    bad.write_text("not an ELF object")
    monkeypatch.setenv("GOSSIP_NATIVE_LIB", str(bad))
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_failed", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert native_mod._load() is not None
    assert any("failed to load" in str(x.message) for x in w)


def test_abi_version_guard(tmp_path, monkeypatch):
    """A library without the version handshake (or with a stale one)
    must be refused — a wrong-ABI .so silently reinterprets buffers."""
    import warnings

    from gossipnet_tpu import native as native_mod

    if native_mod._find_lib() is None:
        pytest.skip("native lib not built")
    # Simulate a stale build: point the loader at a copy of libc-like
    # object with no gossip_abi_version... simplest: monkeypatch the
    # expected version so the real lib 'mismatches'.
    real_abi = native_mod._ABI_VERSION
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_failed", False)
    monkeypatch.setattr(native_mod, "_ABI_VERSION", 999)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert native_mod._load() is None
        assert any("ABI" in str(x.message) for x in w)
    # Restore and confirm the real version loads.
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_load_failed", False)
    monkeypatch.setattr(native_mod, "_ABI_VERSION", real_abi)
    assert native_mod._load() is not None
