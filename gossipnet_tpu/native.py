"""ctypes bindings for the host-side C++ library (native/gossip_native.cc).

Resolution order (VERDICT r4 #5 — the library must load in INSTALLED
layouts, not only a repo checkout):

1. ``GOSSIP_NATIVE_LIB`` env var — explicit path override.
2. Repo checkout: ``<repo>/native/libgossip_native.so``
   (``make -C native``).
3. Installed package: ``gossipnet_tpu/_gossip_native*.so`` — the
   setuptools Extension built by setup.py (ctypes dlopens it directly;
   no PyInit import needed).

A candidate that is missing, fails to dlopen, or fails the ABI
handshake emits a RuntimeWarning and resolution FALLS THROUGH to the
next candidate (e.g. a stale pre-v5 repo ``.so`` no longer shadows a
freshly built installed extension, and a typo'd ``GOSSIP_NATIVE_LIB``
no longer silently disables every fast path).

All callers have pure-numpy fallbacks, so no usable build at all still
degrades gracefully (but slower — the install smoke test pins that the
wheel ships the fast path). pybind11 is deliberately not used (not in
the environment); the ABI is plain C with a version handshake.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[1] / "native"
_lib = None
_load_failed = False


def _candidates():
    """Yield (origin, path) in resolution order. The env override is
    always yielded (even if the path is missing) so _load can warn
    about it instead of silently ignoring a typo."""
    env = os.environ.get("GOSSIP_NATIVE_LIB")
    if env:
        yield "GOSSIP_NATIVE_LIB", Path(env)
    yield "repo checkout", _NATIVE_DIR / "libgossip_native.so"
    for cand in sorted(Path(__file__).resolve().parent.glob(
            "_gossip_native*.so")):
        yield "installed package", cand


def _find_lib() -> Path | None:
    """First EXISTING candidate path (diagnostics/tests). The loader
    itself may fall through further if this one fails to dlopen or
    fails the ABI handshake."""
    for _, p in _candidates():
        if p.exists():
            return p
    return None


def build(quiet: bool = True) -> bool:
    """Build the shared library via make. Returns success.

    On success the load-failure latch is cleared: a process that
    probed (and cached) a missing library before calling build() picks
    the fresh .so up on the next :func:`available` call instead of
    staying on the numpy fallbacks forever."""
    global _load_failed
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    if _lib is None:
        _load_failed = False
    return True


_ABI_VERSION = 5


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    import warnings

    for origin, lib_path in _candidates():
        if not lib_path.exists():
            if origin == "GOSSIP_NATIVE_LIB":
                warnings.warn(
                    f"GOSSIP_NATIVE_LIB={lib_path} does not exist; "
                    "trying the default locations", RuntimeWarning)
            continue
        try:
            lib = ctypes.CDLL(str(lib_path))
        except OSError as e:
            warnings.warn(
                f"{lib_path} ({origin}) failed to load ({e}); trying "
                "the next candidate", RuntimeWarning)
            continue
        # ABI handshake: a stale prebuilt .so (e.g. the pre-r2 float32
        # eval_match) would silently reinterpret buffers with the wrong
        # element type; refuse anything but the exact expected version
        # (missing symbol == pre-handshake build).
        try:
            lib.gossip_abi_version.restype = ctypes.c_int
            abi = int(lib.gossip_abi_version())
        except AttributeError:
            abi = -1
        if abi != _ABI_VERSION:
            warnings.warn(
                f"{lib_path} ({origin}) has ABI {abi}, expected "
                f"{_ABI_VERSION}; trying the next candidate — rebuild "
                "stale copies with `make -C native`", RuntimeWarning)
            continue
        _bind(lib)
        _lib = lib
        return _lib
    _load_failed = True
    return None


def _bind(lib) -> None:
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.eval_match.argtypes = [
        f64p, ctypes.c_int, f64p, u8p, u8p, ctypes.c_int,
        f64p, ctypes.c_int, u8p, u8p,
    ]
    lib.eval_match.restype = None
    lib.greedy_match.argtypes = [
        f32p, f32p, u8p, ctypes.c_int, f32p, u8p, u8p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, f32p, ctypes.c_int,
        f32p, u8p, i32p,
    ]
    lib.greedy_match.restype = None
    lib.greedy_nms.argtypes = [
        f64p, f64p, ctypes.c_int, ctypes.c_double, i32p,
    ]
    lib.greedy_nms.restype = ctypes.c_int
    lib.greedy_nms_multi.argtypes = [
        f64p, f64p, ctypes.c_int, f64p, ctypes.c_int, i32p, i32p,
    ]
    lib.greedy_nms_multi.restype = None
    lib.eval_match_many.argtypes = [
        f64p, f64p, f64p, f64p, u8p,
        i32p, i32p, i32p, i32p, ctypes.c_int,
        f64p, ctypes.c_int, f64p, ctypes.c_int, ctypes.c_int,
        i32p, ctypes.c_int, u8p, u8p, i32p, ctypes.c_int,
    ]
    lib.eval_match_many.restype = None


def available() -> bool:
    return _load() is not None


def eval_match(det_boxes, gt_boxes, gt_crowd, gt_ignore, thresholds):
    """COCO eval matching (pre-sorted inputs) -> (dt_matched, dt_ignore),
    both [T, n] bool. Requires the native lib (callers check
    :func:`available`)."""
    lib = _load()
    n, g = len(det_boxes), len(gt_boxes)
    t = len(thresholds)
    dt_matched = np.zeros((t, n), np.uint8)
    dt_ignore = np.zeros((t, n), np.uint8)
    # float64 end to end — must stay bit-comparable with the numpy path
    # (a float32 threshold rejects IoUs equal to the threshold).
    lib.eval_match(
        np.ascontiguousarray(det_boxes, np.float64), n,
        np.ascontiguousarray(gt_boxes, np.float64),
        np.ascontiguousarray(gt_crowd, np.uint8),
        np.ascontiguousarray(gt_ignore, np.uint8), g,
        np.ascontiguousarray(thresholds, np.float64), t,
        dt_matched, dt_ignore,
    )
    return dt_matched.astype(bool), dt_ignore.astype(bool)


def eval_match_many(det_boxes, det_areas, gt_boxes, gt_areas, gt_crowd,
                    d_lo, d_hi, g_lo, g_hi, thresholds, area_ranges,
                    max_det, out_off, n_cap_tot, n_threads=1):
    """Whole-roidb batched COCO matching (one C++ call for every
    (image, class) segment x area range — see gossip_native.cc).

    ``n_threads`` shards the independent segments over C++
    std::threads INSIDE the library; results are bit-identical at any
    thread count (disjoint output slices per segment). Host-process
    parallelism deliberately lives here and not in Python: forking a
    warm jax process deadlocks (multiprocessing 'fork' + jax threads).

    Returns (dt_matched, dt_ignore [A, T, n_cap_tot] bool,
    num_gt [A, n_seg] int32). Inputs must follow the packed layout
    documented on the C++ entry; callers check :func:`available`."""
    lib = _load()
    n_seg = len(d_lo)
    t, a = len(thresholds), len(area_ranges)
    dt_matched = np.zeros((a, t, n_cap_tot), np.uint8)
    dt_ignore = np.zeros((a, t, n_cap_tot), np.uint8)
    num_gt = np.zeros((a, max(n_seg, 1)), np.int32)
    if n_seg == 0:
        return (dt_matched.astype(bool), dt_ignore.astype(bool),
                num_gt[:, :0])
    lib.eval_match_many(
        np.ascontiguousarray(det_boxes, np.float64),
        np.ascontiguousarray(det_areas, np.float64),
        np.ascontiguousarray(gt_boxes, np.float64),
        np.ascontiguousarray(gt_areas, np.float64),
        np.ascontiguousarray(gt_crowd, np.uint8),
        np.ascontiguousarray(d_lo, np.int32),
        np.ascontiguousarray(d_hi, np.int32),
        np.ascontiguousarray(g_lo, np.int32),
        np.ascontiguousarray(g_hi, np.int32), n_seg,
        np.ascontiguousarray(thresholds, np.float64), t,
        np.ascontiguousarray(area_ranges, np.float64), a, int(max_det),
        np.ascontiguousarray(out_off, np.int32), int(n_cap_tot),
        dt_matched.reshape(-1), dt_ignore.reshape(-1),
        num_gt.reshape(-1), int(n_threads),
    )
    return dt_matched.astype(bool), dt_ignore.astype(bool), num_gt


def greedy_match(det_boxes, det_scores, det_valid, gt_boxes, gt_valid,
                 gt_crowd, thresholds, det_classes=None, gt_classes=None):
    """Host oracle for the training-loss matching (the reference op's
    algorithm) -> (labels [T,n] f32, ignore [T,n] bool, matched_gt [T,n])."""
    lib = _load()
    n, g = len(det_boxes), len(gt_boxes)
    t = len(thresholds)
    labels = np.zeros((t, n), np.float32)
    ignore = np.zeros((t, n), np.uint8)
    matched = np.zeros((t, n), np.int32)
    if det_classes is not None:
        dc = np.ascontiguousarray(det_classes, np.int32)
        gc = np.ascontiguousarray(gt_classes, np.int32)
        dc_ptr = dc.ctypes.data_as(ctypes.c_void_p)
        gc_ptr = gc.ctypes.data_as(ctypes.c_void_p)
    else:
        dc_ptr = gc_ptr = None
    lib.greedy_match(
        np.ascontiguousarray(det_boxes, np.float32),
        np.ascontiguousarray(det_scores, np.float32),
        np.ascontiguousarray(det_valid, np.uint8), n,
        np.ascontiguousarray(gt_boxes, np.float32),
        np.ascontiguousarray(gt_valid, np.uint8),
        np.ascontiguousarray(gt_crowd, np.uint8), g,
        dc_ptr, gc_ptr,
        np.ascontiguousarray(thresholds, np.float32), t,
        labels, ignore, matched,
    )
    return labels, ignore.astype(bool), matched


def greedy_nms(boxes, scores, iou_threshold=0.5):
    """Fast host NMS -> kept indices (descending score). All math is
    f64 (ABI v3), bit-identical to ops/nms.py::greedy_nms_np."""
    lib = _load()
    n = len(scores)
    keep = np.zeros(n, np.int32)
    nk = lib.greedy_nms(
        np.ascontiguousarray(boxes, np.float64),
        np.ascontiguousarray(scores, np.float64),
        n, float(iou_threshold), keep,
    )
    return keep[:nk].astype(np.int64)


def greedy_nms_multi(boxes, scores, thresholds):
    """Greedy-NMS keep indices for MANY thresholds sharing one IoU
    pass (C++ mirror of ops/nms.py::greedy_nms_multi_np, f64
    throughout -> bit-identical keep sets). Returns a list of [k_i]
    int64 arrays, one per threshold, descending score order."""
    lib = _load()
    n, t = len(scores), len(thresholds)
    keep = np.zeros((max(t, 1), n), np.int32)
    nk = np.zeros(max(t, 1), np.int32)
    lib.greedy_nms_multi(
        np.ascontiguousarray(boxes, np.float64),
        np.ascontiguousarray(scores, np.float64),
        n,
        np.ascontiguousarray(thresholds, np.float64),
        t, keep, nk,
    )
    return [keep[i, :nk[i]].astype(np.int64) for i in range(t)]
