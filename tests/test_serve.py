"""Smoke tests for the serving example (scripts/serve.py): JSON-lines
stream mode (sync + batched) and COCO-results file mode."""

import json
import subprocess
import sys

import numpy as np
import pytest


def _run(args, stdin_text, tmp_path):
    env = {
        "PYTHONPATH": "/root/repo",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin",
        "HOME": str(tmp_path),
    }
    return subprocess.run(
        [sys.executable, "/root/repo/scripts/serve.py", "--random-init",
         *args],
        input=stdin_text, capture_output=True, text=True, env=env,
        cwd=str(tmp_path), timeout=600,
    )


@pytest.mark.parametrize("mode", ["batched", "sync"])
def test_stream_modes(tmp_path, mode):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {num_blocks: 1, feature_dim: 16, reduced_dim: 8,"
        " pairwise_dim: 8}\n"
        "data: {bucket_sizes: [32]}\n")
    reqs = []
    rng = np.random.default_rng(0)
    for i in range(3):
        n = int(rng.integers(2, 8))
        xy = rng.uniform(0, 100, (n, 2))
        boxes = np.concatenate([xy, xy + 10], 1)
        reqs.append(json.dumps({
            "id": 100 + i,
            "boxes": boxes.tolist(),
            "scores": rng.uniform(0, 1, n).tolist(),
        }))
    extra = ["--sync"] if mode == "sync" else []
    r = _run(["-c", str(cfg), "--threshold", "0.0", *extra],
             "\n".join(reqs) + "\n", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(x) for x in r.stdout.strip().splitlines()]
    assert {l["id"] for l in lines} == {100, 101, 102}
    by_id = {l["id"]: l for l in lines}
    for i, req in enumerate(reqs):
        n = len(json.loads(req)["scores"])
        resp = by_id[100 + i]
        assert len(resp["new_scores"]) == n
        assert all(0.0 <= s <= 1.0 for s in resp["new_scores"])
        # threshold 0.0 keeps everything with positive score
        assert resp["keep"] == [k for k, s in enumerate(resp["new_scores"])
                                if s > 0.0]
    assert "served 3 images" in r.stderr


def test_file_mode(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {num_blocks: 1, feature_dim: 16, reduced_dim: 8,"
        " pairwise_dim: 8}\n"
        "data: {bucket_sizes: [32]}\n")
    rng = np.random.default_rng(1)
    dets = []
    for img in (1, 2):
        for _ in range(5):
            x, y = rng.uniform(0, 100, 2)
            dets.append({"image_id": img, "category_id": 1,
                         "bbox": [float(x), float(y), 12.0, 14.0],
                         "score": float(rng.uniform(0, 1))})
    inp = tmp_path / "dets.json"
    inp.write_text(json.dumps(dets))
    outp = tmp_path / "out.json"
    r = _run(["-c", str(cfg), "--input", str(inp), "--output", str(outp)],
             "", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    rescored = json.loads(outp.read_text())
    assert len(rescored) == len(dets)
    for old, new in zip(dets, rescored):
        assert new["image_id"] == old["image_id"]
        assert new["bbox"] == old["bbox"]
        assert 0.0 <= new["score"] <= 1.0
    assert "rescored 2 images" in r.stderr


MC_CFG = ("model: {num_blocks: 1, feature_dim: 16, reduced_dim: 8,"
          " pairwise_dim: 8, num_classes: 3}\n"
          "data: {bucket_sizes: [32], person_only: false}\n")


def _mc_dets(rng, cat_ids=(7, 11, 42)):
    dets = []
    for img in (1, 2):
        for _ in range(6):
            x, y = rng.uniform(0, 100, 2)
            dets.append({"image_id": img,
                         "category_id": int(rng.choice(cat_ids)),
                         "bbox": [float(x), float(y), 12.0, 14.0],
                         "score": float(rng.uniform(0, 1))})
    return dets


def test_file_mode_multiclass_uses_training_categories(tmp_path):
    """Multiclass file mode must map category_id -> label through the
    TRAINING category list (ADVICE r2): a det file covering only a
    subset of categories still gets the right labels."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(MC_CFG)
    rng = np.random.default_rng(2)
    # Dets cover only 2 of the 3 training categories — the r2 code would
    # have relabeled {7, 42} -> {0, 1}, silently shifting category 42.
    dets = _mc_dets(rng, cat_ids=(7, 42))
    inp = tmp_path / "dets.json"
    inp.write_text(json.dumps(dets))
    cats = tmp_path / "cats.json"
    cats.write_text(json.dumps([7, 11, 42]))
    outp = tmp_path / "out.json"
    r = _run(["-c", str(cfg), "--input", str(inp), "--output", str(outp),
              "--categories", str(cats)], "", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    rescored = json.loads(outp.read_text())
    assert [d["category_id"] for d in rescored] == \
        [d["category_id"] for d in dets]


def test_file_mode_multiclass_refuses_without_categories(tmp_path):
    cfg = tmp_path / "c.yaml"
    cfg.write_text(MC_CFG)
    dets = _mc_dets(np.random.default_rng(3))
    inp = tmp_path / "dets.json"
    inp.write_text(json.dumps(dets))
    r = _run(["-c", str(cfg), "--input", str(inp),
              "--output", str(tmp_path / "o.json")], "", tmp_path)
    assert r.returncode != 0
    assert "training category list" in r.stderr


def test_file_mode_refuses_overwriting_input(tmp_path):
    """Input without .json suffix: the derived default output must not
    silently overwrite the input (ADVICE r2)."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {num_blocks: 1, feature_dim: 16, reduced_dim: 8,"
        " pairwise_dim: 8}\n"
        "data: {bucket_sizes: [32]}\n")
    inp = tmp_path / "dets"  # no suffix
    inp.write_text(json.dumps(
        [{"image_id": 1, "category_id": 1, "bbox": [1.0, 1.0, 5.0, 5.0],
          "score": 0.5}]))
    r = _run(["-c", str(cfg), "--input", str(inp)], "", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "dets_rescored.json").exists()
    assert json.loads(inp.read_text())[0]["score"] == 0.5  # untouched


def test_tcp_server_concurrent_clients(tmp_path):
    """Two clients on the TCP server concurrently; every request gets a
    correct-shape reply on its own connection (VERDICT r2 #6)."""
    import socket
    import threading
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", "/root/repo/scripts/serve.py")
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model
    import jax

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8},
        "data": {"bucket_sizes": [32]},
    })
    model = build_model(cfg, "dense")
    rng = np.random.default_rng(0)
    n0 = 32
    params = model.init(
        jax.random.key(0), np.zeros((1, n0, 4), np.float32),
        np.zeros((1, n0), np.float32), np.ones((1, n0), bool))["params"]
    rescorer = Rescorer(cfg, params, pool_impl="dense", mesh=None)
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=5.0).start()
    try:
        results = {}

        def client(name, n_reqs):
            with socket.create_connection(("127.0.0.1", server.port)) as s:
                f = s.makefile("r")
                for k in range(n_reqs):
                    n = int(rng.integers(3, 12))
                    xy = rng.uniform(0, 100, (n, 2))
                    req = {"id": f"{name}-{k}",
                           "boxes": np.concatenate(
                               [xy, xy + 10], 1).tolist(),
                           "scores": rng.uniform(0, 1, n).tolist()}
                    s.sendall((json.dumps(req) + "\n").encode())
                    resp = json.loads(f.readline())
                    results[resp["id"]] = (n, resp)

        threads = [threading.Thread(target=client, args=(c, 3))
                   for c in ("A", "B")]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 6, sorted(results)
        for rid, (n, resp) in results.items():
            assert len(resp["new_scores"]) == n, rid
            assert all(0.0 <= s <= 1.0 for s in resp["new_scores"]), rid
            assert resp["keep"] == [k for k, s in
                                    enumerate(resp["new_scores"]) if s > 0.0]
    finally:
        server.stop()


def _tcp_fixture(bucket_sizes=(32,)):
    """(serve_mod, rescorer) on a tiny dense model for TcpServer tests."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", "/root/repo/scripts/serve.py")
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    import jax

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8},
        "data": {"bucket_sizes": list(bucket_sizes)},
    })
    model = build_model(cfg, "dense")
    n0 = min(bucket_sizes)
    params = model.init(
        jax.random.key(0), np.zeros((1, n0, 4), np.float32),
        np.zeros((1, n0), np.float32), np.ones((1, n0), bool))["params"]
    return serve_mod, Rescorer(cfg, params, pool_impl="dense", mesh=None)


def _tcp_fixture_multiclass(bucket_sizes=(32,), num_classes=3):
    """Like _tcp_fixture but with a class-aware model."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_mod", "/root/repo/scripts/serve.py")
    serve_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_mod)

    import jax

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8, "num_classes": num_classes},
        "data": {"bucket_sizes": list(bucket_sizes),
                 "person_only": False},
    })
    model = build_model(cfg, "dense")
    n0 = min(bucket_sizes)
    params = model.init(
        jax.random.key(0), np.zeros((1, n0, 4), np.float32),
        np.zeros((1, n0), np.float32), np.ones((1, n0), bool),
        np.zeros((1, n0), np.int32))["params"]
    return serve_mod, Rescorer(cfg, params, pool_impl="dense", mesh=None)


def _req(rng, n, rid):
    xy = rng.uniform(0, 100, (n, 2))
    return {"id": rid, "boxes": np.concatenate([xy, xy + 10], 1).tolist(),
            "scores": rng.uniform(0, 1, n).tolist()}


def test_tcp_server_batches_interleaved_buckets():
    """An interleaved small/large stream must still micro-batch per
    bucket (the r2 server only grouped CONSECUTIVE same-bucket requests,
    so strict interleaving degenerated to batch size 1 — ROADMAP r3 #5's
    per-bucket open groups fix that). All requests are written before
    any reply is read, so both buckets' groups fill while the batcher
    waits; with per-bucket groups the 12 requests arrive in well under
    12 batches. min_window_ms pins the adaptive window at 500 ms (the
    EMA would shrink it to sub-ms on this tiny CPU fixture, and on a
    loaded machine arrival raggedness then degenerates to singleton
    batches — this test is about grouping, not window adaptation)."""
    import json as _json
    import socket

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(8, 32))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 batch_size=6, window_ms=500.0,
                                 min_window_ms=500.0).start()
    rng = np.random.default_rng(1)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            sizes = [5, 20] * 6     # strict small/large interleave
            for k, n in enumerate(sizes):
                s.sendall((_json.dumps(_req(rng, n, k)) + "\n").encode())
            got = {}
            for _ in sizes:
                resp = _json.loads(f.readline())
                assert "error" not in resp, resp
                got[resp["id"]] = resp
        assert len(got) == 12
        for k, n in enumerate(sizes):
            assert len(got[k]["new_scores"]) == n
        # 12 requests, 2 buckets, batch_size 6 -> at most a handful of
        # batches; the consecutive-only grouper needed 12. Allow slack
        # for arrival raggedness but require real batching happened.
        assert server.stats["batches"] <= 6, server.stats
        assert server.stats["images"] == 12
        # Adaptive windows stay within the configured clamp.
        for bucket in (8, 32):
            w = server._window_s(bucket)
            assert server.min_window_s <= w <= server.max_window_s
    finally:
        server.stop()


def test_tcp_server_busy_aware_batching():
    """While every device slot is busy, open groups must keep absorbing
    arrivals instead of dispatching singleton batches (r3: with the
    deadline-only policy, 4 concurrent clients measured mean batch 1.01
    and p50 = 4x device service time on TPU because every ~10 ms window
    expired long before the ~35 ms in-flight batch completed).

    A wrapper makes each batch take ~100 ms of 'device' time; 12
    requests sent during the first batch's service must then coalesce
    into a few batches even with a 1 ms window."""
    import json as _json
    import socket
    import time as _time

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))

    class SlowBatch:
        def __init__(self, handle, delay):
            self._handle, self._delay = handle, delay

        def wait(self):
            _time.sleep(self._delay)
            return self._handle.wait()

    class SlowRescorer:
        """Delegates to the real rescorer; wait() gains a fixed delay."""

        def __init__(self, inner, delay):
            self._inner, self._delay = inner, delay

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def rescore_async(self, images, padded_n=None, truncate=False):
            h = self._inner.rescore_async(images, padded_n=padded_n,
                                          truncate=truncate)
            return SlowBatch(h, self._delay)

    server = serve_mod.TcpServer(
        SlowRescorer(rescorer, 0.1), port=0, threshold=0.0,
        batch_size=8, window_ms=1.0, pipeline_depth=1).start()
    rng = np.random.default_rng(3)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            for k in range(12):
                s.sendall((_json.dumps(
                    _req(rng, int(rng.integers(3, 12)), k)) + "\n")
                    .encode())
            got = {}
            for _ in range(12):
                resp = _json.loads(f.readline())
                assert "error" not in resp, resp
                got[resp["id"]] = resp
        assert len(got) == 12
        # Deadline-only policy: 12 singleton batches. Busy-aware: the
        # first 1-2 dispatch small, the rest coalesce under the busy
        # slot into batch_size groups.
        assert server.stats["batches"] <= 5, server.stats
        assert server.stats["images"] == 12
    finally:
        server.stop()


@pytest.mark.parametrize("mode", ["batched", "sync"])
def test_stream_survives_bad_requests(tmp_path, mode):
    """The stdin JSON-lines loop must answer malformed requests with an
    {"id", "error"} line and keep serving — one bad line used to raise
    out of serve_stream and kill every queued request (r5 review)."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "model: {num_blocks: 1, feature_dim: 16, reduced_dim: 8,"
        " pairwise_dim: 8}\n"
        "data: {bucket_sizes: [32]}\n")
    rng = np.random.default_rng(3)

    def req(n, rid):
        xy = rng.uniform(0, 100, (n, 2))
        return {"id": rid,
                "boxes": np.concatenate([xy, xy + 10], 1).tolist(),
                "scores": rng.uniform(0, 1, n).tolist()}

    missing = req(4, "missing")
    del missing["scores"]
    mismatch = req(4, "clslen")
    mismatch["classes"] = [0, 1]             # shorter than scores
    lines = [
        "{not json",                          # parse error
        json.dumps(missing),                  # KeyError
        json.dumps(mismatch),                 # classes length mismatch
        json.dumps(req(40, "big")),           # > largest bucket
        json.dumps(req(5, "ok")),             # must still be served
    ]
    extra = ["--sync"] if mode == "sync" else []
    r = _run(["-c", str(cfg), "--threshold", "0.0", *extra],
             "\n".join(lines) + "\n", tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    out = [json.loads(x) for x in r.stdout.strip().splitlines()]
    errs = [o for o in out if "error" in o]
    oks = [o for o in out if "error" not in o]
    assert len(errs) == 4, out
    assert {o.get("id") for o in errs} == {None, "missing", "clslen", "big"}
    assert len(oks) == 1 and oks[0]["id"] == "ok"
    assert len(oks[0]["new_scores"]) == 5
    assert "served 1 images" in r.stderr


def test_tcp_server_rejects_classes_length_mismatch():
    """A JSON request whose classes array is shorter than scores must be
    refused at parse time with a per-request error — reaching _pack
    would broadcast-fail and error-reply the whole co-batched group
    (r5 review)."""
    import json as _json
    import socket

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(5)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            bad = _req(rng, 4, "clslen")
            bad["classes"] = [0, 1]
            s.sendall((_json.dumps(bad) + "\n").encode())
            resp = _json.loads(f.readline())
            assert resp["id"] == "clslen" and "error" in resp, resp
            ok = _req(rng, 4, "ok")
            s.sendall((_json.dumps(ok) + "\n").encode())
            resp = _json.loads(f.readline())
            assert "error" not in resp and len(resp["new_scores"]) == 4
    finally:
        server.stop()


def test_tcp_server_survives_bad_requests():
    """Unservable requests (oversized, length mismatch, bad JSON) get an
    error reply on the same connection and MUST NOT kill the pipeline:
    the r2 server validated inside the device worker, where one
    oversized request raised and silently stopped all serving."""
    import json as _json
    import socket

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(2)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")

            def roundtrip(line):
                s.sendall((line + "\n").encode())
                return _json.loads(f.readline())

            # oversized: 40 dets > largest bucket 32
            resp = roundtrip(_json.dumps(_req(rng, 40, "big")))
            assert resp["id"] == "big" and "error" in resp, resp
            # boxes/scores length mismatch
            bad = _req(rng, 4, "mismatch")
            bad["scores"] = bad["scores"][:2]
            resp = roundtrip(_json.dumps(bad))
            assert resp["id"] == "mismatch" and "error" in resp, resp
            # bad JSON
            resp = roundtrip("{not json")
            assert "error" in resp, resp
            # the server still serves valid requests afterwards
            resp = roundtrip(_json.dumps(_req(rng, 6, "ok")))
            assert "error" not in resp and len(resp["new_scores"]) == 6
        assert server.stats["errors"] == 3
        assert server.stats["images"] == 1
    finally:
        server.stop()


def test_tcp_server_stats_request():
    """{"stats": true} answers inline with operational counters and
    never touches the device."""
    import socket

    serve_mod, rescorer = _tcp_fixture()
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0).start()
    rng = np.random.default_rng(2)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            s.sendall((json.dumps(_req(rng, 5, "a")) + "\n").encode())
            json.loads(f.readline())
            s.sendall(b'{"stats": true}\n')
            stats = json.loads(f.readline())
        assert stats["images"] == 1 and stats["errors"] == 0
        assert stats["mean_batch"] == 1.0
        assert stats["buckets"]["32"]["service_ema_ms"] > 0
        assert stats["batch_size"] == 8
    finally:
        server.stop()


def test_tcp_cli_sigterm_drains(tmp_path):
    """The --tcp CLI drains and exits 0 on SIGTERM (production
    rollout/restart path)."""
    import os
    import signal
    import socket
    import sys as _sys

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        "model:\n  num_blocks: 1\n  feature_dim: 16\n  reduced_dim: 8\n"
        "  pairwise_dim: 8\ndata:\n  bucket_sizes: [32]\n"
        "parallel:\n  enable: off\n")
    env = {**os.environ, "PYTHONPATH": "/root/repo",
           "JAX_PLATFORMS": "cpu"}
    srv = subprocess.Popen(
        [_sys.executable, "-m", "gossipnet_tpu.serve", "--random-init",
         "-c", str(cfg_path), "--tcp", "0", "--threshold", "0.0",
         "--batch-size", "2"],
        env=env, stderr=subprocess.PIPE, text=True)
    try:
        line = srv.stderr.readline().strip()
        assert line.startswith("serving on "), line
        port = int(line.rsplit(":", 1)[1])
        rng = np.random.default_rng(3)
        with socket.create_connection(("127.0.0.1", port)) as s:
            f = s.makefile("r")
            s.sendall((json.dumps(_req(rng, 4, "x")) + "\n").encode())
            resp = json.loads(f.readline())
        assert len(resp["new_scores"]) == 4
        srv.send_signal(signal.SIGTERM)
        assert srv.wait(timeout=60) == 0
        drained = srv.stderr.read()
        assert "drained: 1 images" in drained, drained
    finally:
        if srv.poll() is None:
            srv.kill()


def test_tcp_server_load_shedding():
    """With max_queue_ms set, requests stuck behind a saturated device
    get an 'overloaded' error instead of unbounded queueing; every
    request is answered exactly once."""
    import socket
    import time

    serve_mod, rescorer = _tcp_fixture()

    class SlowRescorer:
        """Delegate that makes each dispatch occupy its slot ~0.3 s."""

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def rescore_async(self, group, padded_n):
            handle = self._inner.rescore_async(group, padded_n)

            class SlowHandle:
                def wait(self_inner):
                    time.sleep(0.3)
                    return handle.wait()

            return SlowHandle()

    server = serve_mod.TcpServer(
        SlowRescorer(rescorer), port=0, threshold=0.0, window_ms=5.0,
        batch_size=2, pipeline_depth=1, max_queue_ms=50.0).start()
    rng = np.random.default_rng(4)
    served, shed = 0, 0
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            n_reqs = 6
            for k in range(n_reqs):
                s.sendall((json.dumps(_req(rng, 4, f"q{k}")) + "\n")
                          .encode())
            for _ in range(n_reqs):
                resp = json.loads(f.readline())
                if "error" in resp:
                    assert "overloaded" in resp["error"]
                    shed += 1
                else:
                    assert len(resp["new_scores"]) == 4
                    served += 1
    finally:
        server.stop()
    assert served + shed == 6
    assert shed >= 1, "saturated queue must shed"
    assert served >= 1, "the in-flight batch must still be served"
    assert server.stats["shed"] == shed


def test_tcp_server_per_bucket_batch_policy():
    """Per-bucket batch sizing: the batch cap is a detection budget
    (batch_size * largest bucket by default), so small buckets coalesce
    to proportionally larger batches — the measured batch sweep
    (BENCHMARKS.md) shows small-N buckets saturate the chip only at
    much larger image counts. The largest bucket's cap must equal
    batch_size (unchanged default behavior)."""
    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(8, 16, 32))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 batch_size=4, window_ms=2.0)
    try:
        # budget = 4 * 32 = 128 -> caps 8:16(cap via max_bucket_batch
        # not hit), 16:8, 32:4
        assert server._batch_for == {8: 16, 16: 8, 32: 4}
        # explicit budget + global cap
        server2 = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                      batch_size=2, det_budget=256,
                                      max_bucket_batch=16)
        assert server2._batch_for == {8: 16, 16: 16, 32: 8}
        server2.sock.close()
    finally:
        server.sock.close()


def test_tcp_server_small_bucket_coalesces_past_batch_size():
    """Under a busy device, a small bucket's open group grows past
    batch_size up to its per-bucket cap and dispatches as ONE batch
    (the whole point of the detection-budget policy)."""
    import json as _json
    import socket
    import time as _time

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(8, 32))

    class SlowBatch:
        def __init__(self, handle, delay):
            self._handle, self._delay = handle, delay

        def wait(self):
            _time.sleep(self._delay)
            return self._handle.wait()

    class SlowRescorer:
        def __init__(self, inner, delay):
            self._inner, self._delay = inner, delay

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def rescore_async(self, images, padded_n=None, truncate=False):
            h = self._inner.rescore_async(images, padded_n=padded_n,
                                          truncate=truncate)
            return SlowBatch(h, self._delay)

    # batch_size=2, buckets (8, 32) -> bucket-8 cap = 2*32/8 = 8
    server = serve_mod.TcpServer(
        SlowRescorer(rescorer, 0.15), port=0, threshold=0.0,
        batch_size=2, window_ms=1.0, pipeline_depth=1).start()
    assert server._batch_for[8] == 8
    rng = np.random.default_rng(7)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            # 10 small requests back to back: 1-2 dispatch before the
            # slot fills; the rest coalesce under the busy slot. With
            # the old global batch_size=2 cap this took >= 5 batches;
            # with cap 8 it takes <= 4.
            for k in range(10):
                s.sendall((_json.dumps(_req(rng, 5, k)) + "\n").encode())
            got = {}
            for _ in range(10):
                resp = _json.loads(f.readline())
                assert "error" not in resp, resp
                got[resp["id"]] = resp
        assert len(got) == 10
        assert server.stats["images"] == 10
        assert server.stats["batches"] <= 4, server.stats
        assert server.stats_snapshot()["buckets"]["8"]["max_batch"] == 8
    finally:
        server.stop()


def test_tcp_server_binary_protocol():
    """Binary frame connections round-trip bit-exact f32 scores, report
    errors as error frames, and coexist with JSON connections on the
    same server (protocol auto-detect is per connection)."""
    import json as _json
    import socket
    import struct

    from gossipnet_tpu.serving import BIN_MAGIC

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(11)

    def recv_exact(s, n):
        buf = bytearray()
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            assert chunk
            buf.extend(chunk)
        return bytes(buf)

    def read_reply(s):
        magic, status, rid = struct.unpack("<IBQ", recv_exact(s, 13))
        assert magic == BIN_MAGIC
        if status:
            (ln,) = struct.unpack("<I", recv_exact(s, 4))
            return rid, recv_exact(s, ln).decode(), None, None
        (n,) = struct.unpack("<I", recv_exact(s, 4))
        scores = np.frombuffer(recv_exact(s, 4 * n), "<f4")
        (k,) = struct.unpack("<I", recv_exact(s, 4))
        keep = np.frombuffer(recv_exact(s, 4 * k), "<i4")
        return rid, None, scores, keep

    try:
        n = 7
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + 10], 1).astype("<f4")
        scores = rng.uniform(0, 1, n).astype("<f4")
        with socket.create_connection(("127.0.0.1", server.port)) as sb, \
                socket.create_connection(("127.0.0.1", server.port)) as sj:
            fj = sj.makefile("r")
            # binary request
            sb.sendall(struct.pack("<IQII", BIN_MAGIC, 42, n, 0)
                       + boxes.tobytes() + scores.tobytes())
            # identical JSON request on the other connection
            sj.sendall((_json.dumps({
                "id": "j", "boxes": boxes.tolist(),
                "scores": scores.tolist()}) + "\n").encode())
            rid, err, bin_scores, keep = read_reply(sb)
            jresp = _json.loads(fj.readline())
            assert rid == 42 and err is None
            assert len(bin_scores) == n
            assert "error" not in jresp
            # same model output on both protocols (JSON rounds to 6dp)
            np.testing.assert_allclose(
                bin_scores, np.asarray(jresp["new_scores"], np.float32),
                atol=1e-6)
            assert list(keep) == jresp["keep"]
            # oversized binary request -> error frame, connection lives
            big = 40
            sb.sendall(struct.pack("<IQII", BIN_MAGIC, 43, big, 0)
                       + b"\0" * (big * 20))
            rid, err, *_ = read_reply(sb)
            assert rid == 43 and "bucket" in err
            # connection still serves after the error
            sb.sendall(struct.pack("<IQII", BIN_MAGIC, 44, n, 0)
                       + boxes.tobytes() + scores.tobytes())
            rid, err, s2, _ = read_reply(sb)
            assert rid == 44 and err is None
            np.testing.assert_array_equal(s2, bin_scores)
        assert server.stats["errors"] == 1
        assert server.stats["images"] == 3
    finally:
        server.stop()


def test_tcp_server_binary_multiclass_and_bad_magic():
    """Binary frames carry class ids (flags bit 0); a bad magic gets one
    error frame and a dropped connection (framing lost)."""
    import socket
    import struct

    from gossipnet_tpu.serving import BIN_MAGIC

    serve_mod, rescorer = _tcp_fixture_multiclass(bucket_sizes=(32,))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(13)

    def recv_exact(s, n):
        buf = bytearray()
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            if not chunk:
                return None
            buf.extend(chunk)
        return bytes(buf)

    try:
        n = 5
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + 10], 1).astype("<f4")
        scores = rng.uniform(0, 1, n).astype("<f4")
        classes = rng.integers(0, 3, n).astype("<i4")
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            s.sendall(struct.pack("<IQII", BIN_MAGIC, 7, n, 1)
                      + boxes.tobytes() + scores.tobytes()
                      + classes.tobytes())
            head = recv_exact(s, 13)
            magic, status, rid = struct.unpack("<IBQ", head)
            assert status == 0 and rid == 7
            (nn,) = struct.unpack("<I", recv_exact(s, 4))
            assert nn == n
            recv_exact(s, 4 * nn)
            (k,) = struct.unpack("<I", recv_exact(s, 4))
            recv_exact(s, 4 * k)
            # multiclass without classes -> error frame (flags bit unset)
            s.sendall(struct.pack("<IQII", BIN_MAGIC, 8, n, 0)
                      + boxes.tobytes() + scores.tobytes())
            magic, status, rid = struct.unpack("<IBQ", recv_exact(s, 13))
            assert status == 1 and rid == 8
            (ln,) = struct.unpack("<I", recv_exact(s, 4))
            assert b"class" in recv_exact(s, ln)
        # bad magic: one error frame, then the server drops the conn
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            s.sendall(struct.pack("<IQII", 0xDEAD, 1, 1, 0) + b"\0" * 20)
            magic, status, rid = struct.unpack("<IBQ", recv_exact(s, 13))
            assert status == 1
            (ln,) = struct.unpack("<I", recv_exact(s, 4))
            assert b"magic" in recv_exact(s, ln)
            # Closed: EOF, or RST if our garbage body bytes were still
            # unread in the server's buffer when it closed.
            try:
                assert recv_exact(s, 1) is None
            except ConnectionResetError:
                pass
    finally:
        server.stop()


def test_tcp_server_on_sharded_rescorer_matches_local():
    """The production multi-chip serving stack end to end: TcpServer
    wrapping a mesh-sharded Rescorer (data=4, det=2 over the 8 simulated
    devices) serves concurrent clients and returns the same scores as a
    single-device Rescorer. Exercises the batch->data-axis padding in
    Rescorer._pad_batch through the server's async-dispatch pipeline."""
    import json as _json
    import socket
    import threading

    import jax

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8, "pair_matmul_dtype": "float32"},
        "data": {"bucket_sizes": [32]},
        "parallel": {"enable": "on", "data_axis": 4, "det_axis": 2},
    })
    model = build_model(cfg, "dense")
    params = model.init(
        jax.random.key(0), np.zeros((1, 32, 4), np.float32),
        np.zeros((1, 32), np.float32), np.ones((1, 32), bool))["params"]
    sharded = Rescorer(cfg, params, pool_impl="dense")
    assert sharded.mesh is not None and sharded.mesh.shape == {
        "data": 4, "det": 2}
    local = Rescorer(cfg, params, pool_impl="dense", mesh=None)

    from gossipnet_tpu.serving import TcpServer

    server = TcpServer(sharded, port=0, threshold=0.0,
                       batch_size=8, window_ms=5.0).start()
    rng = np.random.default_rng(3)
    images = []
    for _ in range(6):   # odd counts force data-axis row padding
        n = int(rng.integers(5, 20))
        xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        images.append((np.concatenate([xy, xy + 10], 1),
                       rng.uniform(0, 1, n).astype(np.float32)))

    got = {}

    def client(start, count):
        with socket.create_connection(("127.0.0.1", server.port)) as s, \
                s.makefile("r") as f:
            for k in range(start, start + count):
                bx, sc = images[k]
                s.sendall((_json.dumps({
                    "id": k, "boxes": bx.tolist(),
                    "scores": sc.tolist()}) + "\n").encode())
                resp = _json.loads(f.readline())
                assert "error" not in resp, resp
                got[k] = np.asarray(resp["new_scores"], np.float32)

    try:
        threads = [threading.Thread(target=client, args=(0, 3)),
                   threading.Thread(target=client, args=(3, 3))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(got) == len(images)
        ref = local.rescore_batch(
            [(bx, sc, None) for bx, sc in images])
        for k in range(len(images)):
            np.testing.assert_allclose(got[k], ref[k], atol=2e-4)
    finally:
        server.stop()


def test_rescorer_hot_reload():
    """Rescorer.reload swaps weights atomically: outputs after reload
    match a fresh Rescorer built on the new params; mismatched trees
    and ambiguous arguments are refused."""
    import jax
    import pytest

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8},
        "data": {"bucket_sizes": [32]},
    })
    model = build_model(cfg, "dense")
    init_args = (np.zeros((1, 32, 4), np.float32),
                 np.zeros((1, 32), np.float32), np.ones((1, 32), bool))
    p1 = model.init(jax.random.key(0), *init_args)["params"]
    p2 = model.init(jax.random.key(1), *init_args)["params"]

    rng = np.random.default_rng(5)
    xy = rng.uniform(0, 100, (9, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 10], 1)
    scores = rng.uniform(0, 1, 9).astype(np.float32)

    r = Rescorer(cfg, p1, pool_impl="dense", mesh=None)
    before = r(boxes, scores)
    r.reload(p2)
    after = r(boxes, scores)
    want = Rescorer(cfg, p2, pool_impl="dense", mesh=None)(boxes, scores)
    np.testing.assert_array_equal(after, want)
    assert not np.array_equal(before, after)

    with pytest.raises(ValueError, match="exactly one"):
        r.reload()
    with pytest.raises(ValueError, match="exactly one"):
        r.reload(p1, checkpoint_dir="x")
    with pytest.raises(ValueError, match="tree"):
        r.reload({"bogus": np.zeros(3)})


def test_tcp_server_hot_reload_under_service():
    """Weights swapped while the TCP server is serving take effect on
    later requests without an error or a dropped connection — the
    zero-downtime update path the CLI's SIGHUP handler uses."""
    import json as _json
    import socket

    import jax

    from gossipnet_tpu.api import Rescorer
    from gossipnet_tpu.train import build_model

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))
    model = build_model(rescorer.cfg, "dense")
    p2 = model.init(
        jax.random.key(9), np.zeros((1, 32, 4), np.float32),
        np.zeros((1, 32), np.float32), np.ones((1, 32), bool))["params"]

    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(17)
    xy = rng.uniform(0, 100, (8, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + 10], 1)
    scores = rng.uniform(0, 1, 8).astype(np.float32)
    req = (_json.dumps({"id": 1, "boxes": boxes.tolist(),
                        "scores": scores.tolist()}) + "\n").encode()
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s, \
                s.makefile("r") as f:
            s.sendall(req)
            old = np.asarray(
                _json.loads(f.readline())["new_scores"], np.float32)
            rescorer.reload(p2)
            s.sendall(req)
            new = np.asarray(
                _json.loads(f.readline())["new_scores"], np.float32)
        want = Rescorer(rescorer.cfg, p2, pool_impl="dense",
                        mesh=None)(boxes, scores)
        np.testing.assert_allclose(new, want, atol=1e-6)
        assert not np.array_equal(old, new)
        assert server.stats["errors"] == 0
    finally:
        server.stop()


def test_artifact_rescorer_refuses_reload(tmp_path):
    """Artifacts bake weights into the exported program; reload must
    refuse with guidance instead of silently serving stale weights."""
    import jax
    import pytest

    from gossipnet_tpu.config import load_config
    from gossipnet_tpu.train import build_model
    from gossipnet_tpu.utils import model_artifact as ma

    cfg = load_config(None, {
        "model": {"num_blocks": 1, "feature_dim": 16, "reduced_dim": 8,
                  "pairwise_dim": 8, "pair_matmul_dtype": "float32"},
        "data": {"bucket_sizes": [32]},
        "parallel": {"enable": "off"},
    })
    model = build_model(cfg, "dense")
    params = model.init(
        jax.random.key(0), np.zeros((1, 32, 4), np.float32),
        np.zeros((1, 32), np.float32), np.ones((1, 32), bool))["params"]
    path = tmp_path / "m.gnetart"
    ma.export_artifact(cfg, params, path, batch_sizes=(1,))
    art = ma.ArtifactRescorer(path)
    with pytest.raises(ValueError, match="baked"):
        art.reload(params)


def test_tcp_server_binary_fuzz_never_crashes():
    """Adversarial binary-protocol input: random garbage, truncated
    frames, zero-length frames, and abrupt disconnects must never kill
    the server or poison service for a well-behaved connection."""
    import socket
    import struct

    from gossipnet_tpu.serving import BIN_MAGIC

    serve_mod, rescorer = _tcp_fixture(bucket_sizes=(32,))
    server = serve_mod.TcpServer(rescorer, port=0, threshold=0.0,
                                 window_ms=2.0).start()
    rng = np.random.default_rng(23)

    def recv_any(s):
        s.settimeout(5.0)
        try:
            return s.recv(4096)
        except (TimeoutError, OSError):
            return b""

    try:
        # 1. pure random garbage (non-'{' first byte -> binary path)
        for _ in range(5):
            blob = bytes(rng.integers(1, 255, 64, dtype=np.uint8))
            if blob[:1] in b"{ \t\r\n":
                blob = b"\xff" + blob[1:]
            with socket.create_connection(
                    ("127.0.0.1", server.port)) as s:
                s.sendall(blob)
                recv_any(s)   # error frame or close — either is fine
        # 2. valid header, then the connection dies mid-body
        for _ in range(3):
            with socket.create_connection(
                    ("127.0.0.1", server.port)) as s:
                s.sendall(struct.pack("<IQII", BIN_MAGIC, 1, 20, 0))
                s.sendall(b"\0" * 37)   # 37 of the 400 body bytes
        # 3. zero-detection frame (n=0: empty body, still a request)
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            s.sendall(struct.pack("<IQII", BIN_MAGIC, 5, 0, 0))
            head = recv_any(s)
            assert head[:4] == struct.pack("<I", BIN_MAGIC)
        # the server still serves a well-behaved client afterwards
        xy = rng.uniform(0, 100, (6, 2)).astype("<f4")
        boxes = np.concatenate([xy, xy + 10], 1).astype("<f4")
        scores = rng.uniform(0, 1, 6).astype("<f4")
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            s.sendall(struct.pack("<IQII", BIN_MAGIC, 77, 6, 0)
                      + boxes.tobytes() + scores.tobytes())
            magic, status, rid = struct.unpack("<IBQ", _recv13(s))
            assert magic == BIN_MAGIC and status == 0 and rid == 77
    finally:
        server.stop()


def _recv13(s):
    buf = bytearray()
    while len(buf) < 13:
        c = s.recv(13 - len(buf))
        assert c
        buf.extend(c)
    return bytes(buf)


def test_tcp_server_survives_rescorer_failures():
    """Fault injection (VERDICT r3 weak #3): a rescorer that throws at
    DISPATCH (batcher thread) or at WAIT (replier thread) must turn into
    error replies — not dead threads — with the slot semaphore balanced,
    and the server must answer the next request normally."""
    import json as _json
    import socket

    serve_mod, rescorer = _tcp_fixture()

    class FlakyRescorer:
        """Delegates to a real Rescorer; fails the first dispatch and
        the first post-dispatch wait(), then behaves."""

        def __init__(self, inner):
            self._inner = inner
            self.dispatch_failures = 1
            self.wait_failures = 1

        def __getattr__(self, name):   # cfg, _run, _check_image, ...
            return getattr(self._inner, name)

        def rescore_async(self, images, padded_n=None, truncate=False):
            if self.dispatch_failures > 0:
                self.dispatch_failures -= 1
                raise RuntimeError("injected dispatch failure")
            handle = self._inner.rescore_async(
                images, padded_n=padded_n, truncate=truncate)
            if self.wait_failures > 0:
                self.wait_failures -= 1

                class BadHandle:
                    def wait(self):
                        raise RuntimeError("injected wait failure")

                return BadHandle()
            return handle

    flaky = FlakyRescorer(rescorer)
    server = serve_mod.TcpServer(flaky, port=0, threshold=0.0,
                                 batch_size=1, window_ms=1.0,
                                 pipeline_depth=1).start()
    rng = np.random.default_rng(3)
    try:
        with socket.create_connection(("127.0.0.1", server.port)) as s:
            f = s.makefile("r")
            # 1: batcher-thread failure -> error reply on this conn.
            s.sendall((_json.dumps(_req(rng, 5, "a")) + "\n").encode())
            resp = _json.loads(f.readline())
            assert resp["id"] == "a" and "internal error" in resp["error"]
            # 2: replier-thread failure (handle.wait raises).
            s.sendall((_json.dumps(_req(rng, 5, "b")) + "\n").encode())
            resp = _json.loads(f.readline())
            assert resp["id"] == "b" and "internal error" in resp["error"]
            # 3: both threads alive, slot released twice -> real answer.
            s.sendall((_json.dumps(_req(rng, 5, "c")) + "\n").encode())
            resp = _json.loads(f.readline())
            assert "error" not in resp, resp
            assert len(resp["new_scores"]) == 5
        assert server.stats["errors"] >= 2
        assert server._batcher_t.is_alive() and server._replier_t.is_alive()
    finally:
        server.stop()
