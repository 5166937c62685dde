"""Concurrent network serving: the pipelined TCP rescoring server.

Package-level serving runtime (the reference has no serving layer at
all — SURVEY.md §1 notes the rebuild adds one; ``scripts/serve.py`` is
the CLI wrapper). Built on :meth:`gossipnet_tpu.api.Rescorer.
rescore_async`.
"""

from __future__ import annotations

import json

import numpy as np

from gossipnet_tpu.api import Rescorer

__all__ = ["TcpServer"]


class TcpServer:
    """Pipelined concurrent JSON-lines rescoring server (VERDICT r2 #6,
    ROADMAP r3 #5).

    Any number of clients connect over TCP and send one JSON request
    per line ({"id", "boxes", "scores"[, "classes"]}); responses come
    back on the same connection as {"id", "new_scores", "keep"}, in
    request order per connection. Malformed or unservable requests
    (bad JSON, more detections than the largest bucket, multiclass
    config without class ids) get an {"id", "error"} reply on the same
    connection — they never reach the device and never kill the server.

    Three pipelined stages, so host packing of batch k+1 overlaps
    device compute of batch k (JAX dispatch is asynchronous):

    1. client reader threads: parse + validate, enqueue.
    2. batcher thread: keeps ONE OPEN GROUP PER SHAPE BUCKET (so
       interleaved mixed-size streams still batch, unlike a
       consecutive-only grouper), dispatches a group when it is full or
       its deadline expires via ``Rescorer.rescore_async``, and puts the
       in-flight handle on a depth-bounded queue (backpressure).
    3. reply thread: blocks on each handle, serializes, sends.

    ADAPTIVE DEADLINES, per bucket: waiting for stragglers is worth at
    most a fraction of the batch's device service time (waiting longer
    than the compute it saves is a net latency loss), so each bucket's
    window is ``window_frac x`` an EMA of its measured service time,
    clamped to [min_window_ms, window_ms]. Seeded from the warmup runs
    at start(); large-N buckets therefore wait longer to fill (their
    batches cost more to run half-empty), small-N buckets answer almost
    immediately.
    """

    _STOP = object()

    def __init__(self, rescorer: Rescorer, host: str = "127.0.0.1",
                 port: int = 0, threshold: float = 0.5,
                 batch_size: int = 8, window_ms: float = 10.0,
                 min_window_ms: float = 0.2, window_frac: float = 0.5,
                 pipeline_depth: int = 2):
        import socket

        self.rescorer = rescorer
        self.threshold = threshold
        self.batch_size = batch_size
        self.max_window_s = window_ms / 1e3
        self.min_window_s = min(min_window_ms / 1e3, self.max_window_s)
        self.window_frac = window_frac
        self.pipeline_depth = pipeline_depth
        self.sock = socket.create_server((host, port))
        self.port = self.sock.getsockname()[1]
        self.stats = {"images": 0, "batches": 0, "errors": 0}
        self._service_ema = {}   # bucket -> EMA device service time (s)
        self._queue = None
        self._threads = []

    # -- internals --
    def _parse(self, req):
        """Parse + validate one request; raises ValueError for anything
        the batcher could not serve (so errors are answered from the
        reader thread and bad requests never poison a batch)."""
        boxes = np.asarray(req["boxes"], np.float32).reshape(-1, 4)
        scores = np.asarray(req["scores"], np.float32)
        classes = (np.asarray(req["classes"], np.int32)
                   if "classes" in req else None)
        if len(boxes) != len(scores):
            raise ValueError(f"boxes/scores length mismatch: "
                             f"{len(boxes)} vs {len(scores)}")
        # Same refusals Rescorer._check_image applies, surfaced as an
        # error reply instead of an exception inside the batcher.
        self.rescorer._check_image(req.get("id"), scores, classes,
                                   truncate=False)
        return boxes, scores, classes

    def _reply(self, client, lock, req, new_scores):
        keep = np.nonzero(new_scores > self.threshold)[0]
        line = json.dumps({
            "id": req.get("id"),
            "new_scores": [round(float(s), 6) for s in new_scores],
            "keep": keep.tolist(),
        }) + "\n"
        with lock:
            try:
                client.sendall(line.encode())
            except OSError:
                pass   # client went away; drop the response

    def _window_s(self, bucket: int) -> float:
        ema = self._service_ema.get(bucket)
        if ema is None:
            return self.max_window_s
        return min(max(self.window_frac * ema, self.min_window_s),
                   self.max_window_s)

    def _batcher(self):
        """Stage 2: per-bucket open groups -> async dispatch."""
        import queue as _q
        import time

        from gossipnet_tpu.data.bucketing import bucket_for

        pending = {}   # bucket -> (deadline, [items])
        stopping = False
        while True:
            if stopping and not pending:
                self._inflight.put(self._STOP)
                return
            timeout = None
            if pending:
                timeout = max(min(d for d, _ in pending.values())
                              - time.monotonic(), 0.0)
            item = None
            if not stopping:
                try:
                    item = self._queue.get(timeout=timeout)
                except _q.Empty:
                    pass
            if item is self._STOP:
                stopping = True
            elif item is not None:
                bucket = bucket_for(len(item[3][1]),
                                    self.rescorer.cfg.data.bucket_sizes)
                if bucket not in pending:
                    pending[bucket] = (
                        time.monotonic() + self._window_s(bucket), [])
                pending[bucket][1].append(item)
                if len(pending[bucket][1]) >= self.batch_size:
                    self._dispatch_group(bucket, pending.pop(bucket)[1])
            now = time.monotonic()
            expired = [b for b, (d, _) in pending.items()
                       if d <= now or stopping]
            # Oldest deadline first: FIFO-ish fairness across buckets.
            expired.sort(key=lambda b: pending[b][0])
            for b in expired:
                self._dispatch_group(b, pending.pop(b)[1])

    def _dispatch_group(self, bucket: int, group: list):
        import time

        t0 = time.monotonic()
        handle = self.rescorer.rescore_async(
            [g[3] for g in group], padded_n=bucket)
        # Bounded put = backpressure: at most pipeline_depth batches in
        # flight; the batcher blocks here rather than racing ahead of
        # the device.
        self._inflight.put((handle, group, bucket, t0))

    def _replier(self):
        """Stage 3: block on device results, send replies, feed the
        service-time EMA the adaptive windows read."""
        import time

        while True:
            entry = self._inflight.get()
            if entry is self._STOP:
                return
            handle, group, bucket, t0 = entry
            results = handle.wait()
            dt = time.monotonic() - t0
            # dt includes any queue wait ahead of this batch — an upper
            # bound on service time; fine for a waiting heuristic.
            prev = self._service_ema.get(bucket, dt)
            self._service_ema[bucket] = 0.7 * prev + 0.3 * dt
            self.stats["batches"] += 1
            self.stats["images"] += len(group)
            for (client, lock, req, _), new_scores in zip(group, results):
                self._reply(client, lock, req, new_scores)

    def _client_loop(self, client):
        import threading

        lock = threading.Lock()
        with client, client.makefile("r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                req = None
                try:
                    req = json.loads(line)
                    image = self._parse(req)
                except (ValueError, KeyError, TypeError) as e:
                    self.stats["errors"] += 1
                    rid = req.get("id") if isinstance(req, dict) else None
                    with lock:
                        try:
                            client.sendall((json.dumps(
                                {"id": rid, "error": str(e)[:200]})
                                + "\n").encode())
                        except OSError:
                            return
                    continue
                self._queue.put((client, lock, req, image))

    def _accept_loop(self):
        import threading

        while True:
            try:
                client, _ = self.sock.accept()
            except OSError:
                return   # socket closed by stop()
            t = threading.Thread(target=self._client_loop, args=(client,),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    # -- lifecycle --
    def start(self):
        import queue
        import threading
        import time

        # Pre-compile every reachable (batch, bucket) shape so no
        # client request pays JIT latency (cold-start SLO), and seed
        # each bucket's service-time EMA from a timed full-batch run.
        self.rescorer.warmup(self.batch_size)
        for n in self.rescorer.cfg.data.bucket_sizes:
            t0 = time.monotonic()
            self.rescorer._run(np.zeros((self.batch_size, n, 4), np.float32),
                               np.zeros((self.batch_size, n), np.float32),
                               np.zeros((self.batch_size, n), bool),
                               np.zeros((self.batch_size, n), np.int32))
            self._service_ema[n] = time.monotonic() - t0
        self._queue = queue.Queue()
        self._inflight = queue.Queue(maxsize=self.pipeline_depth)
        self._batcher_t = threading.Thread(target=self._batcher, daemon=True)
        self._batcher_t.start()
        self._replier_t = threading.Thread(target=self._replier, daemon=True)
        self._replier_t.start()
        self._accept_t = threading.Thread(target=self._accept_loop,
                                          daemon=True)
        self._accept_t.start()
        return self

    def stop(self):
        self.sock.close()
        self._queue.put(self._STOP)
        self._batcher_t.join(timeout=30)
        self._replier_t.join(timeout=30)

    def serve_forever(self):
        self._accept_t.join()

