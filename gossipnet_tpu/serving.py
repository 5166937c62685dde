"""Serving runtime: the pipelined TCP server, JSON-lines stdin/stdout
stream, COCO-results file rescoring, and their CLI.

The reference has no serving layer at all (SURVEY.md §1 — the rebuild
adds one); built on :class:`gossipnet_tpu.api.Rescorer` and its
``rescore_async`` pipeline primitive. Run the CLI as::

    python -m gossipnet_tpu.serve -c experiments/serving_bucketed.yaml \\
        --checkpoint-dir checkpoints [--tcp PORT | --input dets.json]

(``scripts/serve.py`` is a compatibility shim for the same CLI.)

JSON-lines stream (default) — one image per line on stdin, responses on
stdout, double-buffered through ``Rescorer.rescore_stream``::

    echo '{"id": 7, "boxes": [[0,0,10,10],[1,1,11,11]],
           "scores": [0.9, 0.8]}' | python -m gossipnet_tpu.serve ...
    -> {"id": 7, "new_scores": [0.93, 0.04], "keep": [0]}

TCP mode (``--tcp PORT``) — any number of concurrent clients, same
JSON-lines protocol per connection, per-bucket adaptive micro-batching
(:class:`TcpServer`). Connections may instead speak the BINARY frame
protocol (auto-detected per connection from the first byte — see
``TcpServer`` docs): raw little-endian float32 arrays, ~10x cheaper to
serialize than JSON on both ends, for throughput-critical clients.

COCO-results file mode (``--input``) — rescore a standard COCO
detection-results JSON in one call, write the same format back.

Checkpoint-backed ``--tcp`` servers reload weights with zero downtime
on SIGHUP (re-reads the best-AP checkpoint; ``Rescorer.reload``).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import load_config

__all__ = ["TcpServer", "serve_stream", "serve_file", "main"]

# --- binary frame protocol (TcpServer; auto-detected per connection) ---
# All integers little-endian. Request frame:
#   u32 magic = 0x544E4E47 (b"GNNT")
#   u64 request id (echoed back; numeric-only in this protocol)
#   u32 n           detection count
#   u32 flags       bit 0: classes present
#   n*4 f32         boxes, xyxy row-major [n, 4]
#   n   f32         scores
#   [n  i32         classes]        iff flags & 1
# Reply frame:
#   u32 magic, u8 status (0 = ok, 1 = error), u64 id
#   ok:    u32 n, n f32 new_scores, u32 k, k i32 keep
#   error: u32 len, len bytes utf-8 message
# Rationale: JSON encode/decode of ~800-float arrays costs ~ms per
# message per side; at saturation the serving host spends more CPU on
# text than the chip spends on the model. The binary path is a
# np.frombuffer/tobytes round trip (~10x cheaper), and scores come back
# as exact f32 (the JSON path rounds to 6 decimals).
BIN_MAGIC = 0x544E4E47
_BIN_REQ_HEADER = 4 + 8 + 4 + 4


def _recv_exact(sock, n: int) -> bytes | None:
    """Read exactly n bytes or None on EOF/reset mid-frame."""
    buf = bytearray()
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf.extend(chunk)
    return bytes(buf)


def _build(args) -> Rescorer:
    if getattr(args, "artifact", None):
        from gossipnet_tpu.utils.model_artifact import ArtifactRescorer

        return ArtifactRescorer(args.artifact)
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

    A malformed request (bad JSON, missing/mismatched fields, more
    detections than the largest bucket) gets an ``{"id", "error"}``
    reply and the loop keeps serving — same contract as the TCP
    server; one bad line must not kill every queued request behind it.
    """
    def error(rid, msg):
        out.write(json.dumps({"id": rid, "error": str(msg)[:200]}) + "\n")
        out.flush()

    def requests():
        for line in inp:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except ValueError as e:
                error(None, f"bad json: {e}")
                continue
            if not isinstance(req, dict):
                error(None, "request must be a JSON object")
                continue
            yield req

    def arrays(req):
        """Parse + validate one request; ValueError -> error reply."""
        boxes = np.asarray(req["boxes"], np.float32).reshape(-1, 4)
        scores = np.asarray(req["scores"], np.float32)
        classes = (np.asarray(req["classes"], np.int32)
                   if "classes" in req else None)
        if len(boxes) != len(scores):
            raise ValueError(f"boxes/scores length mismatch: "
                             f"{len(boxes)} vs {len(scores)}")
        rescorer._check_image(req.get("id"), scores, classes,
                              truncate=False)
        return boxes, scores, classes

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
            try:
                new_scores = rescorer(*arrays(req))
            except (KeyError, ValueError, TypeError) as e:
                error(req.get("id", idx), e)
                continue
            respond(req, idx, new_scores)
            n += 1
        return n

    # Keyed by stream index and popped on response so a long-running
    # server holds at most the in-flight window of requests.
    reqs: dict = {}

    def images():
        k = 0
        for req in requests():
            try:
                arr = arrays(req)
            except (KeyError, ValueError, TypeError) as e:
                error(req.get("id"), e)
                continue
            # Only accepted requests get a stream index —
            # rescore_stream enumerates ITS input, so indices must
            # cover exactly the yielded images.
            reqs[k] = req
            k += 1
            yield arr

    n = 0
    for idx, new_scores in rescorer.rescore_stream(images()):
        respond(reqs.pop(idx), idx, new_scores)
        n += 1
    return n


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

    A connection whose first byte is not '{' speaks the BINARY frame
    protocol instead (spec at module top, BIN_MAGIC): raw little-endian
    f32/i32 arrays both ways, ~10x cheaper to serialize than JSON and
    bit-exact scores (no decimal rounding). Both protocols share the
    same batcher, buckets, and device path and may be mixed across
    connections.

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

    BUSY-AWARE (continuous) BATCHING: a group is dispatched only when a
    device slot is free (``pipeline_depth`` slots) AND it is full or its
    deadline has expired. While every slot is busy the device could not
    serve the group anyway, so it stays open and keeps absorbing
    arrivals — device-busy time becomes free batching window. Without
    this, any deadline shorter than the device service time floods the
    queue with singleton batches under concurrent synchronous clients
    (measured r3: 4 clients -> mean batch 1.01, p50 = 4x service time,
    because each ~10 ms window expired long before the ~35 ms in-flight
    batch completed).
    """

    _STOP = object()
    _WAKE = object()   # replier -> batcher: a device slot just freed
    _SHED = object()   # batcher -> replier: send an overload reply
    _ERR = object()    # batcher -> replier: dispatch failed, error group

    def __init__(self, rescorer: Rescorer, host: str = "127.0.0.1",
                 port: int = 0, threshold: float = 0.5,
                 batch_size: int = 8, window_ms: float = 10.0,
                 min_window_ms: float = 0.2, window_frac: float = 0.5,
                 pipeline_depth: int = 2,
                 max_queue_ms: float | None = None,
                 det_budget: int | None = None,
                 max_bucket_batch: int = 64):
        """``max_queue_ms``: LOAD SHEDDING bound — a request that has
        waited longer than this in an open group (device saturated)
        gets an {"id", "error": "overloaded..."} reply instead of
        service, bounding queueing latency under overload (the measured
        16-client saturation p99 is queue wait, BENCHMARKS.md). None
        (default) = never shed, requests queue indefinitely.

        PER-BUCKET BATCH SIZING: the device saturates at a roughly
        constant number of DETECTIONS per dispatch, not images — the
        measured batch sweep (BENCHMARKS.md) has N=1024 saturated at
        B=8 while N=256 keeps gaining through B=64 (+22%), because a
        small bucket's grid underfills the Pallas pipeline at the same
        image count. Each bucket's cap is therefore a detection budget:
        ``batch_for(n) = clamp(det_budget // n, batch_size,
        max_bucket_batch)`` with ``det_budget`` defaulting to
        ``batch_size * max(bucket_sizes)`` — identical behavior for the
        largest bucket, proportionally larger coalescing for small
        ones. Groups only grow past ``batch_size`` while every device
        slot is busy (busy-aware batching), so low-load latency is
        unchanged; the cap matters exactly when the device is the
        bottleneck."""
        import socket

        self.rescorer = rescorer
        self.threshold = threshold
        # An ArtifactRescorer can only dispatch shapes it exported:
        # clamp so warmup/grouping never exceed the artifact's max batch.
        max_b = getattr(rescorer, "_max_batch", None)
        if max_b is not None:
            batch_size = min(batch_size, max_b)
        self.batch_size = batch_size
        buckets = tuple(rescorer.cfg.data.bucket_sizes)
        budget = (int(det_budget) if det_budget is not None
                  else batch_size * max(buckets))
        cap_for = getattr(rescorer, "max_batch_for", None)
        self._batch_for = {}
        for n in buckets:
            b = min(max(batch_size, budget // n), max_bucket_batch)
            if cap_for is not None:
                b = min(b, max(cap_for(n), 1))
            self._batch_for[n] = b
        self.max_window_s = window_ms / 1e3
        self.min_window_s = min(min_window_ms / 1e3, self.max_window_s)
        self.window_frac = window_frac
        self.pipeline_depth = pipeline_depth
        self.max_queue_s = (None if max_queue_ms is None
                            else max_queue_ms / 1e3)
        self.sock = socket.create_server((host, port))
        self.port = self.sock.getsockname()[1]
        self.stats = {"images": 0, "batches": 0, "errors": 0, "shed": 0}
        # Counters are bumped from reader, batcher, and replier threads;
        # dict int += is a read-modify-write that drops increments when
        # interleaved, so every mutation/read holds this lock.
        import threading

        self._stats_lock = threading.Lock()
        self._service_ema = {}   # bucket -> EMA device service time (s)
        self._queue = None

    def _bump(self, key: str, by: int = 1) -> None:
        with self._stats_lock:
            self.stats[key] += by

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

    def stats_snapshot(self) -> dict:
        """Operational counters for a `{"stats": true}` request: served
        images/batches/errors, mean batch size, and each bucket's
        service-time EMA + current adaptive window (ms)."""
        with self._stats_lock:
            stats = dict(self.stats)
        images = stats["images"]
        batches = stats["batches"]
        return {
            **stats,
            "mean_batch": round(images / batches, 3) if batches else None,
            "buckets": {
                str(b): {"service_ema_ms": round(ema * 1e3, 2),
                         "window_ms": round(self._window_s(b) * 1e3, 2),
                         "max_batch": self._batch_for.get(
                             b, self.batch_size)}
                for b, ema in sorted(self._service_ema.items())},
            "batch_size": self.batch_size,
            "pipeline_depth": self.pipeline_depth,
        }

    def _reply(self, client, lock, req, new_scores):
        if req.get("_bin"):
            import struct

            ns = np.asarray(new_scores, "<f4")
            keep = np.nonzero(ns > self.threshold)[0].astype("<i4")
            payload = (struct.pack("<IBQI", BIN_MAGIC, 0,
                                   int(req["id"]), len(ns))
                       + ns.tobytes()
                       + struct.pack("<I", len(keep)) + keep.tobytes())
            with lock:
                try:
                    client.sendall(payload)
                except OSError:
                    pass
            return
        keep = np.nonzero(new_scores > self.threshold)[0]
        # np.round(...).tolist() serializes at C speed; a per-score
        # Python round() loop costs ~1 ms per 800-det reply on the
        # replier thread, which is pure GIL pressure under load.
        line = json.dumps({
            "id": req.get("id"),
            "new_scores": np.round(
                np.asarray(new_scores, np.float64), 6).tolist(),
            "keep": keep.tolist(),
        }) + "\n"
        with lock:
            try:
                client.sendall(line.encode())
            except OSError:
                pass   # client went away; drop the response

    def _send_err(self, client, lock, req, msg: str):
        """Error reply in the connection's own protocol."""
        if isinstance(req, dict) and req.get("_bin"):
            import struct

            data = msg.encode()[:200]
            payload = (struct.pack("<IBQI", BIN_MAGIC, 1,
                                   int(req.get("id") or 0), len(data))
                       + data)
        else:
            rid = req.get("id") if isinstance(req, dict) else None
            payload = (json.dumps({"id": rid, "error": msg[:200]})
                       + "\n").encode()
        with lock:
            try:
                client.sendall(payload)
            except OSError:
                pass

    def _window_s(self, bucket: int) -> float:
        ema = self._service_ema.get(bucket)
        if ema is None:
            return self.max_window_s
        return min(max(self.window_frac * ema, self.min_window_s),
                   self.max_window_s)

    def _batcher(self):
        """Stage 2: per-bucket open groups -> slot-gated async dispatch.

        A group goes to the device when a slot is free AND it is full,
        expired, or the server is draining. Groups may grow past
        batch_size while all slots are busy; dispatch then slices off
        batch_size at a time (the remainder keeps a fresh deadline)."""
        import queue as _q
        import time

        from gossipnet_tpu.data.bucketing import bucket_for

        pending = {}   # bucket -> [deadline, [items]]
        stopping = False
        while True:
            # Dispatch everything ready, oldest deadline first
            # (FIFO-ish fairness across buckets), while slots last.
            now = time.monotonic()
            blocked = False   # a ready group is waiting on a slot
            for b in sorted(pending, key=lambda b: pending[b][0]):
                cap = self._batch_for.get(b, self.batch_size)
                while b in pending:
                    deadline, items = pending[b]
                    if self.max_queue_s is not None:
                        t = time.monotonic()
                        live = [it for it in items
                                if t - it[4] <= self.max_queue_s]
                        if len(live) != len(items):
                            for it in items:
                                if t - it[4] > self.max_queue_s:
                                    self._shed(it, t - it[4])
                            if not live:
                                del pending[b]
                                break
                            pending[b][1] = items = live
                    if not (stopping or deadline <= now
                            or len(items) >= cap):
                        break
                    if not self._slots.acquire(blocking=False):
                        blocked = True
                        break
                    take = items[:cap]
                    rest = items[cap:]
                    if rest:
                        pending[b] = [
                            time.monotonic() + self._window_s(b), rest]
                    else:
                        del pending[b]
                    self._dispatch_group(b, take)
                if blocked:
                    break
            if stopping and not pending:
                self._inflight.put(self._STOP)
                return
            if blocked:
                # Every slot is busy: a _WAKE is guaranteed when one
                # frees, and new arrivals also wake us. With shedding
                # enabled, still wake on the shed horizon so queued
                # items are shed on time even if the device stalls.
                timeout = self.max_queue_s
            elif pending:
                timeout = max(min(d for d, _ in pending.values())
                              - time.monotonic(), 0.0)
            else:
                timeout = None
            try:
                item = self._queue.get(timeout=timeout)
            except _q.Empty:
                continue
            if item is self._STOP:
                stopping = True
            elif item is not self._WAKE:
                bucket = bucket_for(len(item[3][1]),
                                    self.rescorer.cfg.data.bucket_sizes)
                if bucket not in pending:
                    pending[bucket] = [
                        time.monotonic() + self._window_s(bucket), []]
                pending[bucket][1].append(item)

    def _shed(self, item, waited_s: float):
        """Overload reply for a request that out-waited max_queue_ms.

        The sendall is delegated to the replier thread: a client that
        stopped reading has a full TCP send buffer exactly when
        shedding fires, and a blocking send from the BATCHER thread
        would head-of-line-block batching for every other client."""
        self._bump("shed")
        self._inflight.put((self._SHED, item, waited_s, None))

    def _dispatch_group(self, bucket: int, group: list):
        import time

        t0 = time.monotonic()
        try:
            handle = self.rescorer.rescore_async(
                [g[3] for g in group], padded_n=bucket)
        except Exception as e:   # noqa: BLE001 — thread supervisor:
            # anything the rescorer throws (a hot-reload race, an
            # artifact missing the shape, a device error) must not kill
            # the batcher thread — a dead batcher wedges EVERY client
            # forever (VERDICT r3 weak #3). Convert to error replies
            # (sent from the replier thread so a stalled client's full
            # TCP buffer can't head-of-line-block batching) and keep
            # the slot semaphore balanced.
            self._slots.release()
            self._bump("errors", len(group))
            self._inflight.put((self._ERR, group, str(e), None))
            return
        # Backpressure comes from the slot semaphore (acquired by the
        # batcher, released by the replier when the batch completes):
        # at most pipeline_depth batches in flight, so this put never
        # grows the queue unboundedly.
        self._inflight.put((handle, group, bucket, t0))

    def _replier(self):
        """Stage 3: block on device results, send replies, feed the
        service-time EMA the adaptive windows read."""
        import time

        while True:
            entry = self._inflight.get()
            if entry is self._STOP:
                return
            if entry[0] is self._SHED:
                _, item, waited_s, _ = entry
                client, lock, req = item[0], item[1], item[2]
                self._send_err(client, lock, req,
                               f"overloaded: queued {waited_s * 1e3:.0f} "
                               "ms > max_queue_ms")
                continue
            if entry[0] is self._ERR:
                _, group, msg, _ = entry
                for client, lock, req, *_ in group:
                    self._send_err(client, lock, req,
                                   f"internal error: {msg[:160]}")
                continue
            handle, group, bucket, t0 = entry
            try:
                results = handle.wait()
            except Exception as e:   # noqa: BLE001 — thread supervisor:
                # a failed device readback must not kill the replier —
                # the dispatched slot would never be released and the
                # server would wedge silently (VERDICT r3 weak #3).
                # Error-reply the whole group, rebalance the slot, and
                # keep serving.
                self._slots.release()
                self._queue.put(self._WAKE)
                self._bump("errors", len(group))
                for client, lock, req, *_ in group:
                    self._send_err(client, lock, req,
                                   f"internal error: {e!s:.160}")
                continue
            # Free the device slot before serializing replies so the
            # batcher can dispatch the next batch immediately.
            self._slots.release()
            self._queue.put(self._WAKE)
            dt = time.monotonic() - t0
            # dt includes any queue wait ahead of this batch — an upper
            # bound on service time; fine for a waiting heuristic.
            prev = self._service_ema.get(bucket, dt)
            self._service_ema[bucket] = 0.7 * prev + 0.3 * dt
            self._bump("batches")
            self._bump("images", len(group))
            for (client, lock, req, *_), new_scores in zip(group, results):
                try:
                    self._reply(client, lock, req, new_scores)
                except Exception:   # noqa: BLE001 — one client's bad
                    # reply serialization must not take down the thread
                    # serving everyone else.
                    self._bump("errors")

    def _client_loop(self, client):
        import socket
        import threading
        import time

        lock = threading.Lock()
        # Protocol auto-detect: a JSON-lines connection's first byte is
        # '{' (or leading whitespace); anything else is a binary frame
        # (BIN_MAGIC's first LE byte is 'G').
        try:
            first = client.recv(1, socket.MSG_PEEK)
        except OSError:
            client.close()
            return
        if first and first not in b"{ \t\r\n":
            self._client_loop_bin(client, lock)
            return
        with client, client.makefile("r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                req = None
                try:
                    req = json.loads(line)
                    if isinstance(req, dict) and req.get("stats"):
                        # Observability probe: answer inline from the
                        # reader thread, never touches the device.
                        with lock:
                            try:
                                client.sendall((json.dumps(
                                    self.stats_snapshot()) + "\n").encode())
                            except OSError:
                                return
                        continue
                    image = self._parse(req)
                except (ValueError, KeyError, TypeError) as e:
                    self._bump("errors")
                    self._send_err(client, lock, req, str(e))
                    continue
                self._queue.put((client, lock, req, image,
                                 time.monotonic()))

    def _client_loop_bin(self, client, lock):
        """Reader loop for a binary-protocol connection (module-level
        frame spec). Validation mirrors the JSON path; a bad magic means
        framing is lost, so the connection is dropped after one error
        frame rather than resynchronized."""
        import struct
        import time

        n_cap = 4 * max(self.rescorer.cfg.data.bucket_sizes) + 65536
        with client:
            while True:
                head = _recv_exact(client, _BIN_REQ_HEADER)
                if head is None:
                    return
                magic, rid, n, flags = struct.unpack("<IQII", head)
                req = {"id": rid, "_bin": True}
                if magic != BIN_MAGIC:
                    self._bump("errors")
                    self._send_err(client, lock, req,
                                   f"bad frame magic 0x{magic:08x}")
                    return
                if n > n_cap:
                    # Don't trust a wild length enough to read the body.
                    self._bump("errors")
                    self._send_err(client, lock, req,
                                   f"frame n={n} exceeds cap {n_cap}")
                    return
                has_cls = bool(flags & 1)
                body = _recv_exact(
                    client, n * 20 + (n * 4 if has_cls else 0))
                if body is None:
                    return
                boxes = np.frombuffer(
                    body, "<f4", count=n * 4).reshape(n, 4)
                scores = np.frombuffer(body, "<f4", count=n, offset=n * 16)
                classes = (np.frombuffer(body, "<i4", count=n,
                                         offset=n * 20)
                           if has_cls else None)
                try:
                    self.rescorer._check_image(rid, scores, classes,
                                               truncate=False)
                except ValueError as e:
                    self._bump("errors")
                    self._send_err(client, lock, req, str(e))
                    continue
                self._queue.put((client, lock, req,
                                 (boxes, scores, classes),
                                 time.monotonic()))

    def _accept_loop(self):
        import threading

        while True:
            try:
                client, _ = self.sock.accept()
            except OSError:
                return   # socket closed by stop()
            threading.Thread(target=self._client_loop, args=(client,),
                             daemon=True).start()

    # -- lifecycle --
    def start(self):
        import queue
        import threading
        import time

        # Pre-compile every reachable (batch, bucket) shape so no
        # client request pays JIT latency (cold-start SLO), and seed
        # each bucket's service-time EMA from a timed full-batch run.
        # Batches pad to powers of two (api.py _dispatch), and each
        # bucket's reachable set runs up to ITS batch cap (per-bucket
        # batch sizing — see __init__).
        for n in self.rescorer.cfg.data.bucket_sizes:
            cap = self._batch_for.get(n, self.batch_size)
            pads = sorted({1 << max(x - 1, 0).bit_length()
                           for x in range(1, cap + 1)})
            for b in pads:
                self.rescorer._run(np.zeros((b, n, 4), np.float32),
                                   np.zeros((b, n), np.float32),
                                   np.zeros((b, n), bool),
                                   np.zeros((b, n), np.int32))
            # Seed the EMA from a second, WARM cap-sized run (the first
            # paid its JIT compile; timing that would pin the window at
            # max_window_ms until real traffic corrected it).
            b = pads[-1]
            t0 = time.monotonic()
            self.rescorer._run(np.zeros((b, n, 4), np.float32),
                               np.zeros((b, n), np.float32),
                               np.zeros((b, n), bool),
                               np.zeros((b, n), np.int32))
            self._service_ema[n] = time.monotonic() - t0
        self._queue = queue.Queue()
        self._inflight = queue.Queue()
        self._slots = threading.Semaphore(self.pipeline_depth)
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
    from gossipnet_tpu.data.roidb import _xywh_to_xyxy_np

    for img_id, idxs in sorted(by_image.items()):
        boxes = _xywh_to_xyxy_np(
            np.asarray([dets[k]["bbox"] for k in idxs], np.float32))
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
    p.add_argument("--artifact", default=None,
                   help="serve from an exported AOT artifact "
                        "(utils/model_artifact.py); no config or "
                        "checkpoint needed")
    p.add_argument("--random-init", action="store_true",
                   help="untrained weights (smoke tests only)")
    p.add_argument("--sync", action="store_true",
                   help="answer each stdin request immediately "
                        "(interactive latency, no batching)")
    p.add_argument("--tcp", type=int, default=None, metavar="PORT",
                   help="serve concurrent clients over TCP on PORT "
                        "(JSON lines per connection; 0 = ephemeral)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--batch-size", type=int, default=8,
                   help="TCP mode max micro-batch (clamped to an "
                        "artifact's max exported batch)")
    p.add_argument("--det-budget", type=int, default=None,
                   help="TCP mode per-bucket batch sizing: each bucket "
                        "n batches up to det_budget/n images (small "
                        "buckets saturate the chip at larger batches — "
                        "BENCHMARKS.md batch sweep). Default: "
                        "batch_size * largest bucket")
    p.add_argument("--max-queue-ms", type=float, default=None,
                   help="TCP mode load-shedding bound: requests queued "
                        "longer than this under overload get an "
                        "'overloaded' error reply (default: queue "
                        "indefinitely)")
    args = p.parse_args(argv)
    rescorer = _build(args)
    if args.tcp is not None:
        import signal
        import threading

        server = TcpServer(rescorer, host=args.host, port=args.tcp,
                           threshold=args.threshold,
                           batch_size=args.batch_size,
                           max_queue_ms=args.max_queue_ms,
                           det_budget=args.det_budget).start()
        print(f"serving on {args.host}:{server.port}", file=sys.stderr,
              flush=True)
        done = threading.Event()

        def _drain(signum, frame):
            # Graceful drain: stop accepting, flush in-flight batches,
            # answer everything already queued, then exit 0.
            del signum, frame
            done.set()

        signal.signal(signal.SIGTERM, _drain)
        signal.signal(signal.SIGINT, _drain)
        if not args.artifact and not args.random_init:
            # Zero-downtime weight update: SIGHUP re-reads the best-AP
            # checkpoint and swaps it in atomically (Rescorer.reload);
            # in-flight batches finish on the old weights. The handler
            # runs on this (main) thread, which only waits on `done`,
            # so the checkpoint read never blocks the serving threads.
            def _reload(signum, frame):
                del signum, frame
                try:
                    rescorer.reload(checkpoint_dir=args.checkpoint_dir)
                    print(f"weights reloaded from "
                          f"{args.checkpoint_dir}", file=sys.stderr,
                          flush=True)
                except Exception as e:   # keep serving on a bad reload
                    print(f"reload failed (serving continues on the "
                          f"old weights): {e}", file=sys.stderr,
                          flush=True)

            signal.signal(signal.SIGHUP, _reload)
        done.wait()
        server.stop()
        s = server.stats
        print(f"drained: {s['images']} images in {s['batches']} batches, "
              f"{s['errors']} errors", file=sys.stderr, flush=True)
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
