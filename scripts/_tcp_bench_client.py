"""Subprocess TCP bench client for scripts/bench_serving.py.

Runs in its OWN interpreter so client-side JSON encode/decode does not
contend on the server process's GIL — in-process thread clients were
measured to depress the 16-client saturation row (the server, the JAX
dispatch thread, and 16 clients' json work all shared one GIL).

Usage: python _tcp_bench_client.py PORT CLIENT_ID N_REQUESTS [fast|bin]
Emits one JSON line: {"lats": [seconds...], "t0": epoch, "t1": epoch}.
Deliberately imports nothing heavy (no jax, no gossipnet_tpu).

``fast``: pre-encode one request line per image size and cycle them —
for high-client-count saturation runs on CPU-starved bench hosts, where
per-request numpy+json generation in dozens of client processes would
measure the host's one core instead of the server. Responses still
fully decode (that cost is inherent to a real client).

``bin``: the server's binary frame protocol (gossipnet_tpu/serving.py
BIN_MAGIC spec) — raw f32 arrays both ways, no JSON on the data path.
"""
import json
import socket
import struct
import sys
import time

import numpy as np

BIN_MAGIC = 0x544E4E47


def _make_arrays(rng, n: int):
    x1 = rng.uniform(0, 540, n)
    y1 = rng.uniform(0, 380, n)
    w = rng.uniform(10, 100, n)
    h = rng.uniform(10, 100, n)
    boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
    scores = rng.uniform(0.05, 1.0, n)
    return boxes, scores


def _make_req(rng, n: int, rid) -> bytes:
    boxes, scores = _make_arrays(rng, n)
    return (json.dumps({
        "id": rid,
        "boxes": np.round(boxes, 2).tolist(),
        "scores": np.round(scores, 4).tolist(),
    }) + "\n").encode()


def _make_req_bin(rng, n: int, rid) -> bytes:
    boxes, scores = _make_arrays(rng, n)
    return (struct.pack("<IQII", BIN_MAGIC, rid, n, 0)
            + boxes.astype("<f4").tobytes()
            + scores.astype("<f4").tobytes())


def _recv_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        assert chunk, "server closed mid-frame"
        buf.extend(chunk)
    return bytes(buf)


def _read_reply_bin(s) -> bool:
    """Read one binary reply frame; returns ok (False = error frame)."""
    magic, status, _rid = struct.unpack("<IBQ", _recv_exact(s, 13))
    assert magic == BIN_MAGIC, hex(magic)
    if status != 0:
        (ln,) = struct.unpack("<I", _recv_exact(s, 4))
        _recv_exact(s, ln)
        return False
    (n,) = struct.unpack("<I", _recv_exact(s, 4))
    scores = np.frombuffer(_recv_exact(s, 4 * n), "<f4")
    (k,) = struct.unpack("<I", _recv_exact(s, 4))
    np.frombuffer(_recv_exact(s, 4 * k), "<i4")
    assert len(scores) == n
    return True


def main(port: int, cid: int, per_client: int, mode: str) -> None:
    rng = np.random.default_rng(100 + cid)
    # Same size mix as bench_serving's stream workload:
    # 8 detections per GT at n_gt in {16, 40, 100} -> 128/320/800.
    sizes = [8 * int(rng.choice([16, 40, 100])) for _ in range(per_client)]
    make = _make_req_bin if mode == "bin" else _make_req
    canned = ({n: make(rng, n, 0) for n in set(sizes)}
              if mode in ("fast", "bin") else None)
    lats = []
    with socket.create_connection(("127.0.0.1", port)) as s:
        f = s.makefile("r") if mode != "bin" else None
        t_start = time.time()
        for k, n in enumerate(sizes):
            payload = canned[n] if canned else make(rng, n, k)
            t0 = time.perf_counter()
            s.sendall(payload)
            if mode == "bin":
                ok = _read_reply_bin(s)
            else:
                ok = "error" not in json.loads(f.readline())
            if ok:   # shed replies are not service time
                lats.append(time.perf_counter() - t0)
        t_end = time.time()
    print(json.dumps({"lats": lats, "t0": t_start, "t1": t_end}))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
         sys.argv[4] if len(sys.argv) > 4 else "")
