"""Subprocess TCP bench client for scripts/bench_serving.py.

Runs in its OWN interpreter so client-side JSON encode/decode does not
contend on the server process's GIL — in-process thread clients were
measured to depress the 16-client saturation row (the server, the JAX
dispatch thread, and 16 clients' json work all shared one GIL).

Usage: python _tcp_bench_client.py PORT CLIENT_ID N_REQUESTS
Emits one JSON line: {"lats": [seconds...], "t0": epoch, "t1": epoch}.
Deliberately imports nothing heavy (no jax, no gossipnet_tpu).
"""
import json
import socket
import sys
import time

import numpy as np


def main(port: int, cid: int, per_client: int) -> None:
    rng = np.random.default_rng(100 + cid)
    lats = []
    with socket.create_connection(("127.0.0.1", port)) as s:
        f = s.makefile("r")
        t_start = time.time()
        for k in range(per_client):
            # Same size mix as bench_serving's stream workload:
            # 8 detections per GT at n_gt in {16, 40, 100} -> 128/320/800.
            n = 8 * int(rng.choice([16, 40, 100]))
            x1 = rng.uniform(0, 540, n)
            y1 = rng.uniform(0, 380, n)
            w = rng.uniform(10, 100, n)
            h = rng.uniform(10, 100, n)
            boxes = np.stack([x1, y1, x1 + w, y1 + h], 1)
            scores = rng.uniform(0.05, 1.0, n)
            req = json.dumps({
                "id": k,
                "boxes": np.round(boxes, 2).tolist(),
                "scores": np.round(scores, 4).tolist(),
            }) + "\n"
            t0 = time.perf_counter()
            s.sendall(req.encode())
            resp = json.loads(f.readline())
            if "error" not in resp:   # shed replies are not service time
                lats.append(time.perf_counter() - t0)
        t_end = time.time()
    print(json.dumps({"lats": lats, "t0": t_start, "t1": t_end}))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
