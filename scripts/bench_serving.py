"""Config-5 end-to-end serving benchmark: mixed-size stream through the
Rescorer (bucketed batches, multiple compiled shapes), host-driven.

Reports wall-clock end-to-end throughput (including host batching and the
harness's per-call RPC latency) — the pessimistic serving bound; the
on-device bound is bench.py's number.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time
import numpy as np
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.api import Rescorer
from gossipnet_tpu.config import Config, DataConfig, ModelConfig
from gossipnet_tpu.data.synthetic import synthetic_record
from gossipnet_tpu.train import build_model
import jax

cfg = Config(
    model=ModelConfig(num_blocks=16, feature_dim=128, reduced_dim=32,
                      pairwise_dim=32),
    data=DataConfig(bucket_sizes=(256, 512, 1024)),
)
rng = np.random.default_rng(0)
# mixed-size stream: small/medium/large images
images = []
for i in range(96):
    n_gt = int(rng.choice([16, 40, 100]))
    rec = synthetic_record(rng, i, num_gt=n_gt, dets_per_gt=7,
                           num_clutter=n_gt)
    images.append((rec.det_boxes, rec.det_scores, None))
sizes = [len(s) for _, s, _ in images]
print(f"{len(images)} images, dets per image min/med/max: "
      f"{min(sizes)}/{int(np.median(sizes))}/{max(sizes)}", flush=True)

model = build_model(cfg, pool_impl="pallas")
import jax.numpy as jnp
b0, s0, _ = images[0]
params = model.init(jax.random.key(0),
                    jnp.asarray(b0[None]), jnp.asarray(s0[None]),
                    jnp.ones((1, len(s0)), bool))["params"]
rescorer = Rescorer(cfg, params, pool_impl="pallas")


def soak(minutes: float, n_clients: int = 4):
    """Long-haul stability: run the TCP server under sustained client
    load in repeated waves, sampling the stats probe and the server
    process RSS each wave. Production evidence the latency rows can't
    give: no RSS creep (leaked handles / growing queues), no error or
    shed accumulation, stable p50 across waves. Exits nonzero on
    drift. Usage: bench_serving.py --soak MINUTES [CLIENTS]."""
    import resource
    import subprocess
    import sys as _sys

    from gossipnet_tpu.serving import TcpServer

    client = pathlib.Path(__file__).resolve().parent / "_tcp_bench_client.py"
    server = TcpServer(rescorer, port=0, threshold=0.5,
                       batch_size=8, window_ms=10.0).start()
    deadline = time.monotonic() + minutes * 60
    waves = []
    rss0 = None
    while time.monotonic() < deadline:
        procs = [subprocess.Popen(
            [_sys.executable, str(client), str(server.port), str(c), "48"],
            stdout=subprocess.PIPE, text=True) for c in range(n_clients)]
        reports = [json.loads(p.communicate()[0]) for p in procs]
        lats = sorted(l for r in reports for l in r["lats"])
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        rss0 = rss0 or rss
        w = {"wave": len(waves) + 1,
             "p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
             "rss_gb": round(rss, 3), **server.stats_snapshot()}
        w.pop("buckets", None)
        waves.append(w)
        print(json.dumps(w), flush=True)
    server.stop()
    n = len(waves)
    ok = (waves[-1]["errors"] == 0 and waves[-1]["shed"] == 0
          and waves[-1]["rss_gb"] - rss0 < 0.25
          and waves[-1]["images"] == 48 * n_clients * n)
    print(json.dumps({
        "metric": f"serving soak ({minutes} min, {n_clients} clients)",
        "waves": n, "images": waves[-1]["images"],
        "p50_ms_first_to_last": [waves[0]["p50_ms"], waves[-1]["p50_ms"]],
        "rss_gb_first_to_last": [waves[0]["rss_gb"], waves[-1]["rss_gb"]],
        "errors": waves[-1]["errors"], "shed": waves[-1]["shed"],
        "ok": ok,
    }), flush=True)
    raise SystemExit(0 if ok else 1)


if "--soak" in sys.argv:
    i = sys.argv.index("--soak")
    soak(float(sys.argv[i + 1]),
         int(sys.argv[i + 2]) if len(sys.argv) > i + 2 else 4)

# warm every reachable (batch, bucket) shape: latency percentiles below
# must measure steady state, not JIT compiles (p99 was 6.5 s without)
rescorer.warmup(8)
rescorer.rescore_batch(images, batch_size=8)
t0 = time.perf_counter()
outs = rescorer.rescore_batch(images, batch_size=8)
dt = time.perf_counter() - t0
total = sum(sizes)
print(json.dumps({
    "metric": "end-to-end serving stream (mixed buckets, host-driven)",
    "images": len(images), "detections": total,
    "wall_s": round(dt, 3),
    "images_per_sec": round(len(images)/dt, 1),
    "dets_per_sec": round(total/dt, 1),
}), flush=True)


# --- per-request latency SLOs (VERDICT r2 #6) ---------------------------
def pct(lat, q):
    return round(float(np.percentile(np.asarray(lat) * 1e3, q)), 1)


# sync: one request at a time, block for each answer (interactive bound)
lat_sync = []
for bx, sc, cl in images:
    t0 = time.perf_counter()
    rescorer(bx, sc, cl)
    lat_sync.append(time.perf_counter() - t0)

# double-buffered stream: enqueue-to-response per request — shows the
# one-batch response lag the double buffering trades for throughput
t_in, lat_stream = {}, {}


def timed_images():
    for idx, img in enumerate(images):
        t_in[idx] = time.perf_counter()
        yield img


for idx, _ in rescorer.rescore_stream(timed_images(), batch_size=8):
    lat_stream[idx] = time.perf_counter() - t_in[idx]
lat_stream = list(lat_stream.values())

print(json.dumps({
    "metric": "serving latency per request (ms)",
    "sync_p50": pct(lat_sync, 50), "sync_p99": pct(lat_sync, 99),
    "stream_p50": pct(lat_stream, 50), "stream_p99": pct(lat_stream, 99),
    "note": "sync = blocking per image; stream = double-buffered "
            "(throughput-optimal, responses trail by <= 1 batch)",
}), flush=True)

# --- pipelined TCP server under concurrent clients (ROADMAP r3 #5) ------
# N clients x 48 requests over localhost through gossipnet_tpu.serving's
# TcpServer: per-bucket adaptive micro-batching + async-dispatch
# pipeline. Measures what a real multi-client deployment sees
# (socket + JSON overhead included). Clients run as SUBPROCESSES
# (scripts/_tcp_bench_client.py) with their own GILs: in-process thread
# clients shared the server's GIL, so their json encode/decode —
# client work a real deployment does on other machines — depressed the
# measured saturation throughput (see BENCHMARKS.md for the delta).
import subprocess
import sys as _sys

from gossipnet_tpu.serving import TcpServer

CLIENT = pathlib.Path(__file__).resolve().parent / "_tcp_bench_client.py"

# (clients, max_queue_ms, proto): the 16-client saturation row runs
# three ways — unbounded queueing, with load shedding bounding the
# queue wait, and over the binary frame protocol (no JSON on the data
# path on either side) to isolate serialization cost at saturation.
for n_clients, shed_ms, proto in (
        (4, None, ""), (16, None, ""), (16, 300.0, ""), (16, None, "bin")):
    server = TcpServer(rescorer, port=0, threshold=0.5,
                       batch_size=8, window_ms=10.0,
                       max_queue_ms=shed_ms).start()
    per_client = 48
    procs = [subprocess.Popen(
        [_sys.executable, str(CLIENT), str(server.port), str(c),
         str(per_client), proto], stdout=subprocess.PIPE, text=True)
        for c in range(n_clients)]
    reports = [json.loads(p.communicate()[0]) for p in procs]
    lat_tcp = [l for r in reports for l in r["lats"]]
    # Wall clock of the overlapping client run windows (excludes each
    # subprocess's interpreter/numpy startup).
    wall = max(r["t1"] for r in reports) - min(r["t0"] for r in reports)
    served = server.stats["images"]
    batches = server.stats["batches"]
    server.stop()
    print(json.dumps({
        "metric": f"pipelined TCP server, {n_clients} concurrent "
                  f"clients ({proto or 'json'}, ms)",
        "requests": n_clients * per_client,
        "tcp_p50": pct(lat_tcp, 50), "tcp_p99": pct(lat_tcp, 99),
        "images_per_sec": round(served / wall, 1),
        "mean_batch": round(served / max(batches, 1), 2),
        "shed": server.stats["shed"],
        "max_queue_ms": shed_ms,
        "note": "request->response round trip per client over localhost; "
                "clients are synchronous (1 in flight each), so batching "
                "comes from cross-client coalescing; subprocess clients",
    }), flush=True)
print("DONE", flush=True)
