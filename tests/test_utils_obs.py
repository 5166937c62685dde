"""Direct coverage for the observability utilities (metrics JSONL,
step timer, profiler hooks) — SURVEY.md §5 'tracing/profiling' and
'metrics/logging'."""
import json
import time

from gossipnet_tpu.utils.metrics import MetricsLogger, StepTimer
from gossipnet_tpu.utils.profiling import (StepProfiler, device_memory_stats,
                                           profile_trace)


def test_metrics_logger_jsonl_roundtrip(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(path, echo=False)
    log.log(1, loss=0.5, ap=0.25, tag="warm")
    log.log(2, loss=0.25)
    recs = [json.loads(line) for line in path.read_text().splitlines()]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[0]["loss"] == 0.5 and recs[0]["tag"] == "warm"
    assert "time" in recs[0]


def test_metrics_logger_tb_optional(tmp_path):
    # tb_dir points somewhere writable; TF present in the image -> the
    # mirror initializes, but the JSONL contract must hold regardless.
    log = MetricsLogger(tmp_path / "m.jsonl", echo=False,
                        tb_dir=tmp_path / "tb")
    log.log(3, loss=1.0)
    assert (tmp_path / "m.jsonl").exists()


def test_step_timer_rates():
    t = StepTimer(window=10)
    for _ in range(5):
        t.tick(num_dets=100)
        time.sleep(0.01)
    assert 0 < t.steps_per_sec < 1000
    assert 0 < t.dets_per_sec <= t.steps_per_sec * 100 * 1.5


def test_step_profiler_traces_window(tmp_path):
    import jax
    import jax.numpy as jnp

    prof = StepProfiler(tmp_path / "trace", start=1, stop=3, enabled=True)
    for step in range(5):
        prof.step(step)
        jnp.square(jnp.arange(8.0)).block_until_ready()
    prof.close()
    assert not prof._active
    assert any((tmp_path / "trace").rglob("*"))  # xplane/perfetto output


def test_profile_trace_disabled_is_noop(tmp_path):
    with profile_trace(tmp_path / "t", enabled=False):
        pass
    assert not (tmp_path / "t").exists()


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
