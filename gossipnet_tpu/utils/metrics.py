"""Metrics logging + step timing.

The reference logs TensorBoard scalars and stdout prints (SURVEY.md §5).
The rebuild's primary sink is append-only JSONL (machine-readable,
dependency-free); stdout mirroring is optional. AP and throughput
(detections/sec/chip) are first-class counters.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any


class MetricsLogger:
    """Append-only JSONL metrics log; one record per call.

    Optional TensorBoard scalar mirroring (the reference's only
    observability was tf.summary scalars): pass ``tb_dir`` and scalars
    are also written via tf.summary if TensorFlow is importable.
    """

    def __init__(self, path: str | Path | None, echo: bool = True,
                 tb_dir: str | Path | None = None):
        self.path = Path(path) if path else None
        self.echo = echo
        self._tb = None
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
        if tb_dir is not None:
            try:
                import tensorflow as tf  # present in the image; optional

                self._tb = tf.summary.create_file_writer(str(tb_dir))
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for k, v in rec.items():
                    if k not in ("step", "time") and isinstance(v, float):
                        tf.summary.scalar(k, v, step=step)
        if self.echo:
            parts = [f"step {step}"]
            parts += [
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("step", "time")
            ]
            print("  ".join(parts), flush=True)


class StepTimer:
    """Rolling steps/sec + detections/sec estimator."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._dets: list[int] = []

    def tick(self, num_dets: int = 0) -> None:
        self._times.append(time.perf_counter())
        self._dets.append(num_dets)
        if len(self._times) > self.window:
            self._times.pop(0)
            self._dets.pop(0)

    @property
    def steps_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else 0.0

    @property
    def dets_per_sec(self) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return sum(self._dets[1:]) / dt if dt > 0 else 0.0
