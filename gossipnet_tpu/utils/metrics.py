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
    """Append-only JSONL metrics log; one record per call."""

    def __init__(self, path: str | Path | None, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
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
