"""Profiling/tracing hooks.

The reference's only observability is TensorBoard scalars (SURVEY.md §5
"Tracing/profiling"); the rebuild adds a proper device profiler: a
``--profile`` flag dumps a perfetto/xplane trace via ``jax.profiler`` for
a window of steps, plus a context manager for ad-hoc use.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True):
    """Capture a jax.profiler trace (view in XProf/perfetto/TensorBoard)."""
    if not enabled:
        yield
        return
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepProfiler:
    """Profiles steps [start, stop) of a training loop into ``log_dir``."""

    def __init__(self, log_dir: str | Path, start: int = 10, stop: int = 15,
                 enabled: bool = False):
        self.log_dir = str(log_dir)
        self.start, self.stop = start, stop
        self.enabled = enabled
        self._active = False

    def step(self, step: int) -> None:
        if not self.enabled:
            return
        import jax

        if step == self.start and not self._active:
            Path(self.log_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Best-effort per-device memory stats (bytes)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = {}
    return out
