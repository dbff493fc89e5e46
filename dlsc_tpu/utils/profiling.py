"""Tracing / profiling (SURVEY.md §5.1 — absent in the reference).

- ``trace(dir)``: jax.profiler trace capture as a context manager; the
  resulting Perfetto/TensorBoard trace lands in ``dir``.
- ``Throughput``: rolling clips/sec/chip meter (the BASELINE.json metric),
  logged per epoch by the Trainer.
- ``device_memory_stats``: best-effort HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace: ``with trace(run_dir/'profile'): step(...)``."""
    import jax

    path = Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(path))
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling clips/sec/chip meter."""

    def __init__(self, n_chips: int = 1, window: int = 50):
        self.n_chips = max(n_chips, 1)
        self.window = window
        self._events: list[tuple[float, int]] = []

    def tick(self, n_clips: int) -> None:
        self._events.append((time.perf_counter(), n_clips))
        if len(self._events) > self.window:
            self._events.pop(0)

    @property
    def clips_per_sec_per_chip(self) -> float:
        if len(self._events) < 2:
            return 0.0
        dt = self._events[-1][0] - self._events[0][0]
        clips = sum(n for _, n in self._events[1:])
        return clips / dt / self.n_chips if dt > 0 else 0.0


def device_memory_stats() -> dict:
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
        except Exception:
            continue
    return out
