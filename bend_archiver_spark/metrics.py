"""Throughput metrics — parity with the reference's sliding-window
rows/s / bytes/s telemetry (A36: source/stats.go, ingester/stats.go,
worker/stats.go).

The reference keeps three mutex-guarded go-time-series recorders and
logs per-batch throughput. Here a single thread-safe recorder tracks
cumulative and sliding-window rates; the archive job records extract
and ingest events, and ``as_log_line`` reproduces the reference's
log shape (rows/s + bytes/s per batch and globally).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass

__all__ = ["ThroughputRecorder"]


@dataclass
class _Event:
    ts: float
    rows: int
    bytes: int


class ThroughputRecorder:
    """Sliding-window rows/s and bytes/s with cumulative totals."""

    def __init__(self, window_sec: float = 60.0, clock=time.monotonic):
        self._window = window_sec
        self._clock = clock
        self._events: deque[_Event] = deque()
        self._lock = threading.Lock()
        self.total_rows = 0
        self.total_bytes = 0
        self._start = clock()

    def record(self, rows: int, nbytes: int = 0) -> None:
        now = self._clock()
        with self._lock:
            self._events.append(_Event(now, rows, nbytes))
            self.total_rows += rows
            self.total_bytes += nbytes
            self._trim(now)

    def _trim(self, now: float) -> None:
        cutoff = now - self._window
        while self._events and self._events[0].ts < cutoff:
            self._events.popleft()

    def window_rates(self) -> tuple[float, float]:
        """(rows/s, bytes/s) over the sliding window."""
        now = self._clock()
        with self._lock:
            self._trim(now)
            if not self._events:
                return 0.0, 0.0
            # clamp to >= 1s so a single fresh event doesn't report an
            # unbounded instantaneous rate
            span = max(now - self._events[0].ts, 1.0)
            rows = sum(e.rows for e in self._events)
            nbytes = sum(e.bytes for e in self._events)
            return rows / span, nbytes / span

    def cumulative_rates(self) -> tuple[float, float]:
        elapsed = max(self._clock() - self._start, 1.0)
        return self.total_rows / elapsed, self.total_bytes / elapsed

    def as_log_line(self, label: str) -> str:
        wr, wb = self.window_rates()
        cr, cb = self.cumulative_rates()
        return (
            f"{label}: window {wr:.0f} rows/s {wb:.0f} bytes/s | "
            f"cumulative {cr:.0f} rows/s {cb:.0f} bytes/s | "
            f"total {self.total_rows} rows {self.total_bytes} bytes"
        )
