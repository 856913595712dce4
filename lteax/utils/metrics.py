"""Metrics / observability (SURVEY.md §5).

(reference capability: the debug message stream of
``LTE_fdd_enb_interface::send_debug_msg`` with type/level masks, plus the
ctrl-socket cell reports.  Here: structured counters + rate meters +
JSON-lines event log — host-side, zero dataplane cost.)
"""

from __future__ import annotations

import json
import sys
import threading
import time
from collections import defaultdict


class Metrics:
    """Process-wide counter/gauge registry with rate computation."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, float] = defaultdict(float)
        self._gauges: dict[str, float] = {}
        self._t0 = time.monotonic()

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def rate(self, name: str) -> float:
        """Counter value per second since process start."""
        dt = time.monotonic() - self._t0
        with self._lock:
            return self._counters.get(name, 0.0) / max(dt, 1e-9)

    def snapshot(self) -> dict:
        with self._lock:
            return {"counters": dict(self._counters),
                    "gauges": dict(self._gauges),
                    "uptime_s": time.monotonic() - self._t0}

    def dump(self, stream=None) -> None:
        print(json.dumps(self.snapshot()), file=stream or sys.stderr)


METRICS = Metrics()


class EventLog:
    """JSON-lines structured event log (decoded MIB/SIB reports, errors)."""

    def __init__(self, path: str | None = None):
        self._f = open(path, "a") if path else sys.stdout
        self._own = path is not None
        self._lock = threading.Lock()

    def emit(self, event: str, **fields) -> None:
        rec = {"ts": time.time(), "event": event, **fields}
        with self._lock:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    def close(self) -> None:
        if self._own:
            self._f.close()


def throughput_meter(n_bits: int, seconds: float) -> dict:
    """Standard throughput record for bench outputs."""
    return {"mbit_per_s": n_bits / seconds / 1e6,
            "seconds": seconds, "bits": n_bits}
