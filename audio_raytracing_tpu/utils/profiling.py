"""Timing spans — the observability layer.

The reference's profiling is two std.time.Timer prints: "update" (acoustic
re-trace per frame, main.zig:525-526) and "callback" (audio block render,
sound_system.zig:133-134). This module provides the same spans as a
structured, aggregating facility: `span(name)` context managers record
wall-time into a global registry; `report()` summarizes count/mean/p50/max
per span. `jax.profiler` remains available for device-side traces; these
spans measure the host-visible latencies that the reference printed.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

_records: dict[str, list] = defaultdict(list)
enabled = True


@contextlib.contextmanager
def span(name: str):
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _records[name].append(time.perf_counter() - t0)


def record(name: str, seconds: float) -> None:
    _records[name].append(seconds)


def stats(name: str) -> dict:
    xs = np.asarray(_records.get(name, []), float)
    if xs.size == 0:
        return {"count": 0}
    return {
        "count": int(xs.size),
        "mean_ms": float(xs.mean() * 1e3),
        "p50_ms": float(np.median(xs) * 1e3),
        "max_ms": float(xs.max() * 1e3),
    }


def report() -> dict:
    return {name: stats(name) for name in sorted(_records)}


def reset() -> None:
    _records.clear()
