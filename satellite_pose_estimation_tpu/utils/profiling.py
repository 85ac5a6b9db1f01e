"""Profiling / tracing utilities.

The reference's observability is wall-clock meters only
(model_time/solver_time SmoothedValues, cuda.max_memory_allocated prints —
SURVEY.md section 5). TPU-native equivalents:
* ``trace(logdir)`` — context manager around jax.profiler for full XLA
  traces viewable in TensorBoard/Perfetto;
* ``device_timer`` — block_until_ready-based stage timing;
* ``ThroughputMeter`` — the images/sec north-star meter;
* ``device_memory_stats`` — per-device HBM usage (max-memory equivalent).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax_trace"):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def device_timer(label: str, results: Optional[dict] = None):
    """Wall-clock a device computation accurately (syncs before/after)."""
    jax.effects_barrier()
    t0 = time.perf_counter()
    holder = {}
    yield holder
    if "value" in holder:
        jax.block_until_ready(holder["value"])
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    print(f"[timer] {label}: {dt * 1000:.2f} ms")


class ThroughputMeter:
    """images/sec over a sliding window — the north-star metric."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.images = 0

    def update(self, n: int):
        self.images += n

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.images / dt if dt > 0 else 0.0


def device_memory_stats() -> dict:
    """Per-device memory usage (bytes), where the backend reports it."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            if stats:
                out[str(d)] = {
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                }
        except Exception:
            pass
    return out
