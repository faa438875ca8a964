"""Profiling and device-memory observability.

TPU equivalents of the reference's nvidia_smi memory probe
(run_train.py:39-40, 156-158) and coarse wall-clock prints: JAX profiler
traces (viewable in TensorBoard/Perfetto) and live device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


def device_memory_stats(device=None) -> Dict[str, float]:
    """Bytes in use / limit for a device, in GB (TPU equivalent of the
    nvmlDeviceGetMemoryInfo probe). Returns {} when unsupported (CPU)."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    out = {}
    for key, name in (
        ("bytes_in_use", "mem_used_gb"),
        ("bytes_limit", "mem_limit_gb"),
        ("peak_bytes_in_use", "mem_peak_gb"),
    ):
        if key in stats:
            out[name] = stats[key] / 1e9
    return out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context: `with trace('/tmp/trace'): step()`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating section timer for coarse pipeline profiling."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            name: {"total_s": t, "count": self.counts[name], "mean_s": t / self.counts[name]}
            for name, t in self.totals.items()
        }
