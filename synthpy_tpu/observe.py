"""Observability: timers, device-memory profiling, sharding visualisation.

Parity surface for the reference's tracing/profiling hooks (SURVEY.md
section 5): wall-clock timers around compile and solve
(propagator.py:579-602), jax device-memory profiles
(propagator.py:606-667, written as memory-domain{D}_rays{R}-<ts>.prof for
evaluation/memory_benchmarks/memory_plots.py), tracemalloc-style host
memory reporting (tracer_mem_test.py:28-53), and
jax.debug.visualize_array_sharding (propagator.py:609).
"""

from __future__ import annotations

import contextlib
import os
import time
from datetime import datetime
from typing import Dict, Iterator, Optional

import jax


class Timer:
    """Named wall-clock section timers.

    Usage:
        t = Timer()
        with t.section("compile"):
            ...
        print(t.report())
    """

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - start)

    def report(self) -> str:
        return " | ".join(f"{k}: {v:.3f}s" for k, v in self.times.items())


def save_device_memory_profile(
    out_dir: str = "memory_benchmarks",
    domain_dim: Optional[int] = None,
    rays: Optional[int] = None,
) -> str:
    """Dump a pprof device-memory profile.

    File naming matches the reference's artifact convention
    ``memory-domain{D}_rays{R}-<timestamp>.prof`` (propagator.py:654-656) so
    existing post-processing keeps working.
    """
    os.makedirs(out_dir, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(
        out_dir,
        f"memory-domain{domain_dim or 0}_rays{rays or 0}-{stamp}.prof")
    jax.profiler.save_device_memory_profile(path)
    return path


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory statistics (bytes), where the backend reports them.

    Replaces the reference's psutil/pynvml free-memory probing
    (domain.py:137-227) — on TPU the allocator statistics come from the
    device itself.
    """
    stats = {}
    for dev in jax.local_devices():
        s = dev.memory_stats()
        if s:
            stats[str(dev)] = {
                "bytes_in_use": int(s.get("bytes_in_use", 0)),
                "bytes_limit": int(s.get("bytes_limit", 0)),
                "peak_bytes_in_use": int(s.get("peak_bytes_in_use", 0)),
            }
    return stats


def visualize_sharding(x) -> None:
    """Pretty-print how an array is laid out across the mesh
    (propagator.py:609's debug hook)."""
    jax.debug.visualize_array_sharding(x)


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """XLA execution trace context (viewable in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def checking_leaks() -> Iterator[None]:
    """jax leak-checking context (the reference wraps whole runs in it,
    test_SynthRayTrace.py:71)."""
    with jax.checking_leaks():
        yield
