"""Profiling helpers: JAX profiler traces around search/build flows.

Replaces the reference's external Instant-timing example binaries
(``examples/profile_mstg_search*.rs``) with first-class device traces that
open in XProf/TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a device profile for the enclosed block.

    Usage::

        with device_trace("/tmp/rabitq_trace"):
            index.batch_search_arrays(queries, params)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timer:
    """Tiny wall-clock timer with named laps, for benchmark harnesses."""

    laps: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def lap(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.laps[name] = self.laps.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        return ", ".join(f"{k}={v:.3f}s" for k, v in self.laps.items())
