"""Profiling hooks: jax.profiler traces + throughput counters.

The reference's only instrumentation is wall-clock epoch timing
(bestengine.py:892,973).  Here: optional XLA trace capture around any
code region (viewable in TensorBoard/Perfetto) and a steady-state
throughput meter whose stop() forces a real device round trip — on this
TPU tunnel ``block_until_ready`` can ack early, so a scalar fetch is the
only trustworthy completion barrier.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture an XLA profiler trace for the enclosed region."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Counts items (segments) between start() and stop()."""

    def __init__(self):
        self.items = 0
        self._t0 = None
        self.elapsed = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self.items = 0

    def count(self, n: int) -> None:
        self.items += n

    def stop(self, barrier: jax.Array | None = None) -> float:
        """Returns items/sec.  Pass the last device array of the timed
        region as ``barrier`` to force completion before the clock stops."""
        if barrier is not None:
            float(jnp.asarray(barrier).reshape(-1)[0])
        self.elapsed = time.perf_counter() - self._t0
        return self.items / self.elapsed if self.elapsed else 0.0
