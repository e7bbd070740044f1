"""Profiling & throughput instrumentation.

The reference's only performance signal is a wall-clock sec/batch print
(``train.py:230-233``).  Here:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  TensorBoard/Perfetto-compatible traces of the TPU timeline,
* ``ThroughputMeter`` — running edges/sec + examples/sec counters (the
  north-star metric) with EMA smoothing,
* ``annotate(name)`` — named trace regions (``jax.profiler.TraceAnnotation``)
  so host-side stages (data materialization, graph building) show up in the
  timeline alongside device kernels.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block.

    View with TensorBoard (``tensorboard --logdir <logdir>``) or convert the
    contained .trace.json.gz to Perfetto.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (host-side stages)."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputMeter:
    """Running edges/sec and examples/sec with exponential smoothing.

    The per-step EMA measures the HOST LOOP's inter-step time — with an
    asynchronous device (and especially with ``steps_per_dispatch``
    chunking) that is an *enqueue* rate, not execution, and can read
    absurdly high.  ``summary()`` labels it as such; the honest number is
    ``sustained()``, valid only when called after a blocking fetch (the
    driver converts the epoch loss right before reading it).
    """

    ema_alpha: float = 0.1
    _last: float | None = field(default=None, repr=False)
    _epoch_t0: float | None = field(default=None, repr=False)
    edges_per_sec: float = 0.0
    examples_per_sec: float = 0.0
    steps: int = 0
    total_edges: int = 0
    total_examples: int = 0

    def start(self) -> None:
        self._last = time.perf_counter()
        self._epoch_t0 = self._last
        self.total_edges = 0
        self.total_examples = 0
        self.steps = 0

    def step(self, num_edges: int, num_examples: int) -> None:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return
        dt = max(now - self._last, 1e-9)
        self._last = now
        eps = num_edges / dt
        xps = num_examples / dt
        if self.steps == 0:
            self.edges_per_sec = eps
            self.examples_per_sec = xps
        else:
            a = self.ema_alpha
            self.edges_per_sec = (1 - a) * self.edges_per_sec + a * eps
            self.examples_per_sec = (1 - a) * self.examples_per_sec + a * xps
        self.steps += 1
        self.total_edges += num_edges
        self.total_examples += num_examples

    def summary(self) -> str:
        return (
            f"{self.edges_per_sec:,.0f} edges/s enqueued, "
            f"{self.examples_per_sec:,.1f} ex/s "
            f"({self.steps} steps, {self.total_edges:,} edges)"
        )

    def sustained(self) -> tuple[float, float, float]:
        """(edges/s, examples/s, wall_s) since ``start()`` — honest only
        after the caller has blocked on the epoch's final result."""
        wall = max(time.perf_counter() - (self._epoch_t0 or 0.0), 1e-9)
        return self.total_edges / wall, self.total_examples / wall, wall
