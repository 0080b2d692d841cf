"""Tracing and throughput observability.

The reference's only observability is DJB_LOG printf's
(dj_brdf.h:557-560); here: ``trace()`` wraps ``jax.profiler.trace``
for XProf/TensorBoard captures of the jitted kernels, and
``Throughput`` is the evals/s counter used around hot loops (bench.py
is its main consumer).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    with jax.profiler.trace(logdir):
        yield


class Throughput:
    """Minimal steady-state items/s meter with device sync.

    >>> meter = Throughput(items_per_call=n)
    >>> with meter:  # repeatedly
    ...     out = step(...)
    ...     meter.sync(out)
    >>> meter.rate()
    """

    def __init__(self, items_per_call: int):
        self.items_per_call = items_per_call
        self.calls = 0
        self.elapsed = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def sync(self, out) -> None:
        jax.block_until_ready(out)

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._t0
        self.calls += 1
        return False

    def rate(self) -> float:
        return self.items_per_call * self.calls / max(self.elapsed, 1e-12)
