"""Wall-clock instrumentation: tic/toc, StopWatch, per-stage accumulators.

Parity with core/util/timer.{h,cpp} (tic/toc at timer.cpp:8-20, StopWatch at
:35-87) plus a structured per-frame stage-timing record feeding the statistics
subsystem (the reference publishes these on its statistics topic,
ros1/msg/statisticsStamped.msg). Device work is asynchronous under JAX, so
`toc` optionally blocks on a pytree of arrays before reading the clock.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax

_T0 = [time.perf_counter()]


def tic() -> None:
    _T0[0] = time.perf_counter()


def toc(block_on=None, verbose: bool = False) -> float:
    """Milliseconds since last tic(). Pass arrays via block_on to sync device."""
    if block_on is not None:
        jax.block_until_ready(block_on)
    dt = (time.perf_counter() - _T0[0]) * 1e3
    if verbose:
        print(f"elapsed: {dt:.3f} ms")
    return dt


class StopWatch:
    def __init__(self, name: str = ""):
        self.name = name
        self.start_time = time.perf_counter()

    def start(self) -> None:
        self.start_time = time.perf_counter()

    def lap_ms(self) -> float:
        return (time.perf_counter() - self.start_time) * 1e3

    def stop_ms(self, verbose: bool = False) -> float:
        dt = self.lap_ms()
        if verbose:
            print(f"[{self.name}] {dt:.3f} ms")
        return dt


class StageTimer:
    """Accumulates per-stage wall times across frames (host-side)."""

    def __init__(self):
        self.totals_ms = defaultdict(float)
        self.counts = defaultdict(int)
        self.last_ms = {}

    @contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = (time.perf_counter() - t0) * 1e3
            self.totals_ms[name] += dt
            self.counts[name] += 1
            self.last_ms[name] = dt

    def record(self, name: str, ms: float) -> None:
        self.totals_ms[name] += ms
        self.counts[name] += 1
        self.last_ms[name] = ms

    def mean_ms(self, name: str) -> float:
        c = self.counts[name]
        return self.totals_ms[name] / c if c else 0.0

    def summary(self) -> dict:
        return {k: self.mean_ms(k) for k in self.totals_ms}
