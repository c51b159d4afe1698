"""Frame / pass timing.

TPU-native equivalent of the reference's GPUTimestamps query-pool ring
(reference: source/graphics/query.cpp:5-124, labeled per-pass GPU spans with
N-frames-in-flight readback) and its Tracy zones (source/utils/profiler.h).

On TPU the per-pass breakdown inside one jitted frame comes from the XLA
profiler (`jax.profiler.trace` + named_scope annotations); this module gives
the wall-clock harness: frame timer, labeled pass timers for un-fused host
sections, and a ms/pass table. Pass labels match chord's timer label set so
profiles compare 1:1.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Iterator, Optional

import jax


class FrameTimer:
    """dt/FPS tracking (reference: ApplicationTickData)."""

    def __init__(self) -> None:
        self._last: Optional[float] = None
        self.dt: float = 0.0
        self.frame_index: int = 0

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            self.dt = now - self._last
        self._last = now
        self.frame_index += 1
        return self.dt

    @property
    def fps(self) -> float:
        return 1.0 / self.dt if self.dt > 0 else 0.0


class PassTimers:
    """Labeled pass spans. Inside jit use `scope()` (jax.named_scope, shows
    in XLA profiles); outside jit `measure()` blocks and records ms."""

    def __init__(self) -> None:
        self.ms: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def scope(self, label: str) -> Iterator[None]:
        with jax.named_scope(label):
            yield

    @contextlib.contextmanager
    def measure(self, label: str, *sync_arrays) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.ms[label] = (time.perf_counter() - t0) * 1e3

    def table(self) -> str:
        if not self.ms:
            return "(no timings)"
        width = max(len(k) for k in self.ms)
        lines = [f"{k:<{width}}  {v:8.3f} ms" for k, v in self.ms.items()]
        return "\n".join(lines)


def time_jitted(fn, *args, warmup: int = 2, iters: int = 10) -> Dict[str, float]:
    """Benchmark a jitted callable: returns mean/min ms over iters."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) * 1e3)
    return {
        "mean_ms": sum(samples) / len(samples),
        "min_ms": min(samples),
        "max_ms": max(samples),
    }
