"""Profiling helpers: wall-clock accumulation and XLA trace capture.

The reference ships only benchmark Timer classes (reference:
test/timetest.cu:16-60, test/app/linear.cu:8-49); on TPU the richer tool
is the JAX profiler, whose traces (xprof) show every fused executable,
HBM traffic, and collective. This module provides both: a Timer with the
reference harness's tic/toc shape, and a trace context manager writing a
TensorBoard-loadable profile.

Usage:
    from troy_tpu.utils.profiling import Timer, trace

    t = Timer()
    with t.measure("multiply"):
        out = ev.multiply(a, b)
    print(t.report())

    with trace("/tmp/troy_trace"):       # inspect with xprof/TensorBoard
        run_pipeline()
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class Timer:
    """Accumulating wall-clock timer (timetest.cu Timer analogue).

    Blocks on JAX async dispatch only if the caller synchronizes; for
    device work, call ``block_until_ready`` inside the measured region
    (see .claude/skills/verify/SKILL.md on measurement discipline)."""

    def __init__(self):
        self._acc: Dict[str, float] = {}
        self._count: Dict[str, int] = {}
        self._tick_at = None

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._acc[name] = self._acc.get(name, 0.0) + dt
            self._count[name] = self._count.get(name, 0) + 1

    def tick(self, name: str):
        """Manual interval start (reference Timer::registerTimer+tick)."""
        self._acc.setdefault(name, 0.0)
        self._count.setdefault(name, 0)
        self._tick_at = (name, time.perf_counter())

    def tock(self, name: str):
        if self._tick_at is None:
            raise ValueError(f"tock({name}) without tick({name})")
        tag, t0 = self._tick_at
        if tag != name:
            raise ValueError(f"tock({name}) without tick({name})")
        self._tick_at = None
        self._acc[name] += time.perf_counter() - t0
        self._count[name] += 1

    def seconds(self, name: str) -> float:
        return self._acc[name]

    def mean_ms(self, name: str) -> float:
        return 1e3 * self._acc[name] / max(1, self._count[name])

    def report(self) -> str:
        lines = []
        for name in self._acc:
            lines.append(f"{name:28s} {self.mean_ms(name):10.3f} ms/op "
                         f"x{self._count[name]}")
        return "\n".join(lines)

    def clear(self):
        self._acc.clear()
        self._count.clear()


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: Optional[int] = None):
    """Capture an XLA/TPU profile into ``log_dir`` (view with xprof or
    TensorBoard's profile plugin). No-op fallback if the profiler is
    unavailable on the backend."""
    import jax
    try:
        if host_tracer_level is not None:
            opts = jax.profiler.ProfileOptions()
            opts.host_tracer_level = host_tracer_level
            jax.profiler.start_trace(log_dir, profiler_options=opts)
        else:
            jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
