"""Lightweight op timing + tracing (the aux-subsystem the reference lacks).

The reference's only instrumentation is benchmark Timer classes
(reference: test/timetest.cu:16-60, binder/timetest.py:48-51). Here we
provide a proper per-op timer registry plus a bridge to the JAX profiler
for xprof traces.

Respects the TPU measurement rules (.claude/skills/verify/SKILL.md):
``OpTimer`` pipelines reps and blocks once, and never reads values back.

Usage:
    from troy_tpu.utils.profiling import OpTimer, trace

    timer = OpTimer()
    with timer.measure("multiply"):      # single-shot wall time
        out = step(...); block(out)
    timer.bench("multiply", lambda: step(...), reps=100)   # pipelined
    print(timer.report())

    with trace("/tmp/xprof"):            # JAX profiler trace
        step(...)
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Callable, Dict, List


def block(x):
    """Wait for every array leaf of a pytree result."""
    import jax
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, x)
    return x


@dataclass
class OpStats:
    total_s: float = 0.0
    count: int = 0
    best_s: float = float("inf")

    @property
    def mean_ms(self) -> float:
        return self.total_s / max(self.count, 1) * 1e3

    @property
    def best_ms(self) -> float:
        return 0.0 if self.best_s == float("inf") else self.best_s * 1e3


@dataclass
class OpTimer:
    """Named wall-clock accumulator for HE ops."""

    stats: Dict[str, OpStats] = field(
        default_factory=lambda: defaultdict(OpStats))

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        s = self.stats[name]
        s.total_s += dt
        s.count += 1
        s.best_s = min(s.best_s, dt)

    def bench(self, name: str, fn: Callable[[], object], reps: int = 50,
              warmup: int = 3) -> float:
        """Pipelined benchmark: enqueue ``reps`` calls, block once.
        Returns mean seconds per call and records it."""
        out = fn()
        block(out)
        for _ in range(warmup):
            out = fn()
        block(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        block(out)
        dt = (time.perf_counter() - t0) / reps
        s = self.stats[name]
        s.total_s += dt * reps
        s.count += reps
        s.best_s = min(s.best_s, dt)
        return dt

    def report(self) -> str:
        lines: List[str] = [f"{'op':30s} {'mean ms':>10s} {'best ms':>10s} "
                            f"{'count':>8s}"]
        for name, s in sorted(self.stats.items()):
            lines.append(f"{name:30s} {s.mean_ms:10.3f} {s.best_ms:10.3f} "
                         f"{s.count:8d}")
        return "\n".join(lines)

    def reset(self):
        self.stats.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace context (view with xprof/tensorboard)."""
    import jax
    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler trace."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
