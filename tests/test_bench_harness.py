"""bench.py harness logic — the parts that guard the published headline.

The driver runs bench.py unattended on real hardware; these tests pin the
host-side guard rails: the floor fallback must never clamp a real
measurement UPWARD with a stale hand count (round-5 code review), and the
child-session protocol line must parse.
"""

import importlib.util
import json
import os
import sys


def _load_bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class _FailingJit:
    """Stands in for a jitted fn whose remote cost_analysis is down."""

    def lower(self, *a):
        raise RuntimeError("remote_compile: connection dropped")


def test_floor_fallback_uses_recorded_compiler_count(monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    for bits, flops in bench.KNOWN_FLOPS.items():
        bench.INTERNAL_BITS = bits
        floor_ms, got_flops, src = bench.derive_floor_ms(_FailingJit(), ())
        assert src == f"recorded-compiler-count-{bits}b"
        assert got_flops == flops
        # the recorded count must be a LOWER bound than the stale hand
        # model (63.9 G) — the hand model would clamp real measurements UP
        assert floor_ms < bench.HAND_MXU_FLOPS / bench.V5E_PEAK_OPS * 1e3
        assert abs(floor_ms - flops / bench.V5E_PEAK_OPS * 1e3) < 1e-9
    # an unrecorded width uses the largest recorded count BELOW it (a
    # valid lower bound: program size grows with base width) ...
    bench.INTERNAL_BITS = 50
    floor_ms, got_flops, src = bench.derive_floor_ms(_FailingJit(), ())
    assert src == "recorded-compiler-count-48b"
    assert got_flops == bench.KNOWN_FLOPS[48]
    # ... and below every recorded width the value is reported unclamped
    # rather than clamped UP by a wider mode's count
    bench.INTERNAL_BITS = 34
    floor_ms, got_flops, src = bench.derive_floor_ms(_FailingJit(), ())
    assert src == "no-floor" and floor_ms == 0.0


def test_floor_uses_cost_analysis_when_available():
    bench = _load_bench()

    class _Jit:
        def lower(self, *a):
            class C:
                def compile(self):
                    return self

                def cost_analysis(self):
                    return {"flops": 41.1e9}
            return C()

    floor_ms, flops, src = bench.derive_floor_ms(_Jit(), ())
    assert src == "xla-cost-analysis" and flops == 41.1e9


def test_child_protocol_line_roundtrip():
    # the parent greps stdout for this exact shape (bench.py session loop)
    line = json.dumps({"child_raw_ms": 0.1234})
    found = [l for l in ["noise", line] if "child_raw_ms" in l]
    assert json.loads(found[-1])["child_raw_ms"] == 0.1234
