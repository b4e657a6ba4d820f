"""CKKS precision-vs-depth bounds at the HEADLINE configuration
(n=16384, q={60,40,40,40,40,60}, scale 2^40) — the chain analogue of the
reference's device max-error tracking (ckks_cuda.cu:178-209; tolerance
checks in test/ckks.cpp). Asserts the bounds the committed artifact
(CKKS_PRECISION_r05.json) and README table publish: uniform [-1,1]
inputs hold >= 30 bits of relative precision fresh and >= 22 bits after
a full depth-3 multiply->relin->rescale chain.

Runs the same harness the artifact is generated with
(benchmarks/ckks_precision.py run()); ~1 min on the CPU mesh.
"""

import importlib.util
import os

MOD_PATH = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "ckks_precision.py")


def _load():
    spec = importlib.util.spec_from_file_location("ckks_precision_bench",
                                                  MOD_PATH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_headline_precision_vs_depth():
    rows, meta = _load().run(trials=1)
    assert meta["depth"] == 3
    by_stage = {r["stage"]: r for r in rows}
    # fresh encode/decode: float64 embedding at scale 2^40
    assert by_stage["encode/decode (fresh)"]["precision_bits"] >= 30.0
    assert by_stage["encrypt/decrypt (fresh)"]["precision_bits"] >= 27.0
    # depth chain: each multiply+rescale costs ~1-3 bits
    for d in (1, 2, 3):
        m = by_stage[f"depth {d}: multiply+relin"]
        r = by_stage[f"depth {d}: rescale"]
        assert m["precision_bits"] >= 23.0, (d, m)
        assert r["precision_bits"] >= 22.0, (d, r)
        assert r["level"] == m["level"] + 1
    # monotone-ish decay sanity: depth 3 keeps >= 22 bits (README table)
    assert by_stage["depth 3: rescale"]["precision_bits"] >= 22.0
