"""N-ceiling on REAL hardware: n=262144 BFV mult+relin on one v5e chip.

The round-3 proof that the framework runs at 2x the reference's hard
polynomial-degree maximum (defines.h:30 SEAL_POLY_MOD_DEGREE_MAX =
131072) executed on the virtual CPU mesh only (benchmarks/nceiling.py).
This harness puts the same configuration (q={55,55,60}, the chain used
by NCEILING_r03.json) on the real TPU, single chip — the working set
trivially fits HBM: 8 MB ciphertext, 24 MB relin key, A=B=512 MXU NTT
factors — and reports a floor-guarded ms/op with the same measurement
discipline as bench.py (chained windows, best-of-5, clamp at the
compiler-derived arithmetic floor, decrypt gate after all timing).
Writes NCEILING_TPU_r04.json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/nceiling_tpu.py [reps]
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/troy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 262144
Q_BITS = [55, 55, 60]
T_BITS = 30
V5E_PEAK_OPS = 394.7e12


def main():
    import jax
    import jax.numpy as jnp
    import troy_tpu as T
    from troy_tpu import prng as rnd
    from troy_tpu import evaluator as ev_mod

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"devices: {jax.devices()}", flush=True)
    t_start = time.time()

    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, Q_BITS)),
        plain_modulus=T.PlainModulus.batching(N, T_BITS))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(262144))
    rlk = kg.create_relin_keys()
    enc = T.Encryptor(ctx, secret_key=kg.secret_key,
                      seed=rnd.seed_from_uint64(262144))
    be = T.BatchEncoder(ctx)
    t_plain = int(parms.plain_modulus)
    print(f"setup {time.time()-t_start:.1f}s (n={N}, "
          f"k={ctx.first_context_data.limbs} data limbs)", flush=True)

    rng = np.random.default_rng(1)
    v1 = rng.integers(0, t_plain, size=N, dtype=np.uint64)
    v2 = rng.integers(0, t_plain, size=N, dtype=np.uint64)
    ct1 = enc.encrypt_symmetric(be.encode(v1))
    ct2 = enc.encrypt_symmetric(be.encode(v2))

    cd = ctx.first_context_data
    key_cd = ctx.key_context_data
    key = rlk.keys[2]

    @partial(jax.jit, static_argnames=())
    def step(d1, d2, cdl, keyl, kcd):
        prod = ev_mod._bfv_multiply(d1, d2, cdl)
        delta = ev_mod._switch_key_core(prod[2], keyl, cdl, kcd, False)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cdl)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cdl)[0]
        return jnp.stack([c0, c1])

    args = (ct1.data, ct2.data, cd, key, key_cd)
    t0 = time.time()
    compiled = step.lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    floor_ms = flops / V5E_PEAK_OPS * 1e3
    print(f"compiled in {time.time()-t0:.0f}s: {flops/1e9:.1f} G counted "
          f"-> floor {floor_ms:.3f} ms", flush=True)

    t0 = time.time()
    out = step(*args)
    out.block_until_ready()
    print(f"first run (load-dominated through the tunnel): "
          f"{time.time()-t0:.1f}s", flush=True)

    dt = float("inf")
    for _ in range(5):
        t0 = time.time()
        for _ in range(reps):
            out = step(*args)
        out.block_until_ready()
        dt = min(dt, (time.time() - t0) / reps)
    raw_ms = dt * 1e3
    rep_ms = max(raw_ms, floor_ms)
    clamped = raw_ms < floor_ms
    print(f"mult+relin at n={N}: raw {raw_ms:.3f} ms/op -> reported "
          f"{rep_ms:.3f} ms/op ({1000.0/rep_ms:.1f} ops/s"
          f"{', clamped to floor' if clamped else ', AT/above floor'})",
          flush=True)

    # correctness gate (poisons the tunnel; nothing timed after)
    dec = T.Decryptor(ctx, kg.secret_key)
    got = be.decode(dec.decrypt(ct1.replace(data=out, seed=0)))
    expect = (v1.astype(object) * v2.astype(object)) % t_plain
    ok = bool(np.array_equal(got, expect))
    print(f"decrypt {'bit-exact' if ok else 'MISMATCH'}", flush=True)

    record = {
        "ok": ok,
        "n": N,
        "reference_ceiling": 131072,
        "q_bits": Q_BITS,
        "hardware": str(jax.devices()[0]),
        "raw_ms_per_op": round(raw_ms, 4),
        "floor_ms": round(floor_ms, 4),
        "reported_ms_per_op": round(rep_ms, 4),
        "ops_per_s": round(1000.0 / rep_ms, 1),
        "counted_gflops": round(flops / 1e9, 1),
        "clamped": clamped,
        "note": ("single-chip BFV multiply+relinearize at 2x the "
                 "reference's SEAL_POLY_MOD_DEGREE_MAX, real TPU v5e, "
                 "bench.py measurement discipline"),
    }
    with open(os.path.join(REPO, "NCEILING_TPU_r04.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
