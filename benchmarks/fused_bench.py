"""Same-session fused mult+relin comparison across BFV / CKKS / BGV.

The headline rows of README's op table are SINGLE fused XLA programs
(multiply + key-switch + fold, one dispatch). Cross-scheme comparisons
are only meaningful inside one tunnel session (round 2 compared a CKKS
and a BGV number from different sessions and reported a phantom 40%
gap), so this harness compiles all three steps first, then times them in
ROUND-ROBIN windows: every scheme sees the same session conditions.
Each raw window is floor-guarded by the scheme's own compiler-derived
arithmetic floor (cost_analysis flops / v5e 394.7 TOPS int8 peak), like
bench.py. Decrypt correctness gates run AFTER all timing (readbacks
degrade the axon harness permanently — .claude/skills/verify/SKILL.md).

Usage: python benchmarks/fused_bench.py [reps_per_window]
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/troy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

N = 16384
Q_BITS = [60, 40, 40, 40, 40, 60]
V5E_PEAK_OPS = 394.7e12


def main():
    import jax
    import jax.numpy as jnp
    import troy_tpu as T
    from troy_tpu import prng as rnd
    from troy_tpu import evaluator as ev_mod

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    print(f"devices: {jax.devices()}", flush=True)

    @partial(jax.jit, static_argnames=("ntt_form",))
    def step(d1, d2, cd, key, key_cd, ntt_form=False):
        if ntt_form:
            prod = ev_mod._ntt_form_multiply(d1, d2, cd)
        else:
            prod = ev_mod._bfv_multiply(d1, d2, cd)
        delta = ev_mod._switch_key_core(prod[2], key, cd, key_cd, ntt_form)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cd)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cd)[0]
        return jnp.stack([c0, c1])

    setups = {}
    for name in ("bfv", "ckks", "bgv"):
        scheme = {"bfv": T.SchemeType.bfv, "ckks": T.SchemeType.ckks,
                  "bgv": T.SchemeType.bgv}[name]
        kw = {} if name == "ckks" else {
            "plain_modulus": T.PlainModulus.batching(N, 20)}
        parms = T.EncryptionParameters(
            scheme=scheme, poly_modulus_degree=N,
            coeff_modulus=tuple(T.CoeffModulus.create(N, Q_BITS)), **kw)
        ctx = T.HeContext(parms)
        kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(0xFEED))
        rlk = kg.create_relin_keys()
        enc = T.Encryptor(ctx, secret_key=kg.secret_key)
        cd = ctx.first_context_data
        key_cd = ctx.key_context_data
        ntt_form = name in ("ckks", "bgv")
        if name == "ckks":
            ce = T.CKKSEncoder(ctx)
            v = np.linspace(0.5, 1.5, N // 2)
            scale = 2.0 ** 40
            ct1 = enc.encrypt_symmetric(ce.encode(v, scale=scale))
            ct2 = enc.encrypt_symmetric(ce.encode(v[::-1].copy(), scale=scale))
            check = ("ckks", ctx, kg, ce, v, scale)
        else:
            be = T.BatchEncoder(ctx)
            t_mod = int(parms.plain_modulus)
            a = np.arange(N, dtype=np.uint64) % t_mod
            ct1 = enc.encrypt_symmetric(be.encode(a))
            ct2 = enc.encrypt_symmetric(be.encode(a[::-1].copy()))
            check = (name, ctx, kg, be, a, t_mod)
        args = (ct1.data, ct2.data, cd, rlk.keys[2], key_cd)

        t0 = time.time()
        compiled = step.lower(*args, ntt_form=ntt_form).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        floor_ms = flops / V5E_PEAK_OPS * 1e3
        print(f"{name}: {flops/1e9:.2f} G counted -> floor {floor_ms:.4f} ms"
              f"  (compile {time.time()-t0:.0f}s)", flush=True)
        out = step(*args, ntt_form=ntt_form)
        jax.block_until_ready(out)
        setups[name] = dict(args=args, ntt_form=ntt_form, floor_ms=floor_ms,
                            best=float("inf"), check=check, ct1=ct1)

    # round-robin windows: every scheme measured under identical session
    # conditions, interleaved
    for w in range(5):
        for name, s in setups.items():
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = step(*s["args"], ntt_form=s["ntt_form"])
            jax.block_until_ready(out)
            dt = (time.time() - t0) / reps * 1e3
            s["best"] = min(s["best"], dt)
            s["out"] = out
    for name, s in setups.items():
        raw = s["best"]
        rep = max(raw, s["floor_ms"])
        tag = "AT/above floor" if raw >= s["floor_ms"] else \
            "clamped to floor"
        print(f"{name}: raw {raw:.4f} ms/op -> reported {rep:.4f} ms/op "
              f"({1000.0/rep:.1f} ops/s, {tag})", flush=True)

    # ---- correctness gates (poisoning readbacks; nothing timed after) ----
    for name, s in setups.items():
        kind = s["check"][0]
        out = s["out"]
        if kind == "ckks":
            _, ctx, kg, ce, v, scale = s["check"]
            dec = T.Decryptor(ctx, kg.secret_key)
            ct = s["ct1"].replace(data=out, scale=scale * scale, seed=0)
            got = ce.decode(dec.decrypt(ct))
            expect = v * v[::-1]
            ok = bool(np.allclose(got.real, expect, rtol=1e-4))
        else:
            _, ctx, kg, be, a, t_mod = s["check"]
            dec = T.Decryptor(ctx, kg.secret_key)
            ct = s["ct1"].replace(data=out, seed=0)
            got = be.decode(dec.decrypt(ct))
            ok = bool(np.array_equal(got, a * a[::-1] % t_mod))
        print(f"{name}: correctness {'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
