"""Same-session fused vs 2-dispatch mult+relin (the object-API gap).

The round-3 README listed Multiply+Relinearize at 0.46 ms when issued as
two dispatches (the object API a user calls: multiply, then
relinearize) vs 0.129 ms fused — a 3.6x gap measured in a per-op
session whose rows admit +-40% wander. This harness measures the gap
under the SAME discipline as the fused headline (fused_bench.py): all
programs AOT-compiled first, round-robin windows in one session,
per-program compiler floors printed, decrypt gates after all timing.

For BFV the 2-dispatch path runs essentially the SAME arithmetic as the
fused program (the key-switch decompose diagonal shortcut only applies
to NTT-form targets, i.e. CKKS/BGV), so its honest floor is
floor(multiply) + floor(relinearize) — the difference to the fused
floor is what XLA fusion across the boundary saves, and anything above
that is dispatch overhead, not framework arithmetic.

Variants timed, mirroring the reference's one-call-per-op object API
(timetest.cu:452-462 Multiply then Relinearize as separate calls):
  fused       one XLA program (the headline row)
  2-dispatch  jitted multiply core, then jitted relinearize core
  2-disp-aot  the same two programs called as AOT compiled executables
              (skips the jit python dispatch: measures how much of the
              gap is host-side call overhead)
  object API  Evaluator.multiply + Evaluator.relinearize (wrapper
              overhead included)

Usage: python benchmarks/dispatch_gap.py [reps_per_window]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/troy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402

N = 16384
Q_BITS = [60, 40, 40, 40, 40, 60]
V5E_PEAK_OPS = 394.7e12


def _flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def main():
    import jax
    import jax.numpy as jnp
    import troy_tpu as T
    from troy_tpu import prng as rnd
    from troy_tpu import evaluator as ev_mod

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    print(f"devices: {jax.devices()}", flush=True)

    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, Q_BITS)),
        plain_modulus=T.PlainModulus.batching(N, 20))
    ctx = T.HeContext(parms)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(0xFEED))
    rlk = kg.create_relin_keys()
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    be = T.BatchEncoder(ctx)
    ev = T.Evaluator(ctx)
    cd = ctx.first_context_data
    key_cd = ctx.key_context_data
    t_mod = int(parms.plain_modulus)
    a = np.arange(N, dtype=np.uint64) % t_mod
    ct1 = enc.encrypt_symmetric(be.encode(a))
    ct2 = enc.encrypt_symmetric(be.encode(a[::-1].copy()))

    @jax.jit
    def fused(d1, d2, cdl, key, kcd):
        prod = ev_mod._bfv_multiply.__wrapped__(d1, d2, cdl)
        delta = ev_mod._switch_key_core(prod[2], key, cdl, kcd, False)
        c0 = ev_mod._add.__wrapped__(prod[0][None], delta[0][None], cdl)[0]
        c1 = ev_mod._add.__wrapped__(prod[1][None], delta[1][None], cdl)[0]
        return jnp.stack([c0, c1])

    @jax.jit
    def relin(prod, key, cdl, kcd):
        delta = ev_mod._switch_key_core(prod[2], key, cdl, kcd, False)
        c0 = ev_mod._add.__wrapped__(prod[0][None], delta[0][None], cdl)[0]
        c1 = ev_mod._add.__wrapped__(prod[1][None], delta[1][None], cdl)[0]
        return jnp.stack([c0, c1])

    mult = ev_mod._bfv_multiply

    d1, d2 = ct1.data, ct2.data
    key = rlk.keys[2]

    c_fused = fused.lower(d1, d2, cd, key, key_cd).compile()
    prod0 = mult(d1, d2, cd)
    c_mult = mult.lower(d1, d2, cd).compile()
    c_relin = relin.lower(prod0, key, cd, key_cd).compile()
    f_fused, f_mult, f_relin = map(_flops, (c_fused, c_mult, c_relin))
    fl_fused = f_fused / V5E_PEAK_OPS * 1e3
    fl_two = (f_mult + f_relin) / V5E_PEAK_OPS * 1e3
    print(f"fused: {f_fused/1e9:.2f} G -> floor {fl_fused:.4f} ms", flush=True)
    print(f"multiply: {f_mult/1e9:.2f} G, relinearize: {f_relin/1e9:.2f} G "
          f"-> 2-dispatch floor {fl_two:.4f} ms "
          f"(fusion saves {(f_mult+f_relin-f_fused)/1e9:.2f} G)", flush=True)

    # warm every path (incl. the object-API jit caches)
    out_f = c_fused(d1, d2, cd, key, key_cd)
    out_2 = relin(mult(d1, d2, cd), key, cd, key_cd)
    out_a = c_relin(c_mult(d1, d2, cd), key, cd, key_cd)
    ct_o = ev.relinearize(ev.multiply(ct1, ct2), rlk)
    jax.block_until_ready((out_f, out_2, out_a, ct_o.data))

    variants = {
        "fused (1 dispatch)": lambda: c_fused(d1, d2, cd, key, key_cd),
        "2-dispatch (jit)": lambda: relin(mult(d1, d2, cd), key, cd, key_cd),
        "2-dispatch (aot)": lambda: c_relin(c_mult(d1, d2, cd), key, cd,
                                            key_cd),
        "object API": lambda: ev.relinearize(ev.multiply(ct1, ct2),
                                             rlk).data,
    }
    best = {k: float("inf") for k in variants}
    outs = {}
    for w in range(5):
        for name, fn in variants.items():
            t0 = time.time()
            out = None
            for _ in range(reps):
                out = fn()
            jax.block_until_ready(out)
            dt = (time.time() - t0) / reps * 1e3
            best[name] = min(best[name], dt)
            outs[name] = out

    floors = {"fused (1 dispatch)": fl_fused}
    fused_rep = max(best["fused (1 dispatch)"], fl_fused)
    print(flush=True)
    for name in variants:
        raw = best[name]
        floor = floors.get(name, fl_two)
        rep = max(raw, floor)
        tag = "AT/above floor" if raw >= floor else "clamped to floor"
        print(f"{name}: raw {raw:.4f} ms/op -> reported {rep:.4f} ms/op "
              f"({tag}; floor {floor:.4f}; {rep/fused_rep:.2f}x fused)",
              flush=True)

    # ---- correctness gates (readbacks poison; nothing timed after) ----
    dec = T.Decryptor(ctx, kg.secret_key)
    expect = a * a[::-1] % t_mod
    for name, out in outs.items():
        got = be.decode(dec.decrypt(ct1.replace(data=out, seed=0)))
        ok = bool(np.array_equal(got, expect))
        print(f"{name}: correctness {'OK' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
