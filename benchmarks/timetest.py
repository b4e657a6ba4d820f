"""Full-op benchmark suite — the reference timetest harness rebuilt for TPU.

Mirrors the reference's op list and configurations
(reference: test/timetest.cu:321-331,452-481 — Encode/Decode, Encrypt/
Decrypt, Add, AddPlain, MultiplyPlain, Square+Relin, Multiply+Relin,
ModSwitch (BFV/BGV) or Rescale (CKKS), RotateRows/RotateVector) at
n=16384, q={60,40,40,40,40,60}.

Usage:
    python benchmarks/timetest.py [bfv|ckks|bgv] [n]

Measurement discipline (see .claude/skills/verify/SKILL.md): pure-device
ops are timed FIRST with pipelined loops and a single final
block_until_ready; host-touching ops (encode/decode/encrypt/decrypt) are
timed LAST because their device->host readbacks permanently degrade the
axon harness's dispatch path.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/troy_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np  # noqa: E402


def block(x):
    import jax
    jax.tree.map(lambda a: a.block_until_ready()
                 if hasattr(a, "block_until_ready") else a, x)
    return x


def timeit(name, fn, reps=50):
    out = fn()
    block(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    block(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"  {name:28s} {dt:10.3f} ms", flush=True)
    return out


def main():
    import troy_tpu as T
    from troy_tpu import prng as rnd

    scheme_name = sys.argv[1] if len(sys.argv) > 1 else "bfv"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    scheme = {"bfv": T.SchemeType.bfv, "ckks": T.SchemeType.ckks,
              "bgv": T.SchemeType.bgv}[scheme_name]
    q_bits = [60, 40, 40, 40, 40, 60]

    if scheme == T.SchemeType.ckks:
        parms = T.EncryptionParameters(
            scheme=scheme, poly_modulus_degree=n,
            coeff_modulus=tuple(T.CoeffModulus.create(n, q_bits)))
    else:
        t_bits = 59 if scheme == T.SchemeType.bfv else 20
        parms = T.EncryptionParameters(
            scheme=scheme, poly_modulus_degree=n,
            coeff_modulus=tuple(T.CoeffModulus.create(n, q_bits)),
            plain_modulus=T.PlainModulus.batching(n, t_bits))
    ctx = T.HeContext(parms)
    print(f"== timetest {scheme_name} n={n} q={q_bits} ==", flush=True)

    t0 = time.time()
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(0xC0FFEE))
    rlk = kg.create_relin_keys()
    gk = kg.create_galois_keys(steps=[1])
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    print(f"  [keygen+setup: {time.time()-t0:.1f}s]", flush=True)

    scale = 2.0 ** 40
    if scheme == T.SchemeType.ckks:
        encd = T.CKKSEncoder(ctx)
        vals = (np.arange(encd.slot_count) % 255).astype(np.float64)
        pt = encd.encode(vals, scale=scale)
        pt2 = encd.encode(vals[::-1].copy(), scale=scale)
    else:
        encd = T.BatchEncoder(ctx)
        tmod = int(parms.plain_modulus)
        vals = np.arange(n, dtype=np.uint64) % tmod
        pt = encd.encode(vals)
        pt2 = encd.encode(vals[::-1].copy())
    ct1 = enc.encrypt_symmetric(pt)
    ct2 = enc.encrypt_symmetric(pt2)
    if scheme != T.SchemeType.ckks:
        pt_ntt = ev.transform_plain_to_ntt(pt2, ct1.level)
    else:
        pt_ntt = pt2

    # ---- phase 1: pure-device ops (no readbacks anywhere) ----
    timeit("Add", lambda: ev.add(ct1, ct2))
    timeit("AddPlain", lambda: ev.add_plain(ct1, pt2))
    timeit("MultiplyPlain", lambda: ev.multiply_plain(ct1, pt2))
    timeit("MultiplyPlain (NTT pt)", lambda: ev.multiply_plain(ct1, pt_ntt))
    prod3 = ev.multiply(ct1, ct2)
    timeit("Multiply", lambda: ev.multiply(ct1, ct2))
    timeit("Square", lambda: ev.square(ct1))
    timeit("Relinearize", lambda: ev.relinearize(prod3, rlk))
    timeit("Multiply+Relinearize",
           lambda: ev.relinearize(ev.multiply(ct1, ct2), rlk))
    if scheme == T.SchemeType.ckks:
        timeit("Rescale", lambda: ev.rescale_to_next(ct1))
        timeit("RotateVector(1)", lambda: ev.rotate_vector(ct1, 1, gk))
    else:
        timeit("ModSwitchToNext", lambda: ev.mod_switch_to_next(ct1))
        timeit("RotateRows(1)", lambda: ev.rotate_rows(ct1, 1, gk))

    # ---- phase 2: host-boundary ops (poison the harness; timed last) ----
    timeit("Encrypt (symmetric)", lambda: enc.encrypt_symmetric(pt), reps=10)
    timeit("Decrypt", lambda: dec.decrypt(ct1), reps=10)
    pt_dec = dec.decrypt(ct1)
    if scheme == T.SchemeType.ckks:
        # device-resident encode: slot values pre-staged on device, no
        # upload inside the window (counterpart of the decode row below)
        import jax.numpy as jnp
        v_re = jnp.asarray(vals.astype(np.float64))
        v_im = jnp.zeros_like(v_re)
        mx = float(np.max(np.abs(vals)))
        block((v_re, v_im))
        timeit("Encode (device-resident)",
               lambda: encd.encode_device(v_re, v_im, scale, mx).data)
        timeit("Decode (device-resident)",
               lambda: encd.decode_device(pt_dec))
        timeit("Encode", lambda: encd.encode(vals, scale=scale), reps=10)
        timeit("Decode", lambda: encd.decode(pt_dec), reps=10)
    else:
        timeit("Encode", lambda: encd.encode(vals), reps=10)
        timeit("Decode", lambda: encd.decode(pt_dec), reps=10)


if __name__ == "__main__":
    main()
