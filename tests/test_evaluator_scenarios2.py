"""Second evaluator scenario batch: Galois-by-element, NAF rotation
fallback, size-mismatched adds, LWE term round-trips, BGV corner ops, and
CKKS level-targeted rescale.

Mirrors more of the reference's evaluator coverage (reference:
test/evaluator.cpp / test/evaluator_cuda.cu — ApplyGalois, rotate-by-
composite-steps, BGV NTT transforms, CKKS RescaleTo; LWE paths
evaluator_cuda.cu:2185-2341)."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


N = 64
SEED = rnd.seed_from_uint64(4242)


@pytest.fixture(scope="module")
def bfv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx, "kg": kg,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "be": T.BatchEncoder(ctx),
        "rlk": kg.create_relin_keys(),
        "t": int(parms.plain_modulus),
    }


@pytest.fixture(scope="module")
def bgv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx, "kg": kg,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "be": T.BatchEncoder(ctx),
        "rlk": kg.create_relin_keys(),
        "t": int(parms.plain_modulus),
    }


def roundtrip(s, ct):
    return s["be"].decode(s["dec"].decrypt(ct))


def test_apply_galois_by_element(bfv):
    """applyGalois with an explicit odd element must equal the coefficient
    automorphism x -> x^elt (evaluator_cuda.cu:2024)."""
    s = bfv
    t = s["t"]
    coeffs = np.arange(N, dtype=np.uint64) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode_polynomial(coeffs))
    elt = 9
    gk = s["kg"].create_galois_keys(elts=[elt])
    out = s["be"].decode_polynomial(
        s["dec"].decrypt(s["ev"].apply_galois(ct, elt, gk)))
    expect = np.zeros(N, dtype=np.uint64)
    for i, c in enumerate(coeffs):
        raw = (i * elt) % (2 * N)
        if raw < N:
            expect[raw] = (int(expect[raw]) + int(c)) % t
        else:
            expect[raw - N] = (int(expect[raw - N]) - int(c)) % t
    np.testing.assert_array_equal(out, expect)


def test_rotate_rows_naf_fallback(bfv):
    """Rotating by a step with no direct key decomposes into NAF hops over
    the default power-of-two key set (evaluator_cuda.cu:2150+)."""
    s = bfv
    t = s["t"]
    gk = s["kg"].create_galois_keys()       # default set: +-2^i only
    vals = np.arange(N, dtype=np.uint64) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(vals))
    half = N // 2
    for steps in (3, 5, -3, 7):
        got = roundtrip(s, s["ev"].rotate_rows(ct, steps, gk))
        expect = np.concatenate([np.roll(vals[:half], -steps),
                                 np.roll(vals[half:], -steps)])
        np.testing.assert_array_equal(got, expect)


def test_add_size_mismatch(bfv):
    """size-3 + size-2 keeps the extra component (evaluator addInplace)."""
    s = bfv
    t = s["t"]
    a = np.arange(N, dtype=np.uint64) % t
    b = (np.arange(N, dtype=np.uint64) * 3 + 1) % t
    c = (np.arange(N, dtype=np.uint64) * 5 + 2) % t
    ct_ab = s["ev"].multiply(s["enc"].encrypt_symmetric(s["be"].encode(a)),
                             s["enc"].encrypt_symmetric(s["be"].encode(b)))
    ct_c = s["enc"].encrypt_symmetric(s["be"].encode(c))
    assert ct_ab.size == 3
    ao, bo, co = a.astype(object), b.astype(object), c.astype(object)
    for big, small in ((ct_ab, ct_c), ):
        got = roundtrip(s, s["ev"].add(big, small))
        np.testing.assert_array_equal(got.astype(object), (ao * bo + co) % t)
        got = roundtrip(s, s["ev"].add(small, big))
        np.testing.assert_array_equal(got.astype(object), (ao * bo + co) % t)
        got = roundtrip(s, s["ev"].sub(big, small))
        np.testing.assert_array_equal(got.astype(object), (ao * bo - co) % t)
        got = roundtrip(s, s["ev"].sub(small, big))
        np.testing.assert_array_equal(got.astype(object), (co - ao * bo) % t)


def test_lwe_extract_assemble_nonzero_term(bfv):
    """extractLWE at term i, re-assembled at term j, decrypts to the same
    value at coefficient j (evaluator_cuda.cu:2185-2249)."""
    s = bfv
    t = s["t"]
    coeffs = (np.arange(N, dtype=np.uint64) * 7 + 3) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode_polynomial(coeffs))
    for term, target in [(5, 0), (0, 9), (11, 11), (N - 1, 1)]:
        lwe = s["ev"].extract_lwe(ct, term)
        back = s["ev"].assemble_lwe(lwe, target)
        out = s["be"].decode_polynomial(s["dec"].decrypt(back))
        assert int(out[target]) == int(coeffs[term])


def test_bgv_negacyclic_shift(bgv):
    s = bgv
    t = s["t"]
    coeffs = np.arange(N, dtype=np.uint64) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode_polynomial(coeffs))
    shift = 5
    shifted = s["ev"].negacyclic_shift(s["ev"].transform_from_ntt(ct), shift)
    out = s["be"].decode_polynomial(
        s["dec"].decrypt(s["ev"].transform_to_ntt(shifted)))
    expect = np.zeros(N, dtype=np.uint64)
    for i, c in enumerate(coeffs):
        j = (i + shift) % (2 * N)
        if j < N:
            expect[j] = (int(expect[j]) + int(c)) % t
        else:
            expect[j - N] = (int(expect[j - N]) - int(c)) % t
    np.testing.assert_array_equal(out, expect)


def test_bgv_square_relinearize(bgv):
    s = bgv
    t = s["t"]
    vals = (np.arange(N, dtype=np.uint64) * 3 + 2) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(vals))
    got = roundtrip(s, s["ev"].relinearize(s["ev"].square(ct), s["rlk"]))
    np.testing.assert_array_equal(got, (vals.astype(object) ** 2 % t
                                        ).astype(np.uint64))


def test_bgv_rotate_columns(bgv):
    s = bgv
    t = s["t"]
    gk = s["kg"].create_galois_keys()
    vals = np.arange(N, dtype=np.uint64) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(vals))
    got = roundtrip(s, s["ev"].rotate_columns(ct, gk))
    half = N // 2
    np.testing.assert_array_equal(
        got, np.concatenate([vals[half:], vals[:half]]))


def test_ckks_rescale_to_level():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [50, 30, 30, 50])))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    enc = T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    cke = T.CKKSEncoder(ctx)
    rlk = kg.create_relin_keys()
    scale = 2.0 ** 30
    vals = np.linspace(-2, 2, N // 2)
    ct = enc.encrypt_symmetric(cke.encode(vals, scale=scale))
    sq = ev.relinearize(ev.multiply(ct, ct), rlk)
    cube = ev.multiply(ev.rescale_to_next(sq),
                       ev.mod_switch_to_next(ct))
    cube = ev.rescale_to_next(ev.relinearize(cube, rlk))
    # rescale_to targeting the already-reached level is a no-op
    same = ev.rescale_to(sq, sq.level + 1)
    out = cke.decode(dec.decrypt(cube))
    np.testing.assert_allclose(out.real, vals ** 3, atol=2e-2)
    out2 = cke.decode(dec.decrypt(same))
    np.testing.assert_allclose(out2.real, vals ** 2, atol=2e-2)


def test_exponentiate_matches_repeated_multiply(bfv):
    s = bfv
    t = s["t"]
    vals = (np.arange(N, dtype=np.uint64) % 5) + 1
    ct = s["enc"].encrypt_symmetric(s["be"].encode(vals))
    got = roundtrip(s, s["ev"].exponentiate(ct, 4, s["rlk"]))
    np.testing.assert_array_equal(
        got, (vals.astype(object) ** 4 % t).astype(np.uint64))


def test_extract_lwe_many_matches_single(bfv):
    """Batched extractLWE (one dynamic-shift executable) must agree
    word-for-word with the per-term static path for every term."""
    s = bfv
    t = s["t"]
    coeffs = (np.arange(N, dtype=np.uint64) * 13 + 5) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode_polynomial(coeffs))
    terms = [0, 1, 7, N // 2, N - 1]
    many = s["ev"].extract_lwe_many(ct, terms)
    for term, lwe in zip(terms, many):
        ref = s["ev"].extract_lwe(ct, term)
        np.testing.assert_array_equal(np.asarray(lwe.c1), np.asarray(ref.c1))
        np.testing.assert_array_equal(np.asarray(lwe.c0), np.asarray(ref.c0))
        back = s["ev"].assemble_lwe(lwe, 0)
        out = s["be"].decode_polynomial(s["dec"].decrypt(back))
        assert int(out[0]) == int(coeffs[term])
