"""Evaluator corner-op tests: many-operand helpers, shifts, plain-side ops,
targeted mod switching, and error paths.

Mirrors the reference's wide evaluator scenarios (reference:
test/evaluator.cpp, test/evaluator_cuda.cu — AddMany/MultiplyMany/
Exponentiate, NegacyclicShift, SubPlain, ModSwitchTo on ct and plain,
TransformToNTT roundtrips, argument validation).
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


N = 64
SEED = rnd.seed_from_uint64(777)


@pytest.fixture(scope="module")
def bfv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "be": T.BatchEncoder(ctx),
        "rlk": kg.create_relin_keys(),
        "t": int(parms.plain_modulus),
    }


def test_add_many(bfv):
    s = bfv
    vals = [np.full(N, i + 1, dtype=np.uint64) for i in range(5)]
    cts = [s["enc"].encrypt_symmetric(s["be"].encode(v)) for v in vals]
    got = s["be"].decode(s["dec"].decrypt(s["ev"].add_many(cts)))
    np.testing.assert_array_equal(got, sum(vals) % s["t"])


def test_multiply_many(bfv):
    s = bfv
    vals = [np.arange(N, dtype=np.uint64) % 5 + 1 + i for i in range(4)]
    cts = [s["enc"].encrypt_symmetric(s["be"].encode(v)) for v in vals]
    out = s["ev"].multiply_many(cts, s["rlk"])
    assert out.size == 2
    got = s["be"].decode(s["dec"].decrypt(out))
    expect = np.ones(N, dtype=object)
    for v in vals:
        expect = expect * v % s["t"]
    np.testing.assert_array_equal(got, expect.astype(np.uint64))


def test_exponentiate(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64) % 9 + 1
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    got = s["be"].decode(s["dec"].decrypt(
        s["ev"].exponentiate(ct, 3, s["rlk"])))
    np.testing.assert_array_equal(
        got, (a.astype(object) ** 3 % s["t"]).astype(np.uint64))
    with pytest.raises(ValueError):
        s["ev"].exponentiate(ct, 0, s["rlk"])


def test_negacyclic_shift(bfv):
    """x^shift * p(x) mod (x^n + 1): rotated coefficients with sign flips
    on wraparound (evaluator_cuda.cuh negacyclicShift)."""
    s = bfv
    coeffs = np.arange(1, N + 1, dtype=np.uint64)
    pt = s["be"].encode_polynomial(coeffs)
    ct = s["enc"].encrypt_symmetric(pt)
    shift = 5
    out = s["ev"].negacyclic_shift(ct, shift)
    got = s["be"].decode_polynomial(s["dec"].decrypt(out))
    expect = np.zeros(N, dtype=np.uint64)
    for i, c in enumerate(coeffs):
        j = (i + shift) % N
        wrapped = (i + shift) // N % 2 == 1
        expect[j] = (s["t"] - c) % s["t"] if wrapped else c
    np.testing.assert_array_equal(got, expect)


def test_sub_plain(bfv):
    s = bfv
    a = np.full(N, 1000, dtype=np.uint64)
    b = np.arange(N, dtype=np.uint64)
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    got = s["be"].decode(s["dec"].decrypt(
        s["ev"].sub_plain(ct, s["be"].encode(b))))
    np.testing.assert_array_equal(got, (a - b) % s["t"])


def test_mod_switch_to_target_level(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64)
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    last = s["ctx"].last_level
    down = s["ev"].mod_switch_to(ct, last)
    assert down.level == last
    got = s["be"].decode(s["dec"].decrypt(down))
    np.testing.assert_array_equal(got, a)
    with pytest.raises(Exception):
        s["ev"].mod_switch_to(down, s["ctx"].first_level)  # cannot go up


def test_mod_switch_plain_keeps_decoding(bfv):
    """CKKS-style plaintext mod switch on an NTT-form plaintext is the
    reference's modSwitchPlainToNext; for BFV the plaintext is mod-t and
    level-free, so the meaningful check is the ct/plain multiply after a
    ciphertext switch."""
    s = bfv
    a = np.arange(N, dtype=np.uint64)
    b = (a * 3 + 1) % s["t"]
    ct = s["ev"].mod_switch_to_next(
        s["enc"].encrypt_symmetric(s["be"].encode(a)))
    got = s["be"].decode(s["dec"].decrypt(
        s["ev"].multiply_plain(ct, s["be"].encode(b))))
    np.testing.assert_array_equal(got, a * b % s["t"])


def test_transform_ntt_roundtrip(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64)
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    ntt_ct = s["ev"].transform_to_ntt(ct)
    assert ntt_ct.is_ntt_form
    back = s["ev"].transform_from_ntt(ntt_ct)
    assert not back.is_ntt_form
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(ct.data))
    with pytest.raises(ValueError):
        s["ev"].transform_to_ntt(ntt_ct)
    with pytest.raises(ValueError):
        s["ev"].transform_from_ntt(ct)


def test_level_mismatch_rejected(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64)
    ct1 = s["enc"].encrypt_symmetric(s["be"].encode(a))
    ct2 = s["ev"].mod_switch_to_next(ct1)
    with pytest.raises(ValueError):
        s["ev"].add(ct1, ct2)


def test_ntt_form_mismatch_rejected(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64)
    ct1 = s["enc"].encrypt_symmetric(s["be"].encode(a))
    ct2 = s["ev"].transform_to_ntt(ct1)
    with pytest.raises(ValueError):
        s["ev"].add(ct1, ct2)
    with pytest.raises(ValueError):
        s["ev"].multiply(ct2, ct2)  # BFV multiply needs coefficient form


def test_negate_roundtrip(bfv):
    s = bfv
    a = np.arange(N, dtype=np.uint64) + 1
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    got = s["be"].decode(s["dec"].decrypt(s["ev"].negate(ct)))
    np.testing.assert_array_equal(got, (s["t"] - a) % s["t"])
