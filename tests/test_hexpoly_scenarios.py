"""Reference-style evaluator scenarios driven through hex-poly strings.

The reference's scheme tests feed plaintexts as hex-polynomial literals
and compare results by to_string() (reference: test/evaluator.cpp,
pattern at test/evaluator_cuda.cu:39-80). These tests exercise the same
workflow end to end: parse -> encrypt -> evaluate -> decrypt -> print.
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


N = 64


@pytest.fixture(scope="module")
def s():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.Modulus(257))   # tiny t, like the reference tests
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(64))
    return {
        "ctx": ctx,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=rnd.seed_from_uint64(64)),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "rlk": kg.create_relin_keys(),
    }


def rt(s, pt_string):
    """encrypt(parse(pt_string)) -> decrypt -> to_string"""
    pt = T.plaintext_from_string(pt_string)
    ct = s["enc"].encrypt_symmetric(pt)
    return T.plaintext_to_string(s["dec"].decrypt(ct))


def test_roundtrip_literals(s):
    for lit in ("0", "1", "1x^1", "Fx^3 + 2x^1 + 1",
                "3Fx^10 + 1x^9 + 100x^2"):
        assert rt(s, lit) == lit


def test_add_hex(s):
    p1 = T.plaintext_from_string("1x^2 + 2x^1 + 3")
    p2 = T.plaintext_from_string("2x^3 + 1x^1 + 4")
    c1 = s["enc"].encrypt_symmetric(p1)
    c2 = s["enc"].encrypt_symmetric(p2)
    out = T.plaintext_to_string(s["dec"].decrypt(s["ev"].add(c1, c2)))
    assert out == "2x^3 + 1x^2 + 3x^1 + 7"


def test_multiply_relin_hex(s):
    # (x + 1)^2 = x^2 + 2x + 1
    p = T.plaintext_from_string("1x^1 + 1")
    ct = s["enc"].encrypt_symmetric(p)
    sq = s["ev"].relinearize(s["ev"].multiply(ct, ct), s["rlk"])
    assert T.plaintext_to_string(s["dec"].decrypt(sq)) == "1x^2 + 2x^1 + 1"


def test_negate_wraps_mod_t(s):
    p = T.plaintext_from_string("5x^1 + 1")
    ct = s["enc"].encrypt_symmetric(p)
    out = T.plaintext_to_string(s["dec"].decrypt(s["ev"].negate(ct)))
    # -5 mod 257 = 252 = 0xFC; -1 mod 257 = 256 = 0x100
    assert out == "FCx^1 + 100"


def test_negacyclic_wraparound_sign(s):
    """x^(n-1) * x^2 = -x^1 mod (x^n + 1) (negacyclic semantics)."""
    p = T.plaintext_from_string(f"1x^{N-1}")
    ct = s["enc"].encrypt_symmetric(p)
    out = s["ev"].negacyclic_shift(ct, 2)
    # -1 mod 257 = 0x100
    assert T.plaintext_to_string(s["dec"].decrypt(out)) == "100x^1"


def test_short_plaintext_literal_encrypts(s):
    """Plaintext literals shorter than n encrypt directly (the reference
    accepts any plain_coeff_count <= n)."""
    pt = T.plaintext_from_string("1x^1 + 2")
    assert pt.coeff_count == 2
    ct = s["enc"].encrypt_symmetric(pt)
    assert T.plaintext_to_string(s["dec"].decrypt(ct)) == "1x^1 + 2"
