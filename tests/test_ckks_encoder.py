"""CKKS-encoder parity tests: constants, int64 exact encodes, complex
slots, conjugate-symmetry, polynomial coefficient mode, and precision
bounds across levels.

Mirrors the reference's CKKS encoder scenarios (reference: test/ckks.cpp
precision-bound checks; src/ckks_cuda.cu:636-749 double/int64 constant
encodes, :455 encodePolynomial).
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


N = 64
SCALE = 2.0 ** 30
SEED = rnd.seed_from_uint64(4242)


@pytest.fixture(scope="module")
def s():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx,
        "encd": T.CKKSEncoder(ctx),
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "rlk": kg.create_relin_keys(),
    }


def test_slot_count(s):
    assert s["encd"].slot_count == N // 2


def test_complex_roundtrip(s):
    vals = (np.arange(N // 2) / 7.0) + 1j * (np.arange(N // 2) / 11.0)
    got = s["encd"].decode(s["encd"].encode(vals, scale=SCALE))
    np.testing.assert_allclose(got, vals, atol=1e-5)


def test_partial_slot_vector_pads_with_zero(s):
    vals = np.array([1.5, -2.25, 3.125])
    got = s["encd"].decode(s["encd"].encode(vals, scale=SCALE))
    np.testing.assert_allclose(got[:3], vals, atol=1e-5)
    np.testing.assert_allclose(got[3:], 0.0, atol=1e-5)


def test_too_many_slots_rejected(s):
    with pytest.raises(ValueError):
        s["encd"].encode(np.zeros(N // 2 + 1), scale=SCALE)


def test_encode_constant_fills_every_slot(s):
    pt = s["encd"].encode_constant(2.5, scale=SCALE)
    got = s["encd"].decode(pt)
    np.testing.assert_allclose(got, 2.5, atol=1e-5)


def test_encode_int64_is_exact(s):
    # integer constants encode without the scale rounding error
    # (ckks_cuda.cu:749 encode int64)
    pt = s["encd"].encode_int64(123456789)
    got = s["encd"].decode(pt)
    np.testing.assert_allclose(got.real, 123456789.0, rtol=1e-9)


def test_encode_polynomial_coefficient_mode(s):
    coeffs = np.array([1.0, -2.0, 3.0, 0.5])
    pt = s["encd"].encode_polynomial(coeffs, scale=SCALE)
    got = s["encd"].decode_polynomial(pt, len(coeffs))
    np.testing.assert_allclose(got, coeffs, atol=1e-5)


def test_encode_at_lower_level_tracks_chain(s):
    ctx = s["ctx"]
    vals = np.linspace(-1.0, 1.0, N // 2)
    pt = s["encd"].encode(vals, scale=SCALE, level=ctx.last_level)
    assert pt.level == ctx.last_level
    np.testing.assert_allclose(s["encd"].decode(pt), vals, atol=1e-5)


def test_multiply_precision_through_rescale(s):
    vals = np.linspace(0.1, 2.0, N // 2)
    ct1 = s["enc"].encrypt_symmetric(s["encd"].encode(vals, scale=SCALE))
    ct2 = s["enc"].encrypt_symmetric(
        s["encd"].encode(vals[::-1].copy(), scale=SCALE))
    prod = s["ev"].rescale_to_next(
        s["ev"].relinearize(s["ev"].multiply(ct1, ct2), s["rlk"]))
    got = s["encd"].decode(s["dec"].decrypt(prod))
    np.testing.assert_allclose(got.real, vals * vals[::-1], atol=1e-3)


def test_conjugate_symmetry_real_inputs_decode_real(s):
    vals = np.linspace(-3.0, 3.0, N // 2)
    got = s["encd"].decode(s["encd"].encode(vals, scale=SCALE))
    assert np.abs(got.imag).max() < 1e-5
