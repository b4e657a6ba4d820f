"""Dedicated square pipeline (reference: src/evaluator_cuda.cu:503-700
squareInplace / bfvSquare / ckksSquare / bgvSquare;
src/kernelutils.cu:166-186 gDyadicSquareCoeffmod).

The dedicated path (one BEHZ lift, 3 dyadic products) must be
WORD-FOR-WORD identical to multiply(a, a) — both fully reduce mod q, so
the doubled cross term equals the convolution's two cross products. That
equality, plus the existing reference-pinned multiply suites, pins square
against the reference transitively. Also covered: fallback for size>2,
metadata (scale / correction factor), and decrypt round-trips.
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import functional as F
from troy_tpu import prng as rnd


N = 64
SEED = rnd.seed_from_uint64(20260819)


def _setup(scheme):
    kwargs = dict(
        poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])))
    if scheme in (T.SchemeType.bfv, T.SchemeType.bgv):
        kwargs["plain_modulus"] = T.PlainModulus.batching(N, 17)
    parms = T.EncryptionParameters(scheme=scheme, **kwargs)
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return ctx, kg


@pytest.fixture(scope="module")
def bfv():
    return _setup(T.SchemeType.bfv)


@pytest.fixture(scope="module")
def ckks():
    return _setup(T.SchemeType.ckks)


@pytest.fixture(scope="module")
def bgv():
    return _setup(T.SchemeType.bgv)


def _encrypt_int(ctx, kg, values):
    enc = T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED)
    be = T.BatchEncoder(ctx)
    return enc.encrypt_symmetric(be.encode(values))


def test_bfv_square_bit_exact_vs_multiply(bfv):
    ctx, kg = bfv
    ev = T.Evaluator(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    vals = np.arange(N, dtype=np.uint64) % t
    ct = _encrypt_int(ctx, kg, vals)
    sq = ev.square(ct)
    mu = ev.multiply(ct, ct)
    assert sq.size == 3
    np.testing.assert_array_equal(np.asarray(sq.data), np.asarray(mu.data))


def test_bfv_square_roundtrip(bfv):
    ctx, kg = bfv
    ev = T.Evaluator(ctx)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    vals = (np.arange(N, dtype=np.uint64) * 3 + 1) % t
    ct = _encrypt_int(ctx, kg, vals)
    rlk = kg.create_relin_keys()
    got = be.decode(dec.decrypt(ev.relinearize(ev.square(ct), rlk)))
    np.testing.assert_array_equal(got, vals.astype(object) ** 2 % t)


def test_bfv_square_size3_falls_back_to_multiply(bfv):
    ctx, kg = bfv
    ev = T.Evaluator(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    vals = np.arange(N, dtype=np.uint64) % t
    ct3 = ev.multiply(_encrypt_int(ctx, kg, vals), _encrypt_int(ctx, kg, vals))
    assert ct3.size == 3
    sq = ev.square(ct3)
    mu = ev.multiply(ct3, ct3)
    assert sq.size == 5
    np.testing.assert_array_equal(np.asarray(sq.data), np.asarray(mu.data))


def test_ckks_square_bit_exact_and_scale(ckks):
    ctx, kg = ckks
    ev = T.Evaluator(ctx)
    enc = T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED)
    encd = T.CKKSEncoder(ctx)
    scale = 2.0 ** 30
    vals = np.linspace(-2.0, 2.0, N // 2) + 1j * np.linspace(1.0, -1.0, N // 2)
    ct = enc.encrypt_symmetric(encd.encode(vals, scale=scale))
    sq = ev.square(ct)
    mu = ev.multiply(ct, ct)
    np.testing.assert_array_equal(np.asarray(sq.data), np.asarray(mu.data))
    assert sq.scale == pytest.approx(scale * scale)
    dec = T.Decryptor(ctx, kg.secret_key)
    rlk = kg.create_relin_keys()
    got = encd.decode(dec.decrypt(ev.relinearize(sq, rlk)))
    np.testing.assert_allclose(got, vals * vals, atol=1e-4)


def test_bgv_square_bit_exact_and_correction_factor(bgv):
    ctx, kg = bgv
    ev = T.Evaluator(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    vals = (np.arange(N, dtype=np.uint64) * 7 + 2) % t
    ct = _encrypt_int(ctx, kg, vals)
    sq = ev.square(ct)
    mu = ev.multiply(ct, ct)
    np.testing.assert_array_equal(np.asarray(sq.data), np.asarray(mu.data))
    assert sq.correction_factor == mu.correction_factor
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    rlk = kg.create_relin_keys()
    got = be.decode(dec.decrypt(ev.relinearize(sq, rlk)))
    np.testing.assert_array_equal(got, vals.astype(object) ** 2 % t)


def test_functional_square_matches_class_api(bfv):
    ctx, kg = bfv
    ev = T.Evaluator(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    vals = np.arange(N, dtype=np.uint64) % t
    ct = _encrypt_int(ctx, kg, vals)
    cd = ctx.get_context_data(ct.level)
    f_sq = F.square(ct, cd)
    c_sq = ev.square(ct)
    np.testing.assert_array_equal(np.asarray(f_sq.data), np.asarray(c_sq.data))
