"""BFV with a power-of-two plain modulus (the reference's app configs use
t = 2^41, test/app/linear.cu:575-584) — exercises the even-t exact
division in the scaling variant and the BEHZ decrypt with composite t."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


@pytest.fixture(scope="module")
def even_t_ctx():
    n = 64
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, [40, 40, 40])),
        plain_modulus=T.Modulus(1 << 16))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(321))
    return ctx, kg


def test_even_t_encrypt_decrypt_roundtrip(even_t_ctx):
    ctx, kg = even_t_ctx
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    n = ctx.n
    t = 1 << 16
    a = (np.arange(n, dtype=np.uint64) * 521 + 7) % t
    pt = be.encode_polynomial(a)
    got = np.asarray(dec.decrypt(enc.encrypt_symmetric(pt)).data)
    assert np.array_equal(got, a)


def test_even_t_multiply_relinearize(even_t_ctx):
    ctx, kg = even_t_ctx
    rlk = kg.create_relin_keys()
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    ev = T.Evaluator(ctx)
    n, t = ctx.n, 1 << 16
    # polynomial product of x+2 and 3x+5 in coefficient encoding
    a = np.zeros(n, dtype=np.uint64); a[0] = 2; a[1] = 1
    b = np.zeros(n, dtype=np.uint64); b[0] = 5; b[1] = 3
    ct = ev.relinearize(ev.multiply(
        enc.encrypt_symmetric(be.encode_polynomial(a)),
        enc.encrypt_symmetric(be.encode_polynomial(b))), rlk)
    got = np.asarray(dec.decrypt(ct).data)
    expect = np.zeros(n, dtype=np.uint64)
    expect[0] = 10; expect[1] = 11; expect[2] = 3
    assert np.array_equal(got, expect)
