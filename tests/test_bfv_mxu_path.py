"""End-to-end BFV at n=2048 — the smallest size where the MXU 4-step NTT
replaces the butterfly network inside the full evaluator pipeline."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd

N = 2048


@pytest.fixture(scope="module")
def bfv2048():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 20))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    assert ctx.first_context_data.ntt.mxu is not None
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(55))
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    be = T.BatchEncoder(ctx)
    rlk = kg.create_relin_keys()
    return ctx, enc, dec, ev, be, rlk


def test_mult_relin_modswitch_roundtrip(bfv2048):
    ctx, enc, dec, ev, be, rlk = bfv2048
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(N, dtype=np.uint64) % t
    b = (np.arange(N, dtype=np.uint64) * 3 + 1) % t
    ca = enc.encrypt_symmetric(be.encode(a))
    cb = enc.encrypt_symmetric(be.encode(b))
    prod = ev.relinearize(ev.multiply(ca, cb), rlk)
    prod = ev.mod_switch_to_next(prod)
    out = be.decode(dec.decrypt(prod))
    np.testing.assert_array_equal(
        out.astype(object), a.astype(object) * b % t)
