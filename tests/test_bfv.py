"""End-to-end BFV tests: keygen -> encode -> encrypt -> evaluate -> decrypt.

Mirrors the reference's host/CUDA scheme integration tests
(reference: test/evaluator.cpp, test/evaluator_cuda.cu:39-80 — tiny
insecure parameters, exact roundtrip checks against integer semantics).
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


def make_bfv(n=64, t_bits=17, q_bits=(40, 40, 40)):
    t = T.PlainModulus.batching(n, t_bits)
    q = T.CoeffModulus.create(n, list(q_bits))
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(q), plain_modulus=t)
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


SEED = rnd.seed_from_uint64(12345)


@pytest.fixture(scope="module")
def bfv():
    ctx = make_bfv()
    kg = T.KeyGenerator(ctx, seed=SEED)
    pk = kg.create_public_key()
    rlk = kg.create_relin_keys()
    glk = kg.create_galois_keys()
    enc = T.Encryptor(ctx, public_key=pk, secret_key=kg.secret_key, seed=SEED)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    be = T.BatchEncoder(ctx)
    return ctx, enc, dec, ev, be, rlk, glk


def roundtrip(bfv, values):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    ct = enc.encrypt(be.encode(values))
    return be.decode(dec.decrypt(ct))[:len(values)]


def test_encrypt_decrypt_roundtrip(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    vals = np.arange(64, dtype=np.uint64)
    out = roundtrip(bfv, vals)
    np.testing.assert_array_equal(out, vals)


def test_symmetric_encrypt_decrypt(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    vals = np.arange(64, dtype=np.uint64) * 3
    ct = enc.encrypt_symmetric(be.encode(vals))
    out = be.decode(dec.decrypt(ct))
    np.testing.assert_array_equal(out, vals)


def test_symmetric_seed_expansion(bfv):
    from troy_tpu import rlwe
    ctx, enc, dec, ev, be, rlk, glk = bfv
    vals = np.arange(64, dtype=np.uint64) + 7
    ct = enc.encrypt_symmetric(be.encode(vals), save_seed=True)
    assert ct.seed != 0
    cd = ctx.get_context_data(ct.level)
    ct2 = rlwe.expand_seed(ct, cd)
    out = be.decode(dec.decrypt(ct2))
    np.testing.assert_array_equal(out, vals)


def test_add_sub_negate(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64)
    b = np.arange(64, dtype=np.uint64) * 5 + 1
    ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.add(ca, cb))), (a + b) % t)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.sub(ca, cb))), (a.astype(object) - b) % t)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.negate(ca))), (-a.astype(object)) % t)


def test_add_plain(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64)
    b = np.arange(64, dtype=np.uint64) * 7 + 3
    ct = enc.encrypt(be.encode(a))
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.add_plain(ct, be.encode(b)))), (a + b) % t)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.sub_plain(ct, be.encode(b)))),
        (a.astype(object) - b) % t)


def test_multiply_relinearize(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 1
    b = np.arange(64, dtype=np.uint64) * 2 + 3
    ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
    prod = ev.multiply(ca, cb)
    assert prod.size == 3
    out = be.decode(dec.decrypt(prod))
    np.testing.assert_array_equal(out, a * b % t)
    rel = ev.relinearize(prod, rlk)
    assert rel.size == 2
    np.testing.assert_array_equal(be.decode(dec.decrypt(rel)), a * b % t)


def test_multiply_plain(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 2
    b = np.arange(64, dtype=np.uint64) * 3 + 1
    ct = enc.encrypt(be.encode(a))
    out = be.decode(dec.decrypt(ev.multiply_plain(ct, be.encode(b))))
    np.testing.assert_array_equal(out, a * b % t)


def test_mod_switch(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    a = np.arange(64, dtype=np.uint64) + 9
    ct = enc.encrypt(be.encode(a))
    ct2 = ev.mod_switch_to_next(ct)
    assert ct2.level == ct.level + 1
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct2)), a)


def test_square_then_relin(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 1
    ct = enc.encrypt(be.encode(a))
    sq = ev.relinearize(ev.square(ct), rlk)
    np.testing.assert_array_equal(be.decode(dec.decrypt(sq)), a * a % t)


def test_rotate_rows(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    n = ctx.n
    a = np.arange(n, dtype=np.uint64)
    ct = enc.encrypt(be.encode(a))
    rot = ev.rotate_rows(ct, 1, glk)
    out = be.decode(dec.decrypt(rot))
    half = n // 2
    expect = np.concatenate([np.roll(a[:half], -1), np.roll(a[half:], -1)])
    np.testing.assert_array_equal(out, expect)


def test_rotate_columns(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    n = ctx.n
    a = np.arange(n, dtype=np.uint64)
    ct = enc.encrypt(be.encode(a))
    rot = ev.rotate_columns(ct, glk)
    out = be.decode(dec.decrypt(rot))
    half = n // 2
    expect = np.concatenate([a[half:], a[:half]])
    np.testing.assert_array_equal(out, expect)


def test_noise_budget_positive(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    a = np.arange(64, dtype=np.uint64)
    ct = enc.encrypt(be.encode(a))
    assert dec.invariant_noise_budget(ct) > 0


def test_transform_ntt_multiply_plain(bfv):
    ctx, enc, dec, ev, be, rlk, glk = bfv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 2
    b = np.arange(64, dtype=np.uint64) + 5
    ct = enc.encrypt(be.encode(a))
    ct_ntt = ev.transform_to_ntt(ct)
    p_ntt = ev.transform_plain_to_ntt(be.encode(b), ct.level)
    prod = ev.transform_from_ntt(ev.multiply_plain(ct_ntt, p_ntt))
    np.testing.assert_array_equal(be.decode(dec.decrypt(prod)), a * b % t)
