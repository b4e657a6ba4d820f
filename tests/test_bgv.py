"""End-to-end BGV tests (reference: test/evaluator.cpp BGV cases,
correction-factor behavior at evaluator_cuda.cu:53-70,170-190)."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd

SEED = rnd.seed_from_uint64(999)


def make_bgv(n=64, t_bits=17, q_bits=(40, 40, 40)):
    t = T.PlainModulus.batching(n, t_bits)
    q = T.CoeffModulus.create(n, list(q_bits))
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=n,
        coeff_modulus=tuple(q), plain_modulus=t)
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


@pytest.fixture(scope="module")
def bgv():
    ctx = make_bgv()
    kg = T.KeyGenerator(ctx, seed=SEED)
    pk = kg.create_public_key()
    rlk = kg.create_relin_keys()
    glk = kg.create_galois_keys()
    enc = T.Encryptor(ctx, public_key=pk, secret_key=kg.secret_key, seed=SEED)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    be = T.BatchEncoder(ctx)
    return ctx, enc, dec, ev, be, rlk, glk


def test_encrypt_decrypt(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    vals = np.arange(64, dtype=np.uint64) * 11 + 2
    ct = enc.encrypt(be.encode(vals))
    assert ct.is_ntt_form
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct)), vals)


def test_symmetric(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    vals = np.arange(64, dtype=np.uint64)
    ct = enc.encrypt_symmetric(be.encode(vals))
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct)), vals)


def test_add_sub(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64)
    b = np.arange(64, dtype=np.uint64) * 3 + 5
    ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.add(ca, cb))), (a + b) % t)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.sub(ca, cb))), (a.astype(object) - b) % t)


def test_multiply_relinearize(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 1
    b = np.arange(64, dtype=np.uint64) * 2 + 3
    ca, cb = enc.encrypt(be.encode(a)), enc.encrypt(be.encode(b))
    prod = ev.relinearize(ev.multiply(ca, cb), rlk)
    np.testing.assert_array_equal(be.decode(dec.decrypt(prod)), a * b % t)


def test_mod_switch_correction_factor(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    a = np.arange(64, dtype=np.uint64) + 7
    ct = enc.encrypt(be.encode(a))
    ct2 = ev.mod_switch_to_next(ct)
    assert ct2.correction_factor != 1
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct2)), a)


def test_add_after_mod_switch_balances_factors(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 1
    b = np.arange(64, dtype=np.uint64) * 5
    ca = ev.mod_switch_to_next(enc.encrypt(be.encode(a)))
    cb_fresh = enc.encrypt(be.encode(b))
    cb = ev.mod_switch_to_next(ev.add_plain(cb_fresh, be.encode(b)))  # cf same path
    # different-factor path: multiply one by plain to keep factor, then add
    out = be.decode(dec.decrypt(ev.add(ca, cb)))
    np.testing.assert_array_equal(out, (a + 2 * b.astype(object)) % t)


def test_multiply_plain_and_add_plain(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(64, dtype=np.uint64) + 2
    b = np.arange(64, dtype=np.uint64) * 3 + 1
    ct = enc.encrypt(be.encode(a))
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.multiply_plain(ct, be.encode(b)))),
        a * b % t)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.add_plain(ct, be.encode(b)))), (a + b) % t)
    # add_plain onto a mod-switched ct exercises the correction-factor scale
    ct2 = ev.mod_switch_to_next(ct)
    np.testing.assert_array_equal(
        be.decode(dec.decrypt(ev.add_plain(ct2, be.encode(b)))), (a + b) % t)


def test_rotate_rows(bgv):
    ctx, enc, dec, ev, be, rlk, glk = bgv
    n = ctx.n
    a = np.arange(n, dtype=np.uint64)
    ct = enc.encrypt(be.encode(a))
    out = be.decode(dec.decrypt(ev.rotate_rows(ct, 1, glk)))
    half = n // 2
    expect = np.concatenate([np.roll(a[:half], -1), np.roll(a[half:], -1)])
    np.testing.assert_array_equal(out, expect)
