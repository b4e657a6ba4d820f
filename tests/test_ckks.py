"""End-to-end CKKS tests (reference: test/ckks.cpp, test/ckks_cuda.cu,
test/evaluator.cpp CKKS cases — precision-bound checks on decoded values)."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd

SEED = rnd.seed_from_uint64(777)
SCALE = 2.0 ** 30


def make_ckks(n=64, q_bits=(50, 40, 40, 50)):
    q = T.CoeffModulus.create(n, list(q_bits))
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=n,
        coeff_modulus=tuple(q))
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


@pytest.fixture(scope="module")
def ckks():
    ctx = make_ckks()
    kg = T.KeyGenerator(ctx, seed=SEED)
    pk = kg.create_public_key()
    rlk = kg.create_relin_keys()
    glk = kg.create_galois_keys()
    enc = T.Encryptor(ctx, public_key=pk, seed=SEED)
    dec = T.Decryptor(ctx, kg.secret_key)
    ev = T.Evaluator(ctx)
    ce = T.CKKSEncoder(ctx)
    return ctx, enc, dec, ev, ce, rlk, glk


def test_encode_decode(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    vals = np.array([0.1 + 0.2j, -3.5, 2.25 - 1j, 7.0] * 8)
    pt = ce.encode(vals, SCALE)
    out = ce.decode(pt)
    np.testing.assert_allclose(out, vals, atol=1e-6)


def test_encrypt_decrypt(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    vals = np.linspace(-2, 2, 32).astype(np.complex128)
    ct = enc.encrypt(ce.encode(vals, SCALE))
    out = ce.decode(dec.decrypt(ct))
    np.testing.assert_allclose(out, vals, atol=1e-5)


def test_add_sub(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(-1, 1, 32).astype(np.complex128)
    b = (np.linspace(3, 4, 32) * 1j).astype(np.complex128)
    ca, cb = enc.encrypt(ce.encode(a, SCALE)), enc.encrypt(ce.encode(b, SCALE))
    np.testing.assert_allclose(ce.decode(dec.decrypt(ev.add(ca, cb))),
                               a + b, atol=1e-5)
    np.testing.assert_allclose(ce.decode(dec.decrypt(ev.sub(ca, cb))),
                               a - b, atol=1e-5)


def test_multiply_relin_rescale(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(0.5, 2, 32).astype(np.complex128)
    b = np.linspace(-1, 1, 32).astype(np.complex128)
    ca, cb = enc.encrypt(ce.encode(a, SCALE)), enc.encrypt(ce.encode(b, SCALE))
    prod = ev.relinearize(ev.multiply(ca, cb), rlk)
    prod = ev.rescale_to_next(prod)
    out = ce.decode(dec.decrypt(prod))
    np.testing.assert_allclose(out, a * b, atol=1e-3)


def test_multiply_plain(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(0.5, 2, 32).astype(np.complex128)
    b = np.linspace(1, 3, 32).astype(np.complex128)
    ct = enc.encrypt(ce.encode(a, SCALE))
    prod = ev.rescale_to_next(ev.multiply_plain(ct, ce.encode(b, SCALE)))
    np.testing.assert_allclose(ce.decode(dec.decrypt(prod)), a * b, atol=1e-3)


def test_add_plain(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(0.5, 2, 32).astype(np.complex128)
    b = np.linspace(1, 3, 32).astype(np.complex128)
    ct = enc.encrypt(ce.encode(a, SCALE))
    out = ce.decode(dec.decrypt(ev.add_plain(ct, ce.encode(b, SCALE))))
    np.testing.assert_allclose(out, a + b, atol=1e-5)


def test_rotate_vector(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.arange(32).astype(np.complex128)
    ct = enc.encrypt(ce.encode(a, SCALE))
    rot = ev.rotate_vector(ct, 1, glk)
    out = ce.decode(dec.decrypt(rot))
    np.testing.assert_allclose(out, np.roll(a, -1), atol=1e-4)


def test_complex_conjugate(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(0, 1, 32) + 1j * np.linspace(1, 2, 32)
    ct = enc.encrypt(ce.encode(a, SCALE))
    out = ce.decode(dec.decrypt(ev.complex_conjugate(ct, glk)))
    np.testing.assert_allclose(out, np.conj(a), atol=1e-4)


def test_mod_switch_drop(ckks):
    ctx, enc, dec, ev, ce, rlk, glk = ckks
    a = np.linspace(-1, 1, 32).astype(np.complex128)
    ct = enc.encrypt(ce.encode(a, SCALE))
    ct2 = ev.mod_switch_to_next(ct)
    assert ct2.level == ct.level + 1
    np.testing.assert_allclose(ce.decode(dec.decrypt(ct2)), a, atol=1e-4)
