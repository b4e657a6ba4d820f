"""pytroy compat-shim parity: the two-party byte-stream protocol of the
reference's binder smoke test (reference: binder/test.py Alice/Bob roles,
pickled byte streams between two independently constructed contexts)."""

import numpy as np
import pytest

import pytroy


N = 64
Q_BITS = [40, 40, 40]


def _params(scheme):
    parms = pytroy.EncryptionParameters(scheme)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(pytroy.CoeffModulus.create(N, Q_BITS))
    if scheme != pytroy.SchemeType.ckks:
        parms.set_plain_modulus(pytroy.PlainModulus.batching(N, 16))
    return parms


def test_ckks_two_party_protocol():
    pytroy.initialize_kernel()
    # Alice: context + keys
    ctx_a = pytroy.SEALContext(_params(pytroy.SchemeType.ckks),
                               sec_level=pytroy.SecurityLevel.none)
    enc_a = pytroy.CKKSEncoder(ctx_a)
    kg = pytroy.KeyGenerator(ctx_a)
    pk = kg.create_public_key()
    rlk = kg.create_relin_keys()
    encryptor = pytroy.Encryptor(ctx_a, pk)
    decryptor = pytroy.Decryptor(ctx_a, kg.secret_key())
    # serialize keys across the "network"
    pk_bytes, rlk_bytes = pk.save(), rlk.save()

    # Bob: independent context, loads Alice's keys
    ctx_b = pytroy.SEALContext(_params(pytroy.SchemeType.ckks),
                               sec_level=pytroy.SecurityLevel.none)
    pk_b = pytroy.PublicKey()
    pk_b.load(pk_bytes)
    rlk_b = pytroy.RelinKeys()
    rlk_b.load(rlk_bytes)
    ev_b = pytroy.Evaluator(ctx_b)

    # Alice encrypts with out-param style
    m1 = [1.0, 2.0, 3.0, 4.0]
    m2 = [0.5, 0.6, 0.7, 0.8]
    p1 = pytroy.Plaintext()
    p2 = pytroy.Plaintext()
    enc_a.encode(m1, 1 << 40, p1)
    enc_a.encode(m2, 1 << 40, p2)
    c1 = pytroy.Ciphertext()
    c2 = pytroy.Ciphertext()
    encryptor.encrypt(p1, c1)
    encryptor.encrypt(p2, c2)

    # Bob computes on the serialized ciphertexts
    c1_b = pytroy.Ciphertext()
    c1_b.load(c1.save(), ctx_b)
    c2_b = pytroy.Ciphertext()
    c2_b.load(c2.save(), ctx_b)
    ev_b.multiply_inplace(c1_b, c2_b)
    ev_b.relinearize_inplace(c1_b, rlk_b)
    result_bytes = c1_b.save()

    # Alice decrypts
    c = pytroy.Ciphertext()
    c.load(result_bytes, ctx_a)
    p = pytroy.Plaintext()
    decryptor.decrypt(c, p)
    got = enc_a.decode(p)[:4]
    expect = np.array(m1) * np.array(m2)
    assert np.allclose(got.real, expect, atol=1e-2)


def test_bfv_inplace_ops_and_rotation():
    ctx = pytroy.SEALContext(_params(pytroy.SchemeType.bfv),
                             sec_level=pytroy.SecurityLevel.none)
    be = pytroy.BatchEncoder(ctx)
    kg = pytroy.KeyGenerator(ctx)
    rlk = kg.create_relin_keys()
    gk = kg.create_galois_keys()
    enc = pytroy.Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = pytroy.Decryptor(ctx, kg.secret_key())
    ev = pytroy.Evaluator(ctx)

    t = 1 << 16
    a = np.arange(N, dtype=np.uint64) % 97
    b = (np.arange(N, dtype=np.uint64) * 3 + 1) % 97
    c1 = enc.encrypt_symmetric(be.encode(a))
    c2 = enc.encrypt(be.encode(b))
    ev.multiply_inplace(c1, c2)
    ev.relinearize_inplace(c1, rlk)
    got = be.decode(dec.decrypt(c1))
    assert np.array_equal(got, a * b % t)

    # rotation via default galois keys
    ct = enc.encrypt(be.encode(a))
    ev.rotate_rows_inplace(ct, 1, gk)
    rot = be.decode(dec.decrypt(ct))
    half = N // 2
    expect = np.concatenate([np.roll(a[:half], -1), np.roll(a[half:], -1)])
    assert np.array_equal(rot, expect)

    # noise budget is positive on a fresh encryption
    assert dec.invariant_noise_budget(enc.encrypt(be.encode(a))) > 0


def test_matmul_helper_protocol():
    ctx = pytroy.SEALContext(_params(pytroy.SchemeType.bfv),
                             sec_level=pytroy.SecurityLevel.none)
    be = pytroy.BatchEncoder(ctx)
    kg = pytroy.KeyGenerator(ctx)
    enc = pytroy.Encryptor(ctx, kg.create_public_key(), kg.secret_key())
    dec = pytroy.Decryptor(ctx, kg.secret_key())
    ev = pytroy.Evaluator(ctx)

    t = 1 << 16
    bs, ind, outd = 2, 3, 4
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, (bs, ind), dtype=np.uint64)
    w = rng.integers(0, 50, (ind, outd), dtype=np.uint64)

    helper = pytroy.MatmulHelper(bs, ind, outd, N, objective=0,
                                 pack_lwe=False)
    w_enc = helper.encode_weights(be, w)
    x_ct = helper.encrypt_inputs(enc, be, x)
    y_ct = helper.matmul(ev, x_ct, w_enc)
    blob = helper.serialize_outputs(ev, y_ct)
    y_back = helper.deserialize_outputs(ev, blob)
    got = helper.decrypt_outputs(be, dec, y_back)
    assert np.array_equal(got, (x @ w) % t)
