"""Third evaluator scenario batch — the remaining cells of the
reference's scheme x op test matrix (reference: test/evaluator.cpp —
BGV AddMany/MultiplyMany/Exponentiate/MultiplyPlainNTT/SubPlain/
ModSwitchTo, CKKS MultiplyByNumber/SubPlain/NaiveMultiply/
MultiplyRelinRescaleModSwitchAdd)."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd


N = 64
SEED = rnd.seed_from_uint64(31337)


@pytest.fixture(scope="module")
def bgv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx, "kg": kg,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "be": T.BatchEncoder(ctx),
        "rlk": kg.create_relin_keys(),
        "t": int(parms.plain_modulus),
    }


@pytest.fixture(scope="module")
def ckks():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [50, 30, 30, 50])))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx, "kg": kg,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "ev": T.Evaluator(ctx),
        "cke": T.CKKSEncoder(ctx),
        "rlk": kg.create_relin_keys(),
        "scale": 2.0 ** 30,
    }


def bgv_rt(s, ct):
    return s["be"].decode(s["dec"].decrypt(ct)).astype(object)


def test_bgv_add_many(bgv):
    s = bgv
    t = s["t"]
    vs = [(np.arange(N, dtype=np.uint64) * m + m) % t for m in (2, 3, 5, 7)]
    cts = [s["enc"].encrypt_symmetric(s["be"].encode(v)) for v in vs]
    got = bgv_rt(s, s["ev"].add_many(cts))
    np.testing.assert_array_equal(got, sum(v.astype(object) for v in vs) % t)


def test_bgv_multiply_many(bgv):
    s = bgv
    t = s["t"]
    vs = [(np.arange(N, dtype=np.uint64) % 7) + m for m in (1, 2, 3)]
    cts = [s["enc"].encrypt_symmetric(s["be"].encode(v)) for v in vs]
    got = bgv_rt(s, s["ev"].multiply_many(cts, s["rlk"]))
    expect = vs[0].astype(object)
    for v in vs[1:]:
        expect = expect * v.astype(object) % t
    np.testing.assert_array_equal(got, expect)


def test_bgv_exponentiate(bgv):
    s = bgv
    t = s["t"]
    v = (np.arange(N, dtype=np.uint64) % 5) + 1
    ct = s["enc"].encrypt_symmetric(s["be"].encode(v))
    got = bgv_rt(s, s["ev"].exponentiate(ct, 3, s["rlk"]))
    np.testing.assert_array_equal(got, v.astype(object) ** 3 % t)


def test_bgv_multiply_plain_ntt(bgv):
    """Pre-lifted NTT plaintext path (evaluator.cpp
    BGVEncryptMultiplyPlainNTTDecrypt)."""
    s = bgv
    t = s["t"]
    a = np.arange(N, dtype=np.uint64) % t
    b = (np.arange(N, dtype=np.uint64) * 3 + 1) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    pt_ntt = s["ev"].transform_plain_to_ntt(s["be"].encode(b), ct.level)
    got = bgv_rt(s, s["ev"].multiply_plain(ct, pt_ntt))
    np.testing.assert_array_equal(got,
                                  a.astype(object) * b.astype(object) % t)


def test_bgv_sub_plain(bgv):
    s = bgv
    t = s["t"]
    a = np.arange(N, dtype=np.uint64) % t
    b = (np.arange(N, dtype=np.uint64) * 9 + 4) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(a))
    got = bgv_rt(s, s["ev"].sub_plain(ct, s["be"].encode(b)))
    np.testing.assert_array_equal(got, (a.astype(object)
                                        - b.astype(object)) % t)


def test_bgv_mod_switch_to_level(bgv):
    s = bgv
    t = s["t"]
    v = np.arange(N, dtype=np.uint64) % t
    ct = s["enc"].encrypt_symmetric(s["be"].encode(v))
    target = ct.level + 2
    ms = s["ev"].mod_switch_to(ct, target)
    assert ms.level == target
    np.testing.assert_array_equal(bgv_rt(s, ms), v.astype(object))


def test_ckks_multiply_by_number(ckks):
    """multiply_plain with an encode_constant plaintext (evaluator.cpp
    CKKSEncryptMultiplyByNumberDecrypt)."""
    s = ckks
    vals = np.linspace(-1, 1, N // 2)
    ct = s["enc"].encrypt_symmetric(s["cke"].encode(vals, scale=s["scale"]))
    pt = s["cke"].encode_constant(2.5, scale=s["scale"], level=ct.level)
    out = s["cke"].decode(s["dec"].decrypt(s["ev"].multiply_plain(ct, pt)))
    np.testing.assert_allclose(out.real, vals * 2.5, atol=1e-4)


def test_ckks_sub_plain(ckks):
    s = ckks
    v1 = np.linspace(0, 2, N // 2)
    v2 = np.linspace(-1, 1, N // 2)
    ct = s["enc"].encrypt_symmetric(s["cke"].encode(v1, scale=s["scale"]))
    pt = s["cke"].encode(v2, scale=s["scale"])
    out = s["cke"].decode(s["dec"].decrypt(s["ev"].sub_plain(ct, pt)))
    np.testing.assert_allclose(out.real, v1 - v2, atol=1e-4)


def test_ckks_naive_multiply_decrypts_size3(ckks):
    """Multiply WITHOUT relinearization: the size-3 ciphertext must
    decrypt directly (evaluator.cpp CKKSEncryptNaiveMultiplyDecrypt)."""
    s = ckks
    v1 = np.linspace(0.5, 1.5, N // 2)
    v2 = np.linspace(-0.5, 0.5, N // 2)
    c1 = s["enc"].encrypt_symmetric(s["cke"].encode(v1, scale=s["scale"]))
    c2 = s["enc"].encrypt_symmetric(s["cke"].encode(v2, scale=s["scale"]))
    prod = s["ev"].multiply(c1, c2)
    assert prod.size == 3
    out = s["cke"].decode(s["dec"].decrypt(prod))
    np.testing.assert_allclose(out.real, v1 * v2, atol=1e-3)


def test_ckks_multiply_relin_rescale_mod_switch_add(ckks):
    """The reference's deepest CKKS chain: x*y rescaled, then z
    mod-switched down and added (evaluator.cpp
    CKKSEncryptMultiplyRelinRescaleModSwitchAddDecrypt)."""
    s = ckks
    ev = s["ev"]
    x = np.linspace(0.1, 1.0, N // 2)
    y = np.linspace(-1.0, 1.0, N // 2)
    z = np.linspace(2.0, 3.0, N // 2)
    cx = s["enc"].encrypt_symmetric(s["cke"].encode(x, scale=s["scale"]))
    cy = s["enc"].encrypt_symmetric(s["cke"].encode(y, scale=s["scale"]))
    prod = ev.rescale_to_next(ev.relinearize(ev.multiply(cx, cy), s["rlk"]))
    # encode z directly at the product's level and scale, then add
    pz = s["cke"].encode(z, scale=prod.scale, level=prod.level)
    cz = s["enc"].encrypt_zero(level=prod.level, asymmetric=False)
    cz = cz.replace(scale=prod.scale)
    cz = ev.add_plain(cz, pz)
    total = ev.add(prod, cz)
    out = s["cke"].decode(s["dec"].decrypt(total))
    np.testing.assert_allclose(out.real, x * y + z, atol=1e-2)
