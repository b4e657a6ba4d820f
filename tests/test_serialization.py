"""Serialization-protocol tests: partial-term streams, seed compression,
plaintext streams, and malformed-stream rejection.

Mirrors the reference's persistence behaviors (reference:
src/ciphertext_cuda.cu:16-140 save/load/saveTerms/loadTerms,
src/utils/rlwe_cuda.cu:291-307 seed-compressed symmetric ciphertexts).
"""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu import serialization as ser


N = 64
SEED = rnd.seed_from_uint64(31337)


@pytest.fixture(scope="module")
def s():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=SEED)
    return {
        "ctx": ctx,
        "kg": kg,
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key, seed=SEED),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "be": T.BatchEncoder(ctx),
        "t": int(parms.plain_modulus),
    }


def test_seed_compression_halves_the_stream(s):
    vals = np.arange(N, dtype=np.uint64)
    pt = s["be"].encode(vals)
    full = s["enc"].encrypt_symmetric(pt)                 # expanded
    seeded = s["enc"].encrypt_symmetric(pt, save_seed=True)
    raw_full = ser.save_ciphertext(full)
    raw_seeded = ser.save_ciphertext(seeded)
    assert len(raw_seeded) < len(raw_full) * 0.6          # c0-only + header
    back = ser.load_ciphertext(raw_seeded, s["ctx"])
    got = s["be"].decode(s["dec"].decrypt(back))
    np.testing.assert_array_equal(got, vals)


def test_save_terms_roundtrip_preserves_selected_coeffs(s):
    coeffs = np.arange(1, N + 1, dtype=np.uint64)
    ct = s["enc"].encrypt_symmetric(s["be"].encode_polynomial(coeffs))
    term_ids = [0, 3, 17, N - 1]
    raw = ser.save_terms(ct, s["ctx"], term_ids)
    # stream carries len(term_ids) c0 coefficients per limb, not n
    full = len(ser.save_ciphertext(ct))
    assert len(raw) < full
    back = ser.load_terms(raw, s["ctx"], term_ids)
    got = s["be"].decode_polynomial(s["dec"].decrypt(back))
    for i in term_ids:
        assert got[i] == coeffs[i], f"term {i} mismatch"


def test_save_terms_rejects_seeded(s):
    ct = s["enc"].encrypt_symmetric(s["be"].encode(
        np.zeros(N, dtype=np.uint64)), save_seed=True)
    with pytest.raises(ValueError):
        ser.save_terms(ct, s["ctx"], [0])


def test_load_terms_rejects_plain_stream(s):
    ct = s["enc"].encrypt_symmetric(s["be"].encode(
        np.zeros(N, dtype=np.uint64)))
    raw = ser.save_ciphertext(ct)
    with pytest.raises(ValueError):
        ser.load_terms(raw, s["ctx"], [0])


def test_plaintext_roundtrip_both_forms(s):
    vals = np.arange(N, dtype=np.uint64)
    pt = s["be"].encode(vals)
    back = ser.load_plaintext(ser.save_plaintext(pt))
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(pt.data))
    assert back.is_ntt_form == pt.is_ntt_form
    assert back.level == pt.level
    np.testing.assert_array_equal(s["be"].decode(back), vals)


def test_secret_key_roundtrip_decrypts(s):
    raw = ser.save_secret_key(s["kg"].secret_key)
    sk2 = ser.load_secret_key(raw)
    dec2 = T.Decryptor(s["ctx"], sk2)
    vals = np.arange(N, dtype=np.uint64) * 7 % s["t"]
    ct = s["enc"].encrypt_symmetric(s["be"].encode(vals))
    np.testing.assert_array_equal(s["be"].decode(dec2.decrypt(ct)), vals)


def test_kswitch_keys_roundtrip(s):
    ksk = s["kg"].create_keyswitch_key(s["kg"].secret_key)
    back = ser.load_kswitch_keys(ser.save_kswitch_keys(ksk))
    assert sorted(back.keys) == sorted(ksk.keys)
    for i in ksk.keys:
        np.testing.assert_array_equal(np.asarray(back.keys[i]),
                                      np.asarray(ksk.keys[i]))


def test_wrong_magic_rejected(s):
    ct = s["enc"].encrypt_symmetric(s["be"].encode(
        np.zeros(N, dtype=np.uint64)))
    raw = ser.save_ciphertext(ct)
    with pytest.raises(ValueError):
        ser.load_plaintext(raw)
    with pytest.raises(ValueError):
        ser.load_ciphertext(b"XXXX" + raw[4:], s["ctx"])
    with pytest.raises(ValueError):
        ser.load_public_key(raw)


def test_parms_save_load_roundtrip():
    """Parameter-set byte stream (extension: the reference stripped
    SEAL's params save/load, encryptionparams.h:345-395; the two-party
    protocol needs one)."""
    for scheme, t in ((T.SchemeType.bfv, T.PlainModulus.batching(64, 16)),
                      (T.SchemeType.bgv, T.PlainModulus.batching(64, 16)),
                      (T.SchemeType.ckks, None)):
        kwargs = {} if t is None else {"plain_modulus": t}
        parms = T.EncryptionParameters(
            scheme=scheme, poly_modulus_degree=64,
            coeff_modulus=tuple(T.CoeffModulus.create(64, [40, 30, 40])),
            **kwargs)
        parms2 = ser.load_parms(ser.save_parms(parms))
        assert parms2 == parms
        assert parms2.parms_id == parms.parms_id
