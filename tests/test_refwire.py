"""Reference wire-format interop (troy_tpu.refwire vs reference bytes).

Fixture ``ref_wire_n64.bin`` carries byte streams in the reference CUDA
classes' save() layout, emitted by the reference CPU library itself
(generator: ref_wire_n64_generator.cpp.txt — it replicates the savet
sequences of ciphertext_cuda.cu:16-83 / plaintext_cuda.cu:7-15 /
kswitchkeys_cuda.cuh:330-339 field-for-field on the CPU twins).

Both interop directions are pinned (VERDICT r4 #4):
  * reference-emitted bytes LOAD here and decrypt/operate bit-exactly;
  * bytes we emit for the same objects BYTE-MATCH the reference encoding
    (load -> save round trips reproduce every fixture record exactly,
    and our seeded keygen's secret key saves to the reference's bytes).
"""

import os

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu import refwire as rw

DATA = os.path.join(os.path.dirname(__file__), "data", "ref_wire_n64.bin")
N = 64


def _records():
    recs = {}
    with open(DATA, "rb") as f:
        raw = f.read()
    off = 0
    while off < len(raw):
        nl = raw.index(b"\n", off)
        name, nbytes = raw[off:nl].decode().rsplit(" ", 1)
        nbytes = int(nbytes)
        recs[name] = raw[nl + 1:nl + 1 + nbytes]
        off = nl + 1 + nbytes
    return recs


@pytest.fixture(scope="module")
def recs():
    return _records()


@pytest.fixture(scope="module")
def bfv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


@pytest.fixture(scope="module")
def ckks():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [50, 30, 50])))
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


VALUES = np.arange(N, dtype=np.uint64) % 97


def test_ref_parms_id_distinct_per_level(bfv):
    ids = [rw.ref_parms_id(cd.parms) for cd in bfv.chain]
    assert len(set(ids)) == len(ids)
    assert all(len(i) == 32 and i != rw.REF_PARMS_ID_ZERO for i in ids)


def test_load_secret_key_matches_seeded_keygen(recs, bfv):
    sk = rw.load_secret_key_ref(recs["bfv_sk"], bfv)
    kg = T.KeyGenerator(bfv, seed=rnd.seed_from_uint64(42))
    np.testing.assert_array_equal(np.asarray(sk.data),
                                  np.asarray(kg.secret_key.data))
    # emit direction: our bytes == the reference's bytes
    assert rw.save_secret_key_ref(kg.secret_key, bfv) == recs["bfv_sk"]


def test_reference_ciphertext_decrypts(recs, bfv):
    sk = rw.load_secret_key_ref(recs["bfv_sk"], bfv)
    ct = rw.load_ciphertext_ref(recs["bfv_ct"], bfv)
    assert not ct.is_ntt_form and ct.size == 2
    dec = T.Decryptor(bfv, sk)
    be = T.BatchEncoder(bfv)
    np.testing.assert_array_equal(be.decode(dec.decrypt(ct)), VALUES)


def test_reference_plaintext_loads(recs, bfv):
    pt = rw.load_plaintext_ref(recs["bfv_pt"], bfv)
    assert not pt.is_ntt_form and pt.level is None
    be = T.BatchEncoder(bfv)
    np.testing.assert_array_equal(be.decode(pt), VALUES)


def test_save_roundtrips_byte_match(recs, bfv, ckks):
    """Load each reference stream and re-save it: the bytes we emit must
    equal the reference's encoding exactly."""
    assert rw.save_ciphertext_ref(
        rw.load_ciphertext_ref(recs["bfv_ct"], bfv), bfv) == recs["bfv_ct"]
    assert rw.save_plaintext_ref(
        rw.load_plaintext_ref(recs["bfv_pt"], bfv), bfv) == recs["bfv_pt"]
    assert rw.save_secret_key_ref(
        rw.load_secret_key_ref(recs["bfv_sk"], bfv), bfv) == recs["bfv_sk"]
    assert rw.save_public_key_ref(
        rw.load_public_key_ref(recs["bfv_pk"], bfv), bfv) == recs["bfv_pk"]
    assert rw.save_relin_keys_ref(
        rw.load_relin_keys_ref(recs["bfv_rlk"], bfv), bfv) == recs["bfv_rlk"]
    assert rw.save_galois_keys_ref(
        rw.load_galois_keys_ref(recs["bfv_gk"], bfv), bfv) == recs["bfv_gk"]
    assert rw.save_ciphertext_ref(
        rw.load_ciphertext_ref(recs["ckks_ct"], ckks), ckks) \
        == recs["ckks_ct"]
    assert rw.save_plaintext_ref(
        rw.load_plaintext_ref(recs["ckks_pt"], ckks), ckks) \
        == recs["ckks_pt"]


def test_reference_keys_operate(recs, bfv):
    """Keys loaded from reference bytes drive relinearize/rotate on
    ciphertexts ENCRYPTED HERE — the full drop-in-peer scenario."""
    sk = rw.load_secret_key_ref(recs["bfv_sk"], bfv)
    rlk = rw.load_relin_keys_ref(recs["bfv_rlk"], bfv)
    gk = rw.load_galois_keys_ref(recs["bfv_gk"], bfv)
    assert sorted(rlk.keys) == [2] and sorted(gk.keys) == [3, 127]
    t = int(bfv.chain[0].plain_modulus)
    enc = T.Encryptor(bfv, secret_key=sk, seed=rnd.seed_from_uint64(9))
    dec = T.Decryptor(bfv, sk)
    be = T.BatchEncoder(bfv)
    ev = T.Evaluator(bfv)
    a = VALUES
    b = (VALUES * 3 + 1) % t
    prod = ev.relinearize(
        ev.multiply(enc.encrypt_symmetric(be.encode(a)),
                    enc.encrypt_symmetric(be.encode(b))), rlk)
    model = a.astype(object) * b.astype(object) % t
    np.testing.assert_array_equal(be.decode(dec.decrypt(prod)), model)
    rot = ev.apply_galois(prod, 3, gk)   # elt 3 = step 1 at n=64
    half = N // 2
    want = np.concatenate([np.roll(model[:half], -1),
                           np.roll(model[half:], -1)])
    np.testing.assert_array_equal(be.decode(dec.decrypt(rot)), want)


def test_reference_terms_stream(recs, bfv):
    """loadTerms: the selected c0 coefficients survive the partial wire
    (the matmul protocol's serializeOutputs shape)."""
    ids = [0, 3, 17, 40]
    full = rw.load_ciphertext_ref(recs["bfv_ct"], bfv)
    part = rw.load_terms_ref(recs["bfv_ct_terms"], bfv, ids)
    assert part.size == full.size
    fd, pd = np.asarray(full.data), np.asarray(part.data)
    np.testing.assert_array_equal(pd[0][:, ids], fd[0][:, ids])
    np.testing.assert_array_equal(pd[1], fd[1])
    # emit direction byte-match
    assert rw.save_terms_ref(full, bfv, ids) == recs["bfv_ct_terms"]
    # the decrypted polynomial agrees at the selected coefficient ids
    sk = rw.load_secret_key_ref(recs["bfv_sk"], bfv)
    dec = T.Decryptor(bfv, sk)
    want = np.asarray(dec.decrypt(full).data)
    got = np.asarray(dec.decrypt(part).data)
    np.testing.assert_array_equal(got[ids], want[ids])


def test_ckks_reference_ciphertext_decodes(recs, ckks):
    sk = rw.load_secret_key_ref(recs["ckks_sk"], ckks)
    ct = rw.load_ciphertext_ref(recs["ckks_ct"], ckks)
    assert ct.is_ntt_form and ct.scale == 2.0 ** 30
    pt = rw.load_plaintext_ref(recs["ckks_pt"], ckks)
    assert pt.is_ntt_form and pt.level == ct.level
    ce = T.CKKSEncoder(ckks)
    want = 0.25 * (np.arange(N // 2) % 9)
    np.testing.assert_allclose(np.real(ce.decode(pt)), want, atol=1e-5)
    dec = T.Decryptor(ckks, sk)
    np.testing.assert_allclose(np.real(ce.decode(dec.decrypt(ct))), want,
                               atol=1e-4)


def test_compat_shim_speaks_troy_wire(recs):
    """The pytroy shim's save/load speak the reference wire too:
    ``save(context, wire="troy")`` emits reference bytes and ``load``
    auto-detects the flavor (compat/__init__.py)."""
    import pytroy
    pytroy.initialize_kernel()
    parms = pytroy.EncryptionParameters(pytroy.SchemeType.bfv)
    parms.set_poly_modulus_degree(N)
    parms.set_coeff_modulus(pytroy.CoeffModulus.create(N, [40, 40, 40]))
    parms.set_plain_modulus(pytroy.PlainModulus.batching(N, 17))
    ctx = pytroy.SEALContext(parms, sec_level=pytroy.SecurityLevel.none)
    ct = pytroy.Ciphertext()
    ct.load(recs["bfv_ct"], ctx)              # reference bytes, auto-detected
    assert ct.save(ctx, wire="troy") == recs["bfv_ct"]
    native = ct.save()                        # native TCT1 default unchanged
    assert native[:4] == b"TCT1"
    ct2 = pytroy.Ciphertext()
    ct2.load(native)
    assert ct2.save(ctx, wire="troy") == recs["bfv_ct"]
    sk = pytroy.SecretKey()
    sk.load(recs["bfv_sk"], ctx)
    assert sk.save(ctx, wire="troy") == recs["bfv_sk"]
    gk = pytroy.GaloisKeys()
    gk.load(recs["bfv_gk"], ctx)
    assert gk.save(ctx, wire="troy") == recs["bfv_gk"]
    dec = pytroy.Decryptor(ctx, sk)
    be = pytroy.BatchEncoder(ctx)
    out = pytroy.Plaintext()
    dec.decrypt(ct, out)
    np.testing.assert_array_equal(
        np.asarray(be.decode(out))[:N], VALUES)
    # save(wire="troy") without a context must raise the same clear
    # error the load paths do, not an AttributeError (round-5 review)
    for obj in (ct, sk, gk, out):
        with pytest.raises(ValueError, match="needs a context"):
            obj.save(wire="troy")


def test_seeded_ciphertext_expands_on_ref_save(bfv):
    """A seed-compressed symmetric ct saved in reference format is
    EXPANDED first (the reference's own load refuses seeded streams), so
    any troy peer can read it."""
    kg = T.KeyGenerator(bfv, seed=rnd.seed_from_uint64(5))
    enc = T.Encryptor(bfv, secret_key=kg.secret_key,
                      seed=rnd.seed_from_uint64(6))
    be = T.BatchEncoder(bfv)
    ct = enc.encrypt_symmetric(be.encode(VALUES), save_seed=True)
    assert ct.seed != 0
    raw = rw.save_ciphertext_ref(ct, bfv)
    back = rw.load_ciphertext_ref(raw, bfv)
    dec = T.Decryptor(bfv, kg.secret_key)
    np.testing.assert_array_equal(be.decode(dec.decrypt(back)), VALUES)
