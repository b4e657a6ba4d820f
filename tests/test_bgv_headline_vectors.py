"""BGV headline config pinned bit-exact against the reference CPU path.

BGV n=16384, q={60,40,40,40,40,60}, t=Batching(n,20) — the timetest BGV
configuration (reference: test/timetest.cu:477-479). Vectors generated
by the reference's compiled host library (generator alongside):
keygen -> symmetric encrypt -> multiply -> relinearize -> mod-switch
(with BGV correction factors) -> rotate -> decrypt, word-for-word. The
reference's host BGV ciphertexts live in COEFFICIENT form while
troy_tpu keeps BGV in NTT form; loads/compares transform at the
boundary (same contract as the n=64 BGV parity tests)."""

import pathlib

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd

N = 16384
Q_BITS = [60, 40, 40, 40, 40, 60]
DATA = pathlib.Path(__file__).parent / "data" / "ref_bgv_n16384_headline.bin"


def _load_bin(path):
    raw = {}
    data = path.read_bytes()
    pos = 0
    while pos < len(data):
        nl = data.index(b"\n", pos)
        name, count = data[pos:nl].decode().rsplit(" ", 1)
        count = int(count)
        raw[name] = np.frombuffer(data, dtype="<u8", count=count,
                                  offset=nl + 1)
        pos = nl + 1 + count * 8
    return raw


@pytest.fixture(scope="module")
def env():
    raw = _load_bin(DATA)
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, Q_BITS)),
        plain_modulus=T.PlainModulus.batching(N, 20))
    ctx = T.HeContext(parms)
    assert [int(m) for m in parms.coeff_modulus] == [int(x)
                                                     for x in raw["q"]]
    assert int(parms.plain_modulus) == int(raw["t"][0])
    return raw, ctx


@pytest.fixture(scope="module")
def keys(env):
    raw, ctx = env
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(2027),
                        host_sampling=True)
    np.testing.assert_array_equal(np.asarray(kg.secret_key.data),
                                  raw["sk"].reshape(6, N))
    rlk = kg.create_relin_keys()
    np.testing.assert_array_equal(np.asarray(rlk.keys[2][0]),
                                  raw["rlk_0"].reshape(2, 6, N))
    from troy_tpu.utils import galois as galois_util
    elt = galois_util.get_elt_from_step(N, 1)
    gk = kg.create_galois_keys(steps=[1])
    np.testing.assert_array_equal(np.asarray(gk.keys[elt][0]),
                                  raw["gk_0"].reshape(2, 6, N))
    return kg, rlk, gk


def _loaders(raw, ctx):
    ev = T.Evaluator(ctx)

    def load(tag, level=None):
        size = int(raw[tag + "_meta"][0])
        ntt = bool(raw[tag + "_meta"][1])
        cf = int(raw[tag + "_meta"][2])
        level = ctx.first_level if level is None else level
        ct = T.Ciphertext(data=raw[tag].reshape(size, -1, N), level=level,
                          is_ntt_form=ntt, correction_factor=cf)
        return ct if ntt else ev.transform_to_ntt(ct)

    def unload(ct):
        return np.asarray(ev.transform_from_ntt(ct).data).reshape(-1)

    return ev, load, unload


def test_bgv_headline_encrypt_bit_exact(env, keys):
    raw, ctx = env
    kg, _, _ = keys
    ev, _, unload = _loaders(raw, ctx)
    be = T.BatchEncoder(ctx)
    t = int(raw["t"][0])
    v1 = np.array([(3 * i + 11) % t for i in range(N)], dtype=np.uint64)
    v2 = np.array([(i * i + 7) % t for i in range(N)], dtype=np.uint64)
    for vals, tag in ((v1, "c1"), (v2, "c2")):
        enc = T.Encryptor(ctx, secret_key=kg.secret_key,
                          seed=rnd.seed_from_uint64(2027),
                          host_sampling=True)
        ct = enc.encrypt_symmetric(be.encode(vals))
        np.testing.assert_array_equal(unload(ct), raw[tag])


def test_bgv_headline_mult_relin_modswitch_rotate_bit_exact(env, keys):
    raw, ctx = env
    _, rlk, gk = keys
    ev, load, unload = _loaders(raw, ctx)
    c1, c2 = load("c1"), load("c2")

    prod = ev.multiply(c1, c2)
    np.testing.assert_array_equal(unload(prod), raw["prod"])
    rel = ev.relinearize(prod, rlk)
    np.testing.assert_array_equal(unload(rel), raw["rel"])
    ms = ev.mod_switch_to_next(rel)
    assert ms.correction_factor == int(raw["ms_meta"][2])
    np.testing.assert_array_equal(unload(ms), raw["ms"])
    rot = ev.rotate_rows(rel, 1, gk)
    np.testing.assert_array_equal(unload(rot), raw["rot"])


def test_bgv_headline_decrypt(env, keys):
    raw, ctx = env
    kg, rlk, _ = keys
    ev, load, _ = _loaders(raw, ctx)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    ms = ev.mod_switch_to_next(ev.relinearize(
        ev.multiply(load("c1"), load("c2")), rlk))
    got = be.decode(dec.decrypt(ms))
    np.testing.assert_array_equal(got, raw["dec_ms"])
