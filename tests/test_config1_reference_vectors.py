"""BASELINE.json config 1: BFV n=4096, 2 RNS primes —
keygen/encrypt/add/decrypt pinned bit-exact against the reference's
compiled CPU path (tests/data/ref_bfv_n4096_config1.txt; generator kept
alongside)."""

import pathlib

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd

N = 4096
DATA = (pathlib.Path(__file__).parent / "data" /
        "ref_bfv_n4096_config1.txt")


@pytest.fixture(scope="module")
def env():
    vecs = {}
    for line in DATA.read_text().splitlines():
        parts = line.split()
        if parts[0] in ("t", "q"):
            vecs[parts[0]] = [int(x) for x in parts[1:]]
        else:
            vecs[parts[0]] = np.array(parts[2:2 + int(parts[1])],
                                      dtype=np.uint64)
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 20))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    assert [int(m) for m in parms.coeff_modulus] == vecs["q"]
    assert int(parms.plain_modulus) == vecs["t"][0]
    return vecs, ctx


def test_config1_keygen_encrypt_add_decrypt(env):
    vecs, ctx = env
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(2026),
                        host_sampling=True)
    np.testing.assert_array_equal(np.asarray(kg.secret_key.data),
                                  vecs["sk"].reshape(2, N))
    be = T.BatchEncoder(ctx)
    v1 = np.array([(i * i + 3 * i + 1) % 12289 for i in range(N)],
                  dtype=np.uint64)
    v2 = np.array([(7 * i + 2) % 12289 for i in range(N)], dtype=np.uint64)
    # reference's seeded factory replays per encryption: fresh Encryptor
    c1 = T.Encryptor(ctx, secret_key=kg.secret_key,
                     seed=rnd.seed_from_uint64(2026),
                     host_sampling=True).encrypt_symmetric(be.encode(v1))
    c2 = T.Encryptor(ctx, secret_key=kg.secret_key,
                     seed=rnd.seed_from_uint64(2026),
                     host_sampling=True).encrypt_symmetric(be.encode(v2))
    # data level has 1 limb (last prime reserved for keyswitching)
    limbs = ctx.first_context_data.limbs
    np.testing.assert_array_equal(np.asarray(c1.data).reshape(-1),
                                  vecs["c1"])
    np.testing.assert_array_equal(np.asarray(c2.data).reshape(-1),
                                  vecs["c2"])
    ev = T.Evaluator(ctx)
    s12 = ev.add(c1, c2)
    np.testing.assert_array_equal(np.asarray(s12.data).reshape(-1),
                                  vecs["sum"])
    dec = T.Decryptor(ctx, kg.secret_key)
    pt = dec.decrypt(s12)
    np.testing.assert_array_equal(np.asarray(pt.data)[:len(vecs["dec"])],
                                  vecs["dec"])
    t = vecs["t"][0]
    np.testing.assert_array_equal(
        be.decode(pt).astype(object),
        (v1.astype(object) + v2.astype(object)) % t)
