"""Multi-chip sharding regimes on the virtual 8-device CPU mesh
(conftest forces JAX_PLATFORMS=cpu with xla_force_host_platform_device_count).

The reference is single-GPU (reference: src/kernelprovider.cuh:30
cudaSetDevice(0)); these layouts are the capability it lacks. Each regime
must decrypt bit-exactly to the plain-integer result.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu.parallel import sharding as par

N = 64
Q_BITS = [30, 30, 30]


@pytest.fixture(scope="module")
def setup():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, Q_BITS)),
        plain_modulus=T.PlainModulus.batching(N, 16))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(11))
    return {
        "ctx": ctx, "rlk": kg.create_relin_keys(),
        "enc": T.Encryptor(ctx, secret_key=kg.secret_key),
        "dec": T.Decryptor(ctx, kg.secret_key),
        "be": T.BatchEncoder(ctx),
        "t": int(ctx.first_context_data.plain_modulus),
        "mesh": par.make_mesh(8),
    }


def test_dp_batch(setup):
    s = setup
    a = np.arange(N, dtype=np.uint64)
    cts1 = [s["enc"].encrypt_symmetric(s["be"].encode(a + i)).data
            for i in range(8)]
    cts2 = [s["enc"].encrypt_symmetric(s["be"].encode(a * 2 + i)).data
            for i in range(8)]
    d1 = par.shard_batch(s["mesh"], jnp.stack(cts1))
    d2 = par.shard_batch(s["mesh"], jnp.stack(cts2))
    out = par.batched_multiply_relin(s["ctx"], s["rlk"], s["mesh"])(d1, d2)
    for i in range(8):
        ct = T.Ciphertext(data=np.asarray(out[i]),
                          level=s["ctx"].first_level)
        got = s["be"].decode(s["dec"].decrypt(ct))
        assert np.array_equal(got, ((a + i) * (a * 2 + i)) % s["t"])


def test_coeff_sharded(setup):
    s = setup
    a = np.arange(N, dtype=np.uint64)
    ca = s["enc"].encrypt_symmetric(s["be"].encode(a))
    cb = s["enc"].encrypt_symmetric(s["be"].encode(a + 3))
    run = par.coeff_sharded_multiply_relin(s["ctx"], s["rlk"], s["mesh"])
    spec = NamedSharding(s["mesh"], P(None, None, "dp"))
    out = run(jax.device_put(ca.data, spec), jax.device_put(cb.data, spec))
    ct = T.Ciphertext(data=np.asarray(out), level=s["ctx"].first_level)
    got = s["be"].decode(s["dec"].decrypt(ct))
    assert np.array_equal(got, (a * (a + 3)) % s["t"])


def test_limb_sharded(setup):
    s = setup
    a = np.arange(N, dtype=np.uint64)
    ca = s["enc"].encrypt_symmetric(s["be"].encode(a + 5))
    cb = s["enc"].encrypt_symmetric(s["be"].encode(a + 9))
    run = par.limb_sharded_multiply_relin(s["ctx"], s["rlk"], s["mesh"])
    spec = NamedSharding(s["mesh"], P(None, "dp", None))
    out = run(jax.device_put(ca.data, spec), jax.device_put(cb.data, spec))
    ct = T.Ciphertext(data=np.asarray(out), level=s["ctx"].first_level)
    got = s["be"].decode(s["dec"].decrypt(ct))
    assert np.array_equal(got, ((a + 5) * (a + 9)) % s["t"])
