"""Functional facade: whole pipelines under one jax.jit, tables as args."""

from functools import partial

import numpy as np
import jax
import pytest

import troy_tpu as T
from troy_tpu import functional as F
from troy_tpu import prng as rnd


@pytest.fixture(scope="module")
def bfv():
    n = 64
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(n, 16))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(11))
    return ctx, kg


def test_fused_multiply_relin_pipeline(bfv):
    ctx, kg = bfv
    rlk = kg.create_relin_keys()
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    n = ctx.n
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(n, dtype=np.uint64) % t
    b = (np.arange(n, dtype=np.uint64) * 5 + 2) % t
    ct1 = enc.encrypt_symmetric(be.encode(a))
    ct2 = enc.encrypt_symmetric(be.encode(b))

    @jax.jit
    def step(c1, c2, cd, key_cd, rk2):
        prod = F.multiply_relinearize(c1, c2, rk2, cd, key_cd)
        return F.mod_switch_to_next(prod, cd)

    out = step(ct1, ct2, ctx.first_context_data, ctx.key_context_data,
               rlk.keys[2])
    got = be.decode(dec.decrypt(out))
    assert np.array_equal(got, a * b % t)


def test_functional_add_sub_negate(bfv):
    ctx, kg = bfv
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    n, t = ctx.n, int(ctx.first_context_data.plain_modulus)
    a = np.arange(n, dtype=np.uint64) % t
    b = (np.arange(n, dtype=np.uint64) * 7) % t
    ct1 = enc.encrypt_symmetric(be.encode(a))
    ct2 = enc.encrypt_symmetric(be.encode(b))

    @jax.jit
    def combo(c1, c2, cd):
        return F.negate(F.sub(F.add(c1, c2, cd), c2, cd), cd)

    out = combo(ct1, ct2, ctx.first_context_data)
    got = be.decode(dec.decrypt(out))
    assert np.array_equal(got, (t - a) % t)


def test_fused_rotate_square_pipeline(bfv):
    """Deeper single-executable pipeline: rotate (Galois key-switch) then
    square + relinearize, all under one jit with permutation tables and
    keys as arguments."""
    from troy_tpu.utils import galois as galois_util
    ctx, kg = bfv
    n = ctx.n
    rlk = kg.create_relin_keys()
    elt = galois_util.get_elt_from_step(n, 1)
    gk = kg.create_galois_keys(elts=[elt])
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    be = T.BatchEncoder(ctx)
    t = int(ctx.first_context_data.plain_modulus)
    a = np.arange(n, dtype=np.uint64) % t
    ct = enc.encrypt_symmetric(be.encode(a))
    src, keep = galois_util.coeff_permutation_dev(n, elt)

    @jax.jit
    def step(c, src, keep, gkey, rk2, cd, key_cd):
        rot = F.apply_galois_coeff(c, src, keep, gkey, cd, key_cd)
        return F.relinearize(F.square(rot, cd), (rk2,), cd, key_cd)

    out = step(ct, src, keep, gk.keys[elt], rlk.keys[2],
               ctx.first_context_data, ctx.key_context_data)
    got = be.decode(dec.decrypt(out)).astype(object)
    half = n // 2
    rotated = np.concatenate([np.roll(a[:half], -1), np.roll(a[half:], -1)])
    np.testing.assert_array_equal(got, rotated.astype(object) ** 2 % t)
