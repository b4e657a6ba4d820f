"""Validity checks + hex-poly string parity
(reference: src/valcheck.h:31-256; plaintext hex I/O plaintext.h:168-239)."""

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu import prng as rnd
from troy_tpu import valcheck as vc
from troy_tpu.hexpoly import (
    hex_string_to_poly, poly_to_hex_string,
    plaintext_from_string, plaintext_to_string,
)


@pytest.fixture(scope="module")
def bfv_ctx():
    n = 64
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, [30, 30, 30])),
        plain_modulus=T.PlainModulus.batching(n, 16))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    kg = T.KeyGenerator(ctx, seed=rnd.seed_from_uint64(99))
    return ctx, kg


def test_hex_poly_roundtrip():
    arr = np.array([1, 0, 2, 0x3F], dtype=np.uint64)
    s = poly_to_hex_string(arr)
    assert s == "3Fx^3 + 2x^2 + 1"
    back = hex_string_to_poly(s)
    assert np.array_equal(back, arr)


def test_hex_poly_zero_and_degree_one():
    assert poly_to_hex_string([0, 0]) == "0"
    assert np.array_equal(hex_string_to_poly("0"), [0])
    assert poly_to_hex_string([0, 5]) == "5x^1"
    assert np.array_equal(hex_string_to_poly("5x^1"), [0, 5])


def test_plaintext_string_roundtrip(bfv_ctx):
    ctx, kg = bfv_ctx
    pt = plaintext_from_string("Ax^2 + 1", coeff_count=4)
    assert plaintext_to_string(pt) == "Ax^2 + 1"
    # encrypt/decrypt the string-built plaintext
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    dec = T.Decryptor(ctx, kg.secret_key)
    got = dec.decrypt(enc.encrypt_symmetric(pt))
    assert plaintext_to_string(got) == "Ax^2 + 1"


def test_valcheck_accepts_fresh_objects(bfv_ctx):
    ctx, kg = bfv_ctx
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    be = T.BatchEncoder(ctx)
    a = np.arange(ctx.n, dtype=np.uint64)
    pt = be.encode(a)
    ct = enc.encrypt_symmetric(pt)
    assert vc.is_valid_for(pt, ctx)
    assert vc.is_valid_for(ct, ctx)
    assert vc.is_valid_for(kg.secret_key, ctx)
    assert vc.is_valid_for(kg.create_public_key(), ctx)
    assert vc.is_valid_for(kg.create_relin_keys(), ctx)
    vc.check_is_valid_for(ct, ctx)  # must not raise


def test_valcheck_rejects_bad_metadata(bfv_ctx):
    ctx, kg = bfv_ctx
    enc = T.Encryptor(ctx, secret_key=kg.secret_key)
    be = T.BatchEncoder(ctx)
    ct = enc.encrypt_symmetric(be.encode(np.zeros(ctx.n, dtype=np.uint64)))
    bad_level = ct.replace(level=len(ctx.chain) + 5)
    assert not vc.is_metadata_valid_for(bad_level, ctx)
    with pytest.raises(ValueError):
        vc.is_metadata_valid_for(bad_level, ctx, raise_on_fail=True)
    # data out of bounds: corrupt a residue above its modulus
    import jax.numpy as jnp
    arr = np.asarray(ct.data).copy()
    arr[0, 0, 0] = np.uint64(2**62)
    bad_data = ct.replace(data=jnp.asarray(arr))
    assert vc.is_metadata_valid_for(bad_data, ctx)
    assert not vc.is_data_valid_for(bad_data, ctx)
