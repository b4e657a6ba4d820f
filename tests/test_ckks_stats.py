"""CKKS encode/decode device statistics (reference:
src/ckks_cuda.cu:178-209 gMaxReal; consumed at :386-407 for the exact
encode magnitude check).

- encode_with_stats: max-|coefficient| tracked on device; the bit count
  must match the host oracle's true coefficient maximum.
- decode_device_with_stats / decode_max_error: the conjugate-symmetry
  residual of the embedding output — ~0 for an exact transform; must be
  tiny relative to the slot values and nonnegative.
- borderline encode: values whose conservative bound trips but whose true
  coefficients fit must encode (the reference accepts them; a purely
  conservative gate would not).
"""

import math

import numpy as np
import pytest

import troy_tpu as T


N = 128


@pytest.fixture(scope="module")
def ctx():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])))
    return T.HeContext(parms, sec_level=T.SecurityLevel.none)


def test_encode_stats_match_host_oracle(ctx):
    encd = T.CKKSEncoder(ctx)
    host = T.CKKSEncoder(ctx, host=True)
    rng = np.random.default_rng(5)
    vals = rng.normal(size=N // 2) + 1j * rng.normal(size=N // 2)
    scale = 2.0 ** 40
    plain, stats = encd.encode_with_stats(vals, scale)
    # host truth: compose the device plaintext back to centered ints
    coeffs = host._compose_centered(plain)
    true_max = float(np.max(np.abs(coeffs)))
    expect_bits = (math.ceil(math.log2(true_max)) if true_max > 1 else 0) + 1
    assert stats.max_coeff_bit_count == expect_bits
    assert abs(stats.max_coeff_log2 - math.log2(true_max)) < 1e-6


def test_decode_max_error_is_tiny(ctx):
    encd = T.CKKSEncoder(ctx)
    rng = np.random.default_rng(6)
    vals = rng.normal(size=N // 2) + 1j * rng.normal(size=N // 2)
    scale = 2.0 ** 40
    plain = encd.encode(vals, scale)
    re, im, err = encd.decode_device_with_stats(plain)
    got = np.asarray(re) + 1j * np.asarray(im)
    np.testing.assert_allclose(got, vals, atol=1e-8)
    e = float(np.asarray(err))
    assert 0.0 <= e < 1e-8
    assert encd.decode_max_error(plain) == e


def test_decode_max_error_host_oracle(ctx):
    host = T.CKKSEncoder(ctx, host=True)
    rng = np.random.default_rng(7)
    vals = rng.normal(size=N // 2)
    plain = host.encode(vals, 2.0 ** 40)
    e = host.decode_max_error(plain)
    assert 0.0 <= e < 1e-8


def test_borderline_encode_uses_exact_check(ctx):
    """A single huge slot value: the conservative bound scale*max|v| can
    exceed Q/2 while the true coefficients (spread over n by the inverse
    embedding, magnitude ~ scale*|v|/sqrt-ish factors) fit. The reference
    accepts exactly when the true max fits (ckks_cuda.cu:404-407)."""
    encd = T.CKKSEncoder(ctx)
    host = T.CKKSEncoder(ctx, host=True)
    cd = ctx.first_context_data
    Q = cd.total_coeff_modulus
    # one slot at v, rest zero: coefficients have |c_j| ~ scale*|v|/n * |...|
    # = scale*|v|/n exactly (single evaluation point spread uniformly).
    # Choose scale*|v| = 4*Q: conservative bound trips, true max ~ 4Q/n << Q/2.
    scale = 2.0 ** 45
    v = 4.0 * Q / scale
    vals = np.zeros(N // 2, dtype=np.complex128)
    vals[0] = v
    plain = encd.encode(vals, scale)   # must NOT raise
    got = encd.decode(plain)
    np.testing.assert_allclose(got[0].real, v, rtol=1e-10)
    # and a genuinely too-large value must still raise
    vals_bad = np.full(N // 2, Q / scale, dtype=np.complex128)
    with pytest.raises(ValueError):
        encd.encode(vals_bad, scale)
    with pytest.raises(ValueError):
        host.encode(vals_bad, scale)


def test_encode_device_matches_encode(ctx):
    import jax.numpy as jnp
    encd = T.CKKSEncoder(ctx)
    rng = np.random.default_rng(8)
    vals = rng.normal(size=N // 2) + 1j * rng.normal(size=N // 2)
    scale = 2.0 ** 40
    host_plain = encd.encode(vals, scale)
    dev_plain = encd.encode_device(
        jnp.asarray(vals.real), jnp.asarray(vals.imag), scale,
        max_abs=float(np.max(np.abs(vals))))
    np.testing.assert_array_equal(np.asarray(dev_plain.data),
                                  np.asarray(host_plain.data))
