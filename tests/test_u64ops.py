"""Unit tests for the uint64 modular-arithmetic primitives.

Mirror of the reference's math-util test layer
(reference: test/utils/uintarithsmallmod.cpp) — random cross-checks against
Python big-int arithmetic.
"""

import numpy as np
import pytest

import troy_tpu  # noqa: F401  (sets jax_enable_x64)
import jax.numpy as jnp
from troy_tpu.ops import u64ops as u
from troy_tpu.modulus import Modulus

RNG = np.random.default_rng(42)


def rand_u64(shape, bound=None):
    hi = (1 << 64) if bound is None else bound
    return RNG.integers(0, hi, size=shape, dtype=np.uint64)


MODULI = [3, 0x10001, 0x1FFFFFFF68001, 0x7FFFFFFFE90001]


@pytest.mark.parametrize("q", MODULI)
def test_mul_mod_barrett(q):
    m = Modulus(q)
    a = rand_u64((128,), q)
    b = rand_u64((128,), q)
    got = np.asarray(u.mul_mod(jnp.asarray(a), jnp.asarray(b), q, m.const_ratio))
    want = np.array([(int(x) * int(y)) % q for x, y in zip(a, b)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_mulhi64_and_mul128():
    a = rand_u64((256,))
    b = rand_u64((256,))
    hi = np.asarray(u.mulhi64(jnp.asarray(a), jnp.asarray(b)))
    lo, hi2 = u.mul128(jnp.asarray(a), jnp.asarray(b))
    lo, hi2 = np.asarray(lo), np.asarray(hi2)
    for i in range(256):
        full = int(a[i]) * int(b[i])
        assert int(hi[i]) == full >> 64
        assert int(hi2[i]) == full >> 64
        assert int(lo[i]) == full & ((1 << 64) - 1)


@pytest.mark.parametrize("q", MODULI)
def test_add_sub_neg_mod(q):
    a = rand_u64((64,), q)
    b = rand_u64((64,), q)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    np.testing.assert_array_equal(
        np.asarray(u.add_mod(ja, jb, q)),
        np.array([(int(x) + int(y)) % q for x, y in zip(a, b)], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(u.sub_mod(ja, jb, q)),
        np.array([(int(x) - int(y)) % q for x, y in zip(a, b)], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(u.neg_mod(ja, q)),
        np.array([(-int(x)) % q for x in a], dtype=np.uint64))


@pytest.mark.parametrize("q", [0x10001, 0x1FFFFFFF68001])
def test_barrett_reduce_64(q):
    m = Modulus(q)
    a = rand_u64((128,))
    got = np.asarray(u.barrett_reduce_64(jnp.asarray(a), q, m.const_ratio[1]))
    want = np.array([int(x) % q for x in a], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", [0x10001, 0x1FFFFFFF68001])
def test_barrett_reduce_128(q):
    m = Modulus(q)
    lo = rand_u64((128,))
    hi = rand_u64((128,))
    got = np.asarray(u.barrett_reduce_128(jnp.asarray(lo), jnp.asarray(hi), q, m.const_ratio))
    want = np.array([((int(h) << 64) | int(l)) % q for l, h in zip(lo, hi)],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("q", [0x10001, 0x7FFFFFFFE90001])
def test_shoup_mul(q):
    w = rand_u64((64,), q)
    wq = np.array([(int(x) << 64) // q for x in w], dtype=np.uint64)
    x = rand_u64((64,))
    got = np.asarray(u.mul_mod_shoup(jnp.asarray(x), jnp.asarray(w), jnp.asarray(wq), q))
    want = np.array([(int(a) * int(b)) % q for a, b in zip(x, w)], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    lazy = np.asarray(u.mul_mod_shoup_lazy(jnp.asarray(x), jnp.asarray(w), jnp.asarray(wq), q))
    assert (lazy < 2 * q).all()
    np.testing.assert_array_equal(lazy % q, want)


def test_modulus_const_ratio():
    # cross-check the 3-word Barrett ratio layout against big-int division
    m = Modulus(0x1FFFFFFF68001)
    ratio = (m.const_ratio[1] << 64) | m.const_ratio[0]
    assert ratio == (1 << 128) // 0x1FFFFFFF68001
    assert m.const_ratio[2] == (1 << 128) % 0x1FFFFFFF68001
    assert m.is_prime and m.bit_count == 49
