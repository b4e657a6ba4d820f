"""NTT round-trip and convolution tests against O(n^2) oracles.

Mirror of reference test/utils/ntt.cpp (round-trips vs naive transform).
"""

import numpy as np
import pytest

import troy_tpu  # noqa: F401
import jax.numpy as jnp
from troy_tpu.utils import ntt_tables as nt
from troy_tpu.ops import ntt as dntt

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("n", [8, 32])
def test_tables_root_is_primitive(n):
    # use an NTT-friendly prime for each n
    from troy_tpu.utils import numth
    q = numth.get_prime(2 * n, 30)
    t = nt.make_ntt_tables(n, q)
    assert pow(t.root, n, q) == q - 1          # psi^n = -1 (negacyclic)
    assert (t.root * t.inv_root) % q == 1
    assert (t.inv_degree * n) % q == 1


@pytest.mark.parametrize("n", [4, 64, 256])
@pytest.mark.parametrize("bits", [20, 60])
def test_forward_matches_naive(n, bits):
    from troy_tpu.utils import numth
    q = numth.get_prime(2 * n, bits)
    t = nt.make_ntt_tables(n, q)
    dt = dntt.NttTables.from_host(t)
    x = RNG.integers(0, q, size=n, dtype=np.uint64)
    got = np.asarray(dntt.ntt_forward(jnp.asarray(x), dt))
    want = nt.naive_negacyclic_ntt(x, t)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [64, 4096])
@pytest.mark.parametrize("bits", [30, 60])
def test_roundtrip(n, bits):
    from troy_tpu.utils import numth
    q = numth.get_prime(2 * n, bits)
    t = nt.make_ntt_tables(n, q)
    dt = dntt.NttTables.from_host(t)
    x = RNG.integers(0, q, size=(3, n), dtype=np.uint64)
    fwd = dntt.ntt_forward(jnp.asarray(x), dt)
    assert (np.asarray(fwd) < q).all()
    back = np.asarray(dntt.ntt_inverse(fwd, dt))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("n", [8, 128])
def test_negacyclic_mul_matches_naive(n):
    from troy_tpu.utils import numth
    q = numth.get_prime(2 * n, 40)
    t = nt.make_ntt_tables(n, q)
    dt = dntt.NttTables.from_host(t)
    a = RNG.integers(0, q, size=n, dtype=np.uint64)
    b = RNG.integers(0, q, size=n, dtype=np.uint64)
    got = np.asarray(dntt.negacyclic_mul(jnp.asarray(a), jnp.asarray(b), dt))
    want = nt.naive_negacyclic_mul(a, b, n, q)
    np.testing.assert_array_equal(got, want)


def test_lazy_bounds():
    from troy_tpu.utils import numth
    n, q = 256, numth.get_prime(512, 59)
    t = nt.make_ntt_tables(n, q)
    dt = dntt.NttTables.from_host(t)
    x = RNG.integers(0, q, size=n, dtype=np.uint64)
    lazy = np.asarray(dntt.ntt_forward(jnp.asarray(x), dt, lazy=True))
    assert (lazy < 4 * q).all()
    full = np.asarray(dntt.ntt_forward(jnp.asarray(x), dt))
    np.testing.assert_array_equal(lazy % q, full)
