"""MXU 4-step NTT must be bit-identical to the butterfly-network NTT."""

import numpy as np
import pytest

import jax.numpy as jnp

from troy_tpu.utils.ntt_tables import make_ntt_tables
from troy_tpu.ops import ntt as dntt
from troy_tpu.ops import ntt_mxu
from troy_tpu.utils import numth


@pytest.mark.parametrize("n,bits", [(64, 30), (256, 50), (1024, 60)])
def test_forward_matches_butterfly(n, bits):
    q = numth.get_prime(2 * n, bits)
    ref = dntt.NttTables.from_host(make_ntt_tables(n, q))
    mxu = ntt_mxu.make_mxu_tables(n, q)
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.integers(0, q, (3, n), dtype=np.uint64))
    expect = np.asarray(dntt.ntt_forward(x, ref))
    got = np.asarray(ntt_mxu.ntt_forward_mxu(x, mxu))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("n,bits", [(64, 30), (256, 50), (1024, 60)])
def test_inverse_matches_butterfly(n, bits):
    q = numth.get_prime(2 * n, bits)
    ref = dntt.NttTables.from_host(make_ntt_tables(n, q))
    mxu = ntt_mxu.make_mxu_tables(n, q)
    rng = np.random.default_rng(n + 1)
    x = jnp.asarray(rng.integers(0, q, (2, n), dtype=np.uint64))
    expect = np.asarray(dntt.ntt_inverse(x, ref))
    got = np.asarray(ntt_mxu.ntt_inverse_mxu(x, mxu))
    np.testing.assert_array_equal(got, expect)


def test_roundtrip_large():
    n, bits = 4096, 55
    q = numth.get_prime(2 * n, bits)
    mxu = ntt_mxu.make_mxu_tables(n, q)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, q, (n,), dtype=np.uint64))
    y = ntt_mxu.ntt_forward_mxu(x, mxu)
    back = np.asarray(ntt_mxu.ntt_inverse_mxu(y, mxu))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_roundtrip_wide_factor():
    """A = B = 256 (n = 65536): exercises the statically-derived signed
    group-accumulator offset in _mod_matmul at a larger contraction
    length than the headline's 128 (the N-ceiling regime runs 512)."""
    n, bits = 65536, 60
    q = numth.get_prime(2 * n, bits)
    mxu = ntt_mxu.make_mxu_tables(n, q)
    assert mxu.a == mxu.b == 256
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(0, q, (n,), dtype=np.uint64))
    y = ntt_mxu.ntt_forward_mxu(x, mxu)
    back = np.asarray(ntt_mxu.ntt_inverse_mxu(y, mxu))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_ndigits_bound_tight():
    """The per-modulus byte-plane count must hold for the WORST residue
    (q-1) at every standard prime width — the biased decomposition asserts
    internally if a value needs an extra plane — and reconstruct exactly
    with the +128 bias."""
    from troy_tpu.ops.ntt_mxu import _ndigits, _biased_digits_host
    import troy_tpu as T
    for bits in (30, 36, 40, 48, 50, 55, 59, 60):
        q = int(T.CoeffModulus.create(4096, [bits])[0])
        nd = _ndigits(q)
        assert nd == (bits + 7) // 8
        worst = np.array([[q - 1, q // 2, 1, 0]], dtype=np.uint64)
        planes = _biased_digits_host(worst, nd)   # asserts on overflow
        for col, v in enumerate((q - 1, q // 2, 1, 0)):
            rec = sum((int(planes[p, 0, col]) + 128) * (1 << (8 * p))
                      for p in range(nd))
            assert rec == v
        # the count is minimal (one fewer plane must fail for max values)
        if nd > 1:
            import pytest
            with pytest.raises(AssertionError):
                _biased_digits_host(np.array([[q - 1]], dtype=np.uint64),
                                    nd - 1)
