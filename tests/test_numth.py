"""Number-theory unit tests, mirroring the reference's numth suite
(reference: test/utils/numth.cpp — primality, prime generation, primitive
roots, NAF, xgcd/inverse; src/utils/numth.h:16-131)."""

import pytest

from troy_tpu.utils import numth


def test_is_prime_known_values():
    primes = [2, 3, 5, 17, 257, 65537, 0xFFFFEE001, 0xFFFFFFFD8001,
              0x7FFFFFFFE90001, (1 << 61) - 1]
    composites = [0, 1, 4, 9, 15, 91, 561, 0xFFFFEE000,
                  (1 << 61) - 2, 3 * ((1 << 40) + 1)]
    for p in primes:
        assert numth.is_prime(p), p
    for c in composites:
        assert not numth.is_prime(c), c


def test_get_primes_are_ntt_friendly():
    n = 4096
    primes = numth.get_primes(2 * n, 40, 4)
    assert len(primes) == 4
    assert len(set(primes)) == 4
    for p in primes:
        assert numth.is_prime(p)
        assert p % (2 * n) == 1           # NTT-friendly: p = 1 mod 2n
        assert p.bit_length() == 40


def test_get_primes_distinct_across_sizes():
    got = numth.get_primes(8192, 30, 2) + numth.get_primes(8192, 31, 2)
    assert len(set(got)) == 4


def test_get_prime_single():
    p = numth.get_prime(2048, 20)
    assert numth.is_prime(p) and p % 2048 == 1 and p.bit_length() == 20


def test_xgcd_identity():
    for x, y in [(7, 7), (2, 2), (1, 1), (x := 4565, 8757), (1 << 60, 3)]:
        g, a, b = numth.xgcd(x, y)
        assert a * x + b * y == g


def test_invert_mod():
    for v, m in [(1, 2), (3, 2), (0xFFFFFF, 2), (5, 19), (4, 19),
                 (123456789, (1 << 61) - 1)]:
        inv = numth.invert_mod(v, m)
        assert (v * inv) % m == 1


def test_invert_mod_non_invertible():
    ok, _ = numth.try_invert_mod(2, 2)
    assert not ok
    with pytest.raises(ValueError):
        numth.invert_mod(4, 8)


def test_primitive_roots_order_and_minimality():
    # q = 1 mod 2n allows a 2n-th root of unity
    n, q = 1024, numth.get_prime(2048, 30)
    root = numth.minimal_primitive_root(2 * n, q)
    assert numth.is_primitive_root(root, 2 * n, q)
    assert pow(root, 2 * n, q) == 1
    assert pow(root, n, q) == q - 1       # exact order 2n, not n
    # minimality: root is the smallest generator of the orbit
    ok, some = numth.try_primitive_root(2 * n, q, seed=7)
    assert ok
    # every generator is root^odd; the minimal one is <= any sampled one
    assert root <= some


def test_naf_reconstructs_and_is_sparse():
    for v in [1, 2, 3, 7, 15, 23, 31, 255, 0b1011011, 12345]:
        parts = numth.naf(v)
        assert sum(parts) == v
        # non-adjacent form: all parts are +-2^i with distinct exponents
        exps = sorted(abs(p).bit_length() - 1 for p in parts)
        assert len(set(exps)) == len(exps)


def test_reverse_bits():
    assert numth.reverse_bits(0b0011, 4) == 0b1100
    assert numth.reverse_bits(1, 10) == 512
    for v in range(16):
        assert numth.reverse_bits(numth.reverse_bits(v, 4), 4) == v


def test_get_power_of_two():
    assert numth.get_power_of_two(1) == 0
    assert numth.get_power_of_two(65536) == 16
    assert numth.get_power_of_two(3) == -1
    assert numth.get_power_of_two(0) == -1
