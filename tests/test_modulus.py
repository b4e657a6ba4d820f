"""Modulus type + factory tests, mirroring the reference's modulus suite
(reference: test/modulus.cpp — Barrett const_ratio, CoeffModulus factories,
security-level tables; src/modulus.h:16-553, hestdparams.h)."""

import numpy as np
import pytest

from troy_tpu.modulus import (Modulus, CoeffModulus, PlainModulus,
                              SecurityLevel)
from troy_tpu.utils import numth


def test_zero_modulus():
    m = Modulus(0)
    assert m.is_zero()
    assert m.bit_count == 0
    assert m.const_ratio == (0, 0, 0)
    with pytest.raises(ValueError):
        m.reduce(5)


def test_const_ratio_matches_bigint():
    for v in [3, 17, 0x10001, 0xFFFFEE001, (1 << 61) - 1]:
        m = Modulus(v)
        ratio, rem = divmod(1 << 128, v)
        assert m.const_ratio == (ratio & ((1 << 64) - 1), ratio >> 64, rem)
        assert m.bit_count == v.bit_length()


def test_modulus_range_enforced():
    with pytest.raises(ValueError):
        Modulus(1)
    with pytest.raises(ValueError):
        Modulus(1 << 61)          # > 61-bit limit (SEAL_MOD_BIT_COUNT_MAX)
    Modulus((1 << 61) - 1)        # largest allowed


def test_reduce_and_equality():
    m = Modulus(97)
    assert m.reduce(0) == 0
    assert m.reduce(96) == 96
    assert m.reduce(97) == 0
    assert m.reduce(10**18) == 10**18 % 97
    assert m == 97 and m == Modulus(97) and m != Modulus(89)


def test_is_prime_flag_and_callable():
    assert Modulus(97).is_prime
    assert Modulus(97).is_prime()          # reference-style method call too
    assert not Modulus(91).is_prime()


def test_coeff_modulus_create():
    n = 4096
    mods = CoeffModulus.create(n, [40, 40, 41])
    assert [m.bit_count for m in mods] == [40, 40, 41]
    assert len({int(m) for m in mods}) == 3
    for m in mods:
        assert int(m) % (2 * n) == 1
        assert m.is_prime


def test_coeff_modulus_bfv_default_respects_budget():
    for sec in (SecurityLevel.tc128, SecurityLevel.tc192,
                SecurityLevel.tc256):
        for n in (2048, 4096, 8192, 16384):
            mods = CoeffModulus.bfv_default(n, sec)
            total = sum(m.bit_count for m in mods)
            assert total <= CoeffModulus.max_bit_count(n, sec)


def test_max_bit_count_tables():
    # HE-standard budgets (hestdparams.h): spot-check known values
    assert CoeffModulus.max_bit_count(4096, SecurityLevel.tc128) == 109
    assert CoeffModulus.max_bit_count(8192, SecurityLevel.tc128) == 218
    assert CoeffModulus.max_bit_count(8192, SecurityLevel.tc192) == 152
    assert CoeffModulus.max_bit_count(8192, SecurityLevel.tc256) == 118
    assert CoeffModulus.max_bit_count(4096, SecurityLevel.none) > 10**4


def test_plain_modulus_batching():
    n = 8192
    t = PlainModulus.batching(n, 20)
    assert int(t) % (2 * n) == 1
    assert t.bit_count == 20
    many = PlainModulus.batching_many(n, [20, 20, 21])
    assert len({int(m) for m in many}) == 3
    for m in many:
        assert int(m) % (2 * n) == 1


def test_create_distinct_from_plain_modulus():
    """CoeffModulus.create avoiding collision with existing primes: the
    factories must hand out fresh primes on repeated same-size requests."""
    n = 4096
    a = CoeffModulus.create(n, [30, 30])
    b = CoeffModulus.create(n, [30, 30])
    assert {int(m) for m in a} == {int(m) for m in b}  # deterministic
    four = CoeffModulus.create(n, [30, 30, 30, 30])
    assert len({int(m) for m in four}) == 4


def test_value_attribute_and_method():
    """The reference binder exposes value() as a method (binder.cu:169);
    troy_tpu's attribute answers both styles."""
    m = Modulus(97)
    assert m.value == 97
    assert m.value() == 97
    assert int(np.uint64(m.value)) == 97
