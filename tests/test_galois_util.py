"""Galois tool unit tests, mirroring the reference's galois suite
(reference: test/utils/galois.cpp — step/element mapping, coefficient-domain
automorphism with sign wrap, NTT-domain permutation tables;
src/utils/galois.h:16-118, galois_cuda.cu:139-208)."""

import numpy as np

import pytest

from troy_tpu.utils import galois as g
from troy_tpu.utils import numth
from troy_tpu.utils.ntt_tables import make_ntt_tables, naive_negacyclic_ntt


N = 32
M = 2 * N


def naive_automorphism(coeffs, elt, q):
    """x -> x^elt applied directly: coeff i of the input contributes
    (+/-) to coeff (i*elt mod 2n) with negacyclic wrap."""
    out = [0] * N
    for i, c in enumerate(coeffs):
        raw = (i * elt) % M
        if raw < N:
            out[raw] = (out[raw] + int(c)) % q
        else:
            out[raw - N] = (out[raw - N] - int(c)) % q
    return np.array(out, dtype=np.uint64)


def test_elt_from_step():
    assert g.get_elt_from_step(N, 0) == M - 1            # conjugation
    assert g.get_elt_from_step(N, 1) == 3                # generator
    assert g.get_elt_from_step(N, 2) == 9
    # negative step uses the inverse orbit: 3^(n/2 - s) mod 2n
    assert g.get_elt_from_step(N, -1) == pow(3, N // 2 - 1, M)
    with pytest.raises(ValueError):
        g.get_elt_from_step(N, N // 2)


def test_elts_all_has_conjugation_and_powers_of_two():
    elts = g.get_elts_all(N)
    assert elts[0] == M - 1
    step = 1
    while step <= N // 4:
        assert g.get_elt_from_step(N, step) in elts
        assert g.get_elt_from_step(N, -step) in elts
        step *= 2
    assert all(e % 2 == 1 for e in elts)


def test_coeff_permutation_matches_naive():
    q = numth.get_prime(M, 20)
    rng = np.random.default_rng(3)
    coeffs = rng.integers(0, q, size=N, dtype=np.uint64)
    for elt in (3, 9, 15, M - 1, 2 * N - 1):
        src, keep = g.coeff_permutation(N, elt)
        gathered = coeffs[src].astype(object)
        got = np.where(keep, gathered, (q - gathered) % q).astype(np.uint64)
        np.testing.assert_array_equal(got, naive_automorphism(coeffs, elt, q))


def test_coeff_permutation_rejects_even_elt():
    with pytest.raises(ValueError):
        g.coeff_permutation(N, 4)


def test_ntt_permutation_consistent_with_coeff_domain():
    """Applying the automorphism in the NTT domain through the permutation
    table must equal NTT(coeff-domain automorphism) (galois_cuda.cu:181)."""
    q = numth.get_prime(M, 20)
    tables = make_ntt_tables(N, q)
    rng = np.random.default_rng(5)
    coeffs = rng.integers(0, q, size=N, dtype=np.uint64)
    ref_ntt = naive_negacyclic_ntt(coeffs, tables)
    for elt in (3, 9, M - 1):
        perm = g.ntt_permutation(N, elt)
        got = ref_ntt[perm]
        want = naive_negacyclic_ntt(naive_automorphism(coeffs, elt, q),
                                    tables)
        np.testing.assert_array_equal(got, want)


def test_permutations_are_bijections():
    for elt in (3, 9, 15, M - 1):
        src, _ = g.coeff_permutation(N, elt)
        assert sorted(src.tolist()) == list(range(N))
        perm = g.ntt_permutation(N, elt)
        assert sorted(perm.tolist()) == list(range(N))


def test_composition_of_steps():
    """rot(a) then rot(b) == rot(a+b) at the element level:
    3^a * 3^b = 3^(a+b) mod 2n."""
    a, b = 3, 5
    ea, eb = g.get_elt_from_step(N, a), g.get_elt_from_step(N, b)
    eab = g.get_elt_from_step(N, a + b)
    assert (ea * eb) % M == eab
