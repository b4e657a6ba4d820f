"""PRNG-stream tests: determinism, block structure, factory behavior,
and sampler distributions.

Mirrors the reference's randomgen layer behaviors (reference:
src/utils/randomgen.h:24-617 — buffered 4 KiB refills, 512-bit seeds,
blake2xb and shake256 stream types, seeded reproducibility).
"""

import numpy as np
import pytest

from troy_tpu import prng as rnd


def test_seed_size_enforced():
    with pytest.raises(ValueError):
        rnd.UniformRandomGenerator(b"short")


def test_same_seed_same_stream():
    s = rnd.seed_from_uint64(1, 2, 3)
    g1 = rnd.UniformRandomGenerator(s)
    g2 = rnd.UniformRandomGenerator(s)
    assert g1.generate(10000) == g2.generate(10000)


def test_stream_is_stateful_and_block_aligned():
    """Reading 100 bytes then 100 more equals reading 200 at once — the
    buffered refill must be transparent (randomgen.h:309-388)."""
    s = rnd.seed_from_uint64(99)
    g1 = rnd.UniformRandomGenerator(s)
    g2 = rnd.UniformRandomGenerator(s)
    a = g1.generate(100) + g1.generate(100) + g1.generate(5000)
    b = g2.generate(5200)
    assert a == b


def test_blake2xb_and_shake256_differ():
    s = rnd.seed_from_uint64(7)
    g1 = rnd.UniformRandomGenerator(s, rnd.PrngType.blake2xb)
    g2 = rnd.UniformRandomGenerator(s, rnd.PrngType.shake256)
    assert g1.generate(64) != g2.generate(64)


def test_factory_default_seed_reproducible():
    f = rnd.RandomGeneratorFactory(default_seed=rnd.seed_from_uint64(5))
    assert not f.use_random_seed()
    assert f.create().generate(256) == f.create().generate(256)
    f2 = rnd.RandomGeneratorFactory()
    assert f2.use_random_seed()
    assert f2.create().generate(256) != f2.create().generate(256)


def test_ternary_sampler_range_and_balance():
    g = rnd.UniformRandomGenerator(rnd.seed_from_uint64(11))
    v = rnd.sample_poly_ternary(g, 4096)
    assert set(np.unique(v)) <= {-1, 0, 1}
    # each value ~1/3 of draws
    for x in (-1, 0, 1):
        assert 0.25 < np.mean(v == x) < 0.42


def test_cbd_sampler_sigma():
    g = rnd.UniformRandomGenerator(rnd.seed_from_uint64(12))
    v = rnd.sample_poly_cbd(g, 1 << 14)
    # Var = 2 * 21 / 4 = 10.5 -> sigma ~= 3.24 (globals.h:31 sigma 3.2)
    assert abs(v.mean()) < 0.2
    assert 3.0 < v.std() < 3.5


def test_uniform_sampler_in_range():
    g = rnd.UniformRandomGenerator(rnd.seed_from_uint64(13))
    moduli = [(1 << 30) - 35, (1 << 40) - 87]
    out = rnd.sample_poly_uniform(g, 2048, moduli)
    assert out.shape == (2, 2048)
    for i, q in enumerate(moduli):
        assert out[i].max() < q
        # roughly uniform: mean near q/2
        assert 0.4 * q < out[i].mean() < 0.6 * q


def test_device_samplers_deterministic():
    """The device threefry samplers (rlwe.py) must be reproducible from
    the same seed — the property seed-compressed ciphertexts rely on."""
    import jax
    from troy_tpu import rlwe

    key = jax.random.PRNGKey(np.uint64(42))
    a = np.asarray(rlwe.sample_cbd_dev(key, 512))
    b = np.asarray(rlwe.sample_cbd_dev(jax.random.PRNGKey(np.uint64(42)), 512))
    np.testing.assert_array_equal(a, b)
    t1 = np.asarray(rlwe.sample_ternary_dev(key, 512))
    assert set(np.unique(t1)) <= {-1, 0, 1}
