"""Pallas modmul kernels: bit-exact vs the u64ops oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from troy_tpu.ops import u64ops as u
from troy_tpu.ops.pallas import modmul as pk


QS = [1152921504606830593, 1099511480321, 576460752303415297]


def _rand(shape, bound, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, bound, shape, dtype=np.uint64)


def test_dyadic_mul_pallas_bit_exact():
    k, n = len(QS), 256
    q = np.array(QS, dtype=np.uint64)
    crs = [(1 << 128) // int(x) for x in QS]
    cr_lo = np.array([c & ((1 << 64) - 1) for c in crs], dtype=np.uint64)
    cr_hi = np.array([c >> 64 for c in crs], dtype=np.uint64)
    a = np.stack([_rand(n, int(x), 1 + i) for i, x in enumerate(QS)])
    b = np.stack([_rand(n, int(x), 9 + i) for i, x in enumerate(QS)])

    got = pk.dyadic_mul_pallas(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(q), jnp.asarray(cr_lo),
                               jnp.asarray(cr_hi), interpret=True)
    expect = (a.astype(object) * b.astype(object)) % q.astype(object)[:, None]
    assert np.array_equal(np.asarray(got).astype(object), expect)


def test_dyadic_mul_pallas_edge_values():
    """Max residues (q-1)^2 exercise every carry path."""
    k, n = len(QS), 128
    q = np.array(QS, dtype=np.uint64)
    crs = [(1 << 128) // int(x) for x in QS]
    cr_lo = np.array([c & ((1 << 64) - 1) for c in crs], dtype=np.uint64)
    cr_hi = np.array([c >> 64 for c in crs], dtype=np.uint64)
    a = np.stack([np.full(n, int(x) - 1, dtype=np.uint64) for x in QS])
    b = a.copy()
    got = pk.dyadic_mul_pallas(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(q), jnp.asarray(cr_lo),
                               jnp.asarray(cr_hi), interpret=True)
    expect = (a.astype(object) * b.astype(object)) % q.astype(object)[:, None]
    assert np.array_equal(np.asarray(got).astype(object), expect)


def test_shoup_mul_pallas_bit_exact():
    k, n = len(QS), 256
    q = np.array(QS, dtype=np.uint64)
    w = np.stack([_rand(n, int(x), 21 + i) for i, x in enumerate(QS)])
    wq = np.zeros((k, n), dtype=np.uint64)
    for i, x in enumerate(QS):
        for j in range(n):
            wq[i, j] = (int(w[i, j]) << 64) // int(x)
    x_in = np.stack([_rand(n, int(x), 31 + i) for i, x in enumerate(QS)])
    got = pk.shoup_mul_pallas(jnp.asarray(x_in), jnp.asarray(w),
                              jnp.asarray(wq), jnp.asarray(q),
                              interpret=True)
    expect = (x_in.astype(object) * w.astype(object)) \
        % q.astype(object)[:, None]
    assert np.array_equal(np.asarray(got).astype(object), expect)
