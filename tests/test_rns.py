"""RNS base-conversion and BEHZ tool tests against Python big-int oracles.

Mirror of reference test/utils/rns.cpp (decompose/compose/convert + tool ops).
"""

import numpy as np
import pytest

import troy_tpu  # noqa: F401
import jax.numpy as jnp
from troy_tpu.modulus import Modulus
from troy_tpu.utils.rns import RnsBase, BaseConverter, make_rns_tool
from troy_tpu.utils import numth
from troy_tpu.ops import rns as drns

RNG = np.random.default_rng(11)
N = 8


def make_base(n, bits, count, offset=0):
    primes = numth.get_primes(2 * n, bits, count + offset)[offset:]
    return RnsBase(tuple(Modulus(p) for p in primes))


def rand_residues(base, n):
    return np.stack([RNG.integers(0, v, size=n, dtype=np.uint64)
                     for v in base.values])


@pytest.fixture(scope="module")
def tool():
    # BFV-ish setup: 3-limb q, plain modulus t
    q = make_base(N, 50, 3)
    t = numth.get_prime(2 * N, 20)
    return make_rns_tool(N, q.values, t)


def test_base_compose_decompose():
    base = make_base(N, 40, 3)
    xs = [int(RNG.integers(0, 1 << 60)) for _ in range(5)]
    for x in xs:
        assert base.compose(base.decompose(x)) == x % base.base_prod


def test_fast_convert_matches_oracle():
    ib = make_base(N, 50, 3)
    ob = make_base(N, 52, 2)
    conv = BaseConverter(ib, ob)
    x = rand_residues(ib, N)
    got = np.asarray(drns.fast_convert(jnp.asarray(x), conv))
    for j in range(N):
        want = conv.fast_convert_int(tuple(int(x[i][j]) for i in range(3)))
        assert tuple(int(got[o][j]) for o in range(2)) == want


def test_exact_convert_exact_mod_t():
    ib = make_base(N, 50, 3)
    t = numth.get_prime(2 * N, 20)
    conv = BaseConverter(ib, RnsBase((Modulus(t),)))
    Q = ib.base_prod
    xs = [int(RNG.integers(0, 1 << 63)) * int(RNG.integers(0, 1 << 63)) % Q
          for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in ib.values])
    got = np.asarray(drns.exact_convert(jnp.asarray(x), conv))[0]
    want = np.array([xv % t for xv in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_m_tilde_montgomery_roundtrip(tool):
    # fastbconv_m_tilde followed by sm_mrq must give exactly x mod Bsk
    q = tool.base_q
    xs = [int(RNG.integers(0, 1 << 63)) % q.base_prod for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in q.values])
    lifted = drns.fastbconv_m_tilde(jnp.asarray(x), tool)
    got = np.asarray(drns.sm_mrq(lifted, tool))
    for i, b in enumerate(tool.base_Bsk.values):
        want = np.array([xv % b for xv in xs], dtype=np.uint64)
        np.testing.assert_array_equal(got[i], want)


def test_fast_floor_multiple_of_q(tool):
    # For X divisible by Q the floor is exact
    q = tool.base_q
    Q = q.base_prod
    f_bound = min(tool.base_B.base_prod // 4, 1 << 80)
    fs = [int(RNG.integers(0, 1 << 62)) * int(RNG.integers(0, 1 << 62)) % f_bound
          for _ in range(N)]
    xs = [f * Q for f in fs]
    vals_in = list(q.values) + list(tool.base_Bsk.values)
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in vals_in])
    got = np.asarray(drns.fast_floor(jnp.asarray(x), tool))
    for i, b in enumerate(tool.base_Bsk.values):
        want = np.array([f % b for f in fs], dtype=np.uint64)
        np.testing.assert_array_equal(got[i], want)


def test_fastbconv_sk_exact_small(tool):
    # Shenoy-Kumaresan is exact for X < prod(B)
    B_prod = tool.base_B.base_prod
    xs = [int(RNG.integers(0, 1 << 62)) * int(RNG.integers(0, 1 << 62)) % B_prod
          for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in tool.base_Bsk.values])
    got = np.asarray(drns.fastbconv_sk(jnp.asarray(x), tool))
    for i, v in enumerate(tool.base_q.values):
        want = np.array([xv % v for xv in xs], dtype=np.uint64)
        np.testing.assert_array_equal(got[i], want)


def test_decrypt_scale_and_round(tool):
    # phase = Delta*m + e with small e must decode to m
    q = tool.base_q
    Q = q.base_prod
    t = tool.t
    delta = Q // t
    ms = [int(RNG.integers(0, t)) for _ in range(N)]
    es = [int(RNG.integers(0, 1 << 20)) - (1 << 19) for _ in range(N)]
    xs = [(m * delta + e) % Q for m, e in zip(ms, es)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in q.values])
    got = np.asarray(drns.decrypt_scale_and_round(jnp.asarray(x), tool))
    want = np.array([round(t * xv / Q) % t for xv in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, np.array(ms, dtype=np.uint64))


def test_decrypt_mod_t(tool):
    q = tool.base_q
    Q = q.base_prod
    xs = [int(RNG.integers(0, 1 << 63)) * 997 % Q for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in q.values])
    got = np.asarray(drns.decrypt_mod_t(jnp.asarray(x), tool))
    want = np.array([xv % tool.t for xv in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_divide_and_round_q_last(tool):
    q = tool.base_q
    Q = q.base_prod
    q_last = q.values[-1]
    xs = [int(RNG.integers(0, 1 << 63)) * 131 % Q for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in q.values])
    got = np.asarray(drns.divide_and_round_q_last(jnp.asarray(x), tool))
    for i, v in enumerate(q.values[:-1]):
        want = np.array([((xv + q_last // 2) // q_last) % v for xv in xs],
                        dtype=np.uint64)
        np.testing.assert_array_equal(got[i], want)


def test_mod_t_and_divide_q_last(tool):
    # BGV: output == floor(X/q_last) - c_t (mod q_i), where
    # c_t = -(X mod q_last) * q_last^{-1} mod t
    q = tool.base_q
    Q = q.base_prod
    t = tool.t
    q_last = q.values[-1]
    inv_q_last_t = numth.invert_mod(q_last % t, t)
    xs = [int(RNG.integers(0, 1 << 63)) * 7919 % Q for _ in range(N)]
    x = np.stack([np.array([xv % v for xv in xs], dtype=np.uint64)
                  for v in q.values])
    got = np.asarray(drns.mod_t_and_divide_q_last(jnp.asarray(x), tool))
    for i, v in enumerate(q.values[:-1]):
        want = []
        for xv in xs:
            c_t = (-(xv % q_last) * inv_q_last_t) % t
            want.append((xv // q_last - c_t) % v)
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))
