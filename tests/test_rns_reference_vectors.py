"""BEHZ RNS-tool op parity against the reference's own RNSTool
(tests/data/ref_rnstool_ops.txt, produced by running the compiled
reference's fastbconvmTilde / smMrq / fastFloor / fastbconvSk /
decryptScaleAndRound / divideAndRoundqLastInplace on deterministic
inputs; generator kept alongside). Pins ops/rns.py word-for-word against
reference rns.cpp (BEHZ bases with m_tilde = 2^32 and the gamma-corrected
t/q scaling)."""

import pathlib

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu.ops import rns as drns

N = 64
DATA = pathlib.Path(__file__).parent / "data" / "ref_rnstool_ops.txt"


@pytest.fixture(scope="module")
def env():
    vecs = {}
    sizes = None
    for line in DATA.read_text().splitlines():
        parts = line.split()
        if parts[0] == "sizes":
            sizes = tuple(int(x) for x in parts[1:])
        else:
            vecs[parts[0]] = np.array(parts[2:2 + int(parts[1])],
                                      dtype=np.uint64)
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [40, 40, 40])),
        plain_modulus=T.PlainModulus.batching(N, 17))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    cd = ctx.first_context_data
    return vecs, sizes, cd


def test_base_sizes_match(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    tool = cd.rns_tool
    assert cd.limbs == k
    assert len(tool.base_Bsk.values) == k_bsk
    assert len(tool.base_Bsk_m_tilde.values) == k_bskm


def test_fastbconv_m_tilde(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    got = drns.fastbconv_m_tilde(vecs["inq"].reshape(k, N), cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got),
                                  vecs["bconv_mtilde"].reshape(k_bskm, N))


def test_sm_mrq(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    got = drns.sm_mrq(vecs["bconv_mtilde"].reshape(k_bskm, N), cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got),
                                  vecs["sm_mrq"].reshape(k_bsk, N))


def test_fast_floor(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    stacked = np.concatenate([vecs["inq"].reshape(k, N),
                              vecs["sm_mrq"].reshape(k_bsk, N)])
    got = drns.fast_floor(stacked, cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got),
                                  vecs["fast_floor"].reshape(k_bsk, N))


def test_fastbconv_sk(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    got = drns.fastbconv_sk(vecs["fast_floor"].reshape(k_bsk, N),
                            cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got),
                                  vecs["bconv_sk"].reshape(k, N))


def test_decrypt_scale_and_round(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    got = drns.decrypt_scale_and_round(vecs["inq"].reshape(k, N),
                                       cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got), vecs["scale_round"])


def test_divide_and_round_q_last(env):
    vecs, (k, k_bsk, k_bskm), cd = env
    got = drns.divide_and_round_q_last(vecs["inq"].reshape(k, N),
                                       cd.rns_tool)
    np.testing.assert_array_equal(np.asarray(got),
                                  vecs["div_round_qlast"].reshape(k - 1, N))
