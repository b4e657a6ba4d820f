"""Context-chain and parameter-validation tests.

Mirrors the reference's context test layer (reference: test/context.cpp,
test/encryptionparams.cpp — chain structure, qualifiers, ParmsID behavior,
parameter rejection).
"""

import pytest

import troy_tpu as T
from troy_tpu.modulus import he_std_max_coeff_bits
from troy_tpu.params import validate


N = 64
T_BITS = 17
Q_BITS = (40, 40, 40)


def make_parms(n=N, t_bits=T_BITS, q_bits=Q_BITS, scheme=T.SchemeType.bfv):
    kwargs = {}
    if scheme != T.SchemeType.ckks:
        kwargs["plain_modulus"] = T.PlainModulus.batching(n, t_bits)
    return T.EncryptionParameters(
        scheme=scheme, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, list(q_bits))),
        **kwargs)


@pytest.fixture(scope="module")
def ctx():
    return T.HeContext(make_parms(), sec_level=T.SecurityLevel.none)


# ---- chain structure (context.h:413-435) ----

def test_chain_levels_drop_one_prime_each(ctx):
    assert len(ctx.chain) == len(Q_BITS)
    for i, cd in enumerate(ctx.chain):
        assert cd.chain_index == i
        assert cd.limbs == len(Q_BITS) - i
    # key level holds the full modulus; data levels are strict prefixes
    key_values = ctx.key_context_data.coeff_values
    for i, cd in enumerate(ctx.chain):
        assert cd.coeff_values == key_values[:len(Q_BITS) - i]


def test_first_last_levels(ctx):
    assert ctx.using_keyswitching
    assert ctx.first_level == 1
    assert ctx.last_level == len(Q_BITS) - 1
    assert ctx.first_context_data is ctx.chain[1]
    assert ctx.last_context_data is ctx.chain[-1]
    assert ctx.last_context_data.limbs == 1


def test_parms_id_distinct_per_level_and_lookup(ctx):
    pids = [cd.parms_id for cd in ctx.chain]
    assert len(set(pids)) == len(pids)
    for cd in ctx.chain:
        assert ctx.get_context_data_by_parms_id(cd.parms_id) is cd
    assert ctx.get_context_data_by_parms_id(b"\x00" * 32) is None


def test_expand_mod_chain_false_stops_after_first_data_level():
    ctx2 = T.HeContext(make_parms(), expand_mod_chain=False,
                       sec_level=T.SecurityLevel.none)
    assert len(ctx2.chain) == 2  # key level + one data level only


def test_single_prime_context_has_no_keyswitching():
    parms = make_parms(q_bits=(40,))
    ctx1 = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    assert not ctx1.using_keyswitching
    assert ctx1.first_level == 0
    assert ctx1.first_context_data is ctx1.key_context_data


# ---- qualifiers (context.h:22-199) ----

def test_qualifiers_batching_and_fast_plain_lift(ctx):
    q = ctx.key_context_data.qualifiers
    assert q.parameters_set and q.using_ntt and q.using_fft
    assert q.using_batching              # t = 1 mod 2n by construction
    assert q.using_fast_plain_lift       # every 40-bit q_i > 17-bit t


def test_qualifiers_no_fast_plain_lift_when_t_exceeds_some_prime():
    n = 64
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, [30, 30])),
        plain_modulus=T.PlainModulus.batching(n, 35))
    q = validate(parms, T.SecurityLevel.none)
    assert q.parameters_set
    assert not q.using_fast_plain_lift


def test_descending_modulus_chain_flag():
    n = 64
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=n,
        coeff_modulus=tuple(T.CoeffModulus.create(n, [40, 30])),
        plain_modulus=T.PlainModulus.batching(n, 17))
    assert validate(parms,
                    T.SecurityLevel.none).using_descending_modulus_chain


# ---- rejection paths (context.cpp validate analogues) ----

def test_rejects_non_power_of_two_degree():
    with pytest.raises(Exception):
        T.EncryptionParameters(
            scheme=T.SchemeType.bfv, poly_modulus_degree=96,
            coeff_modulus=tuple(T.CoeffModulus.create(64, [40])),
            plain_modulus=T.PlainModulus.batching(64, 17))
        # validation happens at context construction
        T.HeContext(T.EncryptionParameters(
            scheme=T.SchemeType.bfv, poly_modulus_degree=96,
            coeff_modulus=tuple(T.CoeffModulus.create(64, [40])),
            plain_modulus=T.PlainModulus.batching(64, 17)),
            sec_level=T.SecurityLevel.none)


def test_rejects_non_ntt_friendly_prime():
    # 97 is prime but 97 % 128 != 1
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=64,
        coeff_modulus=(T.Modulus(97),),
        plain_modulus=T.PlainModulus.batching(64, 17))
    q = validate(parms, T.SecurityLevel.none)
    assert not q.parameters_set
    with pytest.raises(ValueError):
        T.HeContext(parms, sec_level=T.SecurityLevel.none)


def test_rejects_unset_plain_modulus_for_bfv():
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=64,
        coeff_modulus=tuple(T.CoeffModulus.create(64, [40])))
    assert not validate(parms, T.SecurityLevel.none).parameters_set


def test_rejects_ckks_with_plain_modulus():
    with pytest.raises(ValueError):
        T.EncryptionParameters(
            scheme=T.SchemeType.ckks, poly_modulus_degree=64,
            coeff_modulus=tuple(T.CoeffModulus.create(64, [40])),
            plain_modulus=T.PlainModulus.batching(64, 17))


def test_security_level_enforced_for_tiny_degree():
    # n=64 with 120 bits of modulus is far beyond any HE-std budget
    parms = make_parms()
    with pytest.raises(ValueError):
        T.HeContext(parms, sec_level=T.SecurityLevel.tc128)


def test_security_level_allows_conforming_parameters():
    # n=4096 tc128 budget is 109 bits (hestdparams.h analogue)
    assert he_std_max_coeff_bits(4096, T.SecurityLevel.tc128) == 109
    assert he_std_max_coeff_bits(8192, T.SecurityLevel.tc128) == 218
    assert he_std_max_coeff_bits(4096, T.SecurityLevel.tc192) == 75
    assert he_std_max_coeff_bits(4096, T.SecurityLevel.tc256) == 58


def test_parms_id_sensitivity():
    base = make_parms()
    assert base.parms_id == make_parms().parms_id
    assert base.parms_id != base.drop_last().parms_id
    assert base.parms_id != make_parms(t_bits=16).parms_id
    bgv = T.EncryptionParameters(
        scheme=T.SchemeType.bgv, poly_modulus_degree=N,
        coeff_modulus=base.coeff_modulus, plain_modulus=base.plain_modulus)
    assert base.parms_id != bgv.parms_id


def test_rebuild_reuses_device_tables():
    """A context rebuilt with the same params must be a pure cache hit:
    the stacked NTT tables are uploaded once per (n, base) and shared by
    identical rebuilds (round-4 fix — per-level device-side jnp.stack
    used to cost one XLA mini-compile per (limbs, n) shape;
    ops/ntt.py _stacked_tables_dev)."""
    parms = make_parms()
    ctx1 = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    ctx2 = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    for cd1, cd2 in zip(ctx1.chain, ctx2.chain):
        assert cd1.ntt.root_powers is cd2.ntt.root_powers
        assert cd1.ntt.inv_root_powers_shoup is cd2.ntt.inv_root_powers_shoup
        if cd1.bsk_ntt is not None:
            assert cd1.bsk_ntt.root_powers is cd2.bsk_ntt.root_powers
