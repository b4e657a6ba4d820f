"""RLWE zero encryptions — the shared core of keygen and the encryptor.

Semantics-compatible with the reference's rlwe layer
(reference: src/utils/rlwe.h:95-110, src/utils/rlwe.cpp / rlwe_cuda.cu:193-333):
  * symmetric: c = (-(a*s + e), a), a expandable from a stored 64-bit seed;
  * asymmetric: c_j = pk_j * u + e_j with ternary u;
  * BGV noise is scaled by the plain modulus t.

The uniform polynomial a is sampled directly in NTT evaluation order (a
uniform array is uniform in either order, as in the reference), so the
hot-path products are pure dyadic ops; sampling itself is a deterministic
host XOF (see troy_tpu.prng) — reproducible, unlike the reference's curand
device path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .context import ContextData
from .he_types import Ciphertext, SecretKey, PublicKey
from .params import SchemeType
from . import prng as rnd
from .ops import ntt as dntt
from .ops import poly as dpoly


def _sample_a_ntt(seed: int, cd: ContextData) -> jnp.ndarray:
    """Expand the 64-bit ciphertext seed into the uniform polynomial a
    (NTT order) over this level's base (rlwe_cuda.cu:291-307 analogue)."""
    gen = rnd.UniformRandomGenerator(rnd.seed_from_uint64(seed))
    return jnp.asarray(rnd.sample_poly_uniform(gen, cd.n, cd.coeff_values))


def _sample_noise(generator: rnd.UniformRandomGenerator,
                  cd: ContextData) -> jnp.ndarray:
    """CBD noise, lifted to this level's RNS base: (k, n) uint64."""
    e = rnd.sample_poly_cbd(generator, cd.n)
    return jnp.asarray(rnd.centered_to_rns(e, cd.coeff_values))


def encrypt_zero_symmetric(
        cd: ContextData,
        sk: SecretKey,
        generator: rnd.UniformRandomGenerator,
        is_ntt_form: bool,
        save_seed: bool = False,
) -> Ciphertext:
    """Symmetric encryption of zero at level cd (rlwe.cpp:110 analogue).

    Returns (c0, c1) with c0 + c1*s = -e (respectively -t*e for BGV). When
    save_seed is set, the returned ciphertext's ``seed`` regenerates c1.
    """
    t = cd.ntt
    k = cd.limbs
    a_seed = generator.next_uint64() | 1     # nonzero marker
    a = _sample_a_ntt(a_seed, cd)            # (k, n), NTT order
    e = _sample_noise(generator, cd)         # (k, n), coeff order
    if cd.scheme == SchemeType.bgv:
        e = dpoly.rns_broadcast_scalar_mul(e, int(cd.plain_modulus), t)

    sk_level = sk.data[:k]                   # NTT form limbs restrict directly
    as_ntt = dntt.rns_dyadic_mul(a, sk_level, t)
    if is_ntt_form:
        e_ntt = dntt.rns_ntt_forward(e, t)
        c0 = dpoly.rns_neg(dpoly.rns_add(as_ntt, e_ntt, t), t)
        c1 = a
    else:
        as_coeff = dntt.rns_ntt_inverse(as_ntt, t)
        c0 = dpoly.rns_neg(dpoly.rns_add(as_coeff, e, t), t)
        c1 = dntt.rns_ntt_inverse(a, t)

    data = jnp.stack([c0, c1])
    return Ciphertext(
        data=data,
        level=cd.chain_index,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
        seed=a_seed if save_seed else 0,
    )


def expand_seed(ct: Ciphertext, cd: ContextData) -> Ciphertext:
    """Regenerate c1 of a seed-compressed symmetric ciphertext
    (ciphertext_cuda.cu:27-41 loadTerms/seed expansion analogue)."""
    if ct.seed == 0:
        return ct
    a = _sample_a_ntt(ct.seed, cd)
    if not ct.is_ntt_form:
        a = dntt.rns_ntt_inverse(a, cd.ntt)
    data = ct.data.at[1].set(a)
    return ct.replace(data=data, seed=0)


def encrypt_zero_asymmetric(
        cd: ContextData,
        pk: PublicKey,
        generator: rnd.UniformRandomGenerator,
        is_ntt_form: bool,
) -> Ciphertext:
    """Asymmetric encryption of zero at level cd (rlwe.cpp:95,
    rlwe_cuda.cu:193-260): c_j = pk_j * u + e_j, u ternary."""
    t = cd.ntt
    k = cd.limbs
    n = cd.n
    tt = int(cd.plain_modulus)

    u_c = rnd.sample_poly_ternary(generator, n)
    u = jnp.asarray(rnd.centered_to_rns(u_c, cd.coeff_values))
    u_ntt = dntt.rns_ntt_forward(u, t)

    comps = []
    size = pk.data.shape[0]
    for j in range(size):
        cj = dntt.rns_dyadic_mul(u_ntt, pk.data[j][:k], t)
        e = _sample_noise(generator, cd)
        if cd.scheme == SchemeType.bgv:
            e = dpoly.rns_broadcast_scalar_mul(e, tt, t)
        if is_ntt_form:
            cj = dpoly.rns_add(cj, dntt.rns_ntt_forward(e, t), t)
        else:
            cj = dpoly.rns_add(dntt.rns_ntt_inverse(cj, t), e, t)
        comps.append(cj)

    return Ciphertext(
        data=jnp.stack(comps),
        level=cd.chain_index,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
    )
