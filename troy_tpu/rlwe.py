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

Transfer discipline: each encryption performs exactly ONE host->device
upload (the packed sample buffer) and runs the entire device computation
as one fused jit — on the axon tunnel every separate transfer costs
~30-60 ms, and eagerly-evaluated table constants re-upload per call.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .context import ContextData
from .he_types import Ciphertext, SecretKey, PublicKey
from .params import SchemeType
from . import prng as rnd
from .ops import ntt as dntt
from .ops import poly as dpoly

U64 = jnp.uint64


def _sample_a_ntt_host(seed: int, cd: ContextData) -> np.ndarray:
    """Expand the 64-bit ciphertext seed into the uniform polynomial a
    (NTT order) over this level's base (rlwe_cuda.cu:291-307 analogue)."""
    gen = rnd.UniformRandomGenerator(rnd.seed_from_uint64(seed))
    return rnd.sample_poly_uniform(gen, cd.n, cd.coeff_values)


@jax.jit
def _lift_centered(e_u64: jnp.ndarray, cd: ContextData) -> jnp.ndarray:
    """Centered int64 noise (bit-cast to u64) -> (k, n) RNS residues."""
    e = e_u64.astype(jnp.int64)
    outs = []
    for q in cd.coeff_values:
        r = e % jnp.int64(q)                     # Python-sign semantics
        r = jnp.where(r < 0, r + jnp.int64(q), r)
        outs.append(r.astype(U64))
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("is_ntt_form",))
def _zero_sym_core(buf: jnp.ndarray, sk_data: jnp.ndarray,
                   cd: ContextData, is_ntt_form: bool) -> jnp.ndarray:
    """Fused symmetric zero-encryption: buf packs [a (k*n); e (n)] u64."""
    t = cd.ntt
    k, n = cd.limbs, cd.n
    a = buf[:k * n].reshape(k, n)                # NTT order
    e = _lift_centered(buf[k * n:], cd)          # coeff order
    if cd.scheme == SchemeType.bgv:
        e = dpoly.rns_broadcast_scalar_mul(e, int(cd.plain_modulus), t)
    sk_level = sk_data[:k]
    as_ntt = dntt.rns_dyadic_mul(a, sk_level, t)
    if is_ntt_form:
        e_ntt = dntt.rns_ntt_forward(e, t)
        c0 = dpoly.rns_neg(dpoly.rns_add(as_ntt, e_ntt, t), t)
        c1 = a
    else:
        as_coeff = dntt.rns_ntt_inverse(as_ntt, t)
        c0 = dpoly.rns_neg(dpoly.rns_add(as_coeff, e, t), t)
        c1 = dntt.rns_ntt_inverse(a, t)
    return jnp.stack([c0, c1])


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
    k, n = cd.limbs, cd.n
    a_seed = generator.next_uint64() | 1     # nonzero marker
    a = _sample_a_ntt_host(a_seed, cd)       # (k, n), NTT order
    e = rnd.sample_poly_cbd(generator, n)    # (n,) centered
    buf = np.concatenate([a.reshape(-1), e.view(np.uint64)])
    data = _zero_sym_core(jnp.asarray(buf), sk.data, cd, is_ntt_form)
    return Ciphertext(
        data=data,
        level=cd.chain_index,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
        seed=a_seed if save_seed else 0,
    )


@partial(jax.jit, static_argnames=("is_ntt_form",))
def _zero_sym_batch_core(bufs: jnp.ndarray, sk_data: jnp.ndarray,
                         cd: ContextData,
                         is_ntt_form: bool) -> jnp.ndarray:
    """Batched symmetric zero-encryption: bufs (B, k*n + n) -> (B, 2, k, n).
    One upload and one executable for the whole batch (the app layer's
    encrypt_inputs encrypts many ciphertexts at once)."""
    return jax.vmap(
        lambda b: _zero_sym_core.__wrapped__(b, sk_data, cd, is_ntt_form)
    )(bufs)


def sample_zero_sym_batch(cd: ContextData,
                          generator: rnd.UniformRandomGenerator,
                          count: int):
    """Host side of a batched symmetric encryption: (seeds, packed bufs)."""
    k, n = cd.limbs, cd.n
    seeds, bufs = [], []
    for _ in range(count):
        a_seed = generator.next_uint64() | 1
        a = _sample_a_ntt_host(a_seed, cd)
        e = rnd.sample_poly_cbd(generator, n)
        seeds.append(a_seed)
        bufs.append(np.concatenate([a.reshape(-1), e.view(np.uint64)]))
    return seeds, np.stack(bufs)


@partial(jax.jit, static_argnames=("is_ntt_form",))
def _expand_seed_core(data: jnp.ndarray, a_flat: jnp.ndarray,
                      cd: ContextData, is_ntt_form: bool) -> jnp.ndarray:
    a = a_flat.reshape(cd.limbs, cd.n)
    if not is_ntt_form:
        a = dntt.rns_ntt_inverse(a, cd.ntt)
    return data.at[1].set(a)


def expand_seed(ct: Ciphertext, cd: ContextData) -> Ciphertext:
    """Regenerate c1 of a seed-compressed symmetric ciphertext
    (ciphertext_cuda.cu:27-41 loadTerms/seed expansion analogue)."""
    if ct.seed == 0:
        return ct
    a = _sample_a_ntt_host(ct.seed, cd)
    data = _expand_seed_core(ct.data, jnp.asarray(a.reshape(-1)), cd,
                             ct.is_ntt_form)
    return ct.replace(data=data, seed=0)


@partial(jax.jit, static_argnames=("is_ntt_form", "size"))
def _zero_asym_core(buf: jnp.ndarray, pk_data: jnp.ndarray,
                    cd: ContextData, is_ntt_form: bool,
                    size: int) -> jnp.ndarray:
    """Fused asymmetric zero-encryption: buf packs
    [u (n); e_0 (n); ...; e_{size-1} (n)] as centered-int64-bitcast u64."""
    t = cd.ntt
    k, n = cd.limbs, cd.n
    tt = int(cd.plain_modulus)
    u = _lift_centered(buf[:n], cd)
    u_ntt = dntt.rns_ntt_forward(u, t)
    comps = []
    for j in range(size):
        cj = dntt.rns_dyadic_mul(u_ntt, pk_data[j][:k], t)
        e = _lift_centered(buf[(1 + j) * n:(2 + j) * n], cd)
        if cd.scheme == SchemeType.bgv:
            e = dpoly.rns_broadcast_scalar_mul(e, tt, t)
        if is_ntt_form:
            cj = dpoly.rns_add(cj, dntt.rns_ntt_forward(e, t), t)
        else:
            cj = dpoly.rns_add(dntt.rns_ntt_inverse(cj, t), e, t)
        comps.append(cj)
    return jnp.stack(comps)


def encrypt_zero_asymmetric(
        cd: ContextData,
        pk: PublicKey,
        generator: rnd.UniformRandomGenerator,
        is_ntt_form: bool,
) -> Ciphertext:
    """Asymmetric encryption of zero at level cd (rlwe.cpp:95,
    rlwe_cuda.cu:193-260): c_j = pk_j * u + e_j, u ternary."""
    n = cd.n
    size = pk.data.shape[0]
    u_c = rnd.sample_poly_ternary(generator, n)
    parts = [u_c.view(np.uint64)]
    for _ in range(size):
        parts.append(rnd.sample_poly_cbd(generator, n).view(np.uint64))
    buf = np.concatenate(parts)
    data = _zero_asym_core(jnp.asarray(buf), pk.data, cd, is_ntt_form, size)
    return Ciphertext(
        data=data,
        level=cd.chain_index,
        is_ntt_form=is_ntt_form,
        scale=1.0,
        correction_factor=1,
    )
