"""Reference (troy/pytroy) wire-format codec — drop-in byte interop.

The reference's live serialization is the raw-struct ``save``/``load`` on
its CUDA classes (reference: src/serialize.h:1-17 savet/loadt;
src/ciphertext_cuda.cu:16-140 Ciphertext save/saveTerms/load/loadTerms;
src/plaintext_cuda.cu:7-27; src/kswitchkeys_cuda.cuh:330-354;
src/publickey_cuda.cuh:252-257 delegates to the pk ciphertext;
src/secretkey_cuda.cuh:292-297 delegates to the sk plaintext). This module
speaks that exact byte layout, so a party running this framework can join
a Cheetah-style client/server protocol whose peer runs the reference:
reference-emitted streams load here, and streams emitted here byte-match
what the reference would write for the same object.

Layout facts (all little-endian, no padding):
  * ParmsID = 32 bytes: blake2b-256 over the raw u64 words
    [scheme, n, q_0..q_{k-1}, t] — the REFERENCE's hashing layout
    (encryptionparams.cpp:118-146 computeParmsID + utils/hash.h), which
    differs from this framework's internal ParmsID (params.py adds a
    length word). ``ref_parms_id`` computes it; the codec maps it to/from
    chain levels per context.
  * bool = 1 byte, size_t = 8 bytes, double = 8 bytes (IEEE), u64 = 8.
  * Ciphertext: parms_id, is_ntt_form, size, n, k, scale,
    correction_factor, seed, terms=false, data_size, data[size*k*n].
    Seed-compressed streams (seed != 0, c0 only) are a reference EMIT-only
    shape — its own load throws on them (ciphertext_cuda.cu:104) — so
    ``save_ciphertext_ref`` expands the seed first and always writes
    seed=0: strictly more interoperable, byte-identical to what the
    reference emits for the expanded object.
  * saveTerms: same header with terms=true and seed=0 (it throws on
    seeds), then for each term id the k c0 residues [r[j][id] for j],
    then data_size=(size-1)*k*n and the remaining components, all in
    COEFFICIENT domain (the reference iNTTs NTT-form cts first and
    loadTerms re-NTTs — ciphertext_cuda.cu:50-57, 140-147).
  * Plaintext: parms_id (zero block = coefficient form mod t),
    coeff_count, scale, data_size, data.
  * KSwitchKeys: parms_id (key level), outer count, then per outer slot
    the inner count and that many PublicKey (= ciphertext) streams;
    RelinKeys slot index = key_power - 2, GaloisKeys slot index =
    (galois_elt - 1) >> 1 (kswitchkeys.h getIndex analogues), with empty
    slots written as count 0.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .context import HeContext
from .he_types import Ciphertext, Plaintext, PublicKey, SecretKey, \
    KSwitchKeys, RelinKeys, GaloisKeys
from .ops import ntt as dntt

REF_PARMS_ID_ZERO = b"\x00" * 32


def ref_parms_id(parms) -> bytes:
    """The reference's ParmsID for a parameter set: blake2b-256 over the
    raw words [scheme, n, q..., t] (encryptionparams.cpp:118-146)."""
    words = [int(parms.scheme), parms.poly_modulus_degree,
             *parms.coeff_values, int(parms.plain_modulus)]
    return hashlib.blake2b(
        _struct.pack(f"<{len(words)}Q", *words), digest_size=32).digest()


def _level_map(context: HeContext) -> Dict[bytes, int]:
    return {ref_parms_id(cd.parms): cd.chain_index for cd in context.chain}


def _u64s(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<u8").tobytes()


def _ct_header(pid: bytes, is_ntt: bool, size: int, n: int, k: int,
               scale: float, correction: int, seed: int,
               terms: bool) -> bytes:
    return pid + _struct.pack("<?QQQdQQ?", is_ntt, size, n, k,
                              scale, correction, seed, terms)


_CT_HEAD_LEN = 32 + 1 + 8 * 3 + 8 + 8 + 8 + 1      # 82 bytes


def _parse_ct_header(raw: bytes, off: int = 0):
    pid = raw[off:off + 32]
    is_ntt, size, n, k, scale, correction, seed, terms = _struct.unpack_from(
        "<?QQQdQQ?", raw, off + 32)
    return (pid, bool(is_ntt), size, n, k, scale, correction, seed,
            bool(terms), off + _CT_HEAD_LEN)


# ---------------------------------------------------------------------------
# ciphertext
# ---------------------------------------------------------------------------

def save_ciphertext_ref(ct: Ciphertext, context: HeContext,
                        host_data: Optional[np.ndarray] = None) -> bytes:
    """CiphertextCuda::save byte layout (ciphertext_cuda.cu:16-42).
    Seed-compressed inputs are expanded first (module docstring)."""
    cd = context.get_context_data(ct.level)
    if ct.seed != 0:
        from . import rlwe
        ct = rlwe.expand_seed(ct, cd)
        host_data = None
    data = np.asarray(ct.data) if host_data is None else host_data
    size, k, n = data.shape
    head = _ct_header(ref_parms_id(cd.parms), ct.is_ntt_form, size, n, k,
                      ct.scale, ct.correction_factor, 0, False)
    return head + _struct.pack("<Q", size * k * n) + _u64s(data)


def load_ciphertext_ref(raw: bytes, context: HeContext) -> Ciphertext:
    """CiphertextCuda::load (ciphertext_cuda.cu:85-106)."""
    pid, is_ntt, size, n, k, scale, correction, seed, terms, off = \
        _parse_ct_header(raw)
    if terms:
        raise ValueError("stream was saved with saveTerms; use "
                         "load_terms_ref with the term ids")
    if seed != 0:
        # the reference's own load throws here too; its seed expansion is
        # curand state we cannot reproduce
        raise ValueError("reference-format seeded streams are not "
                         "loadable (ciphertext_cuda.cu:104 throws too)")
    level = _level_map(context).get(pid)
    if level is None:
        raise ValueError("stream's parms_id matches no chain level")
    data_size, = _struct.unpack_from("<Q", raw, off)
    if data_size != size * k * n:
        raise ValueError("data size mismatch")
    data = np.frombuffer(raw, dtype="<u8", count=data_size,
                         offset=off + 8).reshape(size, k, n)
    return Ciphertext(data=jnp.asarray(data.copy()), level=level,
                      is_ntt_form=is_ntt, scale=scale,
                      correction_factor=correction)


def save_terms_ref(ct: Ciphertext, context: HeContext,
                   term_ids: Sequence[int],
                   host_coeff_data: Optional[np.ndarray] = None) -> bytes:
    """CiphertextCuda::saveTerms (ciphertext_cuda.cu:44-83): selected c0
    coefficients (each with all k residues) + the full remaining
    components, in coefficient domain."""
    if ct.seed != 0:
        raise ValueError("expand the seed before saving terms")
    cd = context.get_context_data(ct.level)
    if host_coeff_data is not None:
        data = host_coeff_data
    else:
        data = np.asarray(dntt.rns_ntt_inverse(ct.data, cd.ntt)
                          if ct.is_ntt_form else ct.data)
    size, k, n = data.shape
    head = _ct_header(ref_parms_id(cd.parms), ct.is_ntt_form, size, n, k,
                      ct.scale, ct.correction_factor, 0, True)
    ids = np.asarray(term_ids, dtype=np.int64)
    # (len(ids), k): for each id the k limb residues, limb-minor — the
    # reference writes r[j*n + id] for j in 0..k per id
    body = _u64s(data[0][:, ids].T)
    rest = _u64s(data[1:])
    return head + body + _struct.pack("<Q", (size - 1) * k * n) + rest


def load_terms_ref(raw: bytes, context: HeContext,
                   term_ids: Sequence[int]) -> Ciphertext:
    """CiphertextCuda::loadTerms (ciphertext_cuda.cu:108-155)."""
    pid, is_ntt, size, n, k, scale, correction, seed, terms, off = \
        _parse_ct_header(raw)
    if not terms:
        raise ValueError("stream was not saved with saveTerms")
    if seed != 0:
        raise ValueError("termed streams cannot be seeded")
    level = _level_map(context).get(pid)
    if level is None:
        raise ValueError("stream's parms_id matches no chain level")
    ids = np.asarray(term_ids, dtype=np.int64)
    sel = np.frombuffer(raw, dtype="<u8", count=len(ids) * k,
                        offset=off).reshape(len(ids), k)
    off += 8 * len(ids) * k
    data_size, = _struct.unpack_from("<Q", raw, off)
    if data_size != (size - 1) * k * n:
        raise ValueError("data size mismatch")
    rest = np.frombuffer(raw, dtype="<u8", count=data_size,
                         offset=off + 8).reshape(size - 1, k, n)
    data = np.zeros((size, k, n), dtype=np.uint64)
    data[0][:, ids] = sel.T
    data[1:] = rest
    arr = jnp.asarray(data)
    if is_ntt:
        cd = context.get_context_data(level)
        arr = dntt.rns_ntt_forward(arr, cd.ntt)
    return Ciphertext(data=arr, level=level, is_ntt_form=is_ntt,
                      scale=scale, correction_factor=correction)


# ---------------------------------------------------------------------------
# plaintext / keys
# ---------------------------------------------------------------------------

def save_plaintext_ref(pt: Plaintext, context: HeContext) -> bytes:
    """PlaintextCuda::save (plaintext_cuda.cu:7-15): parms_id (zero block
    for coefficient-form mod-t data), coeff_count, scale, data."""
    data = np.asarray(pt.data)
    if pt.is_ntt_form:
        if pt.level is None:
            raise ValueError("NTT-form plaintext needs a level")
        pid = ref_parms_id(context.get_context_data(pt.level).parms)
    else:
        pid = REF_PARMS_ID_ZERO
    count = data.size if pt.is_ntt_form else data.shape[-1]
    return (pid + _struct.pack("<Qd", count, pt.scale)
            + _struct.pack("<Q", data.size) + _u64s(data))


def load_plaintext_ref(raw: bytes, context: HeContext) -> Plaintext:
    """PlaintextCuda::load (plaintext_cuda.cu:17-27)."""
    pid = raw[:32]
    count, scale = _struct.unpack_from("<Qd", raw, 32)
    data_size, = _struct.unpack_from("<Q", raw, 48)
    flat = np.frombuffer(raw, dtype="<u8", count=data_size, offset=56)
    if pid == REF_PARMS_ID_ZERO:
        # coefficient-form mod-t data; the reference permits
        # coeff_count < n (trimmed constants) but every op here expects
        # length-n polynomials (encoder.py zero-pads likewise), so pad.
        # Re-saving a padded plaintext writes coeff_count = n — the same
        # polynomial, normalized encoding.
        n = context.n
        if flat.size > n:
            raise ValueError("plaintext longer than n")
        if flat.size < n:
            flat = np.concatenate(
                [flat, np.zeros(n - flat.size, dtype=np.uint64)])
        return Plaintext(data=jnp.asarray(flat.copy()), level=None,
                         is_ntt_form=False, scale=scale)
    level = _level_map(context).get(pid)
    if level is None:
        raise ValueError("stream's parms_id matches no chain level")
    k = len(context.get_context_data(level).coeff_values)
    n = data_size // k
    return Plaintext(data=jnp.asarray(flat.reshape(k, n).copy()),
                     level=level, is_ntt_form=True, scale=scale)


def save_secret_key_ref(sk: SecretKey, context: HeContext) -> bytes:
    """SecretKeyCuda::save = the sk plaintext's save (secretkey_cuda.cuh:
    292-294); NTT form at the key level."""
    pt = Plaintext(data=sk.data, level=0, is_ntt_form=True, scale=1.0)
    return save_plaintext_ref(pt, context)


def load_secret_key_ref(raw: bytes, context: HeContext) -> SecretKey:
    pt = load_plaintext_ref(raw, context)
    if not pt.is_ntt_form or pt.level != 0:
        raise ValueError("not a key-level NTT-form secret key stream")
    return SecretKey(data=pt.data)


def save_public_key_ref(pk: PublicKey, context: HeContext) -> bytes:
    """PublicKeyCuda::save = the pk ciphertext's save (publickey_cuda.cuh:
    252-254); size-2, NTT form, key level."""
    ct = Ciphertext(data=pk.data, level=0, is_ntt_form=True, scale=1.0,
                    correction_factor=1, seed=pk.seed)
    return save_ciphertext_ref(ct, context)


def load_public_key_ref(raw: bytes, context: HeContext) -> PublicKey:
    ct = load_ciphertext_ref(raw, context)
    if not ct.is_ntt_form or ct.level != 0:
        raise ValueError("not a key-level NTT-form public key stream")
    return PublicKey(data=ct.data, seed=0)


def _save_kswitch_ref(slots: List[Optional[np.ndarray]],
                      context: HeContext) -> bytes:
    """KSwitchKeysCuda::save (kswitchkeys_cuda.cuh:330-339): parms_id +
    outer count + per slot (inner count + PublicKey streams)."""
    pid = ref_parms_id(context.key_context_data.parms)
    out = [pid, _struct.pack("<Q", len(slots))]
    for arr in slots:
        if arr is None:
            out.append(_struct.pack("<Q", 0))
            continue
        decomp = arr.shape[0]
        out.append(_struct.pack("<Q", decomp))
        for j in range(decomp):
            pk = PublicKey(data=jnp.asarray(arr[j]), seed=0)
            out.append(save_public_key_ref(pk, context))
    return b"".join(out)


def _load_kswitch_ref(raw: bytes, context: HeContext
                      ) -> Tuple[List[Optional[np.ndarray]], int]:
    pid = raw[:32]
    if pid != ref_parms_id(context.key_context_data.parms):
        raise ValueError("key stream's parms_id is not this context's "
                         "key level")
    outer, = _struct.unpack_from("<Q", raw, 32)
    off = 40
    slots: List[Optional[np.ndarray]] = []
    for _ in range(outer):
        inner, = _struct.unpack_from("<Q", raw, off)
        off += 8
        if inner == 0:
            slots.append(None)
            continue
        comps = []
        for _ in range(inner):
            (cpid, is_ntt, size, n, k, _scale, _corr, seed, terms,
             hoff) = _parse_ct_header(raw, off)
            data_size, = _struct.unpack_from("<Q", raw, hoff)
            comp = np.frombuffer(raw, dtype="<u8", count=data_size,
                                 offset=hoff + 8).reshape(size, k, n)
            comps.append(comp)
            off = hoff + 8 + 8 * data_size
        slots.append(np.stack(comps))
    return slots, off


def save_relin_keys_ref(rk: RelinKeys, context: HeContext) -> bytes:
    """RelinKeys slot index = key_power - 2 (kswitchkeys.h getIndex)."""
    powers = sorted(rk.keys)
    slots: List[Optional[np.ndarray]] = [None] * (max(powers) - 1)
    for p in powers:
        slots[p - 2] = np.asarray(rk.keys[p])
    return _save_kswitch_ref(slots, context)


def load_relin_keys_ref(raw: bytes, context: HeContext) -> RelinKeys:
    slots, _ = _load_kswitch_ref(raw, context)
    keys = {i + 2: jnp.asarray(arr) for i, arr in enumerate(slots)
            if arr is not None}
    return RelinKeys(keys=keys)


def save_galois_keys_ref(gk: GaloisKeys, context: HeContext) -> bytes:
    """GaloisKeys slot index = (galois_elt - 1) >> 1."""
    elts = sorted(gk.keys)
    slots: List[Optional[np.ndarray]] = [None] * (((max(elts) - 1) >> 1) + 1)
    for e in elts:
        slots[(e - 1) >> 1] = np.asarray(gk.keys[e])
    return _save_kswitch_ref(slots, context)


def load_galois_keys_ref(raw: bytes, context: HeContext) -> GaloisKeys:
    slots, _ = _load_kswitch_ref(raw, context)
    keys = {2 * i + 1: jnp.asarray(arr) for i, arr in enumerate(slots)
            if arr is not None}
    return GaloisKeys(keys=keys)
