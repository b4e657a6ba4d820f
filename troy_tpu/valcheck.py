"""Validity checks for HE objects against a context.

Semantics-compatible with the reference's host-side valcheck layer
(reference: src/valcheck.h:31-256, src/valcheck.cpp): three tiers —
metadata (level/shape bookkeeping), buffer (array shapes/dtypes), and data
(coefficient bounds, requires a device->host readback so it is opt-in on
the hot path, exactly like the reference keeps it out of kernels).

``check_is_valid_for`` raises ``ValueError`` with a precise reason; the
``is_*`` predicates return bools.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import jax.numpy as jnp

from .context import HeContext
from .he_types import (
    Ciphertext, GaloisKeys, KSwitchKeys, Plaintext, PublicKey, RelinKeys,
    SecretKey,
)
from .params import SchemeType

HeObject = Union[Plaintext, Ciphertext, SecretKey, PublicKey, KSwitchKeys]

# ciphertext size bounds (reference: src/utils/defines.h SEAL_CIPHERTEXT_SIZE_*)
CIPHERTEXT_SIZE_MIN = 2
CIPHERTEXT_SIZE_MAX = 16


def _fail(ok: bool, raise_on_fail: bool, msg: str) -> bool:
    if not ok and raise_on_fail:
        raise ValueError(msg)
    return ok


def is_metadata_valid_for(obj: HeObject, context: HeContext,
                          raise_on_fail: bool = False) -> bool:
    """Level/shape metadata consistency (valcheck.h isMetadataValidFor)."""
    ok = _fail
    if isinstance(obj, Plaintext):
        n = context.n
        if obj.is_ntt_form:
            if obj.level is None:
                return ok(False, raise_on_fail, "NTT plaintext has no level")
            if not (0 <= obj.level < len(context.chain)):
                return ok(False, raise_on_fail, "plaintext level out of range")
            cd = context.get_context_data(obj.level)
            if obj.data.ndim != 2 or obj.data.shape != (cd.limbs, n):
                return ok(False, raise_on_fail,
                          f"NTT plaintext shape {obj.data.shape} != "
                          f"({cd.limbs}, {n})")
        else:
            if obj.data.ndim != 1 or obj.data.shape[0] > n:
                return ok(False, raise_on_fail,
                          f"plaintext length {obj.data.shape} exceeds n={n}")
        return True
    if isinstance(obj, Ciphertext):
        if not (0 <= obj.level < len(context.chain)):
            return ok(False, raise_on_fail, "ciphertext level out of range")
        cd = context.get_context_data(obj.level)
        if obj.data.ndim != 3:
            return ok(False, raise_on_fail, "ciphertext data must be 3-D")
        size, limbs, n = obj.data.shape
        if not (CIPHERTEXT_SIZE_MIN <= size <= CIPHERTEXT_SIZE_MAX):
            return ok(False, raise_on_fail,
                      f"ciphertext size {size} out of [2, 16]")
        if limbs != cd.limbs or n != cd.n:
            return ok(False, raise_on_fail,
                      f"ciphertext shape {obj.data.shape} mismatches level "
                      f"{obj.level} ({cd.limbs} limbs, n={cd.n})")
        scheme = context.scheme
        if scheme == SchemeType.ckks and not obj.is_ntt_form:
            return ok(False, raise_on_fail,
                      "CKKS ciphertext must be in NTT form")
        if scheme == SchemeType.bfv and obj.is_ntt_form:
            return ok(False, raise_on_fail,
                      "BFV ciphertext must not be in NTT form")
        if scheme != SchemeType.ckks and obj.scale != 1.0:
            return ok(False, raise_on_fail, "scale must be 1 outside CKKS")
        if scheme != SchemeType.bgv and obj.correction_factor != 1:
            return ok(False, raise_on_fail,
                      "correction factor must be 1 outside BGV")
        return True
    if isinstance(obj, SecretKey):
        key_cd = context.key_context_data
        if obj.data.shape != (key_cd.limbs, key_cd.n):
            return ok(False, raise_on_fail,
                      f"secret key shape {obj.data.shape} != "
                      f"({key_cd.limbs}, {key_cd.n})")
        return True
    if isinstance(obj, PublicKey):
        key_cd = context.key_context_data
        if obj.data.shape != (2, key_cd.limbs, key_cd.n):
            return ok(False, raise_on_fail,
                      f"public key shape {obj.data.shape} != "
                      f"(2, {key_cd.limbs}, {key_cd.n})")
        return True
    if isinstance(obj, KSwitchKeys):
        key_cd = context.key_context_data
        decomp = len(context.first_context_data.coeff_modulus)
        for idx, arr in obj.keys.items():
            if arr.shape != (decomp, 2, key_cd.limbs, key_cd.n):
                return ok(False, raise_on_fail,
                          f"kswitch key {idx} shape {arr.shape} != "
                          f"({decomp}, 2, {key_cd.limbs}, {key_cd.n})")
            if isinstance(obj, GaloisKeys):
                # Galois elements are odd residues mod 2n (galois.h:68)
                if idx % 2 == 0 or not (1 <= idx < 2 * context.n):
                    return ok(False, raise_on_fail,
                              f"invalid Galois element {idx}")
        return True
    return ok(False, raise_on_fail, f"unknown object type {type(obj)}")


def is_buffer_valid(obj: HeObject, raise_on_fail: bool = False) -> bool:
    """Dtype/backing-store validity (valcheck.h isBufferValid): every HE
    array must be uint64 (data plane) — shapes are covered by metadata."""
    arrs = []
    if isinstance(obj, (Plaintext, Ciphertext, SecretKey, PublicKey)):
        arrs = [obj.data]
    elif isinstance(obj, KSwitchKeys):
        arrs = list(obj.keys.values())
    for a in arrs:
        if a.dtype != jnp.uint64:
            return _fail(False, raise_on_fail,
                         f"HE buffers must be uint64, got {a.dtype}")
    return True


def is_data_valid_for(obj: HeObject, context: HeContext,
                      raise_on_fail: bool = False) -> bool:
    """Coefficient-bound check (valcheck.h isDataValidFor): every residue
    must lie below its limb modulus. Reads data back to host — use at trust
    boundaries (deserialization), not per-op."""
    def bounds_ok(arr: np.ndarray, moduli, limb_axis: int) -> bool:
        arr = np.asarray(arr)
        for i, q in enumerate(moduli):
            sl = np.take(arr, i, axis=limb_axis)
            if (sl >= q).any():
                return False
        return True

    if isinstance(obj, Plaintext):
        if obj.is_ntt_form:
            cd = context.get_context_data(obj.level)
            good = bounds_ok(obj.data, cd.coeff_values, 0)
        else:
            t = int(context.key_context_data.plain_modulus)
            if t == 0:  # CKKS coefficient plaintext: bounded by key modulus
                good = True
            else:
                good = bool((np.asarray(obj.data) < t).all())
        return _fail(good, raise_on_fail, "plaintext data out of bounds")
    if isinstance(obj, Ciphertext):
        cd = context.get_context_data(obj.level)
        good = bounds_ok(obj.data, cd.coeff_values, 1)
        return _fail(good, raise_on_fail, "ciphertext data out of bounds")
    if isinstance(obj, SecretKey):
        key_cd = context.key_context_data
        good = bounds_ok(obj.data, key_cd.coeff_values, 0)
        return _fail(good, raise_on_fail, "secret key data out of bounds")
    if isinstance(obj, PublicKey):
        key_cd = context.key_context_data
        good = bounds_ok(obj.data, key_cd.coeff_values, 1)
        return _fail(good, raise_on_fail, "public key data out of bounds")
    if isinstance(obj, KSwitchKeys):
        key_cd = context.key_context_data
        for arr in obj.keys.values():
            if not bounds_ok(arr, key_cd.coeff_values, 2):
                return _fail(False, raise_on_fail,
                             "kswitch key data out of bounds")
        return True
    return _fail(False, raise_on_fail, f"unknown object type {type(obj)}")


def is_valid_for(obj: HeObject, context: HeContext) -> bool:
    """Full check: metadata + buffer + data (valcheck.h isValidFor)."""
    return (is_metadata_valid_for(obj, context)
            and is_buffer_valid(obj)
            and is_data_valid_for(obj, context))


def check_is_valid_for(obj: HeObject, context: HeContext) -> None:
    """Raise ValueError with the first failing reason."""
    is_metadata_valid_for(obj, context, raise_on_fail=True)
    is_buffer_valid(obj, raise_on_fail=True)
    is_data_valid_for(obj, context, raise_on_fail=True)
