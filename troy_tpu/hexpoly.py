"""Hex-poly strings: SEAL's human-readable polynomial notation.

Semantics-compatible with the reference's plaintext string I/O
(reference: src/plaintext.h:168-239 hex-string constructor,
src/plaintext.cpp to_string / util::polyToHexString): coefficients in
uppercase hex, highest degree first, zero terms skipped, e.g.
``"3Fx^3 + 2x^1 + 1"``; the zero polynomial prints as ``"0"``.

The reference's test suite drives encrypt/evaluate/decrypt round-trips
entirely through these strings, so parity here lets troy/SEAL test vectors
be used verbatim.
"""

from __future__ import annotations

import re
from typing import Sequence, Union

import numpy as np

_TERM = re.compile(
    r"^([0-9A-Fa-f]+)(?:x\^([0-9]+)|x)?$")


def poly_to_hex_string(coeffs: Union[Sequence[int], np.ndarray]) -> str:
    """Coefficient array (index = degree) -> hex-poly string."""
    arr = np.asarray(coeffs, dtype=np.uint64)
    terms = []
    for deg in range(arr.shape[0] - 1, -1, -1):
        c = int(arr[deg])
        if c == 0:
            continue
        if deg == 0:
            terms.append(f"{c:X}")
        elif deg == 1:
            terms.append(f"{c:X}x^1")
        else:
            terms.append(f"{c:X}x^{deg}")
    if not terms:
        return "0"
    return " + ".join(terms)


def hex_string_to_poly(s: str, coeff_count: int = 0) -> np.ndarray:
    """Hex-poly string -> uint64 coefficient array (length = max degree + 1,
    or padded to coeff_count if larger)."""
    s = s.strip()
    if not s:
        raise ValueError("empty hex-poly string")
    parts = [p.strip() for p in s.split("+")]
    pairs = []
    max_deg = 0
    for p in parts:
        m = _TERM.match(p.replace(" ", ""))
        if not m:
            raise ValueError(f"malformed hex-poly term: {p!r}")
        coeff = int(m.group(1), 16)
        if m.group(2) is not None:
            deg = int(m.group(2))
        elif p.replace(" ", "").lower().endswith("x"):
            deg = 1
        else:
            deg = 0
        pairs.append((deg, coeff))
        max_deg = max(max_deg, deg)
    length = max(max_deg + 1, coeff_count, 1)
    out = np.zeros(length, dtype=np.uint64)
    for deg, coeff in pairs:
        out[deg] = (int(out[deg]) + coeff) & 0xFFFFFFFFFFFFFFFF
    # the zero polynomial "0" yields [0]
    return out


def plaintext_to_string(pt) -> str:
    """Plaintext (coefficient form) -> hex-poly string
    (plaintext.h:491 to_string analogue)."""
    if pt.is_ntt_form:
        raise ValueError("cannot stringify an NTT-form plaintext")
    return poly_to_hex_string(np.asarray(pt.data))


def plaintext_from_string(s: str, coeff_count: int = 0):
    """Hex-poly string -> coefficient-form Plaintext."""
    from .he_types import Plaintext
    import jax.numpy as jnp
    return Plaintext(data=jnp.asarray(hex_string_to_poly(s, coeff_count)))
