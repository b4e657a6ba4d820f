"""ctypes bindings for the native host runtime (troy_native.cpp).

Compiled on demand with g++ into a content-hash-keyed shared object (no
pip/cmake needed); every entry point has a pure-Python fallback, so the
framework works without a toolchain — just slower on the host paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "troy_native.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache_dir = os.environ.get("TROY_NATIVE_CACHE",
                                   os.path.join(tempfile.gettempdir(),
                                                "troy_native"))
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"troy_native_{tag}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.xof_fill.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                 ctypes.c_void_p, ctypes.c_uint64]
        lib.crt_compose_centered_double.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_double, ctypes.c_void_p]
        lib.ntt_tables_fill.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64] + [ctypes.c_void_p] * 4
        lib.mxu_tables_fill.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.c_uint64, ctypes.c_uint64] + [ctypes.c_void_p] * 8
        lib.signed_digits_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
        lib.signed_digits_fill.restype = ctypes.c_int
        return lib
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if not _tried:
        _lib = _build()
        _tried = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def xof_fill(seed: bytes, counter0: int, nbytes: int) -> Optional[bytes]:
    """nbytes of the buffered XOF stream starting at block counter0."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(nbytes, dtype=np.uint8)
    lib.xof_fill(seed, counter0, out.ctypes.data, nbytes)
    return out.tobytes()


def ntt_tables_fill(n: int, q: int, root: int, inv_root: int):
    """Bit-reversed root-power tables + Shoup quotients; None if no lib.
    Returns (powers, powers_shoup, inv_powers, inv_powers_shoup) u64[n]."""
    lib = get_lib()
    if lib is None:
        return None
    arrs = [np.empty(n, dtype=np.uint64) for _ in range(4)]
    lib.ntt_tables_fill(n, q, root, inv_root,
                        *(a.ctypes.data for a in arrs))
    return tuple(arrs)


def mxu_tables_fill(n: int, a: int, b: int, q: int, psi: int):
    """4-step factor matrices for n = a*b; None if no lib. Returns
    (w1, tw, w2, v1, itw, v2, tw_shoup, itw_shoup) u64 row-major."""
    lib = get_lib()
    if lib is None:
        return None
    shapes = [(a, a), (a, b), (b, b), (a, a), (a, b), (b, b), (a, b), (a, b)]
    arrs = [np.empty(s, dtype=np.uint64) for s in shapes]
    lib.mxu_tables_fill(n, a, b, q, psi,
                        *(x.ctypes.data for x in arrs))
    return tuple(arrs)


def signed_digits_fill(mat: np.ndarray):
    """u64 array -> (8,) + mat.shape int8 signed radix-256 planes; None if
    no lib. Raises on values needing a 9th digit (the representable range
    is (-2^63, 2^63 - 2^55 + 2^54...] in practice; all real inputs are
    residues < q < 2^61), matching the Python oracle's assertion."""
    lib = get_lib()
    if lib is None:
        return None
    mat = np.ascontiguousarray(mat, dtype=np.uint64)
    out = np.empty((8,) + mat.shape, dtype=np.int8)
    if lib.signed_digits_fill(mat.ctypes.data, mat.size, out.ctypes.data):
        raise ValueError("value exceeded the signed 8-digit range")
    return out


def crt_compose_centered_double(residues: np.ndarray, moduli, inv_punctured,
                                inv_punctured_shoup, punctured_words,
                                q_words, inv_scale: float
                                ) -> Optional[np.ndarray]:
    """(k, n) residues -> (n,) centered doubles scaled by inv_scale."""
    lib = get_lib()
    if lib is None:
        return None
    residues = np.ascontiguousarray(residues, dtype=np.uint64)
    k, n = residues.shape
    moduli = np.ascontiguousarray(moduli, dtype=np.uint64)
    invp = np.ascontiguousarray(inv_punctured, dtype=np.uint64)
    invps = np.ascontiguousarray(inv_punctured_shoup, dtype=np.uint64)
    pw = np.ascontiguousarray(punctured_words, dtype=np.uint64)   # (k, w)
    qw = np.ascontiguousarray(q_words, dtype=np.uint64)           # (w,)
    w = qw.shape[0]
    out = np.empty(n, dtype=np.float64)
    lib.crt_compose_centered_double(
        residues.ctypes.data, k, n, moduli.ctypes.data, invp.ctypes.data,
        invps.ctypes.data, pw.ctypes.data, qw.ctypes.data, w,
        ctypes.c_double(inv_scale), out.ctypes.data)
    return out
