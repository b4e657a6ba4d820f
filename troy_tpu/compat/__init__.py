"""pytroy-compatible API shim.

The reference ships a pybind11 module ``pytroy`` (reference:
binder/binder.cu:144-846) whose objects are mutable and whose methods come
in assign + ``*_inplace`` pairs. This module re-exposes troy_tpu's
functional core under that exact surface so reference users can switch with
an ``import troy_tpu.compat as pytroy`` (or ``import pytroy`` — the repo
root ships an alias module).

Wrappers hold the immutable pytree object in ``_inner`` and swap it on
mutation; contexts carry the ParmsID <-> chain-level mapping the reference
API speaks.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

import troy_tpu as _t
from troy_tpu import serialization as _ser
from troy_tpu import refwire as _rw
from troy_tpu.app import linear as _lin
from troy_tpu import prng as _rnd


def _ref_ctx(context, what: str):
    """The reference byte layouts embed a context-derived ParmsID, so
    every save(wire="troy") needs the context the load paths already
    require — fail with the same clear error, not an AttributeError."""
    if context is None:
        raise ValueError(f'{what}.save(wire="troy") needs a context '
                         "(the reference layout embeds its ParmsID)")
    return context._inner

# enums / scalar types are shared directly
SchemeType = _t.SchemeType
SecurityLevel = _t.SecurityLevel
Modulus = _t.Modulus


def initialize_kernel():
    """No-op (binder.cu initialize_kernel -> KernelProvider::initialize);
    XLA owns device initialization."""


class Smoke:
    """Binder smoke-test class (binder.cu:33-39, bound at :147-151)."""

    def __init__(self, i: int = 19991111):
        self.t = int(i)

    def hello(self):
        print(f"Hello I am Smoking ... {self.t}")


class ParmsID(bytes):
    """32-byte blake2b-256 parameter hash (binder.cu ParmsID, :186-193).

    Compares equal to the plain ``bytes`` digest. ``vec()`` returns the
    four little-endian 64-bit words; the reference binder's lambda loops
    ``i < ret.size()`` after a ``reserve`` (binder.cu:188-192), so it
    always returns an empty list — we return the actual words.
    """

    def vec(self) -> List[int]:
        import struct
        return list(struct.unpack("<4Q", self))


class CoeffModulus:
    @staticmethod
    def max_bit_count(poly_modulus_degree: int,
                      sec_level: SecurityLevel = SecurityLevel.tc128) -> int:
        return _t.CoeffModulus.max_bit_count(poly_modulus_degree, sec_level)

    @staticmethod
    def bfv_default(poly_modulus_degree: int,
                    sec_level: SecurityLevel = SecurityLevel.tc128):
        return list(_t.CoeffModulus.bfv_default(poly_modulus_degree,
                                                sec_level))

    @staticmethod
    def create(poly_modulus_degree: int, bit_sizes: Sequence[int]):
        return list(_t.CoeffModulus.create(poly_modulus_degree,
                                           list(bit_sizes)))


class PlainModulus:
    @staticmethod
    def batching(poly_modulus_degree: int, bit_size: int) -> Modulus:
        return _t.PlainModulus.batching(poly_modulus_degree, bit_size)


class EncryptionParameters:
    """Mutable parameter builder (binder.cu EncryptionParameters)."""

    def __init__(self, scheme: SchemeType):
        self._scheme = scheme
        self._n = 0
        self._coeff: List[Modulus] = []
        self._plain = Modulus(0)

    def set_poly_modulus_degree(self, n: int):
        self._n = n

    def set_coeff_modulus(self, moduli: Sequence[Modulus]):
        self._coeff = [m if isinstance(m, Modulus) else Modulus(int(m))
                       for m in moduli]

    def set_plain_modulus(self, t: Union[int, Modulus]):
        self._plain = t if isinstance(t, Modulus) else Modulus(int(t))

    def scheme(self) -> SchemeType:
        return self._scheme

    def poly_modulus_degree(self) -> int:
        return self._n

    def coeff_modulus(self) -> List[Modulus]:
        return list(self._coeff)

    def _freeze(self) -> _t.EncryptionParameters:
        return _t.EncryptionParameters(
            scheme=self._scheme, poly_modulus_degree=self._n,
            coeff_modulus=tuple(self._coeff), plain_modulus=self._plain)

    def parms_id(self):
        return ParmsID(self._freeze().parms_id)


def _rebuild_parms(inner_parms) -> "EncryptionParameters":
    """Inner (frozen) params -> mutable compat builder
    (ContextData::parms, binder.cu:211)."""
    p = EncryptionParameters(inner_parms.scheme)
    p.set_poly_modulus_degree(inner_parms.poly_modulus_degree)
    p.set_coeff_modulus(list(inner_parms.coeff_modulus))
    p.set_plain_modulus(inner_parms.plain_modulus)
    return p


class ContextData:
    def __init__(self, ctx: "SEALContext", level: int):
        self._ctx = ctx
        self._level = level
        self._cd = ctx._inner.get_context_data(level)

    def parms(self) -> "EncryptionParameters":
        return _rebuild_parms(self._cd.parms)

    def parms_id(self):
        return ParmsID(self._cd.parms_id)

    def chain_index(self) -> int:
        # the reference counts chain_index downward (last level = 0)
        return len(self._ctx._inner.chain) - 1 - self._level

    def prev_context_data(self):
        return (ContextData(self._ctx, self._level - 1)
                if self._level > 0 else None)

    def next_context_data(self):
        chain = self._ctx._inner.chain
        return (ContextData(self._ctx, self._level + 1)
                if self._level + 1 < len(chain) else None)


# parms_id <-> chain-level registry so detached Plaintext/Ciphertext
# wrappers can honour the binder's set_parms_id/parms_id (binder.cu:237-268)
# without holding a context reference. ParmsIDs are blake2b-256 of the full
# parameter set, so cross-context collisions cannot occur; level->parms uses
# the most recently constructed context (one context per process in
# practice, as in the reference's binder tests).
_PARMS_TO_LEVEL: dict = {}
_LEVEL_TO_PARMS: dict = {}


def _register_context_chain(inner) -> None:
    _LEVEL_TO_PARMS.clear()
    for cd in inner.chain:
        _PARMS_TO_LEVEL[bytes(cd.parms_id)] = cd.chain_index
        _LEVEL_TO_PARMS[cd.chain_index] = bytes(cd.parms_id)


class SEALContext:
    def __init__(self, parms: EncryptionParameters,
                 expand_mod_chain: bool = True,
                 sec_level: SecurityLevel = SecurityLevel.tc128):
        self._inner = _t.HeContext(parms._freeze(),
                                   expand_mod_chain=expand_mod_chain,
                                   sec_level=sec_level)
        _register_context_chain(self._inner)

    def _level_of(self, parms_id) -> int:
        cd = self._inner.get_context_data_by_parms_id(parms_id)
        if cd is None:
            raise ValueError("unknown parms_id for this context")
        return cd.chain_index

    def get_context_data(self, parms_id) -> ContextData:
        return ContextData(self, self._level_of(parms_id))

    def first_context_data(self) -> ContextData:
        return ContextData(self, self._inner.first_level)

    def last_context_data(self) -> ContextData:
        return ContextData(self, self._inner.last_level)

    def key_context_data(self) -> ContextData:
        return ContextData(self, 0)

    def first_parms_id(self):
        return ParmsID(self._inner.first_context_data.parms_id)

    def last_parms_id(self):
        return ParmsID(self._inner.last_context_data.parms_id)

    def key_parms_id(self):
        return ParmsID(self._inner.key_context_data.parms_id)

    def using_keyswitching(self) -> bool:
        return self._inner.using_keyswitching


class _Wrapper:
    """Shared shape of the mutable single-object wrappers."""

    _inner = None

    def copy(self):
        c = type(self)()
        c._inner = self._inner
        return c


class Plaintext(_Wrapper):
    def __init__(self, inner: Optional[_t.Plaintext] = None):
        self._inner = inner

    def set_zero(self):
        import jax.numpy as jnp
        self._inner = self._inner.replace(
            data=jnp.zeros_like(self._inner.data))

    def coeff_count(self) -> int:
        return int(self._inner.coeff_count)

    def is_ntt_form(self) -> bool:
        return self._inner.is_ntt_form

    def scale(self) -> float:
        return self._inner.scale

    def set_scale(self, s: float):
        self._inner = self._inner.replace(scale=float(s))

    def to_string(self) -> str:
        return _t.plaintext_to_string(self._inner)

    def parms_id(self):
        """ParmsID of the level this plaintext lives at (binder.cu:237);
        mod-t coefficient plaintexts have no level -> zero ParmsID."""
        lvl = self._inner.level
        return ParmsID(_t.PARMS_ID_ZERO if lvl is None
                       else _LEVEL_TO_PARMS.get(lvl, _t.PARMS_ID_ZERO))

    def set_parms_id(self, parms_id):
        self._inner = self._inner.replace(
            level=_PARMS_TO_LEVEL[bytes(parms_id)])

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        """wire="troy" emits the reference's PlaintextCuda::save bytes
        (needs the context for its ParmsID layout — refwire.py)."""
        if wire == "troy":
            return _rw.save_plaintext_ref(self._inner, _ref_ctx(context, "Plaintext"))
        return _ser.save_plaintext(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        """Auto-detects the stream flavor: native TPT1 or the reference's
        raw-struct layout (which needs the context)."""
        if raw[:4] == b"TPT1":
            self._inner = _ser.load_plaintext(raw)
        else:
            if context is None:
                raise ValueError("not a native TPT1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_plaintext_ref(raw, context._inner)


class Ciphertext(_Wrapper):
    def __init__(self, inner: Optional[_t.Ciphertext] = None):
        self._inner = inner

    def correction_factor(self) -> int:
        return self._inner.correction_factor

    def set_correction_factor(self, c: int):
        self._inner = self._inner.replace(correction_factor=int(c))

    def scale(self) -> float:
        return self._inner.scale

    def set_scale(self, s: float):
        self._inner = self._inner.replace(scale=float(s))

    def is_ntt_form(self) -> bool:
        return self._inner.is_ntt_form

    def coeff_modulus_size(self) -> int:
        return int(self._inner.limbs)

    def poly_modulus_degree(self) -> int:
        return int(self._inner.n)

    def size(self) -> int:
        return int(self._inner.size)

    def parms_id(self):
        return ParmsID(
            _LEVEL_TO_PARMS.get(self._inner.level, _t.PARMS_ID_ZERO))

    def set_parms_id(self, parms_id):
        self._inner = self._inner.replace(
            level=_PARMS_TO_LEVEL[bytes(parms_id)])

    def resize(self, size: int):
        """Grow/shrink the ciphertext's component count with zero padding
        (binder.cu:265 Ciphertext::resize)."""
        import jax.numpy as jnp
        data = self._inner.data
        size = int(size)
        if size < data.shape[0]:
            data = data[:size]
        elif size > data.shape[0]:
            pad = jnp.zeros((size - data.shape[0],) + data.shape[1:],
                            dtype=data.dtype)
            data = jnp.concatenate([data, pad], axis=0)
        self._inner = self._inner.replace(data=data)

    def reserve(self, size: int):
        """No-op: XLA owns buffer capacity (binder.cu:266)."""

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        """wire="troy" emits the reference's CiphertextCuda::save bytes
        (seed-compressed cts are expanded first — refwire.py), so the
        stream is loadable by a reference/pytroy peer."""
        if wire == "troy":
            return _rw.save_ciphertext_ref(self._inner, _ref_ctx(context, "Ciphertext"))
        return _ser.save_ciphertext(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        # Auto-detects native TCT1 vs the reference's raw-struct layout.
        # For native streams context is only required when seed-compressed
        # (binder.cu load has both 1- and 2-arg forms); reference streams
        # always need it (ParmsID -> level mapping).
        if raw[:4] == b"TCT1":
            self._inner = _ser.load_ciphertext(
                raw, context._inner if context is not None else None)
        else:
            if context is None:
                raise ValueError("not a native TCT1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_ciphertext_ref(raw, context._inner)

    def save_terms(self, evaluator: "Evaluator", terms) -> bytes:
        return _ser.save_terms(self._inner, evaluator._ctx,
                               [int(x) for x in np.asarray(terms)])

    def load_terms(self, raw: bytes, evaluator: "Evaluator", terms):
        self._inner = _ser.load_terms(raw, evaluator._ctx,
                                      [int(x) for x in np.asarray(terms)])


class LWECiphertext(_Wrapper):
    def __init__(self, inner=None):
        self._inner = inner


class SecretKey(_Wrapper):
    def __init__(self, inner: Optional[_t.SecretKey] = None):
        self._inner = inner

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        if wire == "troy":
            return _rw.save_secret_key_ref(self._inner, _ref_ctx(context, "SecretKey"))
        return _ser.save_secret_key(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        if raw[:4] == b"TKY1":
            self._inner = _ser.load_secret_key(raw)
        else:
            if context is None:
                raise ValueError("not a native TKY1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_secret_key_ref(raw, context._inner)


class PublicKey(_Wrapper):
    def __init__(self, inner: Optional[_t.PublicKey] = None):
        self._inner = inner

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        if wire == "troy":
            return _rw.save_public_key_ref(self._inner, _ref_ctx(context, "PublicKey"))
        return _ser.save_public_key(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        if raw[:4] == b"TKY1":
            self._inner = _ser.load_public_key(raw)
        else:
            if context is None:
                raise ValueError("not a native TKY1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_public_key_ref(raw, context._inner)


class KSwitchKeys(_Wrapper):
    def __init__(self, inner: Optional[_t.KSwitchKeys] = None):
        self._inner = inner

    def save(self) -> bytes:
        return _ser.save_kswitch_keys(self._inner)

    def load(self, raw: bytes):
        self._inner = _ser.load_kswitch_keys(raw)


class RelinKeys(_Wrapper):
    def __init__(self, inner: Optional[_t.RelinKeys] = None):
        self._inner = inner

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        if wire == "troy":
            return _rw.save_relin_keys_ref(self._inner, _ref_ctx(context, "RelinKeys"))
        return _ser.save_relin_keys(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        if raw[:4] == b"TKY1":
            self._inner = _ser.load_relin_keys(raw)
        else:
            if context is None:
                raise ValueError("not a native TKY1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_relin_keys_ref(raw, context._inner)


class GaloisKeys(_Wrapper):
    def __init__(self, inner: Optional[_t.GaloisKeys] = None):
        self._inner = inner

    def save(self, context: Optional[SEALContext] = None,
             wire: str = "native") -> bytes:
        if wire == "troy":
            return _rw.save_galois_keys_ref(self._inner, _ref_ctx(context, "GaloisKeys"))
        return _ser.save_galois_keys(self._inner)

    def load(self, raw: bytes, context: Optional[SEALContext] = None):
        if raw[:4] == b"TKY1":
            self._inner = _ser.load_galois_keys(raw)
        else:
            if context is None:
                raise ValueError("not a native TKY1 stream; loading "
                                 "reference-format bytes needs a context")
            self._inner = _rw.load_galois_keys_ref(raw, context._inner)


class KeyGenerator:
    def __init__(self, context: SEALContext, seed: Optional[bytes] = None):
        self._inner = _t.KeyGenerator(context._inner, seed=seed)

    def secret_key(self) -> SecretKey:
        return SecretKey(self._inner.secret_key)

    @staticmethod
    def _out_key(result, out):
        if out is None:
            return result
        out._inner = result._inner
        return out

    def create_public_key(self,
                          out: Optional[PublicKey] = None) -> PublicKey:
        """Both binder styles: assign-return and out-param
        (binder/timetest.py `keygen.create_public_key(self.pk)`)."""
        return self._out_key(PublicKey(self._inner.create_public_key()), out)

    def create_relin_keys(self,
                          out: Optional[RelinKeys] = None) -> RelinKeys:
        return self._out_key(RelinKeys(self._inner.create_relin_keys()), out)

    def create_galois_keys(self, steps=None,
                           out: Optional[GaloisKeys] = None) -> GaloisKeys:
        # binder overloads: (), (steps), (out), (steps, out)
        if isinstance(steps, GaloisKeys):
            steps, out = None, steps
        return self._out_key(
            GaloisKeys(self._inner.create_galois_keys(steps=steps)), out)

    def create_automorphism_keys(self,
                                 out: Optional[GaloisKeys] = None
                                 ) -> GaloisKeys:
        return self._out_key(
            GaloisKeys(self._inner.create_automorphism_keys()), out)

    def create_keyswitching_keys(self, new_key: SecretKey) -> KSwitchKeys:
        return KSwitchKeys(self._inner.create_keyswitch_key(new_key._inner))


class BatchEncoder:
    def __init__(self, context: SEALContext):
        self._inner = _t.BatchEncoder(context._inner)

    def slot_count(self) -> int:
        return self._inner.slot_count

    @staticmethod
    def _out(result, out: Optional[Plaintext]):
        if out is None:
            return Plaintext(result)
        out._inner = result
        return out

    def encode(self, values, out: Optional[Plaintext] = None) -> Plaintext:
        return self._out(self._inner.encode(
            np.asarray(values, dtype=np.uint64)), out)

    def encode_int64(self, values,
                     out: Optional[Plaintext] = None) -> Plaintext:
        return self._out(self._inner.encode_signed(
            np.asarray(values, dtype=np.int64)), out)

    def encode_polynomial(self, values,
                          out: Optional[Plaintext] = None) -> Plaintext:
        return self._out(self._inner.encode_polynomial(
            np.asarray(values, dtype=np.uint64)), out)

    def decode(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(self._inner.decode(plain._inner))

    def decode_int64(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(self._inner.decode_signed(plain._inner))

    def decode_polynomial(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(self._inner.decode_polynomial(plain._inner))


class CKKSEncoder:
    def __init__(self, context: SEALContext):
        self._ctx = context
        self._inner = _t.CKKSEncoder(context._inner)

    def slot_count(self) -> int:
        return self._inner.slot_count

    def _level(self, parms_id) -> Optional[int]:
        return None if parms_id is None else self._ctx._level_of(parms_id)

    @staticmethod
    def _split_args(args):
        """(scale[, out]) or (parms_id, scale[, out]) — the binder's
        overload set, resolved by type."""
        out = None
        if args and isinstance(args[-1], Plaintext):
            out = args[-1]
            args = args[:-1]
        if len(args) == 1:
            parms_id, scale = None, args[0]
        elif len(args) == 2:
            parms_id, scale = args
        else:
            raise TypeError("encode expects (values, [parms_id,] scale"
                            "[, plaintext_out])")
        return parms_id, float(scale), out

    @staticmethod
    def _out(result, out: Optional[Plaintext]):
        if out is None:
            return Plaintext(result)
        out._inner = result
        return out

    def encode(self, values, *args) -> Plaintext:
        parms_id, scale, out = self._split_args(args)
        if np.isscalar(values) or np.asarray(values).ndim == 0:
            return self._out(self._inner.encode_constant(
                complex(values), scale, level=self._level(parms_id)), out)
        return self._out(self._inner.encode(
            np.asarray(values), scale=scale,
            level=self._level(parms_id)), out)

    def encode_polynomial(self, values, *args) -> Plaintext:
        parms_id, scale, out = self._split_args(args)
        return self._out(self._inner.encode_polynomial(
            np.asarray(values, dtype=np.float64), scale=scale,
            level=self._level(parms_id)), out)

    def decode(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(self._inner.decode(plain._inner))

    def decode_polynomial(self, plain: Plaintext) -> np.ndarray:
        return np.asarray(self._inner.decode_polynomial(plain._inner))


class Encryptor:
    def __init__(self, context: SEALContext,
                 key1: Union[PublicKey, SecretKey, None] = None,
                 key2: Optional[SecretKey] = None):
        self._ctx = context
        pk = key1._inner if isinstance(key1, PublicKey) else None
        sk = key1._inner if isinstance(key1, SecretKey) else None
        if isinstance(key2, SecretKey):
            sk = key2._inner
        self._inner = _t.Encryptor(context._inner, public_key=pk,
                                   secret_key=sk)

    def set_public_key(self, pk: PublicKey):
        self._inner._pk = pk._inner

    def set_secret_key(self, sk: SecretKey):
        self._inner._sk = sk._inner

    def encrypt(self, plain: Plaintext,
                out: Optional[Ciphertext] = None) -> Ciphertext:
        return _assign_or_return(self._inner.encrypt(plain._inner), out)

    def encrypt_symmetric(self, plain: Plaintext,
                          out: Optional[Ciphertext] = None,
                          save_seed: bool = False) -> Ciphertext:
        """save_seed=True keeps the c1-regeneration seed so save() emits
        the compressed form (the reference's Serializable<Ciphertext>
        behavior for symmetric encryptions)."""
        return _assign_or_return(
            self._inner.encrypt_symmetric(plain._inner,
                                          save_seed=save_seed), out)

    def encrypt_zero(self, parms_id=None) -> Ciphertext:
        lvl = None if parms_id is None else self._ctx._level_of(parms_id)
        return Ciphertext(self._inner.encrypt_zero(level=lvl,
                                                   asymmetric=True))

    def encrypt_zero_symmetric(self, parms_id=None) -> Ciphertext:
        lvl = None if parms_id is None else self._ctx._level_of(parms_id)
        return Ciphertext(self._inner.encrypt_zero(level=lvl,
                                                   asymmetric=False))


class Decryptor:
    def __init__(self, context: SEALContext, secret_key: SecretKey):
        self._inner = _t.Decryptor(context._inner, secret_key._inner)

    def decrypt(self, ct: Ciphertext,
                out: Optional[Plaintext] = None) -> Plaintext:
        res = self._inner.decrypt(ct._inner)
        if out is None:
            return Plaintext(res)
        out._inner = res
        return out

    def invariant_noise_budget(self, ct: Ciphertext) -> int:
        return self._inner.invariant_noise_budget(ct._inner)


def _assign_or_return(result, out):
    if out is None:
        return Ciphertext(result)
    out._inner = result
    return out


class Evaluator:
    def __init__(self, context: SEALContext):
        self._compat_ctx = context
        self._ctx = context._inner
        self._inner = _t.Evaluator(context._inner)

    # ---- unary/binary ct ops: assign + inplace pairs ----
    def negate(self, c: Ciphertext, out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.negate(c._inner), out)

    def negate_inplace(self, c: Ciphertext):
        c._inner = self._inner.negate(c._inner)

    def add(self, c1: Ciphertext, c2: Ciphertext,
            out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.add(c1._inner, c2._inner), out)

    def add_inplace(self, c1: Ciphertext, c2: Ciphertext):
        c1._inner = self._inner.add(c1._inner, c2._inner)

    def add_many(self, cts: Sequence[Ciphertext],
                 out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.add_many([c._inner for c in cts]), out)

    def sub(self, c1: Ciphertext, c2: Ciphertext,
            out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.sub(c1._inner, c2._inner), out)

    def sub_inplace(self, c1: Ciphertext, c2: Ciphertext):
        c1._inner = self._inner.sub(c1._inner, c2._inner)

    def multiply(self, c1: Ciphertext, c2: Ciphertext,
                 out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.multiply(c1._inner, c2._inner),
                                 out)

    def multiply_inplace(self, c1: Ciphertext, c2: Ciphertext):
        c1._inner = self._inner.multiply(c1._inner, c2._inner)

    def square(self, c: Ciphertext, out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.square(c._inner), out)

    def square_inplace(self, c: Ciphertext):
        c._inner = self._inner.square(c._inner)

    def multiply_many(self, cts: Sequence[Ciphertext],
                      relin_keys: RelinKeys,
                      out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.multiply_many([c._inner for c in cts],
                                      relin_keys._inner), out)

    def exponentiate(self, c: Ciphertext, power: int,
                     relin_keys: RelinKeys,
                     out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.exponentiate(c._inner, int(power),
                                     relin_keys._inner), out)

    def exponentiate_inplace(self, c: Ciphertext, power: int,
                             relin_keys: RelinKeys):
        c._inner = self._inner.exponentiate(c._inner, int(power),
                                            relin_keys._inner)

    # ---- key switching ----
    def relinearize(self, c: Ciphertext, relin_keys: RelinKeys,
                    out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.relinearize(c._inner, relin_keys._inner), out)

    def relinearize_inplace(self, c: Ciphertext, relin_keys: RelinKeys):
        c._inner = self._inner.relinearize(c._inner, relin_keys._inner)

    def apply_keyswitching(self, c: Ciphertext, ksk: KSwitchKeys,
                           out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.apply_keyswitching(c._inner, ksk._inner), out)

    def apply_keyswitching_inplace(self, c: Ciphertext, ksk: KSwitchKeys):
        c._inner = self._inner.apply_keyswitching(c._inner, ksk._inner)

    # ---- mod switch / rescale ----
    def _lvl(self, parms_id) -> int:
        return self._compat_ctx._level_of(parms_id)

    def mod_switch_to_next(self, obj, out=None):
        if isinstance(obj, Plaintext):
            res = self._inner.mod_switch_plain_to_next(obj._inner)
            if out is None:
                return Plaintext(res)
            out._inner = res
            return out
        return _assign_or_return(self._inner.mod_switch_to_next(obj._inner),
                                 out)

    def mod_switch_to_next_inplace(self, obj):
        if isinstance(obj, Plaintext):
            obj._inner = self._inner.mod_switch_plain_to_next(obj._inner)
        else:
            obj._inner = self._inner.mod_switch_to_next(obj._inner)

    def mod_switch_to(self, obj, parms_id, out=None):
        lvl = self._lvl(parms_id)
        if isinstance(obj, Plaintext):
            res = self._inner.mod_switch_plain_to(obj._inner, lvl)
            if out is None:
                return Plaintext(res)
            out._inner = res
            return out
        return _assign_or_return(
            self._inner.mod_switch_to(obj._inner, lvl), out)

    def mod_switch_to_inplace(self, obj, parms_id):
        lvl = self._lvl(parms_id)
        if isinstance(obj, Plaintext):
            obj._inner = self._inner.mod_switch_plain_to(obj._inner, lvl)
        else:
            obj._inner = self._inner.mod_switch_to(obj._inner, lvl)

    def rescale_to_next(self, c: Ciphertext,
                        out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.rescale_to_next(c._inner), out)

    def rescale_to_next_inplace(self, c: Ciphertext):
        c._inner = self._inner.rescale_to_next(c._inner)

    def rescale_to(self, c: Ciphertext, parms_id,
                   out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.rescale_to(c._inner, self._lvl(parms_id)), out)

    def rescale_to_inplace(self, c: Ciphertext, parms_id):
        c._inner = self._inner.rescale_to(c._inner, self._lvl(parms_id))

    # ---- plain ops ----
    def add_plain(self, c: Ciphertext, p: Plaintext,
                  out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.add_plain(c._inner, p._inner),
                                 out)

    def add_plain_inplace(self, c: Ciphertext, p: Plaintext):
        c._inner = self._inner.add_plain(c._inner, p._inner)

    def sub_plain(self, c: Ciphertext, p: Plaintext,
                  out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.sub_plain(c._inner, p._inner),
                                 out)

    def sub_plain_inplace(self, c: Ciphertext, p: Plaintext):
        c._inner = self._inner.sub_plain(c._inner, p._inner)

    def multiply_plain(self, c: Ciphertext, p: Plaintext,
                       out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.multiply_plain(c._inner, p._inner), out)

    def multiply_plain_1000(self, c: Ciphertext, p: Plaintext) -> Ciphertext:
        """Benchmark helper: 1000 repeated multiply_plain calls
        (binder.cu:637)."""
        ret = None
        for _ in range(1000):
            ret = self._inner.multiply_plain(c._inner, p._inner)
        return Ciphertext(ret)

    def multiply_batch(self, cs: Sequence[Ciphertext],
                       ps: Sequence[Plaintext]) -> List[Ciphertext]:
        """Pairwise multiply_plain over two sequences (binder.cu:644)."""
        return [Ciphertext(self._inner.multiply_plain(c._inner, p._inner))
                for c, p in zip(cs, ps)]

    def multiply_plain_inplace(self, c: Ciphertext, p: Plaintext):
        c._inner = self._inner.multiply_plain(c._inner, p._inner)

    # ---- NTT transforms ----
    def transform_to_ntt(self, obj, parms_id=None, out=None):
        if isinstance(obj, Plaintext):
            lvl = self._lvl(parms_id) if parms_id is not None \
                else self._ctx.first_level
            res = self._inner.transform_plain_to_ntt(obj._inner, lvl)
            if out is None:
                return Plaintext(res)
            out._inner = res
            return out
        return _assign_or_return(self._inner.transform_to_ntt(obj._inner),
                                 out)

    def transform_to_ntt_inplace(self, obj, parms_id=None):
        if isinstance(obj, Plaintext):
            lvl = self._lvl(parms_id) if parms_id is not None \
                else self._ctx.first_level
            obj._inner = self._inner.transform_plain_to_ntt(obj._inner, lvl)
        else:
            obj._inner = self._inner.transform_to_ntt(obj._inner)

    def transform_from_ntt(self, c: Ciphertext,
                           out: Optional[Ciphertext] = None):
        return _assign_or_return(self._inner.transform_from_ntt(c._inner),
                                 out)

    def transform_from_ntt_inplace(self, c: Ciphertext):
        c._inner = self._inner.transform_from_ntt(c._inner)

    # ---- Galois / rotations ----
    def apply_galois(self, c: Ciphertext, galois_elt: int,
                     galois_keys: GaloisKeys,
                     out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.apply_galois(c._inner, int(galois_elt),
                                     galois_keys._inner), out)

    def apply_galois_inplace(self, c: Ciphertext, galois_elt: int,
                             galois_keys: GaloisKeys):
        c._inner = self._inner.apply_galois(c._inner, int(galois_elt),
                                            galois_keys._inner)

    def rotate_rows(self, c: Ciphertext, steps: int,
                    galois_keys: GaloisKeys,
                    out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.rotate_rows(c._inner, int(steps),
                                    galois_keys._inner), out)

    def rotate_rows_inplace(self, c: Ciphertext, steps: int,
                            galois_keys: GaloisKeys):
        c._inner = self._inner.rotate_rows(c._inner, int(steps),
                                           galois_keys._inner)

    def rotate_columns(self, c: Ciphertext, galois_keys: GaloisKeys,
                       out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.rotate_columns(c._inner, galois_keys._inner), out)

    def rotate_columns_inplace(self, c: Ciphertext,
                               galois_keys: GaloisKeys):
        c._inner = self._inner.rotate_columns(c._inner, galois_keys._inner)

    def rotate_vector(self, c: Ciphertext, steps: int,
                      galois_keys: GaloisKeys,
                      out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.rotate_vector(c._inner, int(steps),
                                      galois_keys._inner), out)

    def rotate_vector_inplace(self, c: Ciphertext, steps: int,
                              galois_keys: GaloisKeys):
        c._inner = self._inner.rotate_vector(c._inner, int(steps),
                                             galois_keys._inner)

    def rotate_many(self, c: Ciphertext, steps: Sequence[int],
                    galois_keys: GaloisKeys) -> List[Ciphertext]:
        """Extension beyond the binder: hoisted multi-rotation of one
        ciphertext (decompose-once key switching; see
        Evaluator.rotate_many in troy_tpu.evaluator)."""
        return [Ciphertext(r) for r in self._inner.rotate_many(
            c._inner, [int(s) for s in steps], galois_keys._inner)]

    def apply_galois_many(self, c: Ciphertext, galois_elts: Sequence[int],
                          galois_keys: GaloisKeys) -> List[Ciphertext]:
        """Extension beyond the binder: hoisted multi-automorphism."""
        return [Ciphertext(r) for r in self._inner.apply_galois_many(
            c._inner, [int(e) for e in galois_elts], galois_keys._inner)]

    def complex_conjugate(self, c: Ciphertext, galois_keys: GaloisKeys,
                          out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.complex_conjugate(c._inner, galois_keys._inner), out)

    def complex_conjugate_inplace(self, c: Ciphertext,
                                  galois_keys: GaloisKeys):
        c._inner = self._inner.complex_conjugate(c._inner,
                                                 galois_keys._inner)

    # ---- LWE extension (troy) ----
    def extract_lwe(self, c: Ciphertext, term: int) -> LWECiphertext:
        return LWECiphertext(self._inner.extract_lwe(c._inner, int(term)))

    def assemble_lwe(self, lwe: LWECiphertext) -> Ciphertext:
        return Ciphertext(self._inner.assemble_lwe(lwe._inner))

    def field_trace_inplace(self, c: Ciphertext, auto_keys: GaloisKeys,
                            logn: int):
        c._inner = self._inner.field_trace(c._inner, auto_keys._inner,
                                           int(logn))

    def divide_by_poly_modulus_degree_inplace(self, c: Ciphertext,
                                              div: Optional[int] = None):
        d = int(div) if div is not None else self._ctx.n
        c._inner = self._inner.divide_by_poly_modulus_degree(c._inner, d)

    def pack_lwe_ciphertexts(self, lwes: Sequence[LWECiphertext],
                             auto_keys: GaloisKeys) -> Ciphertext:
        return Ciphertext(self._inner.pack_lwe_ciphertexts(
            [l._inner for l in lwes], auto_keys._inner))

    # ---- beyond-reference extensions (no binder counterpart) ----
    def extract_lwe_many(self, c: Ciphertext,
                         terms: Sequence[int]) -> list:
        """Batched extractLWE: one executable for any term set (see
        evaluator.extract_lwe_many)."""
        return [LWECiphertext(l) for l in
                self._inner.extract_lwe_many(c._inner,
                                             [int(t) for t in terms])]

    def rotate_many(self, c: Ciphertext, steps: Sequence[int],
                    galois_keys: GaloisKeys) -> list:
        """Hoisted multi-rotation of one ciphertext (see
        evaluator.rotate_many for the measured status)."""
        return [Ciphertext(r) for r in
                self._inner.rotate_many(c._inner,
                                        [int(s) for s in steps],
                                        galois_keys._inner)]

    def negacyclic_shift(self, c: Ciphertext, shift: int,
                         out: Optional[Ciphertext] = None):
        return _assign_or_return(
            self._inner.negacyclic_shift(c._inner, int(shift)), out)

    def negacyclic_shift_inplace(self, c: Ciphertext, shift: int):
        c._inner = self._inner.negacyclic_shift(c._inner, int(shift))


class Plain2d:
    def __init__(self, inner: Optional[_lin.Plain2d] = None):
        self._inner = inner or _lin.Plain2d()

    def encrypt(self, encryptor: Encryptor) -> "Cipher2d":
        return Cipher2d(self._inner.encrypt(encryptor._inner))

    def encrypt_symmetric(self, encryptor: Encryptor) -> "Cipher2d":
        return Cipher2d(self._inner.encrypt_symmetric(encryptor._inner))


class Cipher2d:
    def __init__(self, inner: Optional[_lin.Cipher2d] = None):
        self._inner = inner or _lin.Cipher2d()

    def save(self) -> bytes:
        return self._inner.save()

    def load(self, raw: bytes, context: SEALContext):
        self._inner = _lin.Cipher2d.load(raw, context._inner)

    def add_inplace(self, evaluator: Evaluator, other: "Cipher2d"):
        self._inner = self._inner.add(evaluator._inner, other._inner)

    def add_plain_inplace(self, evaluator: Evaluator, other: Plain2d):
        self._inner = self._inner.add_plain(evaluator._inner, other._inner)

    def add_plain(self, evaluator: Evaluator, other: Plain2d) -> "Cipher2d":
        return Cipher2d(self._inner.add_plain(evaluator._inner,
                                              other._inner))

    def mod_switch_to_next(self, evaluator: Evaluator):
        self._inner = self._inner.mod_switch_to_next(evaluator._inner)

    def relinearize(self, evaluator: Evaluator, rlk: RelinKeys):
        self._inner = self._inner.relinearize(evaluator._inner, rlk._inner)

    def switch_key(self, evaluator: Evaluator, ksk: KSwitchKeys):
        self._inner = self._inner.switch_key(evaluator._inner, ksk._inner)

    def multiply_scalar_inplace(self, encoder, evaluator: Evaluator,
                                scalar: int):
        enc = encoder._inner if hasattr(encoder, "_inner") else encoder
        self._inner = self._inner.multiply_scalar(
            evaluator._inner, enc.encode_polynomial, int(scalar))


class MatmulHelper:
    def __init__(self, batch_size: int, input_dims: int, output_dims: int,
                 slot_count: int, objective: int = 0,
                 pack_lwe: bool = True):
        self._inner = _lin.MatmulHelper(batch_size, input_dims, output_dims,
                                        slot_count, objective=objective,
                                        pack_lwe=pack_lwe)

    @staticmethod
    def _poly_codec(encoder):
        enc = encoder._inner if hasattr(encoder, "_inner") else encoder
        return enc.encode_polynomial, enc.decode_polynomial

    def encode_weights(self, encoder, weights) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_weights(
            ep, np.asarray(weights, dtype=np.uint64)))

    def encode_inputs(self, encoder, inputs) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_inputs(
            ep, np.asarray(inputs, dtype=np.uint64)))

    def encrypt_inputs(self, encryptor: Encryptor, encoder,
                       inputs) -> Cipher2d:
        ep, _ = self._poly_codec(encoder)
        return Cipher2d(self._inner.encrypt_inputs(
            encryptor._inner, ep, np.asarray(inputs, dtype=np.uint64)))

    def matmul(self, evaluator: Evaluator, a, w) -> Cipher2d:
        """Dispatches on operand types like the binder's overload set
        (binder.cu:773-781): (Cipher2d, Plain2d) -> matmul,
        (Cipher2d, Cipher2d) -> matmulCipher,
        (Plain2d, Cipher2d) -> matmulReverse."""
        if isinstance(a, Cipher2d) and isinstance(w, Plain2d):
            return Cipher2d(self._inner.matmul(evaluator._inner, a._inner,
                                               w._inner))
        if isinstance(a, Cipher2d) and isinstance(w, Cipher2d):
            return self.matmul_cipher(evaluator, a, w)
        if isinstance(a, Plain2d) and isinstance(w, Cipher2d):
            return self.matmul_reverse(evaluator, a, w)
        raise TypeError("matmul expects (Cipher2d, Plain2d), "
                        "(Cipher2d, Cipher2d) or (Plain2d, Cipher2d)")

    def matmul_cipher(self, evaluator: Evaluator, a: Cipher2d,
                      w: Cipher2d) -> Cipher2d:
        return Cipher2d(self._inner.matmul_cipher(evaluator._inner,
                                                  a._inner, w._inner))

    def matmul_reverse(self, evaluator: Evaluator, a: Plain2d,
                       w: Cipher2d) -> Cipher2d:
        return Cipher2d(self._inner.matmul_reverse(evaluator._inner,
                                                   a._inner, w._inner))

    def pack_outputs(self, evaluator: Evaluator, auto_keys: GaloisKeys,
                     cipher: Cipher2d) -> Cipher2d:
        return Cipher2d(self._inner.pack_outputs(evaluator._inner,
                                                 auto_keys._inner,
                                                 cipher._inner))

    def serialize_outputs(self, evaluator: Evaluator,
                          x: Cipher2d) -> bytes:
        return self._inner.serialize_outputs(evaluator._inner,
                                             evaluator._ctx, x._inner)

    def deserialize_outputs(self, evaluator: Evaluator,
                            raw: bytes) -> Cipher2d:
        return Cipher2d(self._inner.deserialize_outputs(
            evaluator._inner, evaluator._ctx, raw))

    def decrypt_outputs(self, encoder, decryptor: Decryptor,
                        outputs: Cipher2d) -> np.ndarray:
        _, dp = self._poly_codec(encoder)
        return self._inner.decrypt_outputs(dp, decryptor._inner,
                                           outputs._inner)

    def encode_outputs(self, encoder, outputs) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_outputs(
            ep, np.asarray(outputs, dtype=np.uint64)))

    def serialize_encoded_weights(self, w: Plain2d) -> bytes:
        return self._inner.serialize_encoded_weights(w._inner)

    def deserialize_encoded_weights(self, raw: bytes) -> Plain2d:
        return Plain2d(self._inner.deserialize_encoded_weights(raw))


class Conv2dHelper:
    def __init__(self, batch_size: int, image_height: int, image_width: int,
                 kernel_height: int, kernel_width: int,
                 input_channels: int, output_channels: int,
                 slot_count: int, objective: int = 0):
        self._inner = _lin.Conv2dHelper(
            batch_size, image_height, image_width, kernel_height,
            kernel_width, input_channels, output_channels, slot_count,
            objective=objective)

    # re-wrap as staticmethod: the bare function would otherwise rebind as
    # an instance method and swallow `encoder` into `self`
    _poly_codec = staticmethod(MatmulHelper._poly_codec)

    def encode_weights(self, encoder, weights) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_weights(
            ep, np.asarray(weights, dtype=np.uint64)))

    def encode_inputs(self, encoder, inputs) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_inputs(
            ep, np.asarray(inputs, dtype=np.uint64)))

    def encrypt_inputs(self, encryptor: Encryptor, encoder,
                       inputs) -> Cipher2d:
        ep, _ = self._poly_codec(encoder)
        return Cipher2d(self._inner.encrypt_inputs(
            encryptor._inner, ep, np.asarray(inputs, dtype=np.uint64)))

    def conv2d(self, evaluator: Evaluator, a, w) -> Cipher2d:
        """Dispatches on operand types like the binder's overload set
        (binder.cu:824-832): (Cipher2d, Plain2d) -> conv2d,
        (Cipher2d, Cipher2d) -> conv2dCipher,
        (Plain2d, Cipher2d) -> conv2dReverse."""
        if isinstance(a, Cipher2d) and isinstance(w, Plain2d):
            return Cipher2d(self._inner.conv2d(evaluator._inner, a._inner,
                                               w._inner))
        if isinstance(a, Cipher2d) and isinstance(w, Cipher2d):
            return self.conv2d_cipher(evaluator, a, w)
        if isinstance(a, Plain2d) and isinstance(w, Cipher2d):
            return self.conv2d_reverse(evaluator, a, w)
        raise TypeError("conv2d expects (Cipher2d, Plain2d), "
                        "(Cipher2d, Cipher2d) or (Plain2d, Cipher2d)")

    def conv2d_cipher(self, evaluator: Evaluator, a: Cipher2d,
                      w: Cipher2d) -> Cipher2d:
        return Cipher2d(self._inner.conv2d_cipher(evaluator._inner,
                                                  a._inner, w._inner))

    def conv2d_reverse(self, evaluator: Evaluator, a: Plain2d,
                       w: Cipher2d) -> Cipher2d:
        return Cipher2d(self._inner.conv2d_reverse(evaluator._inner,
                                                   a._inner, w._inner))

    def serialize_outputs(self, evaluator: Evaluator,
                          x: Cipher2d) -> bytes:
        return self._inner.serialize_outputs(evaluator._inner,
                                             evaluator._ctx, x._inner)

    def deserialize_outputs(self, evaluator: Evaluator,
                            raw: bytes) -> Cipher2d:
        return Cipher2d(self._inner.deserialize_outputs(
            evaluator._inner, evaluator._ctx, raw))

    def decrypt_outputs(self, encoder, decryptor: Decryptor,
                        outputs: Cipher2d) -> np.ndarray:
        _, dp = self._poly_codec(encoder)
        return self._inner.decrypt_outputs(dp, decryptor._inner,
                                           outputs._inner)

    def encode_outputs(self, encoder, outputs) -> Plain2d:
        ep, _ = self._poly_codec(encoder)
        return Plain2d(self._inner.encode_outputs(
            ep, np.asarray(outputs, dtype=np.uint64)))
