"""Negacyclic NTT on device — vectorized Harvey butterfly network.

TPU-native re-design of the reference's layer-per-kernel-launch GPU NTT
(reference: src/kernelutils.cu:330-476). Instead of one kernel launch per
butterfly layer, the whole transform is a single traced function: log2(n)
rounds of reshaped elementwise ops that XLA fuses; values ride the lazy
Harvey bounds ([0, 4q) between rounds) exactly like the reference, with a
single final reduction pass.

Works on arrays of shape (..., n); leading axes (RNS limbs, ciphertext
components, batch) are free.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import u64ops as u
from ..utils.ntt_tables import NttTablesHost

U64 = jnp.uint64


class NttTables(struct.PyTreeNode):
    """Device twin of NttTablesHost. Arrays are leaves; scalars are static."""

    root_powers: jnp.ndarray
    root_powers_shoup: jnp.ndarray
    inv_root_powers: jnp.ndarray
    inv_root_powers_shoup: jnp.ndarray
    n: int = struct.field(pytree_node=False)
    log_n: int = struct.field(pytree_node=False)
    modulus: int = struct.field(pytree_node=False)
    const_ratio: Tuple[int, int, int] = struct.field(pytree_node=False)
    inv_degree: int = struct.field(pytree_node=False)
    inv_degree_shoup: int = struct.field(pytree_node=False)

    @classmethod
    def from_host(cls, h: NttTablesHost) -> "NttTables":
        return cls(
            root_powers=jnp.asarray(h.root_powers),
            root_powers_shoup=jnp.asarray(h.root_powers_shoup),
            inv_root_powers=jnp.asarray(h.inv_root_powers),
            inv_root_powers_shoup=jnp.asarray(h.inv_root_powers_shoup),
            n=h.n,
            log_n=h.log_n,
            modulus=h.modulus,
            const_ratio=h.const_ratio,
            inv_degree=h.inv_degree,
            inv_degree_shoup=h.inv_degree_shoup,
        )


@partial(jax.jit, static_argnames=("lazy",))
def ntt_forward(x: jnp.ndarray, t: NttTables, lazy: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis.

    Input: coefficients in [0, q), natural order.
    Output: NTT values in bit-reversed evaluation order, in [0, q)
    (or [0, 4q) if lazy=True).
    """
    n, q = t.n, t.modulus
    q2 = u.u64(2 * q)
    lead = x.shape[:-1]
    v = x
    for r in range(t.log_n):
        m = 1 << r            # blocks this round
        gap = n >> (r + 1)    # half-block length
        w = jax.lax.dynamic_slice_in_dim(t.root_powers, m, m)
        wq = jax.lax.dynamic_slice_in_dim(t.root_powers_shoup, m, m)
        w = w.reshape((1,) * len(lead) + (m, 1))
        wq = wq.reshape((1,) * len(lead) + (m, 1))
        v = v.reshape(lead + (m, 2, gap))
        a = v[..., 0, :]
        b = v[..., 1, :]
        a = jnp.where(a >= q2, a - q2, a)             # guard: [0,4q) -> [0,2q)
        bw = u.mul_mod_shoup_lazy(b, w, wq, q)        # [0, 2q)
        v = jnp.stack([a + bw, a - bw + q2], axis=-2)  # both [0, 4q)
        v = v.reshape(lead + (n,))
    if not lazy:
        v = u.reduce_4q(v, q)
    return v


@partial(jax.jit, static_argnames=("lazy",))
def ntt_inverse(x: jnp.ndarray, t: NttTables, lazy: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT over the last axis (Gentleman–Sande), including
    the n^{-1} scaling. Input in [0, q) (accepts up to [0, 2q) lazily),
    output in [0, q) (or [0, 2q) if lazy=True)."""
    n, q = t.n, t.modulus
    q2 = u.u64(2 * q)
    lead = x.shape[:-1]
    v = x
    for r in range(t.log_n - 1, -1, -1):
        m = 1 << r
        gap = n >> (r + 1)
        w = jax.lax.dynamic_slice_in_dim(t.inv_root_powers, m, m)
        wq = jax.lax.dynamic_slice_in_dim(t.inv_root_powers_shoup, m, m)
        w = w.reshape((1,) * len(lead) + (m, 1))
        wq = wq.reshape((1,) * len(lead) + (m, 1))
        v = v.reshape(lead + (m, 2, gap))
        a = v[..., 0, :]
        b = v[..., 1, :]
        s = a + b                                      # [0, 4q)
        d = a - b + q2                                 # [0, 4q)
        s = jnp.where(s >= q2, s - q2, s)              # [0, 2q)
        bw = u.mul_mod_shoup_lazy(d, w, wq, q)         # [0, 2q)
        v = jnp.stack([s, bw], axis=-2)
        v = v.reshape(lead + (n,))
    # scale by n^{-1}
    v = u.mul_mod_shoup_lazy(v, u.u64(t.inv_degree), u.u64(t.inv_degree_shoup), q)
    if not lazy:
        v = u.reduce_2q(v, q)
    return v


@jax.jit
def dyadic_mul(a: jnp.ndarray, b: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Pointwise product mod q of two NTT-domain arrays (kernelutils dyadic
    product equivalent)."""
    return u.mul_mod(a, b, t.modulus, t.const_ratio)


@jax.jit
def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Full negacyclic polynomial product via NTT -> dyadic -> iNTT."""
    fa = ntt_forward(a, t)
    fb = ntt_forward(b, t)
    return ntt_inverse(dyadic_mul(fa, fb, t), t)
