"""Pallas TPU kernels for 64-bit modular arithmetic on u32-pair lanes.

The XLA path (ops/u64ops.py) emulates every u64 op with u32 pairs and
materializes intermediates between fusions. These kernels keep the whole
Barrett/Shoup chain in VMEM registers, operating directly on the two u32
planes — the TPU-native analogue of the reference's fused device modmul
(reference: src/kernelutils.cuh:120-200 dMultiplyUintMod/dBarrettReduce128
inlined into every poly kernel).

Layout: a u64 array of shape (R, C) is carried as two u32 arrays
(lo, hi) of the same shape. ``split_u64``/``join_u64`` convert at the
boundary (free inside a surrounding jit — XLA already stores u64 this way).

Kernels are grid-free (whole block in VMEM): HE shapes (k x n <= 8 x 64K
u32-pairs = 4 MiB) fit comfortably. All kernels verified bit-exact against
the u64ops oracle in tests/test_pallas.py (interpret mode on CPU, compiled
on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

U32 = jnp.uint32
# numpy scalars, NOT jnp: traced jnp constants may not be captured by a
# pallas kernel body
_16 = np.uint32(16)
_M16 = np.uint32(0xFFFF)


def split_u64(x: jnp.ndarray):
    """u64 array -> (lo32, hi32) planes."""
    return (x & jnp.uint64(0xFFFFFFFF)).astype(U32), \
        (x >> jnp.uint64(32)).astype(U32)


def join_u64(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


# --------------------------------------------------------------------------
# in-kernel u32-pair primitives (VPU-register arithmetic)
# --------------------------------------------------------------------------

def _mul32_wide(a, b):
    """32x32 -> 64 as (lo32, hi32), via 16-bit halves (the TPU VPU has no
    widening 32-bit multiply; four 16x16->32 partials reassemble exactly)."""
    a0, a1 = a & _M16, a >> _16
    b0, b1 = b & _M16, b >> _16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> _16) + (lh & _M16) + (hl & _M16)
    lo = (ll & _M16) | (mid << _16)
    hi = hh + (lh >> _16) + (hl >> _16) + (mid >> _16)
    return lo, hi


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(U32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(U32)
    return lo, ahi - bhi - borrow


def _mul64_lo(alo, ahi, blo, bhi):
    """Low 64 bits of a 64x64 product, as a u32 pair."""
    lo, hi = _mul32_wide(alo, blo)
    hi = hi + alo * bhi + ahi * blo
    return lo, hi


def _mul64_full(alo, ahi, blo, bhi):
    """Full 128-bit product: returns (p0, p1, p2, p3) 32-bit words."""
    p0, c0 = _mul32_wide(alo, blo)            # bits 0..63
    m1lo, m1hi = _mul32_wide(alo, bhi)        # << 32
    m2lo, m2hi = _mul32_wide(ahi, blo)        # << 32
    h0, h1 = _mul32_wide(ahi, bhi)            # << 64
    # word 1 = c0 + m1lo + m2lo
    w1 = c0 + m1lo
    c1 = (w1 < c0).astype(U32)
    w1b = w1 + m2lo
    c1 = c1 + (w1b < w1).astype(U32)
    # word 2 = h0 + m1hi + m2hi + carries
    w2 = h0 + m1hi
    c2 = (w2 < h0).astype(U32)
    w2b = w2 + m2hi
    c2 = c2 + (w2b < w2).astype(U32)
    w2c = w2b + c1
    c2 = c2 + (w2c < w2b).astype(U32)
    w3 = h1 + c2
    return p0, w1b, w2c, w3


def _mulhi64(alo, ahi, blo, bhi):
    _, _, h2, h3 = _mul64_full(alo, ahi, blo, bhi)
    return h2, h3


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _cond_sub_mod(lo, hi, qlo, qhi):
    """x - q if x >= q else x."""
    ge = _geq64(lo, hi, qlo, qhi)
    slo, shi = _sub64(lo, hi, qlo, qhi)
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------

def _dyadic_barrett_kernel(alo_ref, ahi_ref, blo_ref, bhi_ref,
                           qlo_ref, qhi_ref, crlo_lo_ref, crlo_hi_ref,
                           crhi_lo_ref, crhi_hi_ref,
                           olo_ref, ohi_ref):
    """(a * b) mod q, per-row modulus: the dyadic (pointwise) product with
    inline 128-bit Barrett reduction (kernelutils.cu:89-115 semantics).

    Row-broadcast operands (q and the two Barrett ratio words) arrive as
    (R, 1) u32-pair planes.
    """
    alo, ahi = alo_ref[:], ahi_ref[:]
    blo, bhi = blo_ref[:], bhi_ref[:]
    qlo, qhi = qlo_ref[:], qhi_ref[:]
    c0lo, c0hi = crlo_lo_ref[:], crlo_hi_ref[:]
    c1lo, c1hi = crhi_lo_ref[:], crhi_hi_ref[:]

    z0, z1, z2, z3 = _mul64_full(alo, ahi, blo, bhi)   # z = a*b (128-bit)
    zlo_lo, zlo_hi = z0, z1
    zhi_lo, zhi_hi = z2, z3

    # Barrett round 1: carry = mulhi(z_lo, cr0)
    car_lo, car_hi = _mulhi64(zlo_lo, zlo_hi, c0lo, c0hi)
    # tmp2 = z_lo * cr1 (full)
    t0, t1, t2, t3 = _mul64_full(zlo_lo, zlo_hi, c1lo, c1hi)
    tmp1_lo, tmp1_hi = _add64(t0, t1, car_lo, car_hi)
    ov = ((tmp1_hi < t1) | ((tmp1_hi == t1) & (tmp1_lo < t0))).astype(U32)
    tmp3_lo, tmp3_hi = _add64(t2, t3, ov, jnp.zeros_like(ov))

    # round 2: tmp2 = z_hi * cr0
    s0, s1, s2, s3 = _mul64_full(zhi_lo, zhi_hi, c0lo, c0hi)
    u_lo, u_hi = _add64(tmp1_lo, tmp1_hi, s0, s1)
    ov2 = ((u_hi < tmp1_hi) | ((u_hi == tmp1_hi) &
                               (u_lo < tmp1_lo))).astype(U32)
    car2_lo, car2_hi = _add64(s2, s3, ov2, jnp.zeros_like(ov2))

    # tmp1 = z_hi * cr1 + tmp3 + carry (low 64 bits suffice)
    q1_lo, q1_hi = _mul64_lo(zhi_lo, zhi_hi, c1lo, c1hi)
    q1_lo, q1_hi = _add64(q1_lo, q1_hi, tmp3_lo, tmp3_hi)
    q1_lo, q1_hi = _add64(q1_lo, q1_hi, car2_lo, car2_hi)

    # result = z_lo - tmp1 * q, then one conditional subtract
    m_lo, m_hi = _mul64_lo(q1_lo, q1_hi, qlo, qhi)
    r_lo, r_hi = _sub64(zlo_lo, zlo_hi, m_lo, m_hi)
    r_lo, r_hi = _cond_sub_mod(r_lo, r_hi, qlo, qhi)
    olo_ref[:] = r_lo
    ohi_ref[:] = r_hi


def _shoup_kernel(xlo_ref, xhi_ref, wlo_ref, whi_ref, wq_lo_ref, wq_hi_ref,
                  qlo_ref, qhi_ref, olo_ref, ohi_ref):
    """Shoup modmul by a table constant, fully reduced
    (uintarithsmallmod.h:166-212 multiplyUintMod with operand quotient)."""
    xlo, xhi = xlo_ref[:], xhi_ref[:]
    wlo, whi = wlo_ref[:], whi_ref[:]
    wqlo, wqhi = wq_lo_ref[:], wq_hi_ref[:]
    qlo, qhi = qlo_ref[:], qhi_ref[:]
    hlo, hhi = _mulhi64(xlo, xhi, wqlo, wqhi)
    xw_lo, xw_hi = _mul64_lo(xlo, xhi, wlo, whi)
    hq_lo, hq_hi = _mul64_lo(hlo, hhi, qlo, qhi)
    r_lo, r_hi = _sub64(xw_lo, xw_hi, hq_lo, hq_hi)   # in [0, 2q)
    r_lo, r_hi = _cond_sub_mod(r_lo, r_hi, qlo, qhi)
    olo_ref[:] = r_lo
    ohi_ref[:] = r_hi


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@partial(jax.jit, static_argnames=("interpret",))
def dyadic_mul_pallas(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray,
                      cr_lo: jnp.ndarray, cr_hi: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """(a * b) mod q over (k, n) u64 arrays with per-limb moduli.

    q/cr_lo/cr_hi: (k,) u64 — the modulus and the low/high words of
    floor(2^128 / q). Bit-exact vs ops.ntt.rns_dyadic_mul.
    """
    k, n = a.shape
    alo, ahi = split_u64(a)
    blo, bhi = split_u64(b)
    # scalar-per-limb operands broadcast to the full tile shape: (k, 1)
    # blocks are below the TPU lane tiling minimum
    bcast = lambda v: jnp.broadcast_to(v.reshape(k, 1), (k, n))
    qlo, qhi = split_u64(bcast(q))
    c0lo, c0hi = split_u64(bcast(cr_lo))
    c1lo, c1hi = split_u64(bcast(cr_hi))
    olo, ohi = pl.pallas_call(
        _dyadic_barrett_kernel,
        out_shape=(jax.ShapeDtypeStruct((k, n), U32),
                   jax.ShapeDtypeStruct((k, n), U32)),
        in_specs=_vmem_specs(10),
        out_specs=tuple(_vmem_specs(2)),
        interpret=interpret,
    )(alo, ahi, blo, bhi, qlo, qhi, c0lo, c0hi, c1lo, c1hi)
    return join_u64(olo, ohi)


@partial(jax.jit, static_argnames=("interpret",))
def shoup_mul_pallas(x: jnp.ndarray, w: jnp.ndarray, w_quot: jnp.ndarray,
                     q: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Shoup multiply x * w mod q with w, w_quot, q broadcast per limb:
    x (k, n); w/w_quot/q (k,) or (k, n)."""
    k, n = x.shape
    xlo, xhi = split_u64(x)
    exp = lambda v: jnp.broadcast_to(
        v.reshape(k, 1) if v.ndim == 1 else v, (k, n))
    wlo, whi = split_u64(exp(w))
    wqlo, wqhi = split_u64(exp(w_quot))
    qlo, qhi = split_u64(exp(q))
    olo, ohi = pl.pallas_call(
        _shoup_kernel,
        out_shape=(jax.ShapeDtypeStruct((k, n), U32),
                   jax.ShapeDtypeStruct((k, n), U32)),
        in_specs=_vmem_specs(8),
        out_specs=tuple(_vmem_specs(2)),
        interpret=interpret,
    )(xlo, xhi, wlo, whi, wqlo, wqhi, qlo, qhi)
    return join_u64(olo, ohi)
