"""MXU-accelerated negacyclic NTT: the 4-step transform as two modular
matrix multiplications on the TPU systolic array.

This is the TPU-native redesign of the reference's butterfly NTT
(reference: src/kernelutils.cu:330-476 runs one kernel launch per layer —
log2(n) passes over HBM). Here the size-n transform factors as
n = A x B:

    out = ((W1 @ C) * Tw) @ W2          (all mod q)

where C is the coefficient array reshaped (A, B), W1/W2 are A x A / B x B
constant matrices absorbing the negacyclic twist (psi^k), the 1/n scaling
(inverse), and the bit-reversed output permutation, and Tw is an A x B
twiddle grid. Two MXU passes + one VPU twiddle pass replace log2(n) HBM
sweeps.

Exact integer semantics on a float/int8 systolic array via BIASED byte
planes: x = sum_i 2^{8i} (d_i + 128) with d_i = byte_i(x) - 128 in
[-128, 127] — a full 8 bits of payload per int8 plane, so a value of b bits
needs exactly ceil(b/8) planes (5 for 40-bit primes vs 8 for 60-bit; the
carry-bounded signed-digit scheme this replaced needed 6). The constant
+128 bias unfolds EXACTLY outside the matmul:

    W @ X = T @ S + 128 * rowsum(T) + 128 * colsum(S) + 128^2 * K

where T/S are the biased planes, rowsum(T) is a host-precomputed per-plane
constant, colsum(S) is one cheap device reduction per X plane, and K is the
contraction length. A digit-plane product W @ C is then one int8 matmul of
the stacked planes with i32 accumulation; plane products are regrouped in
radix 2^32 (with a statically-derived signed-offset bound) before the final
Shoup fold back to [0, q).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from . import u64ops as u
from .. import native
from ..utils import numth

U64 = jnp.uint64
DIGITS = 8          # max byte planes (61-bit moduli)


def _ndigits(q: int) -> int:
    """Biased byte planes needed for residues in [0, q): exactly
    ceil(bitlen(q-1)/8), since each int8 plane carries a full byte of
    payload (bias corrected outside the matmul — see _mod_matmul). 5
    planes for 40-bit primes vs 8 for 60-bit — narrow moduli shrink BOTH
    matmul operands, so a 40-bit limb's NTT runs 5x5 plane pairs instead
    of 8x8 (61% fewer MXU MACs)."""
    return _ndigits_value(q - 1)


def _ndigits_value(v: int) -> int:
    """Byte planes covering values in [0, v]."""
    return max(1, (int(v).bit_length() + 7) // 8)


def _split_factors(n: int) -> Tuple[int, int]:
    """n = A * B with A, B as close to square as possible (A >= B)."""
    log_n = n.bit_length() - 1
    a = 1 << ((log_n + 1) // 2)
    return a, n // a


def _biased_digits_host(mat: np.ndarray, ndig: int) -> np.ndarray:
    """u64 matrix -> (ndig, ...) int8 biased byte planes: plane i stores
    byte_i(x) - 128, so x = sum_i 2^{8i} (plane_i + 128). Exact for
    x < 2^{8*ndig} (asserted)."""
    m = np.asarray(mat, dtype=np.uint64)
    if 8 * ndig < 64:
        assert not (m >> np.uint64(8 * ndig)).any(), \
            "value exceeds the byte-plane range"
    planes = np.stack(
        [((m >> np.uint64(8 * i)) & np.uint64(0xFF)).astype(np.int16)
         for i in range(ndig)])
    return (planes - np.int16(128)).astype(np.int8)


def _plane_sums(planes: np.ndarray, axis: int) -> np.ndarray:
    """Per-plane sums of the biased digits over the contraction axis —
    the host-precomputed half of the bias correction (i32)."""
    return planes.astype(np.int32).sum(axis=axis)


def _signed_digits_host(mat: np.ndarray, ndig: int = DIGITS) -> np.ndarray:
    """u64 matrix -> (ndig, ...) int8 signed radix-256 planes (exact).
    Legacy scheme kept as the oracle for the native engine's
    signed_digits_fill (tests/test_native.py); the transform itself now
    uses _biased_digits_host."""
    out = np.zeros((ndig,) + mat.shape, dtype=np.int64)
    rem = mat.astype(object)
    carry = np.zeros(mat.shape, dtype=object)
    for i in range(ndig):
        d = (rem & 0xFF) + carry
        carry = np.where(d >= 128, 1, 0)
        d = np.where(d >= 128, d - 256, d)
        out[i] = d.astype(np.int64)
        rem = rem >> 8
    assert (rem + carry == 0).all(), "value exceeded the digit range"
    return out.astype(np.int8)


class MxuNttTables(struct.PyTreeNode):
    """Constant matrices for one (n, q): forward and inverse 4-step factors,
    as int8 digit planes (matmul operands) plus u64 twiddles (VPU pass)."""

    w1_digits: jnp.ndarray       # (D, A, A) int8 biased byte planes
    w1_sums: jnp.ndarray         # (D, A) i32 plane sums over contraction
    w2_digits: jnp.ndarray       # (D, B, B) int8
    w2_sums: jnp.ndarray         # (D, B) i32
    tw: jnp.ndarray              # (A, B) u64
    tw_shoup: jnp.ndarray        # (A, B) u64
    iw1_digits: jnp.ndarray      # (D, A, A) int8
    iw1_sums: jnp.ndarray        # (D, A) i32
    iw2_digits: jnp.ndarray      # (D, B, B) int8
    iw2_sums: jnp.ndarray        # (D, B) i32
    itw: jnp.ndarray             # (A, B) u64
    itw_shoup: jnp.ndarray       # (A, B) u64
    n: int = struct.field(pytree_node=False)
    a: int = struct.field(pytree_node=False)
    b: int = struct.field(pytree_node=False)
    modulus: int = struct.field(pytree_node=False)


@lru_cache(maxsize=None)
def make_mxu_tables_host(n: int, q: int):
    """Host precompute of the 4-step factor matrices (numpy, exact ints)."""
    A, B = _split_factors(n)
    log_a, log_b = A.bit_length() - 1, B.bit_length() - 1
    psi = numth.minimal_primitive_root(2 * n, q)     # 2n-th root
    omega = pow(psi, 2, q)                           # n-th root
    inv_psi = numth.invert_mod(psi, q)
    inv_omega = numth.invert_mod(omega, q)
    inv_a = numth.invert_mod(A, q)
    inv_b = numth.invert_mod(B, q)

    brv_a = [numth.reverse_bits(i, log_a) for i in range(A)]
    brv_b = [numth.reverse_bits(i, log_b) for i in range(B)]

    def pow_table(base: int, count: int):
        t = [1] * count
        for i in range(1, count):
            t[i] = t[i - 1] * base % q
        return t

    om = pow_table(omega, n)          # omega^j, j mod n
    iom = pow_table(inv_omega, n)
    ps = pow_table(psi, 2 * n)        # psi^j, j mod 2n
    ips = pow_table(inv_psi, 2 * n)

    # forward: out[p1, p2] = sum_b [sum_a c[a,b] W1[p1,a]] Tw[p1,b] W2[b,p2]
    #   W1[p1, a] = omega^(B*a*brv_a[p1]) * psi^(a*B)
    #   Tw[p1, b] = psi^b * omega^(b*brv_a[p1])
    #   W2[b, p2] = omega^(A*b*brv_b[p2])
    w1 = np.array([[om[B * a * r % n] * ps[a * B % (2 * n)] % q
                    for a in range(A)] for r in brv_a], dtype=object)
    tw = np.array([[ps[b] * om[b * r % n] % q
                    for b in range(B)] for r in brv_a], dtype=object)
    w2 = np.array([[om[A * b * r % n] for r in brv_b]
                   for b in range(B)], dtype=object)

    # inverse of out = ((W1 C) . Tw) W2:
    #   Y = (OUT @ V2) / Tw ; C = V1 @ Y
    #   V2[p2, b] = (1/B) omega^(-A*b*brv_b[p2])
    #   iTw[p1, b] = psi^(-b) omega^(-b*brv_a[p1])
    #   V1[a, p1] = (1/A) omega^(-B*a*brv_a[p1]) psi^(-a*B)
    v2 = np.array([[inv_b * iom[A * b * r % n] % q
                    for b in range(B)] for r in brv_b], dtype=object)
    itw = np.array([[ips[b] * iom[b * r % n] % q
                     for b in range(B)] for r in brv_a], dtype=object)
    v1 = np.array([[inv_a * iom[B * a * r % n] % q * ips[a * B % (2 * n)] % q
                    for r in brv_a] for a in range(A)], dtype=object)
    return A, B, w1, tw, w2, v1, itw, v2


@lru_cache(maxsize=None)
def make_mxu_tables(n: int, q: int) -> MxuNttTables:
    """Cached per (n, q): chain levels share primes, so the digit planes
    and twiddles convert + upload exactly once per prime. Uses the native
    precompute engine when available (bit-exact with the Python oracle —
    tests/test_native.py); falls back to make_mxu_tables_host.

    Digit planes are sized to the MODULUS (_ndigits): residues < q need
    exactly ceil(bits/8) biased byte planes, so narrow primes shrink the
    matmuls."""
    A, B = _split_factors(n)
    nd = _ndigits(q)
    psi = numth.minimal_primitive_root(2 * n, q)

    def planes_and_sums(m, axis):
        """Biased planes + per-plane contraction sums for one factor matrix:
        axis is the contraction axis in (R, C) coords (W1/V1 multiply from
        the left -> contract columns, axis 1; W2/V2 from the right ->
        contract rows, axis 0)."""
        pl = _biased_digits_host(m, nd)
        return (jnp.asarray(pl),
                jnp.asarray(_plane_sums(pl, axis=1 + axis)))

    filled = native.mxu_tables_fill(n, A, B, q, psi)
    if filled is not None:
        w1, tw, w2, v1, itw, v2, tw_shoup, itw_shoup = filled
        w1_d, w1_s = planes_and_sums(w1, 1)
        w2_d, w2_s = planes_and_sums(w2, 0)
        v1_d, v1_s = planes_and_sums(v1, 1)
        v2_d, v2_s = planes_and_sums(v2, 0)
        return MxuNttTables(
            w1_digits=w1_d, w1_sums=w1_s,
            w2_digits=w2_d, w2_sums=w2_s,
            tw=jnp.asarray(tw),
            tw_shoup=jnp.asarray(tw_shoup),
            iw1_digits=v1_d, iw1_sums=v1_s,
            iw2_digits=v2_d, iw2_sums=v2_s,
            itw=jnp.asarray(itw),
            itw_shoup=jnp.asarray(itw_shoup),
            n=n, a=A, b=B, modulus=q,
        )
    A, B, w1, tw, w2, v1, itw, v2 = make_mxu_tables_host(n, q)
    shoup = np.vectorize(lambda w: (int(w) << 64) // q, otypes=[object])
    as_np_u64 = lambda m: np.array(
        [[int(x) & 0xFFFFFFFFFFFFFFFF for x in row] for row in m],
        dtype=np.uint64)
    as_u64 = lambda m: jnp.asarray(as_np_u64(m))
    w1_d, w1_s = planes_and_sums(as_np_u64(w1), 1)
    w2_d, w2_s = planes_and_sums(as_np_u64(w2), 0)
    v1_d, v1_s = planes_and_sums(as_np_u64(v1), 1)
    v2_d, v2_s = planes_and_sums(as_np_u64(v2), 0)
    return MxuNttTables(
        w1_digits=w1_d, w1_sums=w1_s,
        w2_digits=w2_d, w2_sums=w2_s,
        tw=as_u64(tw),
        tw_shoup=as_u64(shoup(tw)),
        iw1_digits=v1_d, iw1_sums=v1_s,
        iw2_digits=v2_d, iw2_sums=v2_s,
        itw=as_u64(itw),
        itw_shoup=as_u64(shoup(itw)),
        n=n, a=A, b=B, modulus=q,
    )


# ---------------------------------------------------------------------------
# device pipeline
# ---------------------------------------------------------------------------

def _digits_device(x: jnp.ndarray, ndig: int) -> jnp.ndarray:
    """u64 (..., R, C) -> int8 (ndig, ..., R, C) biased byte planes
    (byte_i - 128; exact for values < 2^{8*ndig})."""
    planes = []
    for i in range(ndig):
        b = ((x >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.int16)
        planes.append((b - jnp.int16(128)).astype(jnp.int8))
    return jnp.stack(planes)


def _mod_matmul(w_digits: jnp.ndarray, w_sums: jnp.ndarray, x: jnp.ndarray,
                q: int, contract_left: bool, x_planes: int = 0) -> jnp.ndarray:
    """Exact (W @ X) mod q (or (X @ W) if not contract_left).

    w_digits: (Dw, R, R) int8 biased planes with Dw = _ndigits(q);
    w_sums: (Dw, R) i32 per-plane sums over W's contraction axis;
    x: (..., R, C) u64 residues < q (or < 2^{8*x_planes} when given).
    One int8 MXU matmul over the stacked biased planes; the +128 bias
    unfolds exactly as rank-1 corrections (precomputed W sums, one device
    reduction per X plane, and a scalar); plane products are regrouped in
    radix 2^32 and Shoup-folded to [0, q).

    x_planes (static, 0 = same as Dw): plane count for the X operand —
    callers with a tighter input bound (e.g. the key-switch decomposition
    rows of a narrow data prime lifted into a wide key prime) shrink the
    X side of the MXU product from Dw*Dw to Dw*x_planes plane pairs.
    """
    D = w_digits.shape[0]                    # per-modulus plane count (W)
    Dx = x_planes or D
    xd = _digits_device(x, Dx)               # (Dx, ..., R, C)
    K = x.shape[-2] if contract_left else x.shape[-1]   # contraction length
    # X-plane sums over the contraction axis (the device half of the bias
    # correction): contract_left sums X's rows, right-multiply its columns
    xs = jnp.sum(xd, axis=(-2 if contract_left else -1), dtype=jnp.int32)
    # contraction via dot_general: stack W planes on rows, X planes on cols
    if contract_left:
        # (D*R, R) @ (..., R, Dx*C) -> (..., D*R, Dx*C)
        lead = x.shape[:-2]
        R, C = x.shape[-2], x.shape[-1]
        wd = w_digits.reshape(D * w_digits.shape[1], w_digits.shape[2])
        xt = jnp.moveaxis(xd, 0, -2)         # (..., R, Dx, C)
        xt = xt.reshape(lead + (R, Dx * C))
        prod = jax.lax.dot_general(
            wd.astype(jnp.int8), xt,
            dimension_numbers=(((1,), (len(lead),)), ((), ())),
            preferred_element_type=jnp.int32)     # (D*R', ..., Dx*C)
        prod = jnp.moveaxis(prod, 0, -2)          # (..., D*R', Dx*C)
        Rp = w_digits.shape[1]
        prod = prod.reshape(lead + (D, Rp, Dx, C))
        prod = jnp.moveaxis(prod, -2, -3)         # (..., D, Dx, Rp, C)
    else:
        # (..., R, C) @ (C, C'): rows stack the X planes, cols the W planes
        lead = x.shape[:-2]
        R, C = x.shape[-2], x.shape[-1]
        wd = w_digits                              # (D, C, C')
        Cp = wd.shape[2]
        wt = jnp.moveaxis(wd, 0, 1).reshape(C, D * Cp)
        xt = jnp.moveaxis(xd, 0, -2).reshape(lead + (R * Dx, C))
        prod = jax.lax.dot_general(
            xt, wt,
            dimension_numbers=(((len(lead) + 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)      # (..., R*Dx, D*Cp)
        prod = prod.reshape(lead + (R, Dx, D, Cp))  # (r, i, j, p2)
        prod = jnp.moveaxis(prod, -4, -2)           # (..., Dx, D, R, Cp)
        prod = jnp.swapaxes(prod, -4, -3)           # (..., D, Dx, R, Cp)

    # group by digit-sum s = i + j (i: W digit, j: X digit), folding the
    # bias corrections in per group:
    #   sums[s] = sum_{i+j=s} T_i@S_j                       (the matmul)
    #           + 128 * sum_i w_sums[i]   (broadcast over the free axis)
    #           + 128 * sum_j xs[j]       (broadcast over the other axis)
    #           + 128^2 * K * npairs(s)
    lead2 = prod.shape[:-4]
    rows, cols = prod.shape[-2], prod.shape[-1]
    n_sums = D + Dx - 1
    sums = [jnp.zeros(lead2 + (rows, cols), dtype=jnp.int32)
            for _ in range(n_sums)]
    for i in range(D):
        for j in range(Dx):
            sums[i + j] = sums[i + j] + prod[..., i, j, :, :]
    bias = jnp.int32(128)
    for s in range(n_sums):
        ii = [i for i in range(D) if 0 <= s - i < Dx]
        wc = w_sums[ii[0]]
        for i in ii[1:]:
            wc = wc + w_sums[i]
        xc = xs[s - ii[0]]
        for i in ii[1:]:
            xc = xc + xs[s - i]
        const = jnp.int32(128 * 128 * K * len(ii))
        if contract_left:
            # sums[s]: (..., R', C); wc: (R',); xc: (..., C)
            corr = bias * wc[:, None] + bias * xc[..., None, :] + const
        else:
            # sums[s]: (..., R, C'); wc: (C',); xc: (..., R)
            corr = bias * wc + bias * xc[..., :, None] + const
        sums[s] = sums[s] + corr

    # radix-2^32 regroup: U_g = sum_{r<4} T_{4g+r} * 2^{8r}, lifted to a
    # nonnegative residue with a STATIC worst-case offset: each (i, j)
    # plane pair contributes |T_i@S_j| + the three bias terms
    # <= 4 * 128^2 * K, so |sums[s]| <= min(D, Dx) * 2^16 * K and
    # |U_g| <= that * (2^24 + 2^16 + 2^8 + 1).
    max_sum = min(D, Dx) * 4 * 128 * 128 * K
    assert max_sum < (1 << 31), "per-digit-sum accumulator exceeds int32"
    max_acc = max_sum * ((1 << 24) + (1 << 16) + (1 << 8) + 1)
    m_off = (max_acc // q + 1) * q
    assert m_off + max_acc < (1 << 63), "group accumulator exceeds int64"
    out = None
    groups = (n_sums + 3) // 4
    for g in range(groups):
        acc = jnp.zeros(lead2 + (rows, cols), dtype=jnp.int64)
        for r in range(4):
            s = 4 * g + r
            if s < n_sums:
                acc = acc + sums[s].astype(jnp.int64) * (1 << (8 * r))
        av = (acc + jnp.int64(m_off)).astype(U64)
        scale = pow(2, 32 * g, q)
        term = u.mul_mod_shoup(av, u.u64(scale), u.u64((scale << 64) // q), q)
        out = term if out is None else u.add_mod(out, term, q)
    return out


@partial(jax.jit, static_argnames=("x_planes",))
def ntt_forward_mxu(x: jnp.ndarray, t: MxuNttTables,
                    x_planes: int = 0) -> jnp.ndarray:
    """Forward negacyclic NTT over the last axis via two MXU matmuls.
    Bit-for-bit the same scrambled output as ops.ntt.ntt_forward, fully
    reduced to [0, q). Accepts lazy inputs (any u64 residues).

    x_planes (static, 0 = modulus-sized): when the CALLER knows a tighter
    input magnitude bound (values < 2^{8*x_planes}), the entry Barrett
    normalization is skipped — any representative of the residue class
    feeds the matmul directly (the fold happens mod q anyway) — and
    stage 1 runs Dw*x_planes plane pairs instead of Dw^2. The key-switch
    decomposition uses this for narrow data primes lifted into wide key
    primes (evaluator._switch_key_decompose)."""
    q = t.modulus
    lead = x.shape[:-1]
    if not x_planes:
        x = u.barrett_reduce_64(x, q, ((1 << 128) // q) >> 64)
    c = x.reshape(lead + (t.a, t.b))
    y = _mod_matmul(t.w1_digits, t.w1_sums, c, q, contract_left=True,
                    x_planes=x_planes)                          # (.., A, B)
    y = u.mul_mod_shoup(y, t.tw, t.tw_shoup, q)
    z = _mod_matmul(t.w2_digits, t.w2_sums, y, q,
                    contract_left=False)                        # (.., A, B)
    return z.reshape(lead + (t.n,))


@partial(jax.jit, static_argnames=())
def ntt_inverse_mxu(x: jnp.ndarray, t: MxuNttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT (including 1/n), matching ops.ntt.ntt_inverse."""
    q = t.modulus
    lead = x.shape[:-1]
    x = u.barrett_reduce_64(x, q, ((1 << 128) // q) >> 64)
    z = x.reshape(lead + (t.a, t.b))
    y = _mod_matmul(t.iw2_digits, t.iw2_sums, z, q, contract_left=False)
    y = u.mul_mod_shoup(y, t.itw, t.itw_shoup, q)
    c = _mod_matmul(t.iw1_digits, t.iw1_sums, y, q, contract_left=True)
    return c.reshape(lead + (t.n,))
