"""Multi-chip execution: device meshes and sharded ciphertext batches.

The reference is strictly single-GPU (cudaSetDevice(0) hard-coded,
reference: src/kernelprovider.cuh:30; no NCCL/MPI anywhere) — its only
parallelism is SIMT within one chip. This module is where our framework
goes beyond it: ciphertext-batch data parallelism over a
``jax.sharding.Mesh`` (DP across chips/hosts over ICI/DCN), with the
per-ciphertext kernels vmapped inside each shard.

Planned axes (SURVEY.md section 2.2 mapping): ``dp`` ciphertext batches,
``limb`` RNS-limb parallelism, ``coeff`` coefficient-sharded NTT with
all-to-all stage exchange.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..context import HeContext, ContextData
from ..he_types import Ciphertext, RelinKeys
from ..params import SchemeType
from .. import evaluator as ev_mod


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """A 1-D device mesh over the first n_devices local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(dp: int, tp: int,
                 axis_names: Sequence[str] = ("dp", "tp")) -> Mesh:
    """A (dp, tp) 2-D mesh: batch parallelism on the outer axis (DCN-friendly
    across hosts), limb/tensor parallelism on the inner axis (ICI-adjacent
    devices)."""
    devs = jax.devices()
    if dp * tp > len(devs):
        raise ValueError(f"mesh {dp}x{tp} exceeds {len(devs)} devices")
    return Mesh(np.array(devs[:dp * tp]).reshape(dp, tp),
                tuple(axis_names))


def shard_batch(mesh: Mesh, data: jnp.ndarray,
                axis_name: str = "dp") -> jnp.ndarray:
    """Place a (B, ...) batch with its leading axis split over the mesh."""
    spec = P(axis_name, *([None] * (data.ndim - 1)))
    return jax.device_put(data, NamedSharding(mesh, spec))


def batched_multiply_relin(context: HeContext, relin_keys: RelinKeys,
                           mesh: Mesh, axis_name: str = "dp"):
    """Build a jitted data-parallel batch op: (B, 2, k, n) x2 -> (B, 2, k, n)
    multiply+relinearize, batch axis sharded over the mesh.

    XLA sees fully replicated tables/keys and a batch-sharded data axis, so
    the compiled program runs each shard's ciphertexts locally with zero
    collectives — the DP layout the reference cannot express at all.
    """
    cd = context.first_context_data
    key_cd = context.key_context_data
    scheme = context.scheme
    key = relin_keys.keys[2]
    is_ntt = scheme in (SchemeType.ckks, SchemeType.bgv)

    # cd/key/key_cd are jit ARGUMENTS (replicated), never closures: a
    # closed-over device array becomes an embedded constant — a trace-time
    # device readback and a far slower executable on the TPU backend.
    def one(d1, d2, cd, key, key_cd):
        if scheme == SchemeType.bfv:
            prod = ev_mod._bfv_multiply(d1, d2, cd)
        else:
            prod = ev_mod._ntt_form_multiply(d1, d2, cd)
        delta = ev_mod._switch_key_core(prod[2], key, cd, key_cd, is_ntt)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cd)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cd)[0]
        return jnp.stack([c0, c1])

    batched = jax.vmap(one, in_axes=(0, 0, None, None, None))
    spec = NamedSharding(mesh, P(axis_name))

    jitted = jax.jit(batched, in_shardings=(spec, spec, None, None, None),
                     out_shardings=spec)

    def run(d1, d2):
        return jitted(d1, d2, cd, key, key_cd)

    run.jitted = jitted          # exposed for HLO inspection in tests
    run.args = (cd, key, key_cd)
    return run


def limb_sharded_multiply_relin(context: HeContext, relin_keys: RelinKeys,
                                mesh: Mesh, axis_name: str = "dp"):
    """Single-ciphertext multiply+relinearize with the RNS-LIMB axis
    sharded over the mesh (tensor-parallel analogue; SURVEY.md section 2.2
    mapping: "RNS-limb sharding").

    Elementwise ops and the per-limb NTT are embarrassingly parallel
    across limbs; the cross-limb contractions — the BEHZ base conversions
    (q -> Bsk) and the key-switch inner product over decomposition limbs —
    have their reduction axis sharded, so GSPMD lowers them to local
    partial products + an ICI reduce (psum), exactly the hand-written
    NCCL pattern a multi-GPU port would need, derived from annotations.

    The mesh must be no larger than the data-limb count (one or more
    limbs per device); with fewer limbs than devices GSPMD degenerates to
    replication — no communication, no scaling.
    """
    cd = context.first_context_data
    key_cd = context.key_context_data
    scheme = context.scheme
    key = relin_keys.keys[2]
    is_ntt = scheme in (SchemeType.ckks, SchemeType.bgv)

    def one(d1, d2, cd, key, key_cd):
        if scheme == SchemeType.bfv:
            prod = ev_mod._bfv_multiply(d1, d2, cd)
        else:
            prod = ev_mod._ntt_form_multiply(d1, d2, cd)
        delta = ev_mod._switch_key_core(prod[2], key, cd, key_cd, is_ntt)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cd)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cd)[0]
        return jnp.stack([c0, c1])

    # (size, k, n): shard the limb axis; the ksk (decomp, 2, key_limbs, n)
    # shards its decomposition axis to match the data limbs it consumes.
    spec = NamedSharding(mesh, P(None, axis_name, None))
    key_spec = NamedSharding(mesh, P(axis_name, None, None, None))

    jitted = jax.jit(one, in_shardings=(spec, spec, None, key_spec, None),
                     out_shardings=spec)

    def run(d1, d2):
        return jitted(d1, d2, cd, key, key_cd)

    run.jitted = jitted          # exposed for HLO inspection in tests
    run.args = (cd, key, key_cd)
    return run


def dp_limb_sharded_multiply_relin(context: HeContext,
                                   relin_keys: RelinKeys, mesh: Mesh,
                                   dp_axis: str = "dp",
                                   tp_axis: str = "tp"):
    """Combined DP x limb regime over a 2-D mesh (the dp x tp layout of a
    production pod slice): ciphertext batches split over the outer axis,
    each ciphertext's RNS limbs split over the inner axis. The limb-axis
    contractions (BEHZ base conversion, key-switch inner product) reduce
    over ICI within a dp group; no cross-group communication exists."""
    cd = context.first_context_data
    key_cd = context.key_context_data
    scheme = context.scheme
    key = relin_keys.keys[2]
    is_ntt = scheme in (SchemeType.ckks, SchemeType.bgv)

    def one(d1, d2, cd, key, key_cd):
        if scheme == SchemeType.bfv:
            prod = ev_mod._bfv_multiply(d1, d2, cd)
        else:
            prod = ev_mod._ntt_form_multiply(d1, d2, cd)
        delta = ev_mod._switch_key_core(prod[2], key, cd, key_cd, is_ntt)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cd)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cd)[0]
        return jnp.stack([c0, c1])

    batched = jax.vmap(one, in_axes=(0, 0, None, None, None))
    # (B, size, k, n): batch over dp, limbs over tp; the ksk decomposition
    # axis follows the data limbs it consumes (replicated across dp).
    spec = NamedSharding(mesh, P(dp_axis, None, tp_axis, None))
    key_spec = NamedSharding(mesh, P(tp_axis, None, None, None))

    jitted = jax.jit(batched,
                     in_shardings=(spec, spec, None, key_spec, None),
                     out_shardings=spec)

    def run(d1, d2):
        return jitted(d1, d2, cd, key, key_cd)

    run.jitted = jitted          # exposed for HLO inspection in tests
    run.args = (cd, key, key_cd)
    return run


def sharded_app_matmul(ev, mesh: Mesh, a2d, w2d, axis_name: str = "dp"):
    """The app-layer coefficient-packed matmul with its batch-block tile
    axis sharded over the mesh (BASELINE config 5: the LinearHelper
    pipeline across chips/hosts). Each device holds a slice of the input
    batch blocks and computes its output tiles locally — zero collectives,
    DCN-friendly across hosts. Weights/tables replicate.

    a2d: Cipher2d from helper.encrypt_inputs (batch-block rows);
    w2d: Plain2d from helper.encode_weights. Returns a Cipher2d with the
    same layout as helper.matmul (same contraction code path)."""
    from ..app import linear as lin

    spec = NamedSharding(mesh, P(axis_name, None, None, None, None))
    return lin._run_tile_contraction(ev, a2d, w2d, transpose_ct=False,
                                     transpose_pt=False, transpose_out=False,
                                     ct_sharding=spec)


def coeff_sharded_multiply_relin(context: HeContext, relin_keys: RelinKeys,
                                 mesh: Mesh, axis_name: str = "dp"):
    """Single-ciphertext multiply+relinearize with the COEFFICIENT axis
    sharded over the mesh — the reference's impossible-by-design scaling
    axis (its N<=131072 ceiling is one GPU, defines.h:30).

    The 4-step MXU NTT makes this natural for GSPMD: stage-1 matmuls
    partition over the free (column) axis, the inter-stage transpose
    becomes an all-to-all over ICI, stage-2 partitions over rows; XLA
    inserts the collectives from the sharding annotations alone (the
    scaling-book recipe: annotate, compile, let GSPMD place collectives).
    """
    cd = context.first_context_data
    key_cd = context.key_context_data
    scheme = context.scheme
    key = relin_keys.keys[2]
    is_ntt = scheme in (SchemeType.ckks, SchemeType.bgv)

    def one(d1, d2, cd, key, key_cd):
        if scheme == SchemeType.bfv:
            prod = ev_mod._bfv_multiply(d1, d2, cd)
        else:
            prod = ev_mod._ntt_form_multiply(d1, d2, cd)
        delta = ev_mod._switch_key_core(prod[2], key, cd, key_cd, is_ntt)
        c0 = ev_mod._add(prod[0][None], delta[0][None], cd)[0]
        c1 = ev_mod._add(prod[1][None], delta[1][None], cd)[0]
        return jnp.stack([c0, c1])

    # (size, k, n): shard the polynomial-coefficient axis; tables/keys ride
    # as replicated jit arguments (see batched_multiply_relin note).
    spec = NamedSharding(mesh, P(None, None, axis_name))

    jitted = jax.jit(one, in_shardings=(spec, spec, None, None, None),
                     out_shardings=spec)

    def run(d1, d2):
        return jitted(d1, d2, cd, key, key_cd)

    run.jitted = jitted          # exposed for HLO inspection in tests
    run.args = (cd, key, key_cd)
    return run
