"""More cross-implementation vectors: CKKS NTT-domain Galois rotation /
complex conjugation, and BFV with an even plain modulus (t = 2^41, the
app-layer configuration) — all bit-exact against the reference's
compiled CPU path (tests/data/ref_ckksrot_event.txt; generator kept
alongside)."""

import pathlib

import numpy as np
import pytest

import troy_tpu as T
from troy_tpu.he_types import GaloisKeys

N = 64
DATA = pathlib.Path(__file__).parent / "data" / "ref_ckksrot_event.txt"


@pytest.fixture(scope="module")
def vec():
    raw, meta = {}, {}
    for line in DATA.read_text().splitlines():
        parts = line.split()
        if parts[0].endswith("_meta"):
            meta[parts[0][:-5]] = (int(parts[1]), bool(int(parts[2])),
                                   int(parts[3]), float(parts[4]))
        elif parts[0].endswith("_rows"):
            pass
        elif parts[0] == "cr_elt":
            meta["elt"] = int(parts[1])
        else:
            raw[parts[0]] = np.array(parts[2:2 + int(parts[1])],
                                     dtype=np.uint64)
    return raw, meta


def _keys(raw, prefix, rows, key_limbs):
    import jax.numpy as jnp
    return jnp.asarray(np.stack(
        [raw[f"{prefix}_{i}"].reshape(2, key_limbs, N) for i in range(rows)]))


def test_ckks_rotation_and_conjugation_bit_exact(vec):
    raw, meta = vec
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.ckks, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [50, 30, 50])))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    ev = T.Evaluator(ctx)
    elt = meta["elt"]
    gk = GaloisKeys(keys={elt: _keys(raw, "cr_gk", 2, 3)})
    gkc = GaloisKeys(keys={2 * N - 1: _keys(raw, "cr_gkc", 2, 3)})
    size, ntt, _, scale = meta["cr_c1"]
    c1 = T.Ciphertext(data=raw["cr_c1"].reshape(size, -1, N),
                      level=ctx.first_level, is_ntt_form=ntt, scale=scale)
    rot = ev.rotate_vector(c1, 1, gk)
    np.testing.assert_array_equal(np.asarray(rot.data),
                                  raw["cr_rot"].reshape(2, -1, N))
    conj = ev.complex_conjugate(c1, gkc)
    np.testing.assert_array_equal(np.asarray(conj.data),
                                  raw["cr_conj"].reshape(2, -1, N))


def test_even_t_multiply_bit_exact(vec):
    """BEHZ multiply with t = 2^41 (even, power of two — the app/linear
    benchmark config) bit-exact against the reference, including the
    exact t/Q scale-and-round in decryption."""
    raw, meta = vec
    parms = T.EncryptionParameters(
        scheme=T.SchemeType.bfv, poly_modulus_degree=N,
        coeff_modulus=tuple(T.CoeffModulus.create(N, [60, 60, 60])),
        plain_modulus=T.Modulus(1 << 41))
    ctx = T.HeContext(parms, sec_level=T.SecurityLevel.none)
    ev = T.Evaluator(ctx)
    sk = T.SecretKey(data=raw["et_sk"].reshape(3, N))

    def load(tag):
        size, ntt, _, _ = meta[tag]
        return T.Ciphertext(data=raw[tag].reshape(size, -1, N),
                            level=ctx.first_level, is_ntt_form=ntt)

    c1, c2 = load("et_c1"), load("et_c2")
    prod = ev.multiply(c1, c2)
    np.testing.assert_array_equal(np.asarray(prod.data),
                                  raw["et_prod"].reshape(3, -1, N))
    dec = T.Decryptor(ctx, sk)
    pt = dec.decrypt(prod)
    np.testing.assert_array_equal(np.asarray(pt.data)[:len(raw["et_dec"])],
                                  raw["et_dec"])
