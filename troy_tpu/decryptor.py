"""Decryptor: phase computation and per-scheme scaling back to plaintext.

Semantics-compatible with the reference's decryptor
(reference: src/decryptor.h:47, src/decryptor.cpp,
src/decryptor_cuda.cu:61-393): phase = <ct, (1, s, s^2, ...)> accumulated in
the NTT domain with cached secret-key powers; then
  * BFV: decryptScaleAndRound (t/Q scaling via the gamma trick);
  * CKKS: the mod-q NTT phase *is* the plaintext;
  * BGV: exact conversion mod t + correction-factor unwind.

Includes the host-side invariant noise budget (present on the reference's
CPU path, decryptor.cpp; commented out in its CUDA twin).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from .context import HeContext, ContextData
from .he_types import Ciphertext, Plaintext, SecretKey
from .params import SchemeType
from .ops import ntt as dntt
from .ops import poly as dpoly
from .ops import rns as drns
from .utils import numth


class Decryptor:
    """(decryptor.h:47)"""

    def __init__(self, context: HeContext, secret_key: SecretKey):
        self.context = context
        self._sk = secret_key
        # sk powers in NTT form over the *key* base; sliced per level
        self._sk_powers: Dict[int, jnp.ndarray] = {1: secret_key.data}

    def _sk_power(self, p: int) -> jnp.ndarray:
        if p not in self._sk_powers:
            cd = self.context.key_context_data
            self._sk_powers[p] = dntt.rns_dyadic_mul(
                self._sk_power(p - 1), self._sk.data, cd.ntt)
        return self._sk_powers[p]

    def _phase_ntt(self, ct: Ciphertext, cd: ContextData) -> jnp.ndarray:
        """c0 + c1 s + c2 s^2 + ... in the NTT domain: (k, n)
        (decryptor_cuda.cu:262-329 dotProductCtSkArray)."""
        t = cd.ntt
        k = cd.limbs
        if ct.is_ntt_form:
            comps = [ct.data[i] for i in range(ct.size)]
        else:
            comps = [dntt.rns_ntt_forward(ct.data[i], t, lazy=False)
                     for i in range(ct.size)]
        acc = comps[0]
        for i in range(1, ct.size):
            ski = self._sk_power(i)[:k]
            acc = dpoly.rns_add(acc, dntt.rns_dyadic_mul(comps[i], ski, t), t)
        return acc

    def decrypt(self, ct: Ciphertext) -> Plaintext:
        cd = self.context.get_context_data(ct.level)
        scheme = self.context.scheme
        phase_ntt = self._phase_ntt(ct, cd)

        if scheme == SchemeType.bfv:
            phase = dntt.rns_ntt_inverse(phase_ntt, cd.ntt)
            m = drns.decrypt_scale_and_round(phase, cd.rns_tool)
            return Plaintext(data=m)

        if scheme == SchemeType.ckks:
            return Plaintext(data=phase_ntt, level=ct.level,
                             is_ntt_form=True, scale=ct.scale)

        if scheme == SchemeType.bgv:
            phase = dntt.rns_ntt_inverse(phase_ntt, cd.ntt)
            m = drns.decrypt_mod_t(phase, cd.rns_tool)
            tt = int(cd.plain_modulus)
            if ct.correction_factor != 1:
                inv_cf = numth.invert_mod(ct.correction_factor % tt, tt)
                m = drns.smul(m, inv_cf, tt)
            return Plaintext(data=m)

        raise ValueError("unsupported scheme")

    # ---- noise budget (decryptor.cpp invariantNoiseBudget; host-side) ----
    def invariant_noise_budget(self, ct: Ciphertext) -> int:
        """Bits of noise budget left: log2(Q/2) - log2(2*||t/Q*phase - m||).
        Host big-int computation — a diagnostic, not a hot path."""
        if self.context.scheme not in (SchemeType.bfv, SchemeType.bgv):
            raise ValueError("noise budget is defined for BFV/BGV only")
        cd = self.context.get_context_data(ct.level)
        phase = np.asarray(dntt.rns_ntt_inverse(self._phase_ntt(ct, cd), cd.ntt))
        Q = cd.total_coeff_modulus
        t = int(cd.plain_modulus)
        base = cd.rns_tool.base_q
        # compose each coefficient, times t, centered mod Q
        k, n = phase.shape
        acc = np.zeros(n, dtype=object)
        for i in range(k):
            qi = base.values[i]
            acc += phase[i].astype(object) * base.inv_punctured(i) % qi \
                * base.punctured_prod(i)
        v = acc * t % Q
        v = np.minimum(v, Q - v)
        norm = int(v.max())
        budget = (Q // 2).bit_length() - (2 * norm).bit_length()
        return max(budget, 0)
