"""Evaluation domains for the PLONKish prover.

TPU-native analog of halo2_proofs' `EvaluationDomain` (reference:
scroll-tech/halo2 branch v1.1, /root/reference/Cargo.toml:40): a base
2^k domain for witness columns and an extended coset domain (size
2^extended_k >= deg(quotient)) for quotient evaluation. All twiddle/power
tables are host-precomputed numpy constants; transforms run on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_GENERATOR, FR_MOD, fr_root_of_unity
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.poly import ntt as _ntt

FR = fr_spec()


@dataclass(frozen=True)
class Domain:
    """2^k base domain + 2^extended_k coset domain for degree-j quotients."""

    k: int
    extended_k: int

    @classmethod
    def new(cls, gate_degree: int, k: int) -> "Domain":
        """Like EvaluationDomain::new(j, k): extended domain fits
        (j - 1) * n points (quotient degree)."""
        extended_k = k
        while (1 << extended_k) < (gate_degree - 1) * (1 << k) + 1:
            extended_k += 1
        return cls(k, extended_k)

    # -- scalar (python int) constants -------------------------------------
    @property
    def n(self) -> int:
        return 1 << self.k

    @property
    def extended_n(self) -> int:
        return 1 << self.extended_k

    @property
    def omega(self) -> int:
        return fr_root_of_unity(self.k)

    @property
    def omega_inv(self) -> int:
        return pow(self.omega, FR_MOD - 2, FR_MOD)

    @property
    def extended_omega(self) -> int:
        return fr_root_of_unity(self.extended_k)

    @property
    def g_coset(self) -> int:
        """Multiplicative-generator coset shift for the extended domain."""
        return FR_GENERATOR

    # -- device transforms --------------------------------------------------
    def lagrange_to_coeff(self, values):
        """(..., n, 16) evaluations -> coefficients."""
        return _ntt.intt(values, self.k)

    def coeff_to_lagrange(self, coeffs):
        return _ntt.ntt(coeffs, self.k)

    def coeff_to_extended(self, coeffs):
        """(..., n, 16) coeffs -> (..., extended_n, 16) evals on g * <W>."""
        batch = coeffs.shape[:-2]
        pad = jnp.zeros(batch + (self.extended_n - coeffs.shape[-2], ff.L), jnp.uint32)
        wide = jnp.concatenate([coeffs, pad], axis=-2)
        return _ntt.coset_ntt(wide, self.g_coset)

    def extended_to_coeff(self, evals):
        """(..., extended_n, 16) coset evals -> extended-size coeffs."""
        return _ntt.coset_intt(evals, self.g_coset)

    # -- vanishing-polynomial helpers ---------------------------------------
    @lru_cache(maxsize=None)
    def _zh_inv_extended(self):
        """1 / (X^n - 1) evaluated over the extended coset (host-computed).

        On the coset g*W^i: Z_H = g^n * W^(n i) - 1; W^(n i) cycles with
        period extended_n / n, so only that many distinct values exist.
        """
        import numpy as np

        period = self.extended_n // self.n
        w = self.extended_omega
        gn = pow(self.g_coset, self.n, FR_MOD)
        vals = []
        for i in range(period):
            zh = (gn * pow(w, self.n * i, FR_MOD) - 1) % FR_MOD
            vals.append(pow(zh, FR_MOD - 2, FR_MOD))
        tiled = np.tile(
            np.stack([FR.encode(v) for v in vals]), (self.extended_n // period, 1)
        )
        return tiled

    def divide_by_vanishing_poly(self, extended_evals):
        """Pointwise h(X) = e(X) / (X^n - 1) on the extended coset."""
        return ff.mont_mul(FR, extended_evals, jnp.asarray(self._zh_inv_extended()))
