"""Polynomial layer: radix-2 NTT/iNTT, evaluation domains, coset extension
(replaces halo2_proofs' FFT/EvaluationDomain backend)."""

from zkevm_tpu.poly import domain, goldens, ntt
from zkevm_tpu.poly.domain import Domain
from zkevm_tpu.poly.ntt import coset_intt, coset_ntt, intt, ntt as fft  # noqa: F401

__all__ = ["Domain", "domain", "goldens", "ntt", "intt", "coset_ntt", "coset_intt"]
