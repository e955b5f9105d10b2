"""Pure-Python golden model for NTT / polynomial ops over BN254 Fr.

Golden counterpart of scroll-tech/halo2's FFT backend (reference:
halo2_proofs `EvaluationDomain`/`best_fft`, imported at
/root/reference/Cargo.toml:40). Host-only, arbitrary-precision int.
"""

from __future__ import annotations

from zkevm_tpu.ff.goldens import FR_MOD, fr_root_of_unity


def naive_ntt(coeffs: list[int], omega: int, p: int = FR_MOD) -> list[int]:
    """O(n^2) DFT: out[i] = sum_j coeffs[j] * omega^(i*j)."""
    n = len(coeffs)
    out = []
    for i in range(n):
        acc, w = 0, 1
        wi = pow(omega, i, p)
        for j in range(n):
            acc = (acc + coeffs[j] * w) % p
            w = w * wi % p
        out.append(acc)
    return out


def naive_intt(evals: list[int], omega: int, p: int = FR_MOD) -> list[int]:
    n = len(evals)
    n_inv = pow(n, p - 2, p)
    out = naive_ntt(evals, pow(omega, p - 2, p), p)
    return [v * n_inv % p for v in out]


def poly_eval(coeffs: list[int], x: int, p: int = FR_MOD) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def domain_omega(k: int) -> int:
    return fr_root_of_unity(k)
