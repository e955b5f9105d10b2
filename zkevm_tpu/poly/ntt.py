"""Radix-2 NTT / iNTT over BN254 Fr, vectorized over limb arrays.

TPU-first replacement for scroll-tech/halo2's `best_fft` (recursive rayon
FFT; reference: halo2_proofs via /root/reference/Cargo.toml:40). Design:

- host-precomputed twiddle tables (Montgomery limbs, cached per (k));
- one bit-reversal gather, then log2(n) in-place-style butterfly stages,
  each a single batched Montgomery multiply over n/2 lanes — so the whole
  transform is ~log2(n) fused vector ops, ideal for XLA/VPU;
- operates on arrays of shape (..., n, 16): leading axes batch multiple
  polynomials through one compiled transform.

Sharded multi-chip NTT (all_to_all butterfly exchange, SURVEY.md §2.5) goes
in ``zkevm_tpu.parallel``; this module is the single-chip core.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_MOD, fr_root_of_unity
from zkevm_tpu.ff.limbs import fr_spec

FR = fr_spec()


@lru_cache(maxsize=None)
def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    perm = np.zeros(n, dtype=np.int32)
    for i in range(n):
        perm[i] = int(format(i, f"0{k}b")[::-1], 2) if k else 0
    return perm


@lru_cache(maxsize=None)
def _omega_powers(k: int, inverse: bool) -> np.ndarray:
    """(n/2, 16) Montgomery limbs of omega^j, j < n/2, for the 2^k domain."""
    n = 1 << k
    omega = fr_root_of_unity(k)
    if inverse:
        omega = pow(omega, FR_MOD - 2, FR_MOD)
    pows = np.empty((max(n // 2, 1), ff.L), dtype=np.uint32)
    w = 1
    for j in range(max(n // 2, 1)):
        pows[j] = FR.encode(w)
        w = w * omega % FR_MOD
    return pows


def _fft_core(a: jnp.ndarray, k: int, inverse: bool) -> jnp.ndarray:
    """In-order -> in-order radix-2 DIT NTT over axis -2. a: (..., n, 16)."""
    n = 1 << k
    assert a.shape[-2] == n, (a.shape, n)
    if n == 1:
        return a
    a = jnp.take(a, jnp.asarray(_bitrev_perm(k)), axis=-2)
    pows = _omega_powers(k, inverse)  # omega^j for j < n/2
    batch = a.shape[:-2]
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        # twiddles for this stage: omega^(n/m * j), j < half
        tw = jnp.asarray(pows[:: n // m][:half])  # (half, 16)
        x = a.reshape(batch + (n // m, 2, half, ff.L))
        even = x[..., 0, :, :]
        odd = ff.mont_mul(FR, x[..., 1, :, :], tw)
        a = jnp.concatenate(
            [ff.add(FR, even, odd), ff.sub(FR, even, odd)], axis=-2
        ).reshape(batch + (n, ff.L))
    return a


def ntt(a: jnp.ndarray, k: int | None = None) -> jnp.ndarray:
    """Coefficients -> evaluations on the 2^k domain (natural order)."""
    if k is None:
        k = int(a.shape[-2]).bit_length() - 1
    return _fft_core(a, k, inverse=False)


def intt(a: jnp.ndarray, k: int | None = None) -> jnp.ndarray:
    """Evaluations -> coefficients (includes the 1/n scaling)."""
    if k is None:
        k = int(a.shape[-2]).bit_length() - 1
    out = _fft_core(a, k, inverse=True)
    n_inv = jnp.asarray(FR.encode(pow(1 << k, FR_MOD - 2, FR_MOD)))
    return ff.mont_mul(FR, out, n_inv)


@lru_cache(maxsize=None)
def _power_table(base: int, n: int) -> np.ndarray:
    """(n, 16) Montgomery limbs of base^i for i < n (host-computed)."""
    out = np.empty((n, ff.L), dtype=np.uint32)
    w = 1
    for i in range(n):
        out[i] = FR.encode(w)
        w = w * base % FR_MOD
    return out


def scale_by_powers(a: jnp.ndarray, base: int) -> jnp.ndarray:
    """a[..., i, :] *= base^i — the coset-shift step of a coset FFT."""
    n = a.shape[-2]
    return ff.mont_mul(FR, a, jnp.asarray(_power_table(base, n)))


def coset_ntt(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Evaluate the polynomial on the coset shift * <omega>."""
    return ntt(scale_by_powers(a, shift))


def coset_intt(a: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Inverse of :func:`coset_ntt`."""
    return scale_by_powers(intt(a), pow(shift, FR_MOD - 2, FR_MOD))


# ---------------------------------------------------------------------------
# Limbs-first NTT (TPU hot path): operates on (16, n) arrays so batch data
# fills the vector lanes. The transform is the four-step (Bailey) algorithm:
# both sub-NTTs run along axis -2 with a wide CONTIGUOUS trailing axis, so
# every butterfly is a full-tile vector op — a naive radix-2 sweep spends
# its early stages on tiny trailing dims and runs ~100x slower on TPU.
# ---------------------------------------------------------------------------

def _ntt_axis2(a: jnp.ndarray, k: int, inverse: bool,
               unroll: bool = True) -> jnp.ndarray:
    """Radix-2 DIT NTT along axis -2 of a (16, n1, T) limbs-first array.

    unroll=False switches every butterfly multiply to the lax.scan CIOS
    kernel: ~25x cheaper to COMPILE (one unrolled mont_mul_t measures 14s
    under the forced-host-device XLA:CPU mode the driver's multichip
    dryrun runs in; the scan form 0.6s) at some run-time cost — use it
    for compile-bound validation paths, keep unroll=True on the chip.
    """
    from zkevm_tpu.ff.limbs import add_t, mont_mul_t, sub_t

    n = 1 << k
    assert a.shape[1] == n, a.shape
    trail = a.shape[2]
    if n == 1:
        return a
    a = jnp.take(a, jnp.asarray(_bitrev_perm(k)), axis=1)
    pows_t = jnp.asarray(_omega_powers(k, inverse)).T  # (16, n/2)
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        tw = pows_t[:, :: n // m][:, :half]  # (16, half)
        x = a.reshape(ff.L, n // m, 2, half, trail)
        even = x[:, :, 0]
        odd = mont_mul_t(FR, x[:, :, 1], tw[:, None, :, None], unroll=unroll)
        a = jnp.concatenate(
            [add_t(FR, even, odd), sub_t(FR, even, odd)], axis=2
        ).reshape(ff.L, n, trail)
    return a


@lru_cache(maxsize=None)
def _fourstep_twiddle(k: int, k1: int, inverse: bool):
    """(16, n1, n2) device table of w_N^(r*c), built by log-doubling:
    col block [w, 2w) = col block [0, w) * (w^r)^w (one batched mul per
    doubling — host only computes the n1-entry power tables)."""
    from zkevm_tpu.ff.limbs import mont_mul_t

    n = 1 << k
    n1, n2 = 1 << k1, n >> k1
    omega = fr_root_of_unity(k)
    if inverse:
        omega = pow(omega, FR_MOD - 2, FR_MOD)
    base = jnp.asarray(_power_table(omega, n1)).T[:, :, None]  # (16,n1,1) w^r
    one = jnp.asarray(FR.encode(1))[:, None, None]
    T = jnp.broadcast_to(one, (ff.L, n1, 1))
    cur = base  # (w^r)^width
    width = 1
    while width < n2:
        T = jnp.concatenate([T, mont_mul_t(FR, T, cur)], axis=2)
        cur = mont_mul_t(FR, cur, cur)
        width *= 2
    return T


def ntt_t(a_t: jnp.ndarray, k: int, inverse: bool = False) -> jnp.ndarray:
    """NTT over axis 1 of a (16, n) limbs-first array (natural in/out order).

    Four-step: view x[j1*n2 + j2] as (n1, n2); size-n1 NTTs along axis -2;
    twiddle by w_N^(j2*k1'); transpose; size-n2 NTTs along axis -2; the
    flattened result is already in natural order X[k1' + n1*k2'].
    """
    from zkevm_tpu.ff.limbs import mont_mul_t

    n = 1 << k
    assert a_t.shape == (ff.L, n), a_t.shape
    if k <= 7:
        out = _ntt_axis2(a_t[:, :, None], k, inverse)[:, :, 0]
    else:
        k1 = k // 2
        k2 = k - k1
        n1, n2 = 1 << k1, 1 << k2
        A = a_t.reshape(ff.L, n1, n2)
        B = _ntt_axis2(A, k1, inverse)
        B = mont_mul_t(FR, B, jnp.asarray(_fourstep_twiddle(k, k1, inverse)))
        Bt = jnp.swapaxes(B, 1, 2)  # (16, n2, n1)
        C = _ntt_axis2(Bt, k2, inverse)
        out = C.reshape(ff.L, n)
    if inverse:
        n_inv = jnp.asarray(FR.encode(pow(n, FR_MOD - 2, FR_MOD)))[:, None]
        out = mont_mul_t(FR, out, n_inv)
    return out


def intt_t(a_t: jnp.ndarray, k: int) -> jnp.ndarray:
    return ntt_t(a_t, k, inverse=True)
