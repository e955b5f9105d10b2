"""NTT / domain tests vs the O(n^2) golden DFT (SURVEY.md §7 stage 2 gate)."""

import jax
import numpy as np

from zkevm_tpu.ff import FR, goldens as ffg, limbs
from zkevm_tpu.poly import Domain, goldens as pg, ntt as nttmod


def rand_fr(rng, n):
    out = []
    for _ in range(n):
        x = 0
        for _ in range(5):
            x = (x << 62) | int(rng.integers(0, 1 << 62))
        out.append(x % ffg.FR_MOD)
    return out


def enc(vals):
    return np.stack([FR.encode(v) for v in vals])


def test_ntt_matches_naive(rng):
    for k in (0, 1, 3, 6):
        n = 1 << k
        coeffs = rand_fr(rng, n)
        omega = pg.domain_omega(k)
        want = pg.naive_ntt(coeffs, omega)
        got = jax.jit(nttmod.ntt, static_argnums=1)(enc(coeffs), k)
        assert FR.decode_many(got) == want, k


def test_intt_roundtrip(rng):
    k = 5
    coeffs = rand_fr(rng, 1 << k)
    evals = nttmod.ntt(enc(coeffs), k)
    back = nttmod.intt(evals, k)
    assert FR.decode_many(back) == coeffs


def test_batched_ntt(rng):
    k, b = 4, 3
    polys = [rand_fr(rng, 1 << k) for _ in range(b)]
    a = np.stack([enc(p) for p in polys])  # (b, n, 16)
    got = nttmod.ntt(a, k)
    omega = pg.domain_omega(k)
    for i in range(b):
        assert FR.decode_many(got[i]) == pg.naive_ntt(polys[i], omega)


def test_coset_roundtrip_and_eval(rng):
    k = 4
    coeffs = rand_fr(rng, 1 << k)
    evals = nttmod.coset_ntt(enc(coeffs), 7)
    # coset evaluation: point i is 7 * omega^i
    omega = pg.domain_omega(k)
    for i in (0, 1, 5):
        x = 7 * pow(omega, i, ffg.FR_MOD) % ffg.FR_MOD
        assert FR.decode(np.asarray(evals)[i]) == pg.poly_eval(coeffs, x)
    back = nttmod.coset_intt(evals, 7)
    assert FR.decode_many(back) == coeffs


def test_domain_quotient_division(rng):
    """h(X) = (f(X) - f evaluated with wraparound...) — simplest check:
    multiply a random h by Z_H in coeff space, divide back on the coset."""
    dom = Domain.new(3, 4)
    n = dom.n
    h = rand_fr(rng, n)  # quotient of degree < n
    # e(X) = h(X) * (X^n - 1), degree < 2n <= extended_n
    e = [(-v) % ffg.FR_MOD for v in h] + h
    e_ext = nttmod.coset_ntt(
        np.concatenate([enc(e), np.zeros((dom.extended_n - 2 * n, 16), np.uint32)]),
        dom.g_coset,
    )
    h_ext = dom.divide_by_vanishing_poly(e_ext)
    h_coeffs = dom.extended_to_coeff(h_ext)
    got = FR.decode_many(h_coeffs)
    assert got[:n] == h
    assert all(v == 0 for v in got[n:])


def test_ntt_t_fourstep_matches_naive(rng):
    """limbs-first four-step NTT (TPU hot path) vs the golden DFT."""
    import jax.numpy as jnp

    for k in (4, 9):  # below and above the four-step split threshold
        n = 1 << k
        coeffs = rand_fr(rng, n)
        a_t = jnp.asarray(enc(coeffs).T)
        got = FR.decode_many(np.asarray(nttmod.ntt_t(a_t, k)).T)
        assert got == pg.naive_ntt(coeffs, pg.domain_omega(k)), k
        back = FR.decode_many(np.asarray(nttmod.intt_t(nttmod.ntt_t(a_t, k), k)).T)
        assert back == coeffs, k
