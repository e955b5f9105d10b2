"""BN254 pairing golden-model tests: bilinearity + non-degeneracy.

These properties are exactly what the KZG opening / accumulator checks
consume (reference: aggregator/src/core.rs pairing check role).
"""

import pytest

from zkevm_tpu.ec import goldens as g1g, pairing as pr


def test_g2_generator_on_curve():
    assert pr.g2_is_on_curve(pr.G2_GEN)
    # generator has order r
    assert pr.g2_scalar_mul(pr.G2_GEN, pr.R) is None


def test_pairing_bilinear_nondegenerate():
    e1 = pr.pairing(g1g.G1_GEN, pr.G2_GEN)
    assert e1 != pr.F12_ONE  # non-degenerate

    a, b = 6, 11
    pa = g1g.scalar_mul(g1g.G1_GEN, a)
    qb = pr.g2_scalar_mul(pr.G2_GEN, b)
    # e(aP, bQ) == e(P, Q)^(ab)
    assert pr.pairing(pa, qb) == pr.f12_pow(e1, a * b)
    # e(aP, Q) == e(P, aQ)
    qa = pr.g2_scalar_mul(pr.G2_GEN, a)
    assert pr.pairing(pa, pr.G2_GEN) == pr.pairing(g1g.G1_GEN, qa)


def test_pairing_check_kzg_style():
    # A KZG-shaped identity: e(tau*G1, G2) * e(-G1, tau*G2) == 1
    tau = 123456789
    t_g1 = g1g.scalar_mul(g1g.G1_GEN, tau)
    t_g2 = pr.g2_scalar_mul(pr.G2_GEN, tau)
    assert pr.pairing_check([(t_g1, pr.G2_GEN), (g1g.neg(t_g1), pr.G2_GEN)])
    assert pr.pairing_check([(t_g1, pr.G2_GEN), (g1g.neg(g1g.G1_GEN), t_g2)])
    assert not pr.pairing_check([(t_g1, pr.G2_GEN), (g1g.G1_GEN, t_g2)])
