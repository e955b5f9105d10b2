"""G1 group-law tests: device limb kernels vs the pure-Python golden model.

Mirrors halo2curves' bn256 curve test role (SURVEY.md §7 stage 1-2 gate).
"""

import jax
import numpy as np

from zkevm_tpu.ec import goldens as g
from zkevm_tpu.ec import group
from zkevm_tpu.ff import FR, limbs


def test_generator_on_curve():
    assert g.is_on_curve(g.G1_GEN)


def test_double_and_add_batch(rng):
    pts = [g.random_point(rng) for _ in range(8)] + [None, g.G1_GEN]
    qts = [g.random_point(rng) for _ in range(8)] + [g.G1_GEN, None]
    # include degenerate lanes: same point (doubling path), opposite points
    pts += [pts[0], pts[1]]
    qts += [pts[0], g.neg(pts[1])]

    P = group.from_affine_ints(pts)
    Q = group.from_affine_ints(qts)

    s = group.add(P, Q)
    want = [g.add(a, b) for a, b in zip(pts, qts)]
    assert group.to_affine_ints(s) == want

    d = group.double(P)
    want_d = [g.double(a) for a in pts]
    assert group.to_affine_ints(d) == want_d


def test_scalar_mul(rng):
    pts = [g.random_point(rng) for _ in range(4)] + [None]
    ks = [0, 1, 2, int(rng.integers(1, 1 << 62)) * g.R // (1 << 62) + 12345, g.R - 1]
    P = group.from_affine_ints(pts)
    scal = limbs.limbs_from_ints(ks)
    out = group.scalar_mul(P, scal)
    want = [g.scalar_mul(p, k) for p, k in zip(pts, ks)]
    assert group.to_affine_ints(out) == want


def test_sum_reduce(rng):
    pts = [g.random_point(rng) for _ in range(11)] + [None]
    P = group.from_affine_ints(pts)
    out = group.sum_reduce(P)
    want = None
    for p in pts:
        want = g.add(want, p)
    assert group.to_affine_ints(out) == [want]


def test_neg_identity(rng):
    pts = [g.random_point(rng), None]
    P = group.from_affine_ints(pts)
    n = group.neg(P)
    s = group.add(P, n)
    assert group.to_affine_ints(s) == [None, None]
