"""Pippenger bucketed MSM vs the pure-Python golden model.

Reference role: halo2 best_multiexp correctness (msm_cross tests). One
size only (N=16): each distinct (S, Lw) geometry costs its own XLA
compile of the accumulate stage; the persistent cache makes reruns fast.
"""

import numpy as np

from zkevm_tpu.ec import goldens as g, group, group_t
from zkevm_tpu.ec.pippenger import msm_t
from zkevm_tpu.ff import limbs


def test_pippenger_vs_golden(rng):
    n = 16
    pts = [g.random_point(rng) for _ in range(n - 1)] + [None]
    scalars = [
        int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 192)
        for _ in range(n)
    ]
    scalars[0] = 0  # zero scalar: every window digit hits bucket 0
    scalars[1] = g.R - 1  # max scalar: all-ones-ish digits
    scalars[2] = scalars[3]  # duplicate: same bucket twice -> doubling path
    pt = group_t.from_g1(group.from_affine_ints(pts))
    out = msm_t(pt, limbs.limbs_from_ints([s % g.R for s in scalars]), c=4, signed=True)
    got = group.to_affine_ints(group_t.to_g1(out))
    assert got == [g.msm(pts, scalars)]


def test_pippenger_unsigned_vs_golden(rng):
    n = 16
    pts = [g.random_point(rng) for _ in range(n)]
    scalars = [int(rng.integers(1, 1 << 60)) for _ in range(n)]
    pt = group_t.from_g1(group.from_affine_ints(pts))
    out = msm_t(pt, limbs.limbs_from_ints(scalars), c=4, signed=False)
    got = group.to_affine_ints(group_t.to_g1(out))
    assert got == [g.msm(pts, scalars)]
