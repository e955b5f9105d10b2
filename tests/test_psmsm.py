"""Sort+prefix-sum MSM vs the pure-Python golden model.

Reference role: halo2 best_multiexp correctness (same bar as
tests/test_pippenger.py). Small N only — each (G, Lw, S, c) geometry is
its own XLA compile; the persistent cache makes reruns fast. Exercises:
zero scalars (all digits in the dropped bucket 0), max scalar, duplicate
scalars (same bucket, two adds), multi-lane prefix offsets (Lw > 1), and
a window group remainder (W % wgroup != 0).
"""

import numpy as np

from zkevm_tpu.ec import goldens as g, group, group_t
from zkevm_tpu.ec.psmsm import PsMSM, to_affine_t
from zkevm_tpu.ff import limbs


def test_psmsm_vs_golden(rng):
    n = 16
    pts = [g.random_point(rng) for _ in range(n)]
    scalars = [
        int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 1 << 62)) << 192)
        for _ in range(n)
    ]
    scalars[0] = 0  # zero scalar: every window digit in dropped bucket 0
    scalars[1] = g.R - 1  # max scalar
    scalars[2] = scalars[3]  # duplicate scalar: same bucket twice
    pt = group_t.from_g1(group.from_affine_ints(pts))
    # lanes=4 -> Lw=4, S=4: exercises within-lane prefix + lane offsets;
    # wgroup=3 with W=64 -> a remainder group of size 1
    msm = PsMSM(pt, c=4, lanes=4, wgroup=3)
    out = msm(limbs.limbs_from_ints([s % g.R for s in scalars]))
    got = group.to_affine_ints(group_t.to_g1(out))
    assert got == [g.msm(pts, scalars)]


def test_to_affine_roundtrip(rng):
    pts = [g.random_point(rng) for _ in range(4)]
    pt = group_t.from_g1(group.from_affine_ints(pts))
    # scale Z to a non-one representative first: 3*P as Jacobian output
    pj = group_t.to_g1(pt)
    tripled = group.add(group.add(pj, pj), pj)
    tt = group_t.from_g1(tripled)
    ax, ay = to_affine_t(tt)
    got = group.to_affine_ints(
        group_t.to_g1(group_t.G1T(ax, ay, group_t.identity_t((4,)).x))
    )
    # z=mont_one => affine interpretation
    want = [g.scalar_mul(p, 3) for p in pts]
    assert got == want
