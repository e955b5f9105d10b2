"""MSM tests vs the pure-Python golden model (SURVEY.md §7 stage 2 gate)."""

import numpy as np

from zkevm_tpu.ec import goldens as g, group
from zkevm_tpu.ec.msm import FixedBaseMSM, msm, msm_ints
from zkevm_tpu.ff import limbs


def test_msm_variable_base(rng):
    n = 9
    pts = [g.random_point(rng) for _ in range(n - 1)] + [None]
    scalars = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = g.R - 1
    out = msm_ints(pts, scalars)
    assert group.to_affine_ints(out) == [g.msm(pts, scalars)]


def test_msm_fixed_base(rng):
    n = 7
    pts = [g.random_point(rng) for _ in range(n)]
    fixed = FixedBaseMSM(group.from_affine_ints(pts), c=4, window_chunk=8)
    for trial in range(2):
        scalars = [
            (int(rng.integers(0, 1 << 62)) << 192) | int(rng.integers(0, 1 << 62))
            for _ in range(n)
        ]
        if trial == 0:
            scalars[0] = 0
            scalars[1] = g.R - 1
        out = fixed(limbs.limbs_from_ints([s % g.R for s in scalars]))
        assert group.to_affine_ints(out) == [g.msm(pts, scalars)]
