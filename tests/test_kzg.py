"""KZG commit/open/verify tests (SURVEY.md §7 stage 2 gate: commitments
must match a golden model on random polynomials)."""

import numpy as np
import pytest

from zkevm_tpu.ec import goldens as g1g, group
from zkevm_tpu.ff import FR, goldens as ffg
from zkevm_tpu.kzg import ParamsKZG, open_single, verify_single
from zkevm_tpu.poly import goldens as pg


K = 4
TAU = 0xACE0FBA5E


@pytest.fixture(scope="module")
def params():
    return ParamsKZG.unsafe_setup(K, TAU)


def test_srs_matches_golden(params):
    pts = group.to_affine_ints(params.g1_powers)
    t = 1
    for i in range(1 << K):
        assert pts[i] == g1g.scalar_mul(g1g.G1_GEN, t), i
        t = t * TAU % ffg.FR_MOD


def test_commit_matches_golden(params, rng):
    coeffs = [int(rng.integers(0, 1 << 62)) for _ in range(1 << K)]
    enc = np.stack([FR.encode(c) for c in coeffs])
    c = params.commit(enc)
    # golden: f(tau) * G1
    f_tau = pg.poly_eval(coeffs, TAU)
    assert group.to_affine_ints(c) == [g1g.scalar_mul(g1g.G1_GEN, f_tau)]


def test_open_and_verify(params, rng):
    coeffs = [int(rng.integers(0, 1 << 62)) for _ in range(1 << K)]
    enc = np.stack([FR.encode(c) for c in coeffs])
    from zkevm_tpu.poly import ntt as nttmod

    evals = nttmod.ntt(enc, K)
    commitment = params.commit(enc)
    z = 987654321987654321
    value, proof = open_single(params, evals, z)
    assert value == pg.poly_eval(coeffs, z)
    assert verify_single(params, commitment, z, value, proof)
    # wrong value must fail
    assert not verify_single(params, commitment, z, value + 1, proof)
