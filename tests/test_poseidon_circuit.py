"""Poseidon circuit tests: round trace vs the golden permutation, mock
prover satisfaction, and tamper detection (SURVEY.md §7 stage 4)."""

import numpy as np
import pytest

from zkevm_tpu.circuits import poseidon_circuit as pc
from zkevm_tpu.hash import poseidon as pos
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 9
N = 1 << K


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = pc.configure(cs, N)
    return cs, cfg


def test_assignment_matches_golden(circuit):
    cs, cfg = circuit
    states = [[1, 2, pc.hash2_state(0, 0)[2]], pc.hash2_state(7, 9)]
    asg, inst = pc.assign(cs, cfg, N, states)
    for p, init in enumerate(states):
        want = pos.permute_golden(pc.SPEC, init)
        base = p * pc.ROWS_PER_PERM
        got = [asg.get_int(cfg.state[i], base + 64) for i in range(pc.T)]
        assert got == want, p
        assert inst[4 * p + 3] == want[0]
    # hash2 output equals the sponge golden
    assert inst[4 * 1 + 3] == pos.hash_golden(pc.SPEC, [7, 9])


def test_mock_prover_satisfied(circuit):
    cs, cfg = circuit
    asg, _ = pc.assign(cs, cfg, N, [pc.hash2_state(123, 456)])
    MockProver(cs, asg).assert_satisfied()


def test_mock_prover_catches_bad_round(circuit):
    cs, cfg = circuit
    asg, _ = pc.assign(cs, cfg, N, [pc.hash2_state(1, 2)])
    from zkevm_tpu.ff import FR

    row = 30
    cur = asg.get_int(cfg.state[1], row)
    asg.set_int(cfg.state[1], row, cur + 1)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)
