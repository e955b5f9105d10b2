"""End-to-end PLONKish runtime tests: a toy circuit through MockProver and
the real KZG/SHPLONK prove+verify path (SURVEY.md §7 stage 3 gate:
"prove a toy circuit; verify with a ported verifier").

The toy circuit exercises every argument: a custom gate, an equality
(permutation) constraint, and a lookup.
"""

import numpy as np
import pytest

from zkevm_tpu.ff import FR
from zkevm_tpu.kzg import ParamsKZG
from zkevm_tpu.plonk import (
    Assignment,
    ConstraintSystem,
    MockProver,
    create_proof,
    keygen,
    verify_proof,
)

K = 5
N = 1 << K


def build_circuit():
    """A tiny mul-add chip with a range lookup and a copy constraint:
    rows i < 8: c[i] = a[i] * b[i] + const; a values must be in the 4-bit
    table; c[0] copied to an instance-exposed cell a[9]... kept simple:
    c[0] == c[7] via copy."""
    cs = ConstraintSystem()
    q = cs.fixed_column()  # gate selector
    table = cs.fixed_column()  # 4-bit range table
    qt = cs.fixed_column()  # lookup selector
    a = cs.advice_column()
    b = cs.advice_column()
    c = cs.advice_column()

    # gate: q * (a * b + 7 - c) == 0
    cs.create_gate("mul_add", q.cur() * (a.cur() * b.cur() + 7 - c.cur()))
    # lookup: qt * a  must be in table
    cs.lookup("a_in_4bits", [(qt.cur() * a.cur(), table.cur())])
    return cs, (q, table, qt, a, b, c)


def assign_circuit(cs, cols, n=N, break_gate=False, break_lookup=False):
    q, table, qt, a, b, c = cols
    asg = Assignment(cs, n)
    rows = 8
    avals = [3, 5, 1, 15, 0, 7, 9, 3]
    bvals = [2, 4, 6, 1, 0, 3, 2, 2]
    if break_lookup:
        avals[3] = 77  # not 4-bit
    cvals = [x * y + 7 for x, y in zip(avals, bvals)]
    if break_gate:
        cvals[2] += 1
    asg.set_ints(q, 0, [1] * rows)
    asg.set_ints(qt, 0, [1] * rows)
    asg.set_ints(table, 0, list(range(16)))
    asg.set_ints(a, 0, avals)
    asg.set_ints(b, 0, bvals)
    asg.set_ints(c, 0, cvals)
    # copy constraint: c[0] == c[7] (13 == 13)
    cs_copies_ok = cvals[0] == cvals[7]
    assert cs_copies_ok or break_gate or break_lookup
    return asg


@pytest.fixture(scope="module")
def setup():
    cs, cols = build_circuit()
    q, table, qt, a, b, c = cols
    cs.copy(c, 0, c, 7)
    params = ParamsKZG.unsafe_setup(K, windowed=False)
    asg = assign_circuit(cs, cols)
    fixed_only = Assignment(cs, N)
    for col in cs.fixed_columns:
        fixed_only.cols[col][:] = asg.cols[col]
    pk = keygen(params, cs, fixed_only)
    return cs, cols, params, pk


def test_mock_prover_ok(setup):
    cs, cols, params, pk = setup
    MockProver(cs, assign_circuit(cs, cols)).assert_satisfied()


def test_mock_prover_catches_bad_gate(setup):
    cs, cols, params, pk = setup
    fails = MockProver(cs, assign_circuit(cs, cols, break_gate=True)).verify()
    assert any(f.kind == "gate" for f in fails)


def test_mock_prover_catches_bad_lookup(setup):
    cs, cols, params, pk = setup
    fails = MockProver(cs, assign_circuit(cs, cols, break_lookup=True)).verify()
    assert any(f.kind == "lookup" for f in fails)


def test_prove_and_verify(setup):
    cs, cols, params, pk = setup
    asg = assign_circuit(cs, cols)
    proof = create_proof(params, pk, [], asg)
    assert verify_proof(params, pk.vk, [], proof)


def test_verify_rejects_tampered_eval(setup):
    cs, cols, params, pk = setup
    asg = assign_circuit(cs, cols)
    proof = create_proof(params, pk, [], asg)
    proof.evals[0] = (proof.evals[0] + 1) % FR.modulus
    assert not verify_proof(params, pk.vk, [], proof)


def test_prover_rejects_bad_witness(setup):
    cs, cols, params, pk = setup
    asg = assign_circuit(cs, cols, break_lookup=True)
    with pytest.raises(ValueError):
        create_proof(params, pk, [], asg)
