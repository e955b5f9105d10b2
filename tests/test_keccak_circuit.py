"""Keccak circuit: BASELINE milestone config #1 — prove keccak256 of one
136-byte rate block with the MockProver at k=11.

The real-prover end-to-end run (create_proof + verify_proof) is gated
behind ZKEVM_TPU_HEAVY=1, mirroring the reference's `serial_` +
`--ignored` heavy-test discipline (SURVEY.md §4, Makefile:17-22).
"""

import os

import numpy as np
import pytest

from zkevm_tpu.circuits import keccak_circuit as kc
from zkevm_tpu.hash import keccak
from zkevm_tpu.plonk import ConstraintSystem, MockProver


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = kc.configure(cs)
    return cs, cfg


def test_geometry(circuit):
    cs, cfg = circuit
    assert kc.TOTAL_ROWS <= cs.usable_rows(kc.N) - 1
    assert len(cs.gates) == 2 + 5 + 3 + 25


def test_witness_simulation_matches_host_keccak(circuit):
    cs, cfg = circuit
    msg = b"zkevm-tpu keccak circuit test message!"
    asg, inst = kc.assign(cs, cfg, msg)
    assert kc.digest_from_instance(inst) == keccak.keccak256(msg)


def test_mock_prover_satisfied(circuit):
    cs, cfg = circuit
    asg, inst = kc.assign(cs, cfg, b"hello keccak circuit")
    MockProver(cs, asg).assert_satisfied()


def test_mock_prover_catches_flipped_bit(circuit):
    cs, cfg = circuit
    asg, inst = kc.assign(cs, cfg, b"x")
    # flip one bit in an OUT row of round 3
    row = kc.INPUT_ROWS + 3 * kc.BLOCK + 50 + 7
    col = cfg.bits.columns[13]
    from zkevm_tpu.ff import FR

    cur = FR.decode(asg.cols[col][row])
    asg.cols[col][row] = FR.encode(1 - cur)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


@pytest.mark.skipif(
    os.environ.get("ZKEVM_TPU_HEAVY") != "1",
    reason="real keccak proof is a heavy serial test (set ZKEVM_TPU_HEAVY=1)",
)
def test_real_proof_end_to_end(circuit):
    from zkevm_tpu.kzg import ParamsKZG
    from zkevm_tpu.plonk import create_proof, keygen, verify_proof
    from zkevm_tpu.plonk.assign import Assignment

    cs, cfg = circuit
    msg = b"keccak end to end"
    asg, inst = kc.assign(cs, cfg, msg)
    params = ParamsKZG.unsafe_setup(kc.K)
    fixed_only = Assignment(cs, kc.N)
    for colc in cs.fixed_columns:
        fixed_only.cols[colc][:] = asg.cols[colc]
    pk = keygen(params, cs, fixed_only)
    proof = create_proof(params, pk, [inst], asg)
    assert verify_proof(params, pk.vk, [inst], proof)
