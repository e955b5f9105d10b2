"""Bytecode circuit tests (reference role: bytecode_circuit/circuit.rs
unit tests): unrolling, is_code/push-data tracking, mock satisfaction."""

import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 9
N = 1 << K


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = bc.configure(cs)
    return cs, cfg


CODE1 = bytes([0x60, 0xFF, 0x61, 0xAA, 0xBB, 0x01, 0x00])  # PUSH1 ff PUSH2 aabb ADD STOP
CODE2 = bytes([0x5B, 0x7F] + [0xEE] * 32 + [0x50])  # JUMPDEST PUSH32 .. POP


def test_unroll_is_code():
    rows = bc.unroll(CODE1)
    body = [r for r in rows if r["tag"] == 0]
    # PUSH1(code) ff(data) PUSH2(code) aa(data) bb(data) ADD(code) STOP(code)
    got = [(1 if r["pdl"] == 0 else 0) for r in body]
    assert got == [1, 0, 1, 0, 0, 1, 1]


def test_mock_prover_satisfied(circuit):
    cs, cfg = circuit
    asg = bc.assign(cs, cfg, N, [CODE1, CODE2])
    MockProver(cs, asg).assert_satisfied()


def test_mock_prover_catches_bad_is_code(circuit):
    cs, cfg = circuit
    asg = bc.assign(cs, cfg, N, [CODE1])
    # claim a push-data byte is code
    from zkevm_tpu.ff import FR

    # row 2 is the 0xff data byte (row 0 = header, row 1 = PUSH1)
    asg.set_int(cfg.is_code, 2, 1)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_mock_prover_catches_wrong_push_size(circuit):
    cs, cfg = circuit
    asg = bc.assign(cs, cfg, N, [CODE1])
    from zkevm_tpu.ff import FR

    asg.set_int(cfg.psize, 1, 3)  # PUSH1 byte claimed to carry 3 data bytes
    fails = MockProver(cs, asg).verify()
    assert fails  # lookup (byte, psize) fails or transition breaks


def test_push_opcode_as_push_data(circuit):
    """Push-data bytes whose VALUE is a PUSH opcode (0x60..0x7f) must still
    satisfy the (byte, psize) push-table lookup — psize is assigned from the
    byte value on every body row (circuit.rs:712 semantics)."""
    cs, cfg = circuit
    code = bytes([0x61, 0x60, 0x7F, 0x01, 0x00])  # PUSH2 with PUSH-valued data
    rows = bc.unroll(code)
    body = [r for r in rows if r["tag"] == 0]
    assert [(1 if r["pdl"] == 0 else 0) for r in body] == [1, 0, 0, 1, 1]
    asg = bc.assign(cs, cfg, N, [code])
    MockProver(cs, asg).assert_satisfied()
