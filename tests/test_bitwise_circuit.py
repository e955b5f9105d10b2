"""Bitwise table circuit tests (reference role: execution/bitwise.rs
semantics, via the nibble-op satellite)."""

import pytest

from zkevm_tpu.circuits import bitwise_circuit as bw
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 10
N = 1 << K

A = 0x00FF00FF_DEADBEEF_00000000_FFFFFFFF_0123456789ABCDEF_FEDCBA9876543210
B = 0x0F0F0F0F_CAFEBABE_FFFFFFFF_00000000_1111111122222222_3333333344444444


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = bw.configure(cs)
    return cs, cfg


def test_all_ops_satisfied(circuit):
    cs, cfg = circuit
    events = [
        bw.BitwiseEvent(bw.BitOp.AND, A, B),
        bw.BitwiseEvent(bw.BitOp.OR, A, B),
        bw.BitwiseEvent(bw.BitOp.XOR, A, B),
        bw.BitwiseEvent(bw.BitOp.XOR, A, (1 << 256) - 1),  # NOT via XOR
        bw.BitwiseEvent(bw.BitOp.AND, 0, 0),
    ]
    assert events[0].r == A & B and events[2].r == A ^ B
    asg = bw.assign(cs, cfg, N, events)
    MockProver(cs, asg).assert_satisfied()


def test_wrong_result_byte_caught(circuit):
    cs, cfg = circuit
    asg = bw.assign(cs, cfg, N, [bw.BitwiseEvent(bw.BitOp.AND, A, B)])
    # flip one result nibble on one row: the nibble-table lookup must fail
    row = 5
    good = asg.get_int(cfg.nibs[5], row)
    asg.set_int(cfg.nibs[5], row, (good + 1) % 16)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged result nibble accepted"


def test_wrong_accumulator_caught(circuit):
    cs, cfg = circuit
    asg = bw.assign(cs, cfg, N, [bw.BitwiseEvent(bw.BitOp.OR, A, B)])
    asg.set_int(cfg.acc_r, 31, 12345)  # the exposed lo half
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_mixed_tag_within_group_caught(circuit):
    cs, cfg = circuit
    asg = bw.assign(cs, cfg, N, [bw.BitwiseEvent(bw.BitOp.AND, A, B)])
    asg.set_int(cfg.tag, 7, int(bw.BitOp.OR))  # tag must be group-constant
    fails = MockProver(cs, asg).verify()
    assert fails
