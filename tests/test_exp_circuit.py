"""Exp circuit tests (reference role: exp_circuit.rs tests) — word
semantics: every chain multiplication/halving is a WordArithTable lookup,
so the fixture composes the exp circuit with the word-arith satellite."""

import pytest

from zkevm_tpu.circuits import exp_circuit as ec
from zkevm_tpu.circuits import word_arith as wa
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 13  # the 2^130-exponent chain needs ~4.6k word-arith rows
N = 1 << K
M256 = (1 << 256) - 1
BIG = 0xFEDCBA9876543210FEDCBA9876543210FEDCBA9876543210FEDCBA9876543210


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    wa_cfg = wa.configure(cs, rt8)
    cfg = ec.configure(cs, wa_cfg.table)
    return cs, cfg, wa_cfg, rt8


def _assign(cs, cfg, wa_cfg, rt8, events):
    asg = Assignment(cs, N)
    rt8.load(asg)
    ec.assign(cs, cfg, N, events, asg)
    wa.assign(cs, wa_cfg, N, ec.word_arith_ops(events), asg)
    return asg


def test_unroll_chain():
    rows = ec.unroll_event(3, 13)
    assert rows[0]["exponent"] == 13
    assert rows[0]["exponentiation"] == pow(3, 13, 1 << 256)
    assert rows[-1]["exponent"] == 2


def test_mock_satisfied(circuit):
    cs, cfg, wa_cfg, rt8 = circuit
    # word-scale bases/exponents: wrap-around products and a 2^128+
    # exponent (exercises the hi-half halving chain)
    events = [(3, 13), (7, 2), (BIG, 5), (2, (1 << 130) + 3)]
    asg = _assign(cs, cfg, wa_cfg, rt8, events)
    MockProver(cs, asg).assert_satisfied()


def test_mock_catches_wrong_power(circuit):
    cs, cfg, wa_cfg, rt8 = circuit
    events = [(3, 13)]
    asg = _assign(cs, cfg, wa_cfg, rt8, events)
    asg.set_int(cfg.d_lo, 0, (pow(3, 13, 1 << 256) + 1))
    fails = MockProver(cs, asg).verify()
    assert fails, "forged exponentiation accepted"


def test_mock_catches_skipped_halving(circuit):
    """Forge the top exponent (claim base^8 proves base^16): the halving
    lookup chain must break."""
    cs, cfg, wa_cfg, rt8 = circuit
    events = [(5, 8)]
    asg = _assign(cs, cfg, wa_cfg, rt8, events)
    asg.set_int(cfg.e_lo, 0, 16)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged exponent accepted"
