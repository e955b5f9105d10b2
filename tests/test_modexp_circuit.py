"""ModExp circuit vs pow() (reference role: the modexp precompile
circuit tests). One 256-bit-exponent ladder region at k=10."""

import pytest

from zkevm_tpu.circuits import modexp_circuit as mx
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 10
N = 1 << K
BIG = 0xFEDCBA9876543210FEDCBA9876543210FEDCBA9876543210FEDCBA9876543210


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    cfg = mx.configure(cs, rt8)
    return cs, cfg, rt8


def _assign(cs, cfg, rt8, events):
    asg = Assignment(cs, N)
    rt8.load(asg)
    mx.assign(cs, cfg, N, events, asg)
    return asg


def test_modexp_proven(circuit):
    cs, cfg, rt8 = circuit
    ev = mx.ModExpEvent(base=BIG, exponent=(1 << 130) + 12345,
                        modulus=0xFFFF_FFFB)
    assert ev.result == pow(BIG, (1 << 130) + 12345, 0xFFFF_FFFB)
    asg = _assign(cs, cfg, rt8, [ev])
    MockProver(cs, asg).assert_satisfied()


def test_modexp_mod_one_is_zero(circuit):
    cs, cfg, rt8 = circuit
    ev = mx.ModExpEvent(base=7, exponent=99, modulus=1)
    assert ev.result == 0
    asg = _assign(cs, cfg, rt8, [ev])
    MockProver(cs, asg).assert_satisfied()


def test_forged_result_rejected(circuit):
    cs, cfg, rt8 = circuit
    ev = mx.ModExpEvent(base=3, exponent=77, modulus=1009)
    asg = _assign(cs, cfg, rt8, [ev])
    R = mx.region_rows()
    bad = (ev.result + 1) % 1009
    for row in range(R):
        asg.set_int(cfg.rl[0], row, bad)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged modexp result accepted"


def test_forged_exponent_rejected(circuit):
    """Claim a different exponent on the surface: the per-limb bit
    accumulator binding must break."""
    cs, cfg, rt8 = circuit
    ev = mx.ModExpEvent(base=3, exponent=77, modulus=1009)
    asg = _assign(cs, cfg, rt8, [ev])
    R = mx.region_rows()
    for row in range(R):
        asg.set_int(cfg.el[0], row, 78)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged exponent accepted"
