"""ECC circuit (BN254 ecAdd/ecMul) vs the golden host model
(reference role: ecc_circuit.rs tests)."""

import pytest

from zkevm_tpu.circuits import ecc_circuit as ecc
from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 12
N = 1 << K
G1 = (1, 2)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    cfg = ecc.configure(cs, rt8)
    return cs, cfg, rt8


def _assign(cs, cfg, rt8, adds, muls):
    asg = Assignment(cs, N)
    rt8.load(asg)
    ecc.assign(cs, cfg, N, adds, muls, asg)
    return asg


def test_ecadd_ecmul_proven(circuit):
    cs, cfg, rt8 = circuit
    p1 = bn.scalar_mul(G1, 1234567)
    p2 = bn.scalar_mul(G1, 7654321)
    adds = [ecc.EcAddEvent(p1, p2), ecc.EcAddEvent(p2, G1)]
    muls = [ecc.EcMulEvent(p1, (1 << 130) + 99)]
    assert adds[0].result == bn.scalar_mul(G1, 1234567 + 7654321)
    asg = _assign(cs, cfg, rt8, adds, muls)
    MockProver(cs, asg).assert_satisfied()


def test_forged_add_result_rejected(circuit):
    cs, cfg, rt8 = circuit
    p1 = bn.scalar_mul(G1, 31337)
    adds = [ecc.EcAddEvent(p1, G1)]
    asg = _assign(cs, cfg, rt8, adds, [])
    x3, _ = adds[0].result
    for row in range(ecc.ADD_ROWS):
        asg.set_int(cfg.st["r3x"][0], row, (x3 + 1) & ((1 << 88) - 1))
    fails = MockProver(cs, asg).verify()
    assert fails, "forged ecAdd result accepted"


def test_forged_mul_scalar_rejected(circuit):
    cs, cfg, rt8 = circuit
    muls = [ecc.EcMulEvent(G1, 424242)]
    asg = _assign(cs, cfg, rt8, [], muls)
    for row in range(ecc.mul_region_rows()):
        asg.set_int(cfg.st["kl"][0], row, 424243)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged ecMul scalar accepted"


def test_off_curve_input_rejected(circuit):
    cs, cfg, rt8 = circuit
    p1 = bn.scalar_mul(G1, 555)
    adds = [ecc.EcAddEvent(p1, G1)]
    asg = _assign(cs, cfg, rt8, adds, [])
    for row in range(ecc.ADD_ROWS):
        asg.set_int(cfg.st["p1y"][0], row, (p1[1] + 1) & ((1 << 88) - 1))
    fails = MockProver(cs, asg).verify()
    assert fails, "off-curve ecAdd input accepted"
