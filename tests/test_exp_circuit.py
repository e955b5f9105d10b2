"""Exp circuit tests (reference role: exp_circuit.rs tests)."""

import pytest

from zkevm_tpu.circuits import exp_circuit as ec
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 7
N = 1 << K


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = ec.configure(cs)
    return cs, cfg


def test_unroll_chain():
    rows = ec.unroll_event(3, 13)
    assert rows[0]["exponent"] == 13
    assert rows[0]["exponentiation"] == pow(3, 13, FR_MOD)
    assert rows[-1]["exponent"] == 2


def test_mock_satisfied(circuit):
    cs, cfg = circuit
    asg = ec.assign(cs, cfg, N, [(3, 13), (7, 2), (123456789, 100)])
    MockProver(cs, asg).assert_satisfied()


def test_mock_catches_wrong_power(circuit):
    cs, cfg = circuit
    asg = ec.assign(cs, cfg, N, [(3, 13)])
    asg.set_int(cfg.exponentiation, 0, pow(3, 13, FR_MOD) + 1)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_mock_catches_wrong_parity(circuit):
    cs, cfg = circuit
    asg = ec.assign(cs, cfg, N, [(5, 9)])
    asg.set_int(cfg.parity, 0, 0)  # 9 is odd; claim even
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)
