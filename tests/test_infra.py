"""Capacity checker + circuit stats (SURVEY §5 aux subsystems; reference
prover/src/zkevm/capacity_checker.rs, zkevm-circuits/src/stats.rs)."""

from zkevm_tpu.plonk import ConstraintSystem
from zkevm_tpu.plonk.stats import circuit_stats, span
from zkevm_tpu.prover.capacity import (
    CONFIDENCE,
    CircuitCapacityChecker,
)

TX_USAGE = {"evm": 40, "state": 90, "bytecode": 30, "keccak": 1825}
LIMITS = {"evm": 100, "state": 200, "bytecode": 100, "keccak": 3650}


def test_capacity_admission():
    ccc = CircuitCapacityChecker(LIMITS)
    assert ccc.fits(TX_USAGE)
    ccc.add(TX_USAGE)
    # second identical tx fills keccak to 100% > confidence
    assert not ccc.fits(TX_USAGE)
    norm = ccc.estimate(TX_USAGE)
    assert norm["keccak"] > CONFIDENCE
    ccc.reset()
    assert ccc.fits(TX_USAGE)


def test_capacity_strict_overflow():
    import pytest

    ccc = CircuitCapacityChecker(LIMITS, strict=True)
    ccc.add(TX_USAGE)
    with pytest.raises(OverflowError):
        ccc.add(TX_USAGE)


def test_circuit_stats_shapes():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column(phase=1)
    cs.enable_equality(a)
    cs.create_gate("g", [q.cur() * a.cur() * (a.cur() - 1)])
    cs.lookup("l", [(a.cur(), q.cur())])
    st = circuit_stats(cs, n=1 << 6)
    assert st["advice_columns"] == 2
    assert st["advice_by_phase"] == {0: 1, 1: 1}
    assert st["gates"] == 1 and st["lookups"] == 1
    assert st["max_gate_degree"] == 3
    assert st["usable_rows"] <= (1 << 6)
    assert st["commitments_per_proof"] > 4


def test_span_records():
    sink = {}
    with span("unit", sink):
        pass
    assert "unit" in sink and sink["unit"] >= 0
