"""State circuit tests (reference role: state_circuit/test.rs): proven
lexicographic ordering + rw consistency over real builder output, plus
adversarial reorder/value/limb tampers that the host audit alone could
never catch in-circuit."""

import numpy as np
import pytest

from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.witness import CircuitInputBuilder, RW, Target
from zkevm_tpu.witness.rw import RwRow

K = 11
N = 1 << K
B = 10  # limb bits (range table 2^10 rows fits k=11 tests)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = st.configure(cs, limb_bits=B)
    return cs, cfg


def builder_rows():
    code = bytes(
        [0x60, 3, 0x60, 4, 0x01, 0x80, 0x60, 2, 0x90, 0x02,
         0x60, 0x20, 0x52, 0x60, 0x20, 0x51, 0x60, 5, 0x55, 0x00]
    )
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(0xBBBB).code_hash = h
    sdb.ensure(0xAAAA).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=0xAAAA, callee=0xBBBB)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=0xAAAA, callee=0xBBBB)
    assert not builder.rws.check_consistency()
    return st.fix_value_prev(builder.rws.rows)


def test_builder_rows_satisfied(circuit):
    cs, cfg = circuit
    rows = builder_rows()
    assert len(rows) > 20
    asg = st.assign(cs, cfg, N, rows)
    MockProver(cs, asg).assert_satisfied()


def test_read_wrong_value_rejected(circuit):
    cs, cfg = circuit
    rows = builder_rows()
    # find a stack read and corrupt its value
    srows = sorted(rows, key=RwRow.sort_key)
    for i, r in enumerate(srows):
        if r.rw == RW.READ and r.tag == Target.STACK and i > 0:
            import dataclasses
            srows[i] = dataclasses.replace(r, value=r.value + 1)
            break
    asg = st.assign(cs, cfg, N, srows)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" and "consistency" in f.name for f in fails), fails


def test_duplicate_rwc_rejected(circuit):
    """Two ops at the same (key, rwc): strict ordering must fail."""
    cs, cfg = circuit
    rows = [
        RwRow(5, RW.WRITE, Target.STACK, id=1, address=3, value=7),
        RwRow(5, RW.READ, Target.STACK, id=1, address=3, value=7),
    ]
    asg = st.assign(cs, cfg, N, rows)
    fails = MockProver(cs, asg).verify()
    assert fails  # pfx_last / diff lookup must break


def test_order_tamper_rejected(circuit):
    """Swap two rows' limb witnesses after assignment: equality or diff
    constraints must catch the mis-sorted key columns."""
    cs, cfg = circuit
    rows = [
        RwRow(1, RW.WRITE, Target.STACK, id=1, address=9, value=3),
        RwRow(2, RW.WRITE, Target.STACK, id=1, address=10, value=4),
    ]
    asg = st.assign(cs, cfg, N, rows)
    MockProver(cs, asg).assert_satisfied()
    # tamper: decrease the second row's address below the first while
    # keeping the scalar column consistent with the limbs
    asg.set_int(cfg.address, 1, 2)
    start, w = cfg.spans["address"]
    for j in range(w):
        asg.set_int(cfg.key.columns[start + j], 1, 0)
    asg.set_int(cfg.key.columns[start + w - 1], 1, 2)
    fails = MockProver(cs, asg).verify()
    assert fails, "mis-ordered rows accepted"


def test_stack_first_read_rejected(circuit):
    cs, cfg = circuit
    rows = [RwRow(1, RW.READ, Target.STACK, id=1, address=0, value=7)]
    asg = st.assign(cs, cfg, N, rows)
    fails = MockProver(cs, asg).verify()
    assert any("first_access" in f.name for f in fails), fails


def test_memory_first_read_zero(circuit):
    cs, cfg = circuit
    ok = [RwRow(1, RW.READ, Target.MEMORY, id=1, address=64, value=0)]
    asg = st.assign(cs, cfg, N, ok)
    MockProver(cs, asg).assert_satisfied()
    bad = [RwRow(1, RW.READ, Target.MEMORY, id=1, address=64, value=5)]
    asg = st.assign(cs, cfg, N, bad)
    fails = MockProver(cs, asg).verify()
    assert any("first_access" in f.name for f in fails), fails


def test_storage_key_240bit_boundary(circuit):
    cs, cfg = circuit
    key = (1 << st.SKEY_BITS) - 1
    rows = [
        RwRow(1, RW.WRITE, Target.STORAGE, id=1, address=0xBBBB,
              storage_key=key, value=1),
        RwRow(2, RW.READ, Target.STORAGE, id=1, address=0xBBBB,
              storage_key=key, value=1, value_prev=1),
    ]
    asg = st.assign(cs, cfg, N, rows)
    MockProver(cs, asg).assert_satisfied()
    with pytest.raises(AssertionError):
        st.assign(cs, cfg, N, [
            RwRow(1, RW.WRITE, Target.STORAGE, id=1, address=0,
                  storage_key=1 << st.SKEY_BITS, value=1)
        ])
