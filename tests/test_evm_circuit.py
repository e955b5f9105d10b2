"""EVM circuit milestone tests (VERDICT round-2 item 4 / BASELINE
milestone #3): a value-transfer tx with contract execution proven
end-to-end from a mini-tracer trace through the mini SuperCircuit
(EVM + State + Bytecode over shared tables), plus adversarial tampers."""

import dataclasses

import numpy as np
import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.witness import CircuitInputBuilder, RW, Target

K = 11
N = 1 << K
CALLER = 0xAAAA
CALLEE = 0xBBBB
VALUE = 10**15

# PUSH1 5; PUSH1 7; ADD; PUSH1 3; SWAP1; SUB; DUP1; PUSH1 0; MSTORE;
# PUSH1 0; MLOAD; PUSH1 1; SSTORE; POP; JUMPDEST; STOP
CODE = bytes([
    0x60, 5, 0x60, 7, 0x01, 0x60, 3, 0x90, 0x03, 0x80,
    0x60, 0, 0x52, 0x60, 0, 0x51, 0x60, 1, 0x55, 0x50, 0x5B, 0x00,
])


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    ev_cfg = evm.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        rw_count=st_cfg.count_surface,
    )
    return cs, st_cfg, bc_cfg, ev_cfg


def build(code=CODE, value=VALUE):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=value)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=value)
    assert builder.check_post_state(sdb) == []
    return builder, h


def witness(circuit, builder, h, code=CODE, rows=None):
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    asg = Assignment(cs, N)
    st.assign(cs, st_cfg, N, rows if rows is not None
              else st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [code], asg)
    evm.assign(cs, ev_cfg, N, builder.steps, builder.rws, asg=asg)
    return asg


def test_transfer_with_execution_proven(circuit):
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    builder, h = build()
    # post-state sanity: the tx did what it says
    assert builder.sdb.get_account(CALLER).balance == 10**18 - VALUE
    assert builder.sdb.get_account(CALLEE).balance == VALUE
    assert builder.sdb.get_storage(CALLEE, 1) == 9
    asg = witness(circuit, builder, h)
    MockProver(cs, asg).assert_satisfied()


def test_pure_transfer_proven(circuit):
    """Empty callee code: BeginTx -> EndTx only (the ERC20-shaped simple
    value transfer of BASELINE milestone #3)."""
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    sdb, cdb = StateDB(), CodeDB()
    sdb.ensure(CALLER).balance = 10**18
    sdb.ensure(CALLEE)
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=VALUE)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=VALUE)
    assert builder.check_post_state(sdb) == []
    from zkevm_tpu.etypes.state import EMPTY_CODE_HASH
    asg = witness(circuit, builder, EMPTY_CODE_HASH, code=b"")
    MockProver(cs, asg).assert_satisfied()


def test_stolen_balance_rejected(circuit):
    """Credit the callee more than the caller paid: the balance-transfer
    word identity or RW lookup must break."""
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    builder, h = build()
    rows = st.fix_value_prev(builder.rws.rows)
    for i, r in enumerate(rows):
        if r.tag == Target.ACCOUNT and r.rw == RW.WRITE and r.address == CALLEE:
            rows[i] = dataclasses.replace(r, value=r.value + 10**18)
    asg = witness(circuit, builder, h, rows=rows)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged balance accepted"


def test_wrong_add_result_rejected(circuit):
    """Corrupt the ADD result in both the RW rows and the EVM witness:
    the add/sub word identity must break."""
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    builder, h = build()
    asg = witness(circuit, builder, h)
    # find the ADD step row and bump its result word cell
    add_row = next(
        r for r, s in enumerate(builder.steps)
        if s.exec_state is None and s.op == 0x01
    )
    cur = FR.decode(asg.cols[ev_cfg.w[2][0]][add_row])
    asg.set_int(ev_cfg.w[2][0], add_row, cur + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "wrong ADD result accepted"


def test_skipped_opcode_rejected(circuit):
    """Claim a different pc chain (skip an opcode): the bytecode fetch
    lookup or pc transition must break."""
    cs, st_cfg, bc_cfg, ev_cfg = circuit
    builder, h = build()
    asg = witness(circuit, builder, h)
    some_row = 3
    cur_pc = FR.decode(asg.cols[ev_cfg.pc][some_row])
    asg.set_int(ev_cfg.pc, some_row, cur_pc + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "pc tamper accepted"


# JUMPI(untaken) JUMPDEST PUSH PUSH LT ISZERO JUMPI(taken over INVALID)
# JUMPDEST ADDRESS POP CALLER CALLVALUE EQ CALLDATASIZE GT ISZERO
# PUSH1 2 SSTORE STOP
CODE2 = bytes([
    0x60, 0x00, 0x60, 0x05, 0x57, 0x5B, 0x60, 0x0A, 0x60, 0x14,
    0x10, 0x15, 0x60, 0x10, 0x57, 0xFE, 0x5B, 0x30, 0x50, 0x33,
    0x34, 0x14, 0x36, 0x11, 0x15, 0x60, 0x02, 0x55, 0x00,
])


def test_jumps_compares_context_proven(circuit):
    """The round-2 extension states: JUMP/JUMPI (taken + untaken, dest
    bytecode-checked), LT/GT, ISZERO, EQ, CALLER/CALLVALUE/ADDRESS/
    CALLDATASIZE — proven against RwTable + BytecodeTable."""
    cs = circuit[0]
    builder, h = build(code=CODE2)
    assert builder.sdb.get_storage(CALLEE, 2) == 1
    ops = [s.op for s in builder.steps if s.exec_state is None]
    for op in (0x57, 0x10, 0x11, 0x14, 0x15, 0x30, 0x33, 0x34, 0x36):
        assert op in ops, hex(op)
    asg = witness(circuit, builder, h, code=CODE2)
    MockProver(cs, asg).assert_satisfied()


def test_forged_jump_dest_rejected(circuit):
    """Claim a taken jump to a non-JUMPDEST byte: the ev_jumpdest
    bytecode lookup must break."""
    cs, _, _, ev_cfg = circuit
    builder, h = build(code=CODE2)
    asg = witness(circuit, builder, h, code=CODE2)
    # find the taken-JUMPI row (dest 0x10) and claim dest 0x0F (INVALID)
    row = next(r for r, s in enumerate(builder.steps)
               if s.op == 0x57 and builder.rws.rows is not None
               and FR.decode(asg.cols[ev_cfg.w[0][0]][r]) == 0x10)
    asg.set_int(ev_cfg.w[0][0], row, 0x0F)
    fails = MockProver(cs, asg).verify()
    assert fails, "jump to non-JUMPDEST accepted"


def test_forged_compare_rejected(circuit):
    """Claim LT produced 1 where it produced 0."""
    cs, _, _, ev_cfg = circuit
    builder, h = build(code=CODE2)
    asg = witness(circuit, builder, h, code=CODE2)
    row = next(r for r, s in enumerate(builder.steps) if s.op == 0x10)
    asg.set_int(ev_cfg.w[2][0], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged comparison accepted"


def test_injected_rw_row_rejected(circuit):
    """Smuggle an extra storage write into the RwTable that no EVM step
    claims: the total-rws count link must break (rw-set completeness)."""
    cs, st_cfg, _, _ = circuit
    builder, h = build()
    rows = st.fix_value_prev(builder.rws.rows)
    top = max(r.rw_counter for r in rows)
    rows.append(dataclasses.replace(
        rows[-1], rw_counter=top + 1, tag=Target.STORAGE, rw=RW.WRITE,
        id=1, address=CALLEE, field=0, storage_key=999, value=5,
        value_prev=0,
    ))
    asg = witness(circuit, builder, h, rows=rows)
    fails = MockProver(cs, asg).verify()
    assert any("total_rws" in f.name for f in fails), \
        f"injected rw row accepted: {fails[:3]}"
