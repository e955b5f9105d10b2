"""Witness pipeline tests: mini tracer -> CircuitInputBuilder -> RwMap
(reference role: bus-mapping per-opcode witness tests + tracer_tests.rs,
SURVEY.md §4). Covers the call tree, reversion, EIP-2929/3529 gas, copy
events and the post-state sanitizer."""

import pytest

from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.witness import CircuitInputBuilder, RW, Target


CALLER = 0xAAAA
CALLEE = 0xBBBB
OTHER = 0xB0B2


def setup_contract(code: bytes, other_code: bytes | None = None):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    if other_code is not None:
        sdb.ensure(OTHER).code_hash = cdb.insert(other_code)
    return sdb, cdb


def run_tx(sdb, cdb, *, value=0, calldata=b"", expect_ok=True):
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=value,
                    calldata=calldata)
    if expect_ok:
        assert not tr.failed, [hex(s.op) for s in tr.struct_logs]
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=value,
                      calldata=calldata)
    errs = builder.rws.check_consistency()
    assert errs == [], errs
    perrs = builder.check_post_state(sdb)
    assert perrs == [], perrs
    return tr, builder


def test_tracer_add_mstore_return():
    # PUSH1 5; PUSH1 7; ADD; PUSH1 0; MSTORE; PUSH1 32; PUSH1 0; RETURN
    code = bytes([0x60, 5, 0x60, 7, 0x01, 0x60, 0, 0x52, 0x60, 32, 0x60, 0, 0xF3])
    sdb, cdb = setup_contract(code)
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    assert int.from_bytes(tr.return_value, "big") == 12
    assert [s.op for s in tr.struct_logs][:5] == [0x60, 0x60, 0x01, 0x60, 0x52]


def test_tracer_storage_and_jump():
    # PUSH1 42; PUSH1 1; SSTORE; PUSH1 9; JUMP; INVALID; JUMPDEST; PUSH1 1; SLOAD; STOP
    code = bytes([0x60, 42, 0x60, 1, 0x55, 0x60, 9, 0x56, 0xFE, 0x5B, 0x60, 1, 0x54, 0x00])
    sdb, cdb = setup_contract(code)
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    assert sdb.get_storage(CALLEE, 1) == 42
    sload_step = [s for s in tr.struct_logs if s.op == 0x54][0]
    assert sload_step.stack[-1] == 1


def test_tracer_jump_into_push_data_rejected():
    # PUSH2 0x5B00; PUSH1 1; JUMP -> dest 1 is push data, not a JUMPDEST
    code = bytes([0x61, 0x5B, 0x00, 0x60, 1, 0x56])
    sdb, cdb = setup_contract(code)
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert tr.failed


def test_builder_rw_consistency():
    # exercise arithmetic, dup/swap, memory, storage
    code = bytes(
        [0x60, 3, 0x60, 4, 0x01,        # ADD -> 7
         0x80,                           # DUP1
         0x60, 2, 0x90,                  # PUSH 2; SWAP1
         0x02,                           # MUL -> 14
         0x60, 0x20, 0x52,               # MSTORE @32
         0x60, 0x20, 0x51,               # MLOAD @32
         0x60, 5, 0x55,                  # SSTORE key=5
         0x00]
    )
    sdb, cdb = setup_contract(code)
    tr, builder = run_tx(sdb, cdb)
    tags = {r.tag for r in builder.rws.rows}
    assert Target.STACK in tags and Target.MEMORY in tags and Target.STORAGE in tags
    # BeginTx + opcode steps + EndTx
    assert len(builder.steps) == len(tr.struct_logs) + 2


def test_builder_stack_rws_add():
    code = bytes([0x60, 3, 0x60, 4, 0x01, 0x00])  # PUSH PUSH ADD STOP
    sdb, cdb = setup_contract(code)
    tr, builder = run_tx(sdb, cdb)
    add_step = builder.steps[3]  # BeginTx, PUSH, PUSH, ADD
    assert add_step.op == 0x01
    rows = {r.rw_counter: r for r in builder.rws.rows}
    reads = [rows[i] for i in add_step.rw_indices if rows[i].rw == RW.READ]
    writes = [rows[i] for i in add_step.rw_indices if rows[i].rw == RW.WRITE]
    assert [r.value for r in reads] == [4, 3]
    assert [w.value for w in writes] == [7]


CALL_B = bytes([0x60, 7, 0x60, 1, 0x55, 0x00])  # SSTORE(1, 7); STOP
# CALL(gas=0xFFFF, to=OTHER, value=0, in=(0,0), out=(0,0)); STOP
CALL_A = bytes([0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0,
                0x61, 0xB0, 0xB2, 0x61, 0xFF, 0xFF, 0xF1, 0x00])


def test_call_tree():
    sdb, cdb = setup_contract(CALL_A, other_code=CALL_B)
    tr, builder = run_tx(sdb, cdb)
    assert sdb.get_storage(OTHER, 1) == 7
    assert [c.call_id for c in builder.calls] == [1, 2]
    child = builder.calls[1]
    assert child.caller_id == 1 and child.address == OTHER and child.is_success
    # the CALL result push is 1 (on the Restore row since the 4-row
    # CALL layout landed)
    restore = next(s for s in builder.steps if s.exec_state == "Restore")
    rows = {r.rw_counter: r for r in builder.rws.rows}
    result = rows[restore.rw_indices[-1]]
    assert result.rw == RW.WRITE and result.value == 1
    # the child's SSTORE landed with the child's context
    sstores = [r for r in builder.rws.rows
               if r.tag == Target.STORAGE and r.rw == RW.WRITE]
    assert sstores and sstores[0].address == OTHER


REVERT_B = bytes([0x60, 7, 0x60, 1, 0x55, 0x60, 0, 0x60, 0, 0xFD])  # SSTORE; REVERT


def test_revert_rolls_back_child_writes():
    sdb, cdb = setup_contract(CALL_A, other_code=REVERT_B)
    tr, builder = run_tx(sdb, cdb)  # root succeeds; child reverts
    assert sdb.get_storage(OTHER, 1) == 0
    child = builder.calls[1]
    assert not child.is_success
    # compensating write restored the slot: a WRITE of value 0 after the 7
    writes = [r for r in builder.rws.rows
              if r.tag == Target.STORAGE and r.rw == RW.WRITE]
    assert [w.value for w in writes] == [7, 0]
    # the CALL result push is 0
    restore = next(s for s in builder.steps if s.exec_state == "Restore")
    rows = {r.rw_counter: r for r in builder.rws.rows}
    assert rows[restore.rw_indices[-1]].value == 0


def test_staticcall_write_violation():
    # STATICCALL(gas, to, in=(0,0), out=(0,0)) into a storage writer.
    # The TRACER must reject the write and revert the child; the builder
    # emits an ErrorWriteProtection step for the violating SSTORE.
    code = bytes([0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0,
                  0x61, 0xB0, 0xB2, 0x61, 0xFF, 0xFF, 0xFA, 0x00])
    sdb, cdb = setup_contract(code, other_code=CALL_B)
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    assert sdb.get_storage(OTHER, 1) == 0
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0,
                      calldata=b"")
    assert any(s.exec_state == "ErrorWriteProtection" for s in builder.steps)


def test_failed_root_tx_reverts_transfer():
    code = bytes([0xFE])  # INVALID
    sdb, cdb = setup_contract(code)
    pre_balance = sdb.get_account(CALLER).balance
    tr, builder = run_tx(sdb, cdb, value=1000, expect_ok=False)
    assert tr.failed
    assert sdb.get_account(CALLER).balance == pre_balance
    assert sdb.get_account(CALLER).nonce == 1
    assert sdb.get_account(CALLEE).balance == 0


def test_cold_warm_gas_and_refund():
    # SLOAD(1) cold; SLOAD(1) warm; SSTORE(1, 0) clears a pre-set slot
    code = bytes([0x60, 1, 0x54, 0x50, 0x60, 1, 0x54, 0x50,
                  0x60, 0, 0x60, 1, 0x55, 0x00])
    sdb, cdb = setup_contract(code)
    sdb.set_storage(CALLEE, 1, 99)
    tr, builder = run_tx(sdb, cdb)
    sloads = [s for s in tr.struct_logs if s.op == 0x54]
    assert sloads[0].gas_cost == 2100 and sloads[1].gas_cost == 100
    sstore = next(s for s in tr.struct_logs if s.op == 0x55)
    assert sstore.gas_cost == 2900  # warm slot, original nonzero -> reset
    assert tr.refund == 4800
    refunds = [r for r in builder.rws.rows if r.tag == Target.TX_REFUND]
    assert refunds[0].rw == RW.WRITE and refunds[0].value == 4800
    warm_rows = [r for r in builder.rws.rows
                 if r.tag == Target.TX_ACCESS_LIST_STORAGE]
    assert [r.value_prev for r in warm_rows] == [0, 1, 1]


def test_copy_events_calldatacopy_sha3():
    # CALLDATACOPY(mem 0, data 0, 8); SHA3(0, 8); STOP
    code = bytes([0x60, 8, 0x60, 0, 0x60, 0, 0x37,
                  0x60, 8, 0x60, 0, 0x20, 0x00])
    sdb, cdb = setup_contract(code)
    data = bytes(range(1, 9))
    tr, builder = run_tx(sdb, cdb, calldata=data)
    evs = builder.copy_events
    assert len(evs) == 2
    cdc, sha = evs
    assert bytes(b for b, _ in cdc.bytes_) == data
    assert bytes(b for b, _ in sha.bytes_) == data
    # destination memory write is in the RW rows
    mems = [r for r in builder.rws.rows if r.tag == Target.MEMORY]
    assert mems[0].rw == RW.WRITE
    assert mems[0].value == int.from_bytes(data.ljust(32, b"\0"), "big")
    # SHA3 pushed the real keccak
    from zkevm_tpu.hash.keccak import keccak256

    sha_step_i = next(i for i, s in enumerate(tr.struct_logs) if s.op == 0x20)
    assert tr.struct_logs[sha_step_i + 1].stack[-1] == int.from_bytes(
        keccak256(data), "big"
    )


def test_exp_event_and_log():
    # EXP(2, 10); LOG1(topic=ADD result, mem 0..4)
    code = bytes([0x60, 10, 0x60, 2, 0x0A,  # EXP -> 1024
                  0x60, 0, 0x52,            # MSTORE @0
                  0x60, 0xAB, 0x60, 4, 0x60, 28, 0xA1,  # LOG1 topic=0xAB data=mem[28:32]
                  0x00])
    sdb, cdb = setup_contract(code)
    tr, builder = run_tx(sdb, cdb)
    assert builder.exp_events and builder.exp_events[0].exponentiation == 1024
    assert len(tr.logs) == 1
    assert tr.logs[0].topics == [0xAB]
    assert tr.logs[0].data == (1024).to_bytes(32, "big")[28:32]
    logrows = [r for r in builder.rws.rows if r.tag == Target.TX_LOG]
    assert len(logrows) == 6  # address + 1 topic + 4 data bytes
    assert [r.value for r in logrows][:2] == [CALLEE, 0xAB]
    data_rows = [r for r in logrows if r.field == 2]
    assert bytes(r.value for r in data_rows) == tr.logs[0].data
    assert any(
        e.dst_type == 4 and bytes(b for b, _ in e.bytes_) == tr.logs[0].data
        for e in builder.copy_events
    )


def test_gas_chain_audit_catches_tamper():
    code = bytes([0x60, 3, 0x60, 4, 0x01, 0x00])
    sdb, cdb = setup_contract(code)
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    tr.struct_logs[1].gas_cost += 1
    builder = CircuitInputBuilder(pre, cdb)
    import pytest

    from zkevm_tpu.witness.builder import GasMismatch

    with pytest.raises(GasMismatch):
        builder.handle_tx(tr, caller=CALLER, callee=CALLEE)
