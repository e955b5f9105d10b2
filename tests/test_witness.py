"""Witness pipeline tests: mini tracer -> CircuitInputBuilder -> RwMap
(reference role: bus-mapping per-opcode witness tests, SURVEY.md §4)."""

from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.opcodes import OpcodeId
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.witness import CircuitInputBuilder, RW, Target


CALLER = 0xAAAA
CALLEE = 0xBBBB


def setup_contract(code: bytes):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    return sdb, cdb


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


def test_builder_rw_consistency():
    # exercise arithmetic, dup/swap, memory, storage
    code = bytes(
        [0x60, 3, 0x60, 4, 0x01,        # ADD -> 7
         0x80,                           # DUP1
         0x60, 2, 0x90,                  # PUSH 2; SWAP1
         0x02,                           # MUL -> 14
         0x60, 0x20, 0x52,               # MSTORE @32
         0x60, 0x20, 0x51,               # MLOAD @32
         0x60, 5, 0x55,                  # SSTORE key=5... stack: [7, loaded]; push 5; SSTORE key=5 val=loaded
         0x00]
    )
    sdb, cdb = setup_contract(code)
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed, [hex(s.op) for s in tr.struct_logs]
    builder = CircuitInputBuilder(sdb.clone(), cdb)
    builder.handle_call(tr, caller=CALLER, callee=CALLEE)
    errs = builder.rws.check_consistency()
    assert errs == [], errs
    tags = {r.tag for r in builder.rws.rows}
    assert Target.STACK in tags and Target.MEMORY in tags and Target.STORAGE in tags
    # every step recorded at least one rw except STOP/JUMPDEST-like
    assert len(builder.steps) == len(tr.struct_logs)


def test_builder_stack_rws_add():
    code = bytes([0x60, 3, 0x60, 4, 0x01, 0x00])  # PUSH PUSH ADD STOP
    sdb, cdb = setup_contract(code)
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    builder = CircuitInputBuilder(sdb.clone(), cdb)
    builder.handle_call(tr, caller=CALLER, callee=CALLEE)
    add_step = builder.steps[2]
    rows = {r.rw_counter: r for r in builder.rws.rows}
    reads = [rows[i] for i in add_step.rw_indices if rows[i].rw == RW.READ]
    writes = [rows[i] for i in add_step.rw_indices if rows[i].rw == RW.WRITE]
    assert [r.value for r in reads] == [4, 3]
    assert [w.value for w in writes] == [7]
