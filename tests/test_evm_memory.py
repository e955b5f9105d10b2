"""Byte-granular memory: unaligned MLOAD/MSTORE, MSTORE8, MSIZE and the
quadratic memory-expansion gas gadget, proven at the circuit tier
(reference: evm_circuit/execution/{memory,msize}.rs and the
memory_expansion gadget of util/memory_gadget.rs; the TPU design uses a
32-wide one-hot shift mask instead of a CellManager byte pipeline)."""

import pytest

from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.plonk import MockProver
from zkevm_tpu.witness import CircuitInputBuilder

from tests.test_evm_circuit import BLOCK_CTX, CALLEE, CALLER, circuit, witness

# mem[5] = 0x11 (MSTORE8); unaligned MSTORE of 0xBEEF at 30 (crosses the
# word boundary); unaligned MLOAD at 7; MSIZE (=64); aligned MLOAD at 32
CODE_MEM = bytes([
    0x60, 0x11, 0x60, 5, 0x53,          # PUSH1 0x11; PUSH1 5; MSTORE8
    0x61, 0xBE, 0xEF, 0x60, 30, 0x52,   # PUSH2 0xBEEF; PUSH1 30; MSTORE
    0x60, 7, 0x51,                      # PUSH1 7; MLOAD
    0x59,                               # MSIZE
    0x60, 32, 0x51,                     # PUSH1 32; MLOAD (aligned)
    0x50, 0x50, 0x50,                   # POP x3
    0x00,                               # STOP
])


def build_mem(code=CODE_MEM):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=0,
                    block_ctx=BLOCK_CTX)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0)
    assert builder.check_post_state(sdb) == []
    return builder, h, tr


def test_trace_semantics():
    """The mini tracer's view of the memory ops (sanity anchor)."""
    builder, h, tr = build_mem()
    # mem after: [0]*5 + [0x11] ... word1[30:32] = BE EF spill into word?
    # MSTORE at 30 writes bytes 30..61: value 0xBEEF big-endian 32 bytes
    # -> bytes 60,61 = BE,EF
    mem = tr.struct_logs[-1].memory
    assert mem[5] == 0x11
    assert mem[60] == 0xBE and mem[61] == 0xEF
    # MLOAD at 7 sees bytes 7..38 (zeros except nothing set there yet
    # besides index 5 which is below 7)
    msize_step = next(s for s in tr.struct_logs if s.op == 0x59)
    nxt = tr.struct_logs[tr.struct_logs.index(msize_step) + 1]
    # MSTORE at 30 expanded memory to ceil(62/32)=2 words; the unaligned
    # MLOAD at 7 stays within -> MSIZE = 64
    assert nxt.stack[-1] == 64


def test_unaligned_memory_proven(circuit):
    builder, h, tr = build_mem()
    asg = witness(circuit, builder, h, code=CODE_MEM)
    cs = circuit[0]
    MockProver(cs, asg).assert_satisfied()


def test_forged_mload_value_rejected(circuit):
    """Bump a byte of the unaligned-MLOAD stack result: the one-hot
    recombination (or the RW consistency) must break."""
    import dataclasses

    from zkevm_tpu.circuits import state_circuit as st
    from zkevm_tpu.witness.rw import RW, Target

    builder, h, tr = build_mem()
    rows = st.fix_value_prev(builder.rws.rows)
    # the MLOAD-at-7 result is the stack write right after the two
    # memory reads of the first MLOAD step
    ml_step = next(s for s in builder.steps if s.op == 0x51)
    wr_rwc = ml_step.rw_indices[3]
    for i, r_ in enumerate(rows):
        if r_.rw_counter == wr_rwc:
            assert r_.tag == Target.STACK and r_.rw == RW.WRITE
            rows[i] = dataclasses.replace(r_, value=r_.value + (1 << 64))
    asg = witness(circuit, builder, h, code=CODE_MEM, rows=rows)
    cs = circuit[0]
    assert MockProver(cs, asg).verify(), "forged MLOAD value accepted"


def test_forged_msize_rejected(circuit):
    """Bump the MSIZE push: the 32*mws binding must break."""
    import dataclasses

    from zkevm_tpu.circuits import state_circuit as st
    from zkevm_tpu.witness.rw import RW, Target

    builder, h, tr = build_mem()
    rows = st.fix_value_prev(builder.rws.rows)
    ms_step = next(s for s in builder.steps if s.op == 0x59)
    wr_rwc = ms_step.rw_indices[0]
    for i, r_ in enumerate(rows):
        if r_.rw_counter == wr_rwc:
            rows[i] = dataclasses.replace(r_, value=r_.value + 32)
    asg = witness(circuit, builder, h, code=CODE_MEM, rows=rows)
    cs = circuit[0]
    assert MockProver(cs, asg).verify(), "forged MSIZE accepted"
