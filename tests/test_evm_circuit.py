"""EVM circuit milestone tests (VERDICT round-2 item 4 / BASELINE
milestone #3): a value-transfer tx with contract execution proven
end-to-end from a mini-tracer trace through the mini SuperCircuit
(EVM + State + Bytecode over shared tables), plus adversarial tampers."""

import dataclasses

import numpy as np
import pytest

from zkevm_tpu.circuits import bitwise_circuit as bw
from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import exp_circuit as ec
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits import word_arith as wa
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
    from zkevm_tpu.gadgets import RangeTable

    rt8 = RangeTable.configure(cs, 8)
    wa_cfg = wa.configure(cs, rt8)
    bw_cfg = bw.configure(cs)
    # mini BlockTable provider: fixed (en, tag, lo, hi) rows loaded from
    # BLOCK_CTX below (the real producer is the PI circuit; the super
    # circuit test covers that wiring)
    from zkevm_tpu.circuits.pi_circuit import BlockTable

    bt_cols = [cs.fixed_column() for _ in range(4)]
    block_table = BlockTable([c.cur() for c in bt_cols])
    ex_cfg = ec.configure(cs, wa_cfg.table)
    from zkevm_tpu.circuits.tables import BytecodeLenTable

    ev_cfg = evm.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        rw_count=st_cfg.count_surface, rt8=rt8,
        word_table=wa_cfg.table, bitwise_table=bw_cfg.table,
        block_table=block_table, exp_table=ex_cfg.table,
        bytecode_len_table=BytecodeLenTable.from_config(bc_cfg),
    )
    return cs, st_cfg, bc_cfg, ev_cfg, wa_cfg, bw_cfg, bt_cols, ex_cfg


BLOCK_CTX = {"coinbase": 0xC01BA5E, "timestamp": 1_700_000_000,
             "number": 1234, "gas_limit": 30_000_000, "chain_id": 7,
             "base_fee": 10**9}


def build(code=CODE, value=VALUE):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=value,
                    block_ctx=BLOCK_CTX)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=value)
    assert builder.check_post_state(sdb) == []
    return builder, h


def witness(circuit, builder, h, code=CODE, rows=None, codes=None):
    (cs, st_cfg, bc_cfg, ev_cfg, wa_cfg, bw_cfg, bt_cols, ex_cfg) = circuit
    asg = Assignment(cs, N)
    # load the mini block table (row 0 stays zero = disabled tuple)
    from zkevm_tpu.circuits.pi_circuit import BlockField

    M128 = (1 << 128) - 1
    fields = [(BlockField.COINBASE, BLOCK_CTX["coinbase"]),
              (BlockField.TIMESTAMP, BLOCK_CTX["timestamp"]),
              (BlockField.NUMBER, BLOCK_CTX["number"]),
              (BlockField.GAS_LIMIT, BLOCK_CTX["gas_limit"]),
              (BlockField.CHAIN_ID, BLOCK_CTX["chain_id"]),
              (BlockField.BASE_FEE, BLOCK_CTX["base_fee"])]
    for i, (tag, v) in enumerate(fields):
        asg.set_int(bt_cols[0], 1 + i, 1)
        asg.set_int(bt_cols[1], 1 + i, int(tag))
        asg.set_int(bt_cols[2], 1 + i, v & M128)
        asg.set_int(bt_cols[3], 1 + i, v >> 128)
    st.assign(cs, st_cfg, N, rows if rows is not None
              else st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, codes if codes is not None else [code], asg)
    evm.assign(cs, ev_cfg, N, builder.steps, builder.rws, asg=asg,
               calls=builder.calls)
    xevents = evm.exp_events(builder.steps, builder.rws)
    ec.assign(cs, ex_cfg, N, xevents, asg)
    wa.assign(cs, wa_cfg, N,
              evm.word_arith_ops(builder.steps, builder.rws)
              + ec.word_arith_ops(xevents), asg)
    bw.assign(cs, bw_cfg, N, evm.bitwise_events(builder.steps, builder.rws),
              asg)
    return asg


def test_transfer_with_execution_proven(circuit):
    cs, st_cfg, bc_cfg, ev_cfg = circuit[:4]
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
    cs, st_cfg, bc_cfg, ev_cfg = circuit[:4]
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
    cs, st_cfg, bc_cfg, ev_cfg = circuit[:4]
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
    cs, st_cfg, bc_cfg, ev_cfg = circuit[:4]
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
    cs, st_cfg, bc_cfg, ev_cfg = circuit[:4]
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
    cs, _, _, ev_cfg = circuit[:4]
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
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE2)
    asg = witness(circuit, builder, h, code=CODE2)
    row = next(r for r, s in enumerate(builder.steps) if s.op == 0x10)
    asg.set_int(ev_cfg.w[2][0], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged comparison accepted"


def test_injected_rw_row_rejected(circuit):
    """Smuggle an extra storage write into the RwTable that no EVM step
    claims: the total-rws count link must break (rw-set completeness)."""
    cs, st_cfg, _, _ = circuit[:4]
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


# MUL 3*7; DIV 21/5; DIV 9/0; MOD 13%5; MOD 13%0; SHL 0xF0<<4;
# SHL 1<<256 (invalid); SHR 0xF0>>4; AND; OR; XOR; NOT; STOP
CODE3 = bytes([
    0x60, 7, 0x60, 3, 0x02,             # MUL -> 21
    0x60, 5, 0x90, 0x04,                # DIV 21/5 -> 4
    0x60, 0, 0x60, 9, 0x04,             # DIV 9/0 -> 0
    0x60, 5, 0x60, 13, 0x06,            # MOD 13%5 -> 3
    0x60, 0, 0x60, 13, 0x06,            # MOD 13%0 -> 0
    0x60, 0xF0, 0x60, 4, 0x1B,          # SHL: 0xF0 << 4 -> 0xF00
    0x60, 1, 0x61, 0x01, 0x00, 0x1B,    # SHL: 1 << 256 -> 0 (invalid)
    0x60, 0xF0, 0x60, 4, 0x1C,          # SHR: 0xF0 >> 4 -> 0x0F
    0x60, 0x3C, 0x60, 0x0F, 0x16,       # AND -> 0x0C
    0x60, 0x30, 0x17,                   # OR  -> 0x3C
    0x60, 0xFF, 0x18,                   # XOR -> 0xC3
    0x19,                               # NOT -> ~0xC3
    0x00,
])


def test_word_arith_bitwise_states_proven(circuit):
    """Round-2 batch: MUL/DIV/MOD (incl. division by zero), SHL/SHR
    (incl. shift >= 256), AND/OR/XOR/NOT — proven against the
    WordArithTable and BitwiseTable satellites."""
    cs = circuit[0]
    builder, h = build(code=CODE3)
    ops = [s.op for s in builder.steps if s.exec_state is None]
    for op in (0x02, 0x04, 0x06, 0x1B, 0x1C, 0x16, 0x17, 0x18, 0x19):
        assert op in ops, hex(op)
    wops = evm.word_arith_ops(builder.steps, builder.rws)
    assert len(wops) == 5  # 2 div-by-zero + 1 invalid shift skip the table
    asg = witness(circuit, builder, h, code=CODE3)
    MockProver(cs, asg).assert_satisfied()


def test_forged_quotient_rejected(circuit):
    """Claim 21/5 = 5: the WordArithTable lookup (exactness + canonical
    remainder) must break."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE3)
    asg = witness(circuit, builder, h, code=CODE3)
    row = next(r for r, s in enumerate(builder.steps)
               if s.op == 0x04 and FR.decode(asg.cols[ev_cfg.w[2][0]][r]) == 4)
    asg.set_int(ev_cfg.w[2][0], row, 5)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged quotient accepted"


def test_div_by_zero_nonzero_result_rejected(circuit):
    """x/0 must push 0; claim it pushes 1."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE3)
    asg = witness(circuit, builder, h, code=CODE3)
    row = next(r for r, s in enumerate(builder.steps)
               if s.op == 0x04 and FR.decode(asg.cols[ev_cfg.bzc][r]) == 1)
    asg.set_int(ev_cfg.w[2][0], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "x/0 != 0 accepted"


def test_oversized_shift_nonzero_result_rejected(circuit):
    """1 << 256 must push 0; claim a nonzero result."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE3)
    asg = witness(circuit, builder, h, code=CODE3)
    row = next(r for r, s in enumerate(builder.steps)
               if s.op == 0x1B and FR.decode(asg.cols[ev_cfg.vcell][r]) == 0)
    asg.set_int(ev_cfg.w[2][0], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "oversized shift nonzero result accepted"


def test_forged_bitwise_result_rejected(circuit):
    """Claim 0x3C AND 0x0F = 0x0D: the BitwiseTable lookup must break."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE3)
    asg = witness(circuit, builder, h, code=CODE3)
    row = next(r for r, s in enumerate(builder.steps) if s.op == 0x16)
    asg.set_int(ev_cfg.w[2][0], row, 0x0D)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged AND result accepted"


# COINBASE TIMESTAMP NUMBER GASLIMIT CHAINID BASEFEE PC GAS SELFBALANCE
# BALANCE(caller, warm) EXTCODEHASH(callee, warm) BALANCE(0xCCCC, cold) STOP
CODE4 = bytes([
    0x41, 0x42, 0x43, 0x45, 0x46, 0x48, 0x58, 0x5A, 0x47,
    0x61, 0xAA, 0xAA, 0x31,
    0x61, 0xBB, 0xBB, 0x3F,
    0x61, 0xCC, 0xCC, 0x31,
    0x3D, 0x50,  # RETURNDATASIZE (0 before any call); POP
    0x00,
])


def test_context_states_proven(circuit):
    """Round-2 batch: block context (BlockTable lookups), PC/GAS,
    SELFBALANCE, BALANCE/EXTCODEHASH with EIP-2929 warm/cold gas."""
    cs = circuit[0]
    builder, h = build(code=CODE4)
    ops = [s.op for s in builder.steps if s.exec_state is None]
    for op in (0x41, 0x42, 0x43, 0x45, 0x46, 0x48, 0x58, 0x5A, 0x47,
               0x31, 0x3F):
        assert op in ops, hex(op)
    # cold BALANCE charged 2600, warm 100
    costs = [s.gas_cost for s in builder.steps
             if s.exec_state is None and s.op == 0x31]
    assert costs == [100, 2600]
    asg = witness(circuit, builder, h, code=CODE4)
    MockProver(cs, asg).assert_satisfied()


def test_forged_block_value_rejected(circuit):
    """Claim a different TIMESTAMP than the block header's."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE4)
    asg = witness(circuit, builder, h, code=CODE4)
    row = next(r for r, s in enumerate(builder.steps) if s.op == 0x42)
    asg.set_int(ev_cfg.w[0][0], row, BLOCK_CTX["timestamp"] + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged block value accepted"


def test_forged_cold_gas_rejected(circuit):
    """Claim the cold BALANCE access was warm (gas 100 instead of 2600)."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE4)
    asg = witness(circuit, builder, h, code=CODE4)
    row = next(r for r, s in enumerate(builder.steps)
               if s.op == 0x31 and s.gas_cost == 2600)
    asg.set_int(ev_cfg.gc, row, 100)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged warm-access gas accepted"


# ADDMOD (250+13)%7=4; ADDMOD N=0 -> 0; ADDMOD (M+M)%7=2 (257-bit sum);
# MULMOD (M*M)%12=9 (512-bit product); MULMOD (6*5)%7=2; MULMOD N=0 -> 0
M = (1 << 256) - 1
CODE5 = bytes([
    0x60, 7, 0x60, 13, 0x60, 250, 0x08, 0x50,
    0x60, 0, 0x60, 1, 0x60, 2, 0x08, 0x50,
    0x60, 7, 0x60, 0, 0x19, 0x80, 0x08, 0x50,
    0x60, 12, 0x60, 0, 0x19, 0x80, 0x09, 0x50,
    0x60, 7, 0x60, 5, 0x60, 6, 0x09, 0x50,
    0x60, 0, 0x60, 5, 0x60, 6, 0x09, 0x50,
    0x00,
])


def test_mod_arith_states_proven(circuit):
    """Round-2 batch: ADDMOD/MULMOD via the 512-bit WordArithTable tags,
    including the 2^256 overflow shapes and the N = 0 zero-push rule."""
    cs = circuit[0]
    builder, h = build(code=CODE5)
    results = []
    for s in builder.steps:
        if s.exec_state is None and s.op in (0x08, 0x09):
            w = builder.rws.rows
            by = {row.rw_counter: row for row in w}
            results.append(by[s.rw_indices[3]].value)
    assert results == [4, 0, 2, 9, 2, 0]
    wops = evm.word_arith_ops(builder.steps, builder.rws)
    # 2 ops per live ADDMOD, 3 per live MULMOD, 0 for N = 0
    assert len(wops) == 2 + 0 + 2 + 3 + 3 + 0
    asg = witness(circuit, builder, h, code=CODE5)
    MockProver(cs, asg).assert_satisfied()


def test_forged_mod_result_rejected(circuit):
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE5)
    asg = witness(circuit, builder, h, code=CODE5)
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state is None and s.op == 0x09 and
               builder.steps[r].gas_left)
    asg.set_int(ev_cfg.w[3][0], row, 11)  # (M*M)%12 != 11
    fails = MockProver(cs, asg).verify()
    assert fails, "forged MULMOD result accepted"


def test_forged_modzero_result_rejected(circuit):
    """N = 0 must push 0 — claim 1 instead."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE5)
    rows = [r for r, s in enumerate(builder.steps)
            if s.exec_state is None and s.op == 0x08]
    row = rows[1]  # the N = 0 ADDMOD
    asg = witness(circuit, builder, h, code=CODE5)
    asg.set_int(ev_cfg.w[3][0], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged N=0 ADDMOD result accepted"


# EXP: 3^13 (table chain); 2^0 -> 1; 5^1 -> 5; 2^256 wrap (0x0100 exp);
# each POPped
CODE6 = bytes([
    0x60, 13, 0x60, 3, 0x0A, 0x50,
    0x60, 0, 0x60, 2, 0x0A, 0x50,
    0x60, 1, 0x60, 5, 0x0A, 0x50,
    0x61, 0x01, 0x00, 0x60, 2, 0x0A, 0x50,
    0x00,
])


def test_exp_states_proven(circuit):
    """Round-2 batch: EXP via the word-semantics ExpTable + byte-size
    gas, including the 0/1 special cases and a wrap-to-zero power."""
    cs = circuit[0]
    builder, h = build(code=CODE6)
    by = {row.rw_counter: row for row in builder.rws.rows}
    results = [by[s.rw_indices[2]].value for s in builder.steps
               if s.exec_state is None and s.op == 0x0A]
    assert results == [pow(3, 13), 1, 5, 0]
    gas = [s.gas_cost for s in builder.steps
           if s.exec_state is None and s.op == 0x0A]
    assert gas == [60, 10, 60, 110]  # 10 + 50*byte_size(exponent)
    asg = witness(circuit, builder, h, code=CODE6)
    MockProver(cs, asg).assert_satisfied()


def test_forged_exp_result_rejected(circuit):
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE6)
    asg = witness(circuit, builder, h, code=CODE6)
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state is None and s.op == 0x0A)
    asg.set_int(ev_cfg.w[2][0], row, pow(3, 13) + 2)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged EXP result accepted"


def test_forged_exp_gas_rejected(circuit):
    """Claim byte_size(exponent)=1 for the 2-byte exponent."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE6)
    asg = witness(circuit, builder, h, code=CODE6)
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state is None and s.op == 0x0A
               and s.gas_cost == 110)
    asg.set_int(ev_cfg.gc, row, 60)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged EXP byte-size gas accepted"


# BYTE: i=31 (low byte), i=3 of a PUSH2 value, i>=32 -> 0;
# SIGNEXTEND: i=0 on 0xFF (-> all-ones), i=0 on 0x7F (-> 0x7F), i>=31 -> x;
# SAR: 0xFF00 >> 4 (positive), sign-extended shift of a negative word,
# shift >= 256 of a negative word -> all-ones
NEG = (1 << 256) - 0x100  # "-256": top bit set
CODE7 = bytes([
    0x61, 0xBE, 0xEF, 0x60, 31, 0x1A, 0x50,   # BYTE(31, 0xBEEF) = 0xEF
    0x61, 0xBE, 0xEF, 0x60, 30, 0x1A, 0x50,   # BYTE(30, 0xBEEF) = 0xBE
    0x61, 0xBE, 0xEF, 0x60, 40, 0x1A, 0x50,   # BYTE(40, .) = 0
    0x60, 0xFF, 0x60, 0, 0x0B, 0x50,          # SIGNEXTEND(0, 0xFF) = -1
    0x60, 0x7F, 0x60, 0, 0x0B, 0x50,          # SIGNEXTEND(0, 0x7F) = 0x7F
    0x60, 0x7F, 0x60, 33, 0x0B, 0x50,         # SIGNEXTEND(33, x) = x
    0x61, 0xFF, 0x00, 0x60, 4, 0x1D, 0x50,    # SAR(4, 0xFF00) = 0xFF0
    0x60, 0, 0x19, 0x60, 4, 0x1D, 0x50,       # SAR(4, -1) = -1
    0x60, 0, 0x19, 0x61, 0x01, 0x00, 0x1D, 0x50,  # SAR(256, -1) = -1
    0x60, 5, 0x60, 0, 0x19, 0x1D, 0x50,       # SAR(shift=-1, 5) = 0
    0x00,
])


def test_byte_signext_sar_proven(circuit):
    """Round-2 batch: BYTE / SIGNEXTEND / SAR via pow2 + DIVMOD
    decompositions with sign masks."""
    cs = circuit[0]
    builder, h = build(code=CODE7)
    by = {row.rw_counter: row for row in builder.rws.rows}
    res = [by[s.rw_indices[2]].value for s in builder.steps
           if s.exec_state is None and s.op in (0x1A, 0x0B, 0x1D)]
    M = (1 << 256) - 1
    assert res == [0xEF, 0xBE, 0, M, 0x7F, 0x7F, 0xFF0, M, M, 0]
    asg = witness(circuit, builder, h, code=CODE7)
    MockProver(cs, asg).assert_satisfied()


def test_forged_byte_rejected(circuit):
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE7)
    asg = witness(circuit, builder, h, code=CODE7)
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state is None and s.op == 0x1A)
    asg.set_int(ev_cfg.w[2][0], row, 0xBE)  # byte 31 of 0xBEEF is 0xEF
    fails = MockProver(cs, asg).verify()
    assert fails, "forged BYTE accepted"


def test_forged_sar_sign_rejected(circuit):
    """Claim the negative SAR input was positive (sign bit 0)."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, h = build(code=CODE7)
    rows = [r for r, s in enumerate(builder.steps)
            if s.exec_state is None and s.op == 0x1D]
    row = rows[1]  # SAR(4, -1)
    asg = witness(circuit, builder, h, code=CODE7)
    asg.set_int(ev_cfg.carries[2], row, 0)
    M128 = (1 << 128) - 1
    asg.set_int(ev_cfg.w[2][0], row, (((1 << 256) - 1) >> 4) & M128)
    asg.set_int(ev_cfg.w[2][1], row, (((1 << 256) - 1) >> 4) >> 128)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged SAR sign accepted"


# -- CALL family --------------------------------------------------------
CHILD = 0xCCC1
# child: SSTORE(1, 7); PUSH 42; PUSH 0; MSTORE; STOP
CHILD_CODE = bytes([0x60, 7, 0x60, 1, 0x55, 0x00])
# parent: CALL(gas=0xFFFF, to=CHILD, value=5, in=(0,0), out=(0,0)); POP;
# then STATICCALL(gas=0xFFFF, to=CHILD... child SSTOREs -> fails) is NOT
# used here (separate test); just ADD after to prove resume works
PARENT_CALL = bytes([
    0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0, 0x60, 5,
    0x61, (CHILD >> 8) & 0xFF, CHILD & 0xFF, 0x61, 0xFF, 0xFF, 0xF1,
    0x60, 3, 0x01, 0x50, 0x00,
])
# parent: DELEGATECALL into a reader child; child: CALLVALUE; POP; STOP
READER_CODE = bytes([0x34, 0x50, 0x00])
PARENT_DC = bytes([
    0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0,
    0x61, (CHILD >> 8) & 0xFF, CHILD & 0xFF, 0x61, 0xFF, 0xFF, 0xF4,
    0x50, 0x00,
])
# parent: STATICCALL into the reader; child returns data-free
PARENT_SC = bytes([
    0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0,
    0x61, (CHILD >> 8) & 0xFF, CHILD & 0xFF, 0x61, 0xFF, 0xFF, 0xFA,
    0x50, 0x00,
])
# child that REVERTs after an SSTORE
REVERTER = bytes([0x60, 9, 0x60, 1, 0x55, 0x60, 0, 0x60, 0, 0xFD])


def build_call(parent_code, child_code, value=0):
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(parent_code)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CHILD).code_hash = cdb.insert(child_code)
    sdb.ensure(CALLER).balance = 10**18
    sdb.ensure(CALLEE).balance = 10**6
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=value,
                    block_ctx=BLOCK_CTX)
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=value)
    return builder, tr


def test_call_frame_proven(circuit):
    """A value CALL into a storage-writing child, then resume and ADD in
    the parent: the full 4-row CALL + Restore frame machinery."""
    cs = circuit[0]
    builder, tr = build_call(PARENT_CALL, CHILD_CODE)
    assert not tr.failed
    assert builder.sdb.get_storage(CHILD, 1) == 7
    assert builder.sdb.get_account(CHILD).balance == 10**0 * 5
    asg = witness(circuit, builder, None, codes=[PARENT_CALL, CHILD_CODE])
    MockProver(cs, asg).assert_satisfied()


def test_delegatecall_staticcall_proven(circuit):
    cs = circuit[0]
    for parent in (PARENT_DC, PARENT_SC):
        builder, tr = build_call(parent, READER_CODE)
        assert not tr.failed
        asg = witness(circuit, builder, None, codes=[parent, READER_CODE])
        MockProver(cs, asg).assert_satisfied()


def test_reverting_child_proven(circuit):
    """Child SSTOREs then REVERTs: the parent resumes with success=0 and
    the state write is rolled back (journal compensation rows)."""
    cs = circuit[0]
    builder, tr = build_call(PARENT_CALL, REVERTER)
    assert not tr.failed  # the PARENT tx still succeeds
    assert builder.sdb.get_storage(CHILD, 1) == 0
    restore = next(s for s in builder.steps if s.exec_state == "Restore")
    by = {row.rw_counter: row for row in builder.rws.rows}
    assert by[restore.rw_indices[-1]].value == 0  # pushed failure
    asg = witness(circuit, builder, None, codes=[PARENT_CALL, REVERTER])
    MockProver(cs, asg).assert_satisfied()


def test_forged_resume_pc_rejected(circuit):
    """Tamper the saved resume pc on the Restore row: the ctx read no
    longer matches the saved row AND the parent's next pc breaks."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, _ = build_call(PARENT_CALL, CHILD_CODE)
    asg = witness(circuit, builder, None, codes=[PARENT_CALL, CHILD_CODE])
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state == "Restore")
    asg.set_int(ev_cfg.w[3][0], row, 5)  # wrong resume pc
    fails = MockProver(cs, asg).verify()
    assert fails, "forged resume pc accepted"


def test_forged_call_success_rejected(circuit):
    """Claim the reverting child succeeded."""
    cs, _, _, ev_cfg = circuit[:4]
    builder, _ = build_call(PARENT_CALL, REVERTER)
    asg = witness(circuit, builder, None, codes=[PARENT_CALL, REVERTER])
    row = next(r for r, s in enumerate(builder.steps)
               if s.exec_state == "Restore")
    asg.set_int(ev_cfg.aux[1], row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged call success accepted"


NEG1 = (1 << 256) - 1  # -1 two's-complement


def _slt_code():
    """SLT/SGT both branches + CODESIZE + EXTCODESIZE(self)."""
    code = bytearray()
    code += bytes([0x7F]) + NEG1.to_bytes(32, "big")      # PUSH32 -1
    code += bytes([0x60, 1, 0x12, 0x50])                  # 1 SLT(-1<1=... ) POP
    code += bytes([0x60, 1])
    code += bytes([0x7F]) + NEG1.to_bytes(32, "big")
    code += bytes([0x12, 0x50])                           # SLT(a=-1,b=1)=1 POP
    code += bytes([0x60, 3])
    code += bytes([0x7F]) + NEG1.to_bytes(32, "big")
    code += bytes([0x13, 0x50])                           # SGT(a=-1,b=3)=0 POP
    code += bytes([0x38, 0x50])                           # CODESIZE POP
    code += bytes([0x61, CALLEE >> 8, CALLEE & 0xFF, 0x3B, 0x50])  # EXTCODESIZE
    code += bytes([0x00])
    return bytes(code)


def test_signed_compare_codesize_proven(circuit):
    cs = circuit[0]
    code = _slt_code()
    builder, h = build(code=code, value=0)
    # tracer sanity: the comparisons behaved signed
    slt_steps = [i for i, s_ in enumerate(builder.steps)
                 if s_.op == 0x12 and s_.exec_state is None]
    assert slt_steps
    asg = witness(circuit, builder, h, code=code)
    MockProver(cs, asg).assert_satisfied()


def test_forged_signed_compare_rejected(circuit):
    """Claim the UNSIGNED result for SLT(-1, 1): msb pinning must break."""
    code = _slt_code()
    builder, h = build(code=code, value=0)
    cs = circuit[0]
    ev_cfg = circuit[3]
    # second SLT: a=-1, b=1 -> signed lt = 1; forge result 0 (the
    # unsigned answer is 1... forge to 0 and flip the grid accordingly)
    r = [i for i, s_ in enumerate(builder.steps)
         if s_.op == 0x12 and s_.exec_state is None][1]
    asg = witness(circuit, builder, h, code=code)
    cur = FR.decode(asg.cols[ev_cfg.w[2][0]][r])
    asg.set_int(ev_cfg.w[2][0], r, 1 - cur)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged signed compare accepted"


def test_forged_codesize_rejected(circuit):
    code = _slt_code()
    builder, h = build(code=code, value=0)
    cs = circuit[0]
    ev_cfg = circuit[3]
    r = next(i for i, s_ in enumerate(builder.steps)
             if s_.op == 0x38 and s_.exec_state is None)
    asg = witness(circuit, builder, h, code=code)
    cur = FR.decode(asg.cols[ev_cfg.w[0][0]][r])
    asg.set_int(ev_cfg.w[0][0], r, cur + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged CODESIZE accepted"


def _sdiv_code():
    """SDIV/SMOD sign combos + division by zero."""
    code = bytearray()
    NEG7 = (1 << 256) - 7
    NEG3 = (1 << 256) - 3
    # SDIV(-7, 3) = -2   (pops a then b: push b first)
    code += bytes([0x60, 3]) + bytes([0x7F]) + NEG7.to_bytes(32, "big")
    code += bytes([0x05, 0x50])
    # SDIV(-7, -3) = 2
    code += bytes([0x7F]) + NEG3.to_bytes(32, "big")
    code += bytes([0x7F]) + NEG7.to_bytes(32, "big")
    code += bytes([0x05, 0x50])
    # SMOD(-7, 3) = -1
    code += bytes([0x60, 3]) + bytes([0x7F]) + NEG7.to_bytes(32, "big")
    code += bytes([0x07, 0x50])
    # SMOD(7, -3) = 1
    code += bytes([0x7F]) + NEG3.to_bytes(32, "big") + bytes([0x60, 7])
    code += bytes([0x07, 0x50])
    # SDIV(-7, 0) = 0
    code += bytes([0x60, 0]) + bytes([0x7F]) + NEG7.to_bytes(32, "big")
    code += bytes([0x05, 0x50])
    # SDIV(-2^255, -1) = -2^255 (the wrap case)
    code += bytes([0x7F]) + ((1 << 256) - 1).to_bytes(32, "big")
    code += bytes([0x7F]) + (1 << 255).to_bytes(32, "big")
    code += bytes([0x05, 0x50])
    code += bytes([0x00])
    return bytes(code)


def test_sdiv_smod_proven(circuit):
    cs = circuit[0]
    code = _sdiv_code()
    builder, h = build(code=code, value=0)
    asg = witness(circuit, builder, h, code=code)
    MockProver(cs, asg).assert_satisfied()


def test_forged_sdiv_sign_rejected(circuit):
    """Claim the positive quotient for SDIV(-7, 3): the sign/abs
    bindings must break."""
    code = _sdiv_code()
    builder, h = build(code=code, value=0)
    cs = circuit[0]
    ev_cfg = circuit[3]
    r = next(i for i, s_ in enumerate(builder.steps)
             if s_.op == 0x05 and s_.exec_state is None)
    asg = witness(circuit, builder, h, code=code)
    # forge res = +2 (true res = -2) and flip the sign cell to match
    asg.set_int(ev_cfg.w[2][0], r, 2)
    asg.set_int(ev_cfg.w[2][1], r, 0)
    asg.set_int(ev_cfg.srv, r, 0)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged SDIV sign accepted"
