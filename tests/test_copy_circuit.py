"""Copy circuit: CODECOPY / SHA3 / LOG copy events proven against the
RwTable (word-anchored rotation-combined lookups) and the BytecodeTable
(reference copy_circuit.rs:71)."""

import dataclasses

import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import copy_circuit as cp
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.witness import CircuitInputBuilder
from zkevm_tpu.witness.builder import CopyDataType

K = 11
N = 1 << K
CALLER, CALLEE = 0xAAAA, 0xBBBB

# CODECOPY 11 bytes of code -> mem[0..11]; SHA3 mem[0..32]; POP;
# LOG0 mem[30..37] (crosses a word boundary); STOP
CODE = bytes([
    0x60, 0x0B, 0x60, 0x00, 0x60, 0x00, 0x39,  # PUSH1 11 PUSH1 0 PUSH1 0 CODECOPY
    0x60, 0x20, 0x60, 0x00, 0x20,              # PUSH1 32 PUSH1 0 SHA3
    0x50,                                      # POP
    0x60, 0x07, 0x60, 0x1E, 0xA0,              # PUSH1 7 PUSH1 30 LOG0
    0x00,                                      # STOP
])


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    cp_cfg = cp.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg)
    )
    return cs, st_cfg, bc_cfg, cp_cfg


@pytest.fixture(scope="module")
def builder():
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(CODE)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=0)
    assert not tr.failed
    b = CircuitInputBuilder(pre, cdb)
    b.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0)
    assert b.check_post_state(sdb) == []
    return b


def _assign(circuit, builder, rows=None, events=None):
    cs, st_cfg, bc_cfg, cp_cfg = circuit
    asg = Assignment(cs, N)
    st.assign(cs, st_cfg, N, rows if rows is not None
              else st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [CODE], asg)
    cp.assign(cs, cp_cfg, N,
              events if events is not None else builder.copy_events,
              builder.rws, asg)
    return asg


def test_copy_events_collected(builder):
    types = [(e.src_type, e.dst_type) for e in builder.copy_events]
    assert (CopyDataType.BYTECODE, CopyDataType.MEMORY) in types
    assert (CopyDataType.MEMORY, CopyDataType.RLC_ACC) in types
    assert (CopyDataType.MEMORY, CopyDataType.TX_LOG) in types
    log_ev = next(e for e in builder.copy_events
                  if e.dst_type == CopyDataType.TX_LOG)
    assert log_ev.src_addr == 30 and log_ev.src_addr_end == 37
    assert len(log_ev.bytes_) == 7


def test_copy_circuit_proven(circuit, builder):
    cs = circuit[0]
    MockProver(cs, _assign(circuit, builder)).assert_satisfied()


def test_copy_forged_code_byte_rejected(circuit, builder):
    """Claim different copied code content: the bytecode lookup (and/or
    the word-write lookup) must break."""
    cs, _, _, cp_cfg = circuit
    asg = _assign(circuit, builder)
    # row 0 of the first event group is the CODECOPY dst word, byte 0
    cur = FR.decode(asg.cols[cp_cfg.byte][0])
    asg.set_int(cp_cfg.byte, 0, (cur + 1) % 256)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged copied byte accepted"


def test_copy_forged_log_data_rejected(circuit, builder):
    cs, _, _, cp_cfg = circuit
    asg = _assign(circuit, builder)
    # find a non-pad TX_LOG row and corrupt its byte + didx coherently
    import numpy as np

    d_log = asg.cols[cp_cfg.d_log]
    pad = asg.cols[cp_cfg.is_pad]
    row = next(
        r for r in range(N)
        if d_log[r].any() and not pad[r].any()
    )
    cur = FR.decode(asg.cols[cp_cfg.byte][row])
    asg.set_int(cp_cfg.byte, row, (cur + 1) % 256)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged log data accepted"


def test_copy_pad_tamper_rejected(circuit, builder):
    """Write-event pad rows must keep byte == prev byte (memory outside
    the copy range unchanged)."""
    cs, _, _, cp_cfg = circuit
    asg = _assign(circuit, builder)
    import numpy as np

    d_mem = asg.cols[cp_cfg.d_mem]
    pad = asg.cols[cp_cfg.is_pad]
    row = next(
        r for r in range(N)
        if d_mem[r].any() and pad[r].any()
    )
    cur = FR.decode(asg.cols[cp_cfg.byte][row])
    asg.set_int(cp_cfg.byte, row, (cur + 3) % 256)
    fails = MockProver(cs, asg).verify()
    assert fails, "pad-byte tamper accepted"


def test_copy_forged_is_pad_rejected(circuit, builder):
    """v2 soundness: marking an in-range row as padding (skipping its
    source binding) must break the pad-edge/maddr structure."""
    cs, _, _, cp_cfg = circuit
    asg = _assign(circuit, builder)
    pad = asg.cols[cp_cfg.is_pad]
    ev = asg.cols[cp_cfg.is_ev]
    row = next(r for r in range(N) if ev[r].any() and not pad[r].any())
    asg.set_int(cp_cfg.is_pad, row, 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged is_pad accepted"


def test_copy_forged_length_rejected(circuit, builder):
    """The event-end binding pins the surfaced length to the non-pad
    row count."""
    cs, _, _, cp_cfg = circuit
    asg = _assign(circuit, builder)
    lst = asg.cols[cp_cfg.lst]
    row = next(r for r in range(N) if lst[r].any())
    cur = FR.decode(asg.cols[cp_cfg.alen][row])
    for r in range(row + 1):  # alen is event-constant; shift the event's
        if asg.cols[cp_cfg.is_ev][r].any():
            asg.set_int(cp_cfg.alen, r, cur + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged copy length accepted"


# -- SHA3 digest binding through the KeccakTable --------------------------
R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def sha3_circuit():
    from zkevm_tpu.circuits import keccak_table as kt
    from zkevm_tpu.circuits.tables import Challenges

    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    cp_cfg = cp.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        challenges=ch, keccak_table=ktcfg.table,
    )
    return cs, ch, ktcfg, st_cfg, bc_cfg, cp_cfg


def _sha3_assign(sha3_circuit, builder, tamper=None):
    from zkevm_tpu.circuits import keccak_table as kt
    from zkevm_tpu.hash import keccak256

    cs, ch, ktcfg, st_cfg, bc_cfg, cp_cfg = sha3_circuit
    sha3_ev = next(e for e in builder.copy_events
                   if e.dst_type == CopyDataType.RLC_ACC)
    data = bytes(b for b, _ in sha3_ev.bytes_)
    asg = Assignment(cs, N)
    st.assign(cs, st_cfg, N, st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [CODE], asg)
    kwit = kt.assign(cs, ktcfg, N, [data], asg)
    cwit = cp.assign(cs, cp_cfg, N, builder.copy_events, builder.rws, asg)
    if tamper:
        tamper(asg, cp_cfg)
    kwit.fill_phase1(R_KECCAK, R_WORD)
    cwit.fill_phase1(R_KECCAK)
    return asg


def test_sha3_digest_proven(sha3_circuit, builder):
    cs = sha3_circuit[0]
    asg = _sha3_assign(sha3_circuit, builder)
    MockProver(cs, asg, challenges=CHALLENGES).assert_satisfied()


def test_sha3_forged_digest_rejected(sha3_circuit, builder):
    cs = sha3_circuit[0]

    def tamper(asg, cp_cfg):
        ev = asg.cols[cp_cfg.d_rlc]
        for r in range(N):
            if ev[r].any():
                cur = FR.decode(asg.cols[cp_cfg.dlo][r])
                asg.set_int(cp_cfg.dlo, r, (int(cur) + 1) % (1 << 128))

    asg = _sha3_assign(sha3_circuit, builder, tamper)
    fails = MockProver(cs, asg, challenges=CHALLENGES).verify()
    assert fails, "forged sha3 digest accepted"
