"""MCOPY (EIP-5656), focused circuit tier: memory->memory copy events
proven through evm + state + bytecode + copy circuits (reference:
execution/mcopy.rs + the copy circuit's mm leg)."""

import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import copy_circuit as cp
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits import word_arith as wac
from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.ff import FR
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.witness import CircuitInputBuilder
from zkevm_tpu.witness.builder import CopyDataType

K = 12
N = 1 << K
CALLER, CALLEE = 0xAAAA, 0xBBBB

# MSTORE 0xDEAD..01 at 0; MSTORE ..02 at 32; MCOPY(dst=64, src=0, 64);
# overlapping MCOPY(dst=32, src=0, 64) exercises the as-if-intermediate
# read-all-then-write ordering; STOP
W1, W2 = (0xDEAD << 16) + 1, (0xBEEF << 16) + 2
CODE = bytes(
    [0x7F] + list(W1.to_bytes(32, "big")) + [0x60, 0, 0x52]
    + [0x7F] + list(W2.to_bytes(32, "big")) + [0x60, 32, 0x52]
    + [0x60, 64, 0x60, 0, 0x60, 64, 0x5E]      # MCOPY(64, 0, 64)
    + [0x60, 64, 0x60, 0, 0x60, 32, 0x5E]      # MCOPY(32, 0, 64) overlap
    + [0x00]
)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    rt8 = RangeTable.configure(cs, 8)
    wa_cfg = wac.configure(cs, rt8)
    cp_cfg = cp.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg))
    ev_cfg = evm.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        rw_count=st_cfg.count_surface, rt8=rt8, word_table=wa_cfg.table,
        copy_table=cp_cfg.table,
    )
    return cs, st_cfg, bc_cfg, cp_cfg, ev_cfg, wa_cfg


def _build():
    sdb, cdb = StateDB(), CodeDB()
    sdb.ensure(CALLEE).code_hash = cdb.insert(CODE)
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    # tracer semantics: after both copies mem = [W1,W2,W1,W2] words
    last_mem = tr.struct_logs[-1].memory
    words = [int.from_bytes(last_mem[32 * i : 32 * i + 32], "big")
             for i in range(4)]
    assert words == [W1, W1, W2, W2] or words == [W1, W2, W1, W2], words
    b = CircuitInputBuilder(pre, cdb)
    b.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0)
    assert b.check_post_state(sdb) == []
    assert sum(1 for e in b.copy_events
               if e.src_type == CopyDataType.MEMORY
               and e.dst_type == CopyDataType.MEMORY) == 2
    return b


def _witness(circuit, b, tamper=None):
    cs, st_cfg, bc_cfg, cp_cfg, ev_cfg, wa_cfg = circuit
    asg = Assignment(cs, N)
    st.assign(cs, st_cfg, N, st.fix_value_prev(b.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [CODE], asg)
    wac.assign(cs, wa_cfg, N, evm.word_arith_ops(b.steps, b.rws), asg)
    cp.assign(cs, cp_cfg, N, b.copy_events, b.rws, asg)
    evm.assign(cs, ev_cfg, N, b.steps, b.rws, asg=asg, calls=b.calls)
    if tamper:
        tamper(asg, ev_cfg, cp_cfg, b)
    return asg


def test_mcopy_proven(circuit):
    cs = circuit[0]
    b = _build()
    asg = _witness(circuit, b)
    MockProver(cs, asg).assert_satisfied()


def test_forged_mcopy_src_rejected(circuit):
    """Claim a different source offset on the MCOPY row: the CopyTable
    lookup must break."""
    cs = circuit[0]
    b = _build()

    def tamper(asg, ev_cfg, cp_cfg, b_):
        r = next(i for i, s_ in enumerate(b_.steps)
                 if s_.op == 0x5E and s_.exec_state is None)
        asg.set_int(ev_cfg.w[2][0], r, 32 * 7)
        asg.set_int(ev_cfg.pcell[2][0], r, 7)

    asg = _witness(circuit, b, tamper)
    assert MockProver(cs, asg).verify(), "forged MCOPY src accepted"


def test_forged_mcopy_bytes_rejected(circuit):
    """Tamper a copied byte in the copy rows: the mm src word READ
    lookup must break (the dst write would otherwise still verify)."""
    cs = circuit[0]
    b = _build()
    asg = _witness(circuit, b)
    cp_cfg = circuit[3]
    target = next(r for r in range(N)
                  if FR.decode(asg.cols[cp_cfg.mm][r]) == 1)
    cur = FR.decode(asg.cols[cp_cfg.byte][target])
    asg.set_int(cp_cfg.byte, target, (cur + 1) % 256)
    assert MockProver(cs, asg).verify(), "forged MCOPY byte accepted"
