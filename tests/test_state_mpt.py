"""State circuit <-> MPT circuit connection: every storage-group
transition in the RwTable is proven as a zktrie update against the
MptTable, with the running root chained across updates (reference:
state_circuit.rs mpt lookups + scroll's MptUpdates aggregation)."""

import pytest

from zkevm_tpu.circuits import mpt_circuit as mpt
from zkevm_tpu.circuits import poseidon_table as pt
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.state.zktrie import ZkTrie
from zkevm_tpu.witness import RW, Target
from zkevm_tpu.witness.rw import RwRow

K = 16
N = 1 << K
DEPTH = 248
ADDR = 0xBBBB


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ptcfg = pt.configure(cs)
    mcfg = mpt.configure(cs, ptcfg.table, depth=DEPTH)
    stcfg = st.configure(cs, limb_bits=10, mpt_table=mcfg.table)
    return cs, ptcfg, mcfg, stcfg


def _rows():
    # slot 5: pre-state 111 -> 333; slot 7: fresh insert 222
    return [
        RwRow(1, RW.WRITE, Target.STORAGE, id=1, address=ADDR,
              storage_key=5, value=333, value_prev=111),
        RwRow(2, RW.READ, Target.STORAGE, id=1, address=ADDR,
              storage_key=5, value=333, value_prev=333),
        RwRow(3, RW.WRITE, Target.STORAGE, id=1, address=ADDR,
              storage_key=7, value=222, value_prev=0),
    ]


def _witness(circuit, rows, pre_val=111):
    cs, ptcfg, mcfg, stcfg = circuit
    trie = ZkTrie(depth=DEPTH)
    if pre_val is not None:
        trie.update([ADDR, 5], [pre_val, 0])
    asg = Assignment(cs, N)
    ups: list = []
    st.assign(cs, stcfg, N, st.fix_value_prev(rows), asg, trie=trie,
              updates_out=ups)
    states = mpt.poseidon_states(ups, DEPTH)
    assert len(states) <= pt.capacity(cs, N)
    pt.assign(cs, ptcfg, N, states, asg)
    mpt.assign(cs, mcfg, N, ups, asg)
    return asg, ups


def test_state_mpt_proven(circuit):
    cs = circuit[0]
    asg, ups = _witness(circuit, _rows())
    assert len(ups) == 2  # slot-5 group + slot-7 group
    assert ups[0].root_new == ups[1].root_old  # chained
    MockProver(cs, asg).assert_satisfied()


def test_wrong_pre_state_rejected(circuit):
    """Seed the trie with a different pre-value than the RwTable's
    value_prev: the MptTable lookup (v_old binding) must break."""
    cs = circuit[0]
    asg, _ = _witness(circuit, _rows(), pre_val=999)
    fails = MockProver(cs, asg).verify()
    assert fails, "trie/rw pre-state mismatch accepted"


def test_forged_root_rejected(circuit):
    """Tamper the running root between updates."""
    cs, _, _, stcfg = circuit
    asg, ups = _witness(circuit, _rows())
    # find the first group-last storage row and bump the NEXT root
    m = cs.usable_rows(N) - 2
    import numpy as np
    gl = [r for r in range(m)
          if int(FR.decode(asg.cols[stcfg.gl][r])) == 1]
    assert gl
    asg.set_int(stcfg.root, gl[0] + 1, ups[0].root_new + 1)
    fails = MockProver(cs, asg).verify()
    assert fails, "forged chained root accepted"
