"""MPT circuit: zktrie updates proven in-circuit against the
PoseidonTable (reference mpt_circuit.rs + halo2-mpt-circuits role):
insert + update chained across one root sequence, with path-canonicality
and tamper rejection."""

import pytest

from zkevm_tpu.circuits import mpt_circuit as mpt
from zkevm_tpu.circuits import poseidon_table as pt
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.state.zktrie import ZkTrie

K = 16
N = 1 << K
DEPTH = 248


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ptcfg = pt.configure(cs)
    mcfg = mpt.configure(cs, ptcfg.table, depth=DEPTH)
    return cs, ptcfg, mcfg


@pytest.fixture(scope="module")
def updates():
    trie = ZkTrie(depth=DEPTH)
    trie.update([0xAAAA, 5], [111, 0])  # pre-existing entry
    u1 = mpt.apply_update(trie, 0xBBBB, 7, 222, 1)  # insert
    u2 = mpt.apply_update(trie, 0xAAAA, 5, 333, 0)  # update
    assert u1.v_old is None and u2.v_old == (111, 0)
    assert u1.root_new == u2.root_old  # chained
    return [u1, u2]


def _witness(circuit, updates, tamper=None):
    cs, ptcfg, mcfg = circuit
    asg = Assignment(cs, N)
    states = mpt.poseidon_states(updates, DEPTH)
    assert len(states) <= pt.capacity(cs, N)
    pt.assign(cs, ptcfg, N, states, asg)
    mpt.assign(cs, mcfg, N, updates, asg)
    if tamper:
        tamper(asg, mcfg)
    return asg


def test_mpt_proven(circuit, updates):
    cs = circuit[0]
    asg = _witness(circuit, updates)
    MockProver(cs, asg).assert_satisfied()


def test_forged_new_root_rejected(circuit, updates):
    cs = circuit[0]

    def tamper(asg, mcfg):
        row = mpt.KEY_BITS + DEPTH - 1  # root row of update 2
        cur = FR.decode(asg.cols[mcfg.root_new][row])
        asg.set_int(mcfg.root_new, row, cur ^ 1)

    asg = _witness(circuit, updates, tamper)
    assert MockProver(cs, asg).verify(), "forged root accepted"


def test_forged_value_rejected(circuit, updates):
    """Claim a different new value without recomputing hashes."""
    cs = circuit[0]

    def tamper(asg, mcfg):
        asg.set_int(mcfg.vlo_new, mpt.KEY_BITS, 334)  # update 2's leaf row

    asg = _witness(circuit, updates, tamper)
    assert MockProver(cs, asg).verify(), "forged value accepted"


def test_forged_path_bit_rejected(circuit, updates):
    """Move the leaf to a different path: kh binding must break."""
    cs = circuit[0]

    def tamper(asg, mcfg):
        row = mpt.KEY_BITS + 3  # level 3 of update 2
        cur = FR.decode(asg.cols[mcfg.bit][row])
        asg.set_int(mcfg.bit, row, 1 - cur)

    asg = _witness(circuit, updates, tamper)
    assert MockProver(cs, asg).verify(), "forged path accepted"


def test_broken_chain_rejected(circuit, updates):
    """Second update starting from a different root."""
    cs = circuit[0]

    def tamper(asg, mcfg):
        row = mpt.KEY_BITS + DEPTH - 1
        cur = FR.decode(asg.cols[mcfg.root_old][row])
        asg.set_int(mcfg.root_old, row, cur ^ 1)

    asg = _witness(circuit, updates, tamper)
    assert MockProver(cs, asg).verify(), "broken root chain accepted"
