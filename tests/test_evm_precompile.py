"""EVM precompile-call states, focused circuit tier (fast iteration):
a CALL to ecrecover (0x01) proven through evm + state + bytecode + sig
(reference: evm_circuit/execution/precompiles/ecrecover.rs)."""

import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import sig_circuit as sg
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits import word_arith as wac
from zkevm_tpu.circuits.tables import BytecodeTable, Challenges, RwTable
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.witness import CircuitInputBuilder

K = 13
N = 1 << K
CALLER, CALLEE = 0xAAAA, 0xBBBB
R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    rt8 = RangeTable.configure(cs, 8)
    scfg = sg.configure(cs, rt8, challenges=ch, keccak_table=ktcfg.table)
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    wacfg = wac.configure(cs, rt8)
    ev_cfg = evm.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        rw_count=st_cfg.count_surface, rt8=rt8,
        word_table=wacfg.table,
        sig_word_table=scfg.addr_word_table,
    )
    return cs, ch, ktcfg, scfg, st_cfg, bc_cfg, ev_cfg, wacfg


def _code_and_sig():
    from test_super_full import _mstore, _staticcall

    from zkevm_tpu.ec import secp256k1 as s256
    from zkevm_tpu.hash import keccak256

    priv = 0xA11CE5EED
    z = int.from_bytes(keccak256(b"focused ecrecover"), "big")
    r_, s_, par = s256.ecdsa_sign(z, priv)
    code = bytearray()
    code += _mstore(0x00, z)
    code += _mstore(0x20, 27 + par)
    code += _mstore(0x40, r_)
    code += _mstore(0x60, s_)
    code += _staticcall(0x01, 0x00, 0x80, 0x80, 0x20)
    code += bytes([0x00])
    pub = s256.ecrecover(z, par, r_, s_)
    return bytes(code), (z, pub, r_, s_)


def _witness(circuit, tamper=None):
    import sys

    sys.path.insert(0, "tests")
    cs, ch, ktcfg, scfg, st_cfg, bc_cfg, ev_cfg, wacfg = circuit
    code, sig = _code_and_sig()
    sdb, cdb = StateDB(), CodeDB()
    sdb.ensure(CALLEE).code_hash = cdb.insert(code)
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0)
    assert builder.ecrecover_sigs == [sig]
    asg = Assignment(cs, N)
    st.assign(cs, st_cfg, N, st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [code], asg)
    z, (qx, qy), r_, s_ = sig
    pk = qx.to_bytes(32, "big") + qy.to_bytes(32, "big")
    kwit = kt.assign(cs, ktcfg, N, [pk], asg)
    swit = sg.assign(cs, scfg, N, [sig], asg)
    wac.assign(cs, wacfg, N,
               evm.word_arith_ops(builder.steps, builder.rws), asg)
    evm.assign(cs, ev_cfg, N, builder.steps, builder.rws, asg=asg,
               calls=builder.calls, codes=[code])
    if tamper:
        tamper(asg, ev_cfg, builder)
    kwit.fill_phase1(R_KECCAK, R_WORD)
    swit.fill_phase1(R_KECCAK)
    return asg


def test_ecrecover_call_proven(circuit):
    cs = circuit[0]
    asg = _witness(circuit)
    MockProver(cs, asg, challenges=CHALLENGES).assert_satisfied()


def test_forged_recovered_address_rejected(circuit):
    """Tampering the output memory word (the recovered address) must
    break the SigTable word-surface lookup."""
    cs = circuit[0]

    def tamper(asg, ev_cfg, builder):
        r = next(i for i, s_ in enumerate(builder.steps)
                 if s_.exec_state == "PreEcrecover")
        asg.set_int(ev_cfg.w[4][0], r, 0xDEAD)

    asg = _witness(circuit, tamper)
    assert MockProver(cs, asg, challenges=CHALLENGES).verify(), \
        "forged recovered address accepted"
