"""EVM ecAdd/ecMul precompile-call states, focused circuit tier:
STATICCALLs to 0x06 and 0x07 proven through evm + state + bytecode + ecc
(reference: evm_circuit/execution/precompiles/ec_add.rs, ec_mul.rs;
EccTable consumption per ecc_circuit.rs)."""

import pytest

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import ecc_circuit as ecc
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits import word_arith as wac
from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.witness import CircuitInputBuilder

K = 13
N = 1 << K
CALLER, CALLEE = 0xAAAA, 0xBBBB
G1 = (1, 2)


def _push_word(v: int) -> bytes:
    return bytes([0x7F]) + v.to_bytes(32, "big")


def _mstore(off: int, v: int) -> bytes:
    if off < 256:
        return _push_word(v) + bytes([0x60, off, 0x52])
    return _push_word(v) + bytes([0x61, off >> 8, off & 0xFF, 0x52])


def _staticcall(addr, in_off, in_ln, out_off, out_ln) -> bytes:
    def p(v):
        return bytes([0x60, v]) if v < 256 else bytes([0x61, v >> 8, v & 0xFF])
    return (p(out_ln) + p(out_off) + p(in_ln) + p(in_off) + p(addr)
            + bytes([0x61, 0xFF, 0xFF, 0xFA, 0x50]))


P1 = bn.scalar_mul(G1, 5)
P2 = bn.scalar_mul(G1, 7)
PM = bn.scalar_mul(G1, 3)
KM = 9


def _build_code() -> bytes:
    code = bytearray()
    # ecAdd: in mem[0..128) = (x1,y1,x2,y2), out mem[128..192)
    code += _mstore(0x00, P1[0])
    code += _mstore(0x20, P1[1])
    code += _mstore(0x40, P2[0])
    code += _mstore(0x60, P2[1])
    code += _staticcall(0x06, 0x00, 0x80, 0x80, 0x40)
    # ecMul: in mem[0xC0..0x120) = (px,py,k), out mem[0x120..0x160)
    code += _mstore(0xC0, PM[0])
    code += _mstore(0xE0, PM[1])
    code += _mstore(0x100, KM)
    code += _staticcall(0x07, 0xC0, 0x60, 0x120, 0x40)
    code += bytes([0x00])
    return bytes(code)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    ecc_cfg = ecc.configure(cs, rt8)
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    wacfg = wac.configure(cs, rt8)
    ev_cfg = evm.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg),
        rw_count=st_cfg.count_surface, rt8=rt8,
        word_table=wacfg.table,
        ecadd_word_table=ecc_cfg.add_word_table,
        ecmul_word_table=ecc_cfg.mul_word_table,
    )
    return cs, ecc_cfg, st_cfg, bc_cfg, ev_cfg, wacfg, rt8


def _witness(circuit, tamper=None):
    cs, ecc_cfg, st_cfg, bc_cfg, ev_cfg, wacfg, rt8 = circuit
    code = _build_code()
    sdb, cdb = StateDB(), CodeDB()
    sdb.ensure(CALLEE).code_hash = cdb.insert(code)
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=0)
    assert builder.ecadd_events == [(P1, P2, bn.add(P1, P2))]
    assert builder.ecmul_events == [(PM, KM, bn.scalar_mul(PM, KM))]
    asg = Assignment(cs, N)
    rt8.load(asg)
    st.assign(cs, st_cfg, N, st.fix_value_prev(builder.rws.rows), asg)
    bc.assign(cs, bc_cfg, N, [code], asg)
    wac.assign(cs, wacfg, N,
               evm.word_arith_ops(builder.steps, builder.rws), asg)
    adds = [ecc.EcAddEvent(p1, p2) for (p1, p2, _) in builder.ecadd_events]
    muls = [ecc.EcMulEvent(p, k) for (p, k, _) in builder.ecmul_events]
    ecc.assign(cs, ecc_cfg, N, adds, muls, asg)
    evm.assign(cs, ev_cfg, N, builder.steps, builder.rws, asg=asg,
               calls=builder.calls, codes=[code])
    if tamper:
        tamper(asg, ev_cfg, builder)
    return asg


def test_ecadd_ecmul_calls_proven(circuit):
    cs = circuit[0]
    asg = _witness(circuit)
    MockProver(cs, asg).assert_satisfied()


def test_forged_ecadd_output_rejected(circuit):
    """Claim a wrong x3 on the PRE_ECA row: the EcAddTable word lookup
    (or the memory-write rw link) must break."""
    from zkevm_tpu.ff import FR

    cs = circuit[0]

    def tamper(asg, cfg, builder):
        r = next(i for i, s_ in enumerate(builder.steps)
                 if s_.exec_state == "PreEcAdd")
        cur = FR.decode(asg.cols[cfg.w[4][0]][r])
        asg.set_int(cfg.w[4][0], r, cur + 1)

    asg = _witness(circuit, tamper)
    assert MockProver(cs, asg).verify(), "forged ecAdd output accepted"


def test_forged_ecmul_scalar_rejected(circuit):
    """Claim a different scalar word on the PRE_ECM row."""
    from zkevm_tpu.ff import FR

    cs = circuit[0]

    def tamper(asg, cfg, builder):
        r = next(i for i, s_ in enumerate(builder.steps)
                 if s_.exec_state == "PreEcMul")
        cur = FR.decode(asg.cols[cfg.w[2][0]][r])
        asg.set_int(cfg.w[2][0], r, cur + 1)

    asg = _witness(circuit, tamper)
    assert MockProver(cs, asg).verify(), "forged ecMul scalar accepted"
