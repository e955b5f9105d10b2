"""SuperCircuit composition: EVM + State + Bytecode + Keccak in one
constraint system, with the full link chain proven — executed opcodes
fetch from a BytecodeTable whose code_hash is keccak-verified, and every
state access lives in the lexicographically-proven RwTable (reference
super_circuit.rs:472, BASELINE milestone #3 with real code-hash binding)."""

import pytest

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.witness import CircuitInputBuilder

CALLER = 0xAAAA
CALLEE = 0xBBBB
VALUE = 10**15
R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]

# PUSH1 5; PUSH1 7; ADD; PUSH1 0; MSTORE; PUSH1 0; MLOAD; PUSH1 1;
# SSTORE; JUMPDEST; STOP
CODE = bytes([
    0x60, 5, 0x60, 7, 0x01, 0x60, 0, 0x52,
    0x60, 0, 0x51, 0x60, 1, 0x55, 0x5B, 0x00,
])


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = sup.configure(cs, limb_bits=10)
    return cs, cfg


def build():
    sdb, cdb = StateDB(), CodeDB()
    h = cdb.insert(CODE)
    sdb.ensure(CALLEE).code_hash = h
    sdb.ensure(CALLER).balance = 10**18
    pre = sdb.clone()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=CALLEE, value=VALUE)
    assert not tr.failed
    builder = CircuitInputBuilder(pre, cdb)
    builder.handle_tx(tr, caller=CALLER, callee=CALLEE, value=VALUE)
    assert builder.check_post_state(sdb) == []
    return builder, h


def test_super_circuit_proven(circuit):
    cs, cfg = circuit
    builder, h = build()
    k = sup.choose_k(cs, builder, [CODE])
    assert k == 11  # one keccak permutation + small step/rw regions
    usage = sup.row_usage(builder, [CODE])
    assert usage["keccak"] == 1825 and usage["bytecode"] == len(CODE) + 2
    wit = sup.assign(cs, cfg, 1 << k, builder, [CODE],
                     callee=CALLEE, code_hash=h)
    wit.fill_phase1(R_KECCAK, R_WORD)
    MockProver(cs, wit.asg, challenges=CHALLENGES).assert_satisfied()


def test_super_fabricated_code_hash_rejected(circuit):
    """Run different code than the account's code hash claims: the
    keccak link must catch it even when bytecode+EVM agree with each
    other."""
    cs, cfg = circuit
    builder, h = build()
    fake = bytes([0x60, 9, 0x60, 7, 0x01, 0x60, 0, 0x52,
                  0x60, 0, 0x51, 0x60, 1, 0x55, 0x5B, 0x00])
    # bytecode circuit carries the REAL hash h over the FAKE bytes
    import zkevm_tpu.circuits.bytecode_circuit as bc
    orig = bc.keccak256
    wit = sup.assign(cs, cfg, 1 << 12, builder, [CODE],
                     callee=CALLEE, code_hash=h)
    wit.fill_phase1(R_KECCAK, R_WORD)
    # tamper: swap the bytecode-circuit byte rows to the fake code while
    # keeping hash columns (and the keccak circuit hashing the real code)
    start, _ = wit.bwit.spans[0]
    for i, b in enumerate(fake):
        if CODE[i] != b:
            wit.asg.set_int(cfg.bc.byte, start + i, b)
    wit.bwit.spans = [(start, fake)]
    wit.fill_phase1(R_KECCAK, R_WORD)
    fails = MockProver(cs, wit.asg, challenges=CHALLENGES).verify()
    assert any(f.name == "bytecode_code_hash" for f in fails), \
        "fabricated code accepted"


def test_super_forged_storage_rejected(circuit):
    """Claim a different SSTORE'd value in the state circuit rows."""
    import dataclasses

    from zkevm_tpu.circuits import state_circuit as st
    from zkevm_tpu.witness import RW, Target

    cs, cfg = circuit
    builder, h = build()
    rows = st.fix_value_prev(builder.rws.rows)
    for i, r in enumerate(rows):
        if r.tag == Target.STORAGE and r.rw == RW.WRITE:
            rows[i] = dataclasses.replace(r, value=r.value + 1)
    wit = sup.assign(cs, cfg, 1 << 12, builder, [CODE],
                     callee=CALLEE, code_hash=h, rows=rows)
    wit.fill_phase1(R_KECCAK, R_WORD)
    fails = MockProver(cs, wit.asg, challenges=CHALLENGES).verify()
    assert fails, "forged storage accepted"
