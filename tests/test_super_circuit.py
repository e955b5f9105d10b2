"""SuperCircuit composition: EVM + State + Bytecode + Keccak + Tx +
Copy + PI in one constraint system, with the full link chain proven —
executed opcodes fetch from a BytecodeTable whose code_hash is
keccak-verified, every state access lives in the lexicographically-proven
RwTable, BeginTx words are bound to the signed transactions in the
TxTable, and the whole block closes over ONE public instance: the PI hash
(reference super_circuit.rs:472, pi_circuit.rs:33; BASELINE milestone #3
extended to a multi-tx block with a public-input commitment)."""

import dataclasses

import pytest

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]
K = 14
N = 1 << K

# PUSH1 5; PUSH1 7; ADD; PUSH1 0; MSTORE; PUSH1 0; MLOAD; PUSH1 1;
# SSTORE; JUMPDEST; then the context batch (TIMESTAMP, CHAINID, ORIGIN,
# GASPRICE, PC, SELFBALANCE -- BlockTable/TxTable/context lookups in the
# super composition), each POPped; EXP; then CALLDATALOAD at 0 (partial:
# calldata is 2 bytes, zero-padded) and at 5 (fully out of range); STOP
CODE = bytes([
    0x60, 5, 0x60, 7, 0x01, 0x60, 0, 0x52,
    0x60, 0, 0x51, 0x60, 1, 0x55, 0x5B,
    0x42, 0x50, 0x46, 0x50, 0x32, 0x50,
    0x3A, 0x50, 0x58, 0x50, 0x47, 0x50,
    0x60, 3, 0x60, 2, 0x0A, 0x50,        # 2^3 via the ExpTable
    0x60, 0, 0x35, 0x50, 0x60, 5, 0x35, 0x50,  # CALLDATALOAD per-byte
    # LOG3: topics 1,2,3 over mem[0..2) (two-row LOG state: topic
    # reads on the LOG row, TX_LOG topic writes on the LogTopics row;
    # offset is 32-aligned — the copy circuit's word-anchored layout)
    0x60, 3, 0x60, 2, 0x60, 1, 0x60, 2, 0x60, 0, 0xA3,
    0x00,
])
CALLDATA2 = bytes([0xDE, 0xAD])
PARAMS = CircuitsParams(max_txs=2, max_calldata=16, max_rlp=128)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = sup.configure(cs, PARAMS, limb_bits=10)
    return cs, cfg


def build():
    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**19),
            lambda a: a.balance(10**18),
            lambda a: a.code(CODE),
        ],
        txs=[
            lambda t: t.from_(0).to(1).value(10**15),  # plain transfer
            # contract execution with calldata (CALLDATALOAD bytes)
            lambda t: t.from_(1).to(2).value(3).input(CALLDATA2),
        ],
    )
    return block_convert(ctx, PARAMS)


def test_super_circuit_proven(circuit):
    cs, cfg = circuit
    block = build()
    usage = sup.row_usage(cfg, block)
    assert usage["keccak"] == 7 * 1825  # 1 code + 2x2 rlp + 2 pi perms
    assert sup.choose_k(cfg, block) == K
    wit = sup.assign(cs, cfg, N, block)
    wit.fill_phase1(R_KECCAK, R_WORD)
    MockProver(cs, wit.asg, challenges=CHALLENGES).assert_satisfied()
    # the public instance is the PI hash of exactly this block
    from zkevm_tpu.circuits.pi_circuit import instance_values

    assert wit.instance() == [instance_values(block.context, block.tx_hashes)]


def test_super_forged_tx_value_rejected(circuit):
    """EVM executes a different transfer value than the signed tx: the
    BeginTx TxTable lookup must break."""
    cs, cfg = circuit
    block = build()
    wit = sup.assign(cs, cfg, N, block)
    # tamper the TxTable VALUE field row of tx 1 (slot 0)
    from zkevm_tpu.circuits.tx_circuit import ROW, TxFieldTag

    row = ROW[TxFieldTag.VALUE]
    cur = FR.decode(wit.asg.cols[cfg.tx.value_lo][row])
    assert cur == 10**15
    wit.asg.set_int(cfg.tx.value_lo, row, cur + 1)
    wit.fill_phase1(R_KECCAK, R_WORD)
    fails = MockProver(cs, wit.asg, challenges=CHALLENGES).verify()
    assert fails, "forged tx value accepted"


def test_super_forged_storage_rejected(circuit):
    """Claim a different SSTORE'd value in the state circuit rows."""
    from zkevm_tpu.circuits import state_circuit as st
    from zkevm_tpu.witness import RW, Target

    cs, cfg = circuit
    block = build()
    rows = st.fix_value_prev(block.rws.rows)
    for i, r in enumerate(rows):
        if r.tag == Target.STORAGE and r.rw == RW.WRITE:
            rows[i] = dataclasses.replace(r, value=r.value + 1)
    wit = sup.assign(cs, cfg, N, block, rows=rows)
    wit.fill_phase1(R_KECCAK, R_WORD)
    fails = MockProver(cs, wit.asg, challenges=CHALLENGES).verify()
    assert fails, "forged storage accepted"


def test_super_fabricated_code_hash_rejected(circuit):
    """Run different code than the account's code hash claims: the
    keccak link must catch it even when bytecode+EVM agree with each
    other."""
    cs, cfg = circuit
    block = build()
    fake = bytes([0x60, 9]) + CODE[2:]
    wit = sup.assign(cs, cfg, N, block)
    start, _ = wit.bwit.spans[0]
    for i, b in enumerate(fake):
        if CODE[i] != b:
            wit.asg.set_int(cfg.bc.byte, start + i, b)
    wit.bwit.spans = [(start, fake)]
    wit.fill_phase1(R_KECCAK, R_WORD)
    fails = MockProver(cs, wit.asg, challenges=CHALLENGES).verify()
    assert any(f.name == "bytecode_code_hash" for f in fails), \
        "fabricated code accepted"
