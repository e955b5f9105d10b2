"""TestContext DSL (reference mock crate, test_ctx.rs:244): declarative
accounts x txs -> signed txs + traces + a replayed witness builder."""

from zkevm_tpu.testctx import MOCK_ADDRS, TestContext
from zkevm_tpu.witness.rw import Target


def test_value_transfer_two_txs():
    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**20),
            lambda a: a.balance(10**19),
        ],
        txs=[
            lambda t: t.from_(0).to(1).value(10**18),
            lambda t: t.from_(1).to(0).value(3),
        ],
    )
    assert ctx.addrs == MOCK_ADDRS[:2]
    assert all(not tr.failed for tr in ctx.traces)
    # signed + recoverable
    for tx in ctx.txs:
        assert tx.recover_caller() == tx.caller
    # nonces advanced in sequence state
    assert ctx.post_sdb.get_account(ctx.addrs[0]).nonce == 1
    # balances moved
    assert ctx.post_sdb.get_account(ctx.addrs[1]).balance == 10**19 + 10**18 - 3

    b = ctx.builder()
    assert b.rws.check_consistency() == []
    assert b.check_post_state(ctx.post_sdb) == []
    assert b.tx_id == 3  # two txs consumed
    # BeginTx/EndTx pairs per tx
    states = [s.exec_state for s in b.steps]
    assert states.count("BeginTx") == 2 and states.count("EndTx") == 2


def test_contract_call_with_storage():
    # PUSH1 42; PUSH1 1; SSTORE; STOP
    code = bytes([0x60, 42, 0x60, 1, 0x55, 0x00])
    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**20),
            lambda a: a.code(code).storage({1: 7}),
        ],
        txs=[lambda t: t.from_(0).to(1)],
    )
    assert ctx.post_sdb.get_storage(ctx.addrs[1], 1) == 42
    b = ctx.builder()
    srows = [r for r in b.rws.rows if r.tag == Target.STORAGE]
    assert srows and srows[-1].value == 42 and srows[-1].value_prev == 7


def test_raw_address_and_calldata():
    ctx = TestContext.new(
        accounts=[lambda a: a.balance(10**18)],
        txs=[lambda t: t.from_(0).to(0xDEAD).value(5).input(b"\x01\x02")],
    )
    tx = ctx.txs[0]
    assert tx.to == 0xDEAD and tx.data == b"\x01\x02"
    assert ctx.post_sdb.get_account(0xDEAD).balance == 5
