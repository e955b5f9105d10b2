"""TestContext DSL: declarative accounts × transactions -> traced,
witness-ready test fixtures.

Reference counterpart: the `mock` crate —
`TestContext::<NACC, NTX>::new(history_hashes, acc_fns, tx_fns,
block_fn)` (mock/src/test_ctx.rs:244) with the MockAccount /
MockTransaction builders (mock/src/{account,transaction}.rs) and the
MOCK_* well-known constants. The reference routes the built block through
the cgo geth tracer; here it runs the mini-EVM tracer
(etypes/trace.py) per transaction, threading state so multi-tx contexts
see each other's effects, and signs each tx with its sender's test key
(secp256k1 host, deterministic wallets).

Typical use (mirrors the reference's closure style):

    ctx = TestContext.new(
        accounts=[
            lambda a: a.address(0x100).balance(10**20),
            lambda a: a.address(0x200).code(bytecode),
        ],
        txs=[lambda tx: tx.from_(0).to(1).value(10**18)],
    )
    builder = ctx.builder()          # CircuitInputBuilder, replayed
    ctx.txs[0], ctx.traces[0], ...   # typed artifacts

`from_(i)` / `to(i)` accept an ACCOUNT INDEX (like the reference's
`accs[i]`) or a raw address int >= 0x10000.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.ec import secp256k1 as s256
from zkevm_tpu.etypes import CodeDB, StateDB
from zkevm_tpu.etypes.trace import GethExecTrace, trace_call
from zkevm_tpu.etypes.tx import Transaction

MOCK_CHAIN_ID = 1338  # reference mock/src/lib.rs MOCK_CHAIN_ID (Scroll fork value differs; ours is self-consistent)
MOCK_GAS_PRICE = 10**9
MOCK_BASE_FEE = 7
MOCK_COINBASE = 0x00000000000000000000000000000000C014BA5E
MOCK_BLOCK_NUMBER = 0xCAFE
MOCK_TIMESTAMP = 1_700_000_000
MOCK_GAS_LIMIT = 30_000_000

# deterministic test wallets (reference MOCK_ACCOUNTS/MOCK_WALLETS)
MOCK_KEYS = [int.from_bytes(bytes([i + 1]) * 32, "big") % s256.N
             for i in range(10)]
MOCK_ADDRS = [s256.address_of(s256.pubkey(k)) for k in MOCK_KEYS]


class MockAccount:
    """Builder for one pre-state account (mock/src/account.rs)."""

    def __init__(self, default_addr: int):
        self.addr = default_addr
        self._balance = 0
        self._nonce = 0
        self._code = b""
        self._storage: dict[int, int] = {}

    def address(self, a: int) -> "MockAccount":
        self.addr = a
        return self

    def balance(self, b: int) -> "MockAccount":
        self._balance = b
        return self

    def nonce(self, n: int) -> "MockAccount":
        self._nonce = n
        return self

    def code(self, c: bytes) -> "MockAccount":
        self._code = bytes(c)
        return self

    def storage(self, kv: dict) -> "MockAccount":
        self._storage.update(kv)
        return self


class MockTransaction:
    """Builder for one transaction (mock/src/transaction.rs)."""

    def __init__(self, nonce_hint: int = 0):
        self._from = 0
        self._to = 1
        self._value = 0
        self._gas = 1_000_000
        self._gas_price = MOCK_GAS_PRICE
        self._input = b""
        self._nonce: int | None = None
        self._type = 0
        self._access_list: list = []
        self._max_fee = 0
        self._max_priority_fee = 0

    def from_(self, a: int) -> "MockTransaction":
        self._from = a
        return self

    def to(self, a: int) -> "MockTransaction":
        self._to = a
        return self

    def value(self, v: int) -> "MockTransaction":
        self._value = v
        return self

    def gas(self, g: int) -> "MockTransaction":
        self._gas = g
        return self

    def gas_price(self, p: int) -> "MockTransaction":
        self._gas_price = p
        return self

    def input(self, data: bytes) -> "MockTransaction":
        self._input = bytes(data)
        return self

    def nonce(self, n: int) -> "MockTransaction":
        self._nonce = n
        return self

    def type(self, t: int) -> "MockTransaction":
        """Tx envelope type: 0 legacy, 1 EIP-2930, 2 EIP-1559."""
        self._type = t
        return self

    def access_list(self, al: list) -> "MockTransaction":
        """[(addr_or_index, [storage keys...])...] (EIP-2930)."""
        self._access_list = al
        return self

    def max_fee(self, f: int) -> "MockTransaction":
        self._max_fee = f
        return self

    def max_priority_fee(self, f: int) -> "MockTransaction":
        self._max_priority_fee = f
        return self


@dataclass
class TestContext:
    """Built context: pre-state + signed txs + per-tx traces + post-state
    (the reference's GethData analog)."""

    sdb: StateDB  # PRE state (unmutated)
    cdb: CodeDB
    txs: list[Transaction]
    traces: list[GethExecTrace]
    post_sdb: StateDB
    chain_id: int = MOCK_CHAIN_ID
    block_ctx: dict = field(default_factory=dict)
    addrs: list[int] = field(default_factory=list)

    @classmethod
    def new(
        cls,
        accounts: list,
        txs: list,
        *,
        chain_id: int = MOCK_CHAIN_ID,
        block: dict | None = None,
    ) -> "TestContext":
        """accounts/txs: lists of closures receiving a MockAccount /
        MockTransaction builder (reference test_ctx.rs:244 closure style).
        Account i defaults to the i-th mock wallet address, so tx senders
        referenced by index have known signing keys."""
        accs = []
        for i, fn in enumerate(accounts):
            a = MockAccount(MOCK_ADDRS[i])
            fn(a)
            accs.append(a)
        addrs = [a.addr for a in accs]
        key_of = dict(zip(MOCK_ADDRS, MOCK_KEYS))

        sdb, cdb = StateDB(), CodeDB()
        for a in accs:
            acct = sdb.ensure(a.addr)
            acct.balance = a._balance
            acct.nonce = a._nonce
            acct.storage = dict(a._storage)
            if a._code:
                acct.code_hash = cdb.insert(a._code)
        pre = sdb.clone()

        block_ctx = {
            "coinbase": MOCK_COINBASE,
            "number": MOCK_BLOCK_NUMBER,
            "timestamp": MOCK_TIMESTAMP,
            "gas_limit": MOCK_GAS_LIMIT,
            "base_fee": MOCK_BASE_FEE,
            "chain_id": chain_id,
        }
        if block:
            block_ctx.update(block)

        def resolve(x: int | None) -> int | None:
            if x is None:
                return None  # contract-creation tx
            return addrs[x] if 0 <= x < len(addrs) else x

        built_txs, traces = [], []
        for fn in txs:
            m = MockTransaction()
            fn(m)
            frm, to = resolve(m._from), resolve(m._to)
            nonce = m._nonce if m._nonce is not None else sdb.get_account(frm).nonce
            al = [(resolve(a), list(keys)) for a, keys in m._access_list]
            tx = Transaction(
                nonce=nonce, gas_price=m._gas_price, gas=m._gas, to=to,
                value=m._value, data=m._input, chain_id=chain_id,
                tx_type=m._type, access_list=al,
                max_priority_fee_per_gas=m._max_priority_fee,
                max_fee_per_gas=(m._max_fee or m._gas_price
                                 if m._type == 2 else 0),
            )
            if frm in key_of:
                tx.sign(key_of[frm])
                assert tx.caller == frm, "signer/address mismatch"
            else:
                tx.caller = frm  # unsignable address: witness-only tx
            tr = trace_call(
                sdb, cdb, caller=frm, callee=to, calldata=tx.data,
                value=tx.value, gas=tx.gas, gas_price=tx.gas_price,
                block_ctx=block_ctx, create=to is None,
                access_list=tx.access_list,
            )
            built_txs.append(tx)
            traces.append(tr)

        return cls(pre, cdb, built_txs, traces, sdb, chain_id, block_ctx, addrs)

    def builder(self):
        """Replay every tx through a CircuitInputBuilder and return it
        (reference BlockData::new_from_geth_data + handle_block)."""
        from zkevm_tpu.witness import CircuitInputBuilder

        b = CircuitInputBuilder(self.sdb.clone(), self.cdb)
        for tx, tr in zip(self.txs, self.traces):
            b.handle_tx(tr, caller=tx.caller, callee=tx.to,
                        value=tx.value, calldata=tx.data,
                        create=tx.to is None,
                        access_list=tx.access_list)
        return b
