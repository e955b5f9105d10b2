"""In-memory StateDB / CodeDB.

Reference counterpart: eth-types/src/state_db.rs (StateDB, CodeDB,
Account) — the witness generator's view of pre-state, mutated as the
trace replays.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.hash.keccak import keccak256

EMPTY_CODE_HASH = int.from_bytes(keccak256(b""), "big")


@dataclass
class Account:
    nonce: int = 0
    balance: int = 0
    code_hash: int = EMPTY_CODE_HASH
    storage: dict = field(default_factory=dict)  # key int -> value int

    def is_empty(self) -> bool:
        return (
            self.nonce == 0 and self.balance == 0 and self.code_hash == EMPTY_CODE_HASH
        )

    def clone(self) -> "Account":
        return Account(self.nonce, self.balance, self.code_hash, dict(self.storage))


class CodeDB:
    def __init__(self):
        self.codes: dict[int, bytes] = {EMPTY_CODE_HASH: b""}

    def insert(self, code: bytes) -> int:
        h = int.from_bytes(keccak256(code), "big")
        self.codes[h] = bytes(code)
        return h

    def get(self, code_hash: int) -> bytes:
        return self.codes[code_hash]


class StateDB:
    def __init__(self):
        self.accounts: dict[int, Account] = {}
        # EIP-2929 warm sets (per tx; reset by the tracer)
        self.access_list_account: set = set()
        self.access_list_storage: set = set()

    def get_account(self, addr: int) -> Account:
        return self.accounts.get(addr, Account())

    def ensure(self, addr: int) -> Account:
        if addr not in self.accounts:
            self.accounts[addr] = Account()
        return self.accounts[addr]

    def set_account(self, addr: int, acc: Account) -> None:
        self.accounts[addr] = acc

    def get_storage(self, addr: int, key: int) -> int:
        return self.get_account(addr).storage.get(key, 0)

    def set_storage(self, addr: int, key: int, value: int) -> None:
        self.ensure(addr).storage[key] = value

    def clone(self) -> "StateDB":
        s = StateDB()
        s.accounts = {a: acc.clone() for a, acc in self.accounts.items()}
        return s
