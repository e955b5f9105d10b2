"""Read/write operation container.

Reference counterpart: bus-mapping/src/operation.rs (typed ops + RWCounter
+ OperationContainer) and zkevm-circuits/src/witness/rw.rs (RwMap: the
state circuit's row source, sorted by (tag, id, address, field, storage
key, rw_counter)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class RW(IntEnum):
    READ = 0
    WRITE = 1


class Target(IntEnum):
    """Row tag (reference: operation::Target / RwTableTag)."""

    START = 1
    STACK = 2
    MEMORY = 3
    STORAGE = 4
    CALL_CONTEXT = 5
    ACCOUNT = 6
    TX_REFUND = 7
    TX_ACCESS_LIST_ACCOUNT = 8
    TX_ACCESS_LIST_STORAGE = 9
    TX_LOG = 10
    TX_RECEIPT = 11


class CallContextField(IntEnum):
    CALLER_ADDRESS = 1
    CALLEE_ADDRESS = 2
    VALUE = 3
    CALL_DATA_LENGTH = 4
    TX_ID = 5
    IS_SUCCESS = 6
    CALLER_ID = 7
    IS_STATIC = 8
    IS_PERSISTENT = 9
    IS_ROOT = 10
    CODE_ADDRESS = 11
    RETURN_DATA_LENGTH = 12
    PROGRAM_COUNTER = 13
    STACK_POINTER = 14
    GAS_LEFT = 15
    DEPTH = 16
    CODE_HASH = 17  # caller's code hash, saved for the frame restore
    CALLER_SELF_ADDRESS = 18  # caller's self (storage) address, ditto


class AccountField(IntEnum):
    NONCE = 1
    BALANCE = 2
    CODE_HASH = 3


@dataclass(frozen=True)
class RwRow:
    rw_counter: int
    rw: RW
    tag: Target
    id: int = 0  # call id or tx id
    address: int = 0  # stack pointer / memory word addr / account addr
    field: int = 0  # call-context / account field tag
    storage_key: int = 0
    value: int = 0
    value_prev: int = 0

    def sort_key(self):
        return (
            int(self.tag),
            self.id,
            self.address,
            self.field,
            self.storage_key,
            self.rw_counter,
        )


class RwMap:
    """Ordered container; `sorted_rows` yields state-circuit order."""

    def __init__(self):
        self.rows: list[RwRow] = []

    def push(self, row: RwRow) -> None:
        self.rows.append(row)

    def sorted_rows(self) -> list[RwRow]:
        return sorted(self.rows, key=RwRow.sort_key)

    def check_consistency(self) -> list[str]:
        """First-access/read-after-write audit (reference: the state
        circuit's constraint set, host-checked): a READ must return the
        previous WRITE's value within the same key group."""
        errs = []
        cur_key = None
        cur_val = None
        for row in self.sorted_rows():
            key = row.sort_key()[:5]
            if key != cur_key:
                cur_key = key
                cur_val = row.value
                continue
            if row.rw == RW.READ and row.value != cur_val:
                errs.append(
                    f"read mismatch at rwc={row.rw_counter}: {row.value} != {cur_val}"
                )
            if row.rw == RW.WRITE:
                # only storage/account rows carry a constrained prev value
                # (stack/memory writes overwrite freely, as in the
                # reference's RwTable semantics)
                if row.tag in (Target.STORAGE, Target.ACCOUNT) and row.value_prev != cur_val:
                    errs.append(f"write prev mismatch at rwc={row.rw_counter}")
                cur_val = row.value
        return errs
