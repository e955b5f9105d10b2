"""Geth execution-trace structures + a mini-EVM tracer for tests.

Reference counterparts:
- GethExecTrace/GethExecStep (eth-types/src/lib.rs:348,658) — the struct-
  logger output the witness builder consumes;
- the Go tracer behind geth-utils (geth-utils/l2geth/trace.go) that the
  reference calls through cgo to produce those traces for its mock
  TestContext DSL. Here the tracer is an in-process EVM interpreter with
  a call-frame stack (CALL/CALLCODE/DELEGATECALL/STATICCALL), state
  snapshot/rollback on reverts, and a Berlin/London gas model: memory
  expansion, EIP-2929 warm/cold access sets, EIP-3529 refunds, 63/64 call
  forwarding with the 2300 value stipend. Production traces arrive as
  geth JSON and parse into the same dataclasses
  (`GethExecStep.from_structlog`).

One deliberate structlog deviation from geth: the logged `gas_cost` of a
CALL-family row is the gas the CALLING frame actually consumed for it
(base + forwarded - returned), so within every frame
`gas[i+1] == gas[i] - gas_cost[i]` holds exactly — the invariant the
witness builder asserts and the EVM circuit constrains. geth instead logs
the up-front deduction and returns unused child gas out-of-band
(bus-mapping reconstructs the same invariant from it,
circuit_input_builder.rs:586-600).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.etypes.opcodes import OPCODES, is_push, push_size
from zkevm_tpu.etypes.state import CodeDB, StateDB

WORD = (1 << 256) - 1
ADDR_MASK = (1 << 160) - 1
MAX_DEPTH = 1024
STACK_LIMIT = 1024

# EIP-2929 / EIP-3529 constants
COLD_ACCOUNT_COST = 2600
COLD_SLOAD_COST = 2100
WARM_COST = 100
SSTORE_SET = 20000
SSTORE_RESET = 2900  # 5000 - COLD_SLOAD_COST
SSTORE_CLEARS_REFUND = 4800
SSTORE_SENTRY = 2300
CALL_VALUE_COST = 9000
CALL_NEW_ACCOUNT_COST = 25000
CALL_STIPEND = 2300


@dataclass
class GethExecStep:
    pc: int
    op: int
    gas: int
    gas_cost: int
    depth: int
    stack: list  # ints, bottom first (geth order: we store bottom->top)
    memory: bytes
    storage: dict
    refund: int = 0  # accumulated refund counter before this step
    error: str = ""  # VmError kind when this step failed (geth's err field)

    @classmethod
    def from_structlog(cls, d: dict) -> "GethExecStep":
        name_to_code = {info.name: c for c, info in OPCODES.items()}
        op = d["op"] if isinstance(d["op"], int) else name_to_code[d["op"]]
        return cls(
            pc=d["pc"],
            op=op,
            gas=d["gas"],
            gas_cost=d.get("gasCost", 0),
            depth=d.get("depth", 1),
            stack=[int(s, 16) for s in d.get("stack", [])],
            memory=bytes.fromhex("".join(d.get("memory", []))),
            storage={int(k, 16): int(v, 16) for k, v in d.get("storage", {}).items()},
            refund=d.get("refund", 0),
        )


@dataclass
class EventLog:
    address: int
    topics: list
    data: bytes


@dataclass
class GethExecTrace:
    gas_used: int
    failed: bool
    return_value: bytes
    struct_logs: list  # list[GethExecStep]
    refund: int = 0  # uncapped refund counter at tx end
    logs: list = field(default_factory=list)  # list[EventLog]
    created: int | None = None  # deployed address for creation txs


class TraceError(Exception):
    pass


class VmError(Exception):
    """In-EVM failure (consumes the frame's gas unless it's a revert)."""

    def __init__(self, kind: str):
        super().__init__(kind)
        self.kind = kind


def _mem_words(n: int) -> int:
    return -(-n // 32)


def _mem_gas(words: int) -> int:
    return 3 * words + words * words // 512


def jumpdest_set(code: bytes) -> set:
    """Valid JUMPDEST positions (0x5B bytes that are code, not push data)."""
    dests, i = set(), 0
    while i < len(code):
        op = code[i]
        if op == 0x5B:
            dests.add(i)
        i += 1 + push_size(op)
    return dests


class _Frame:
    def __init__(self, *, caller, address, code_address, code, calldata,
                 value, gas, is_static, depth):
        self.caller = caller
        self.address = address  # storage/context address
        self.code_address = code_address  # where the code lives
        self.code = code
        self.calldata = calldata
        self.value = value
        self.gas = gas
        self.is_static = is_static
        self.depth = depth
        self.stack: list[int] = []
        self.memory = bytearray()
        self.pc = 0
        self.returndata = b""  # from the last completed subcall
        self.storage_view: dict = {}
        self.jumpdests = jumpdest_set(code)

    def mem_expansion_cost(self, ranges) -> int:
        """Gas to grow memory to cover (offset, length) ranges."""
        need = 0
        for off, ln in ranges:
            if ln:
                need = max(need, off + ln)
        if need == 0:
            return 0
        new_w = _mem_words(need)
        cur_w = len(self.memory) // 32
        if new_w <= cur_w:
            return 0
        return _mem_gas(new_w) - _mem_gas(cur_w)

    def mem_grow(self, ranges) -> None:
        need = 0
        for off, ln in ranges:
            if ln:
                need = max(need, off + ln)
        if need > len(self.memory):
            self.memory.extend(b"\x00" * (_mem_words(need) * 32 - len(self.memory)))


class Interpreter:
    """Multi-depth EVM with the struct-logger bolted on."""

    def __init__(self, sdb: StateDB, cdb: CodeDB, *, origin: int,
                 gas_price: int = 0, block_ctx: dict | None = None):
        self.sdb = sdb
        self.cdb = cdb
        self.origin = origin
        self.gas_price = gas_price
        self.block_ctx = block_ctx or {}
        self.steps: list[GethExecStep] = []
        self.logs: list[EventLog] = []
        self.refund = 0
        # tx-start storage values (SSTORE gas/refund baseline)
        self._original: dict = {}

    # -- snapshot / rollback (reference: journaled state) ------------------
    def _snapshot(self):
        return (
            {a: acc.clone() for a, acc in self.sdb.accounts.items()},
            set(self.sdb.access_list_account),
            set(self.sdb.access_list_storage),
            self.refund,
            len(self.logs),
        )

    def _rollback(self, snap):
        accounts, ala, als, refund, nlogs = snap
        self.sdb.accounts = accounts
        self.sdb.access_list_account = ala
        self.sdb.access_list_storage = als
        self.refund = refund
        del self.logs[nlogs:]

    def _touch_account(self, addr: int) -> bool:
        """Mark addr warm; True if it was cold."""
        cold = addr not in self.sdb.access_list_account
        self.sdb.access_list_account.add(addr)
        return cold

    def _touch_slot(self, addr: int, key: int) -> bool:
        cold = (addr, key) not in self.sdb.access_list_storage
        self.sdb.access_list_storage.add((addr, key))
        return cold

    # -- frame execution ---------------------------------------------------
    def run_call(self, *, caller, address, code_address, calldata, value,
                 gas, is_static=False, depth=1,
                 init_code: bytes | None = None) -> tuple[bool, bytes, int]:
        """Execute one message call. Returns (success, returndata,
        gas_left). Value has already been transferred by the caller.
        `init_code` marks a creation frame: it runs instead of the
        account's deployed code (which doesn't exist yet)."""
        if init_code is not None:
            code = init_code
        else:
            code = self.cdb.get(self.sdb.get_account(code_address).code_hash)
        f = _Frame(
            caller=caller, address=address, code_address=code_address,
            code=code, calldata=calldata, value=value, gas=gas,
            is_static=is_static, depth=depth,
        )
        try:
            ret = self._loop(f)
            return True, ret, f.gas
        except VmError as e:
            if e.kind == "revert":
                return False, f.returndata, f.gas
            # annotate the failing step (geth's structlog error field) and
            # pin its cost to the whole frame remainder: non-revert errors
            # consume all frame gas, so the per-depth gas chain stays exact
            if self.steps and self.steps[-1].depth == f.depth:
                self.steps[-1].error = e.kind
                self.steps[-1].gas_cost = self.steps[-1].gas
            return False, b"", 0  # all remaining frame gas consumed

    def _loop(self, f: _Frame) -> bytes:
        sdb = self.sdb
        while True:
            if f.pc >= len(f.code):
                return b""  # implicit STOP
            op = f.code[f.pc]
            info = OPCODES.get(op)
            # pre-execution failures still get a struct-log row (geth
            # emits the failing step with its error field set; run_call
            # annotates .error on the raised VmError)
            if info is None or info.name == "INVALID" \
                    or len(f.stack) < info.pops \
                    or len(f.stack) - info.pops + info.pushes > STACK_LIMIT:
                self.steps.append(GethExecStep(
                    pc=f.pc, op=op, gas=f.gas,
                    gas_cost=info.gas if info else 0, depth=f.depth,
                    stack=list(f.stack), memory=bytes(f.memory),
                    storage=dict(f.storage_view), refund=self.refund,
                ))
                if info is None or info.name == "INVALID":
                    raise VmError("invalid opcode")
                if len(f.stack) < info.pops:
                    raise VmError("stack underflow")
                raise VmError("stack overflow")

            log = GethExecStep(
                pc=f.pc, op=op, gas=f.gas, gas_cost=info.gas, depth=f.depth,
                stack=list(f.stack), memory=bytes(f.memory),
                storage=dict(f.storage_view), refund=self.refund,
            )
            self.steps.append(log)

            try:
                nxt = self._exec(f, op, info, log)
            except VmError:
                # failed op still pays what it can (geth convention: OOG
                # rows show the attempted cost); frame gas goes to 0 in
                # run_call for non-revert errors
                raise
            f.gas -= log.gas_cost
            if f.gas < 0:
                raise VmError("out of gas")
            if nxt == "stop":
                return b""
            if nxt == "return":
                return f._ret
            f.pc = nxt if isinstance(nxt, int) else f.pc + 1

    def _charge(self, f: _Frame, log: GethExecStep, extra: int) -> None:
        log.gas_cost += extra
        if log.gas_cost > f.gas:
            # pin the logged cost to geth's convention (attempted cost)
            raise VmError("out of gas")

    def _exec(self, f: _Frame, op: int, info, log: GethExecStep):
        """Execute one opcode. Returns None (fallthrough), an int (jump
        target), 'stop', or 'return' (f._ret set)."""
        name = info.name
        stack = f.stack
        pop = stack.pop

        def push(v):
            stack.append(v & WORD)

        def sgn(x):  # two's-complement signed view
            return x - (1 << 256) if x >> 255 else x

        if name == "STOP":
            return "stop"
        elif name == "ADD":
            push(pop() + pop())
        elif name == "MUL":
            push(pop() * pop())
        elif name == "SUB":
            a = pop(); b = pop(); push(a - b)
        elif name == "DIV":
            a, b = pop(), pop(); push(0 if b == 0 else a // b)
        elif name == "SDIV":
            a, b = sgn(pop()), sgn(pop())
            push(0 if b == 0 else abs(a) // abs(b) * (1 if (a < 0) == (b < 0) else -1))
        elif name == "MOD":
            a, b = pop(), pop(); push(0 if b == 0 else a % b)
        elif name == "SMOD":
            a, b = sgn(pop()), sgn(pop())
            push(0 if b == 0 else abs(a) % abs(b) * (1 if a >= 0 else -1))
        elif name == "ADDMOD":
            a, b, m = pop(), pop(), pop(); push(0 if m == 0 else (a + b) % m)
        elif name == "MULMOD":
            a, b, m = pop(), pop(), pop(); push(0 if m == 0 else (a * b) % m)
        elif name == "EXP":
            a, e = pop(), pop()
            self._charge(f, log, 50 * ((e.bit_length() + 7) // 8))
            push(pow(a, e, 1 << 256))
        elif name == "SIGNEXTEND":
            b, x = pop(), pop()
            if b < 31:
                bit = 8 * (b + 1) - 1
                if x & (1 << bit):
                    x |= WORD ^ ((1 << (bit + 1)) - 1)
                else:
                    x &= (1 << (bit + 1)) - 1
            push(x)
        elif name == "LT":
            a, b = pop(), pop(); push(1 if a < b else 0)
        elif name == "GT":
            a, b = pop(), pop(); push(1 if a > b else 0)
        elif name == "SLT":
            a, b = sgn(pop()), sgn(pop()); push(1 if a < b else 0)
        elif name == "SGT":
            a, b = sgn(pop()), sgn(pop()); push(1 if a > b else 0)
        elif name == "EQ":
            push(1 if pop() == pop() else 0)
        elif name == "ISZERO":
            push(1 if pop() == 0 else 0)
        elif name == "AND":
            push(pop() & pop())
        elif name == "OR":
            push(pop() | pop())
        elif name == "XOR":
            push(pop() ^ pop())
        elif name == "NOT":
            push(~pop())
        elif name == "BYTE":
            i, x = pop(), pop()
            push((x >> (8 * (31 - i))) & 0xFF if i < 32 else 0)
        elif name == "SHL":
            s, v = pop(), pop(); push(v << s if s < 256 else 0)
        elif name == "SHR":
            s, v = pop(), pop(); push(v >> s if s < 256 else 0)
        elif name == "SAR":
            s, v = pop(), sgn(pop())
            push((v >> s if s < 256 else (0 if v >= 0 else -1)) & WORD)
        elif name == "SHA3":
            off, ln = pop(), pop()
            self._charge(f, log, 6 * _mem_words(ln) + f.mem_expansion_cost([(off, ln)]))
            f.mem_grow([(off, ln)])
            from zkevm_tpu.hash.keccak import keccak256

            push(int.from_bytes(keccak256(bytes(f.memory[off : off + ln])), "big"))
        elif name == "ADDRESS":
            push(f.address)
        elif name == "BALANCE":
            addr = pop() & ADDR_MASK
            if self._touch_account(addr):
                self._charge(f, log, COLD_ACCOUNT_COST - WARM_COST)
            push(self.sdb.get_account(addr).balance)
        elif name == "ORIGIN":
            push(self.origin)
        elif name == "CALLER":
            push(f.caller)
        elif name == "CALLVALUE":
            push(f.value)
        elif name == "CALLDATALOAD":
            off = pop()
            chunk = f.calldata[off : off + 32] if off < len(f.calldata) else b""
            push(int.from_bytes(chunk.ljust(32, b"\x00"), "big"))
        elif name == "CALLDATASIZE":
            push(len(f.calldata))
        elif name == "CALLDATACOPY":
            doff, soff, ln = pop(), pop(), pop()
            self._charge(f, log, 3 * _mem_words(ln) + f.mem_expansion_cost([(doff, ln)]))
            f.mem_grow([(doff, ln)])
            src = f.calldata[soff : soff + ln] if soff < len(f.calldata) else b""
            f.memory[doff : doff + ln] = src.ljust(ln, b"\x00")
        elif name == "CODESIZE":
            push(len(f.code))
        elif name == "CODECOPY":
            doff, soff, ln = pop(), pop(), pop()
            self._charge(f, log, 3 * _mem_words(ln) + f.mem_expansion_cost([(doff, ln)]))
            f.mem_grow([(doff, ln)])
            src = f.code[soff : soff + ln] if soff < len(f.code) else b""
            f.memory[doff : doff + ln] = src.ljust(ln, b"\x00")
        elif name == "GASPRICE":
            push(self.gas_price)
        elif name == "EXTCODESIZE":
            addr = pop() & ADDR_MASK
            if self._touch_account(addr):
                self._charge(f, log, COLD_ACCOUNT_COST - WARM_COST)
            push(len(self.cdb.get(self.sdb.get_account(addr).code_hash)))
        elif name == "EXTCODECOPY":
            addr = pop() & ADDR_MASK
            doff, soff, ln = pop(), pop(), pop()
            extra = 3 * _mem_words(ln) + f.mem_expansion_cost([(doff, ln)])
            if self._touch_account(addr):
                extra += COLD_ACCOUNT_COST - WARM_COST
            self._charge(f, log, extra)
            f.mem_grow([(doff, ln)])
            code = self.cdb.get(self.sdb.get_account(addr).code_hash)
            src = code[soff : soff + ln] if soff < len(code) else b""
            f.memory[doff : doff + ln] = src.ljust(ln, b"\x00")
        elif name == "RETURNDATASIZE":
            push(len(f.returndata))
        elif name == "RETURNDATACOPY":
            doff, soff, ln = pop(), pop(), pop()
            if soff + ln > len(f.returndata):
                raise VmError("returndata out of bounds")
            self._charge(f, log, 3 * _mem_words(ln) + f.mem_expansion_cost([(doff, ln)]))
            f.mem_grow([(doff, ln)])
            f.memory[doff : doff + ln] = f.returndata[soff : soff + ln]
        elif name == "EXTCODEHASH":
            addr = pop() & ADDR_MASK
            if self._touch_account(addr):
                self._charge(f, log, COLD_ACCOUNT_COST - WARM_COST)
            acc = self.sdb.get_account(addr)
            push(0 if acc.is_empty() else acc.code_hash)
        elif name == "BLOCKHASH":
            n = pop()
            push(self.block_ctx.get("block_hashes", {}).get(n, 0))
        elif name == "COINBASE":
            push(self.block_ctx.get("coinbase", 0))
        elif name == "TIMESTAMP":
            push(self.block_ctx.get("timestamp", 0))
        elif name == "NUMBER":
            push(self.block_ctx.get("number", 0))
        elif name == "DIFFICULTY":
            push(self.block_ctx.get("difficulty", 0))
        elif name == "GASLIMIT":
            push(self.block_ctx.get("gas_limit", 0))
        elif name == "CHAINID":
            push(self.block_ctx.get("chain_id", 1))
        elif name == "SELFBALANCE":
            push(self.sdb.get_account(f.address).balance)
        elif name == "BASEFEE":
            push(self.block_ctx.get("base_fee", 0))
        elif name == "POP":
            pop()
        elif name == "MLOAD":
            off = pop()
            self._charge(f, log, f.mem_expansion_cost([(off, 32)]))
            f.mem_grow([(off, 32)])
            push(int.from_bytes(f.memory[off : off + 32], "big"))
        elif name == "MSTORE":
            off, v = pop(), pop()
            self._charge(f, log, f.mem_expansion_cost([(off, 32)]))
            f.mem_grow([(off, 32)])
            f.memory[off : off + 32] = v.to_bytes(32, "big")
        elif name == "MCOPY":
            doff, soff, ln = pop(), pop(), pop()
            self._charge(f, log, 3 * _mem_words(ln)
                         + f.mem_expansion_cost([(doff, ln), (soff, ln)]))
            f.mem_grow([(doff, ln), (soff, ln)])
            src = bytes(f.memory[soff : soff + ln])  # as-if-intermediate
            f.memory[doff : doff + ln] = src
        elif name == "MSTORE8":
            off, v = pop(), pop()
            self._charge(f, log, f.mem_expansion_cost([(off, 1)]))
            f.mem_grow([(off, 1)])
            f.memory[off] = v & 0xFF
        elif name == "SLOAD":
            key = pop()
            if self._touch_slot(f.address, key):
                self._charge(f, log, COLD_SLOAD_COST - WARM_COST)
            v = self.sdb.get_storage(f.address, key)
            f.storage_view[key] = v
            push(v)
        elif name == "SSTORE":
            if f.is_static:
                raise VmError("write in static context")
            if f.gas <= SSTORE_SENTRY:
                raise VmError("out of gas")  # EIP-2200 sentry
            key, v = pop(), pop()
            extra = -WARM_COST  # replace the table's base with the real cost
            if self._touch_slot(f.address, key):
                extra += COLD_SLOAD_COST
            current = self.sdb.get_storage(f.address, key)
            original = self._original.get((f.address, key), 0)
            if v == current:
                extra += WARM_COST
            elif current == original:
                extra += SSTORE_SET if original == 0 else SSTORE_RESET
            else:
                extra += WARM_COST
            # EIP-3529 refunds
            if v != current:
                if current == original:
                    if original != 0 and v == 0:
                        self.refund += SSTORE_CLEARS_REFUND
                else:
                    if original != 0:
                        if current == 0:
                            self.refund -= SSTORE_CLEARS_REFUND
                        elif v == 0:
                            self.refund += SSTORE_CLEARS_REFUND
                    if v == original:
                        if original == 0:
                            self.refund += SSTORE_SET - WARM_COST
                        else:
                            self.refund += 5000 - COLD_SLOAD_COST - WARM_COST
            self._charge(f, log, extra)
            self.sdb.set_storage(f.address, key, v)
            f.storage_view[key] = v
        elif name == "JUMP":
            dest = pop()
            if dest not in f.jumpdests:
                raise VmError("invalid jump")
            return dest
        elif name == "JUMPI":
            dest, cond = pop(), pop()
            if cond != 0:
                if dest not in f.jumpdests:
                    raise VmError("invalid jump")
                return dest
        elif name == "PC":
            push(f.pc)
        elif name == "MSIZE":
            push(len(f.memory))
        elif name == "GAS":
            push(f.gas - log.gas_cost)
        elif name == "JUMPDEST":
            pass
        elif name == "PUSH0":
            push(0)
        elif is_push(op):
            size = push_size(op)
            push(int.from_bytes(f.code[f.pc + 1 : f.pc + 1 + size], "big"))
            return f.pc + 1 + size
        elif 0x80 <= op <= 0x8F:  # DUP
            push(stack[-1 - (op - 0x80)])
        elif 0x90 <= op <= 0x9F:  # SWAP
            idx = op - 0x8F
            stack[-1], stack[-1 - idx] = stack[-1 - idx], stack[-1]
        elif name.startswith("LOG"):
            if f.is_static:
                raise VmError("write in static context")
            ntopics = op - 0xA0
            off, ln = pop(), pop()
            topics = [pop() for _ in range(ntopics)]
            self._charge(
                f, log,
                375 * ntopics + 8 * ln + f.mem_expansion_cost([(off, ln)]),
            )
            f.mem_grow([(off, ln)])
            self.logs.append(
                EventLog(f.address, topics, bytes(f.memory[off : off + ln]))
            )
        elif name in ("CALL", "CALLCODE", "DELEGATECALL", "STATICCALL"):
            return self._call(f, name, log)
        elif name in ("CREATE", "CREATE2"):
            return self._create(f, name, log)
        elif name == "RETURN":
            off, ln = pop(), pop()
            self._charge(f, log, f.mem_expansion_cost([(off, ln)]))
            f.mem_grow([(off, ln)])
            f._ret = bytes(f.memory[off : off + ln])
            return "return"
        elif name == "REVERT":
            off, ln = pop(), pop()
            self._charge(f, log, f.mem_expansion_cost([(off, ln)]))
            f.mem_grow([(off, ln)])
            f.returndata = bytes(f.memory[off : off + ln])
            f.gas -= log.gas_cost
            raise VmError("revert")
        else:
            raise TraceError(f"unsupported opcode {name} in mini tracer")
        return None

    def _create(self, f: _Frame, name: str, log: GethExecStep):
        """CREATE / CREATE2 (reference: bus-mapping/src/evm/opcodes/create.rs
        and core/vm create semantics). Shanghai rules: EIP-3860 initcode
        word gas + 49152-byte cap, EIP-3541 0xEF rejection, EIP-170
        24576-byte deposited-code cap, EIP-161 new-account nonce = 1."""
        from zkevm_tpu.etypes.state import EMPTY_CODE_HASH
        from zkevm_tpu.etypes.tx import rlp_encode
        from zkevm_tpu.hash.keccak import keccak256

        pop = f.stack.pop
        if f.is_static:
            raise VmError("write in static context")
        value, off, ln = pop(), pop(), pop()
        salt = pop() if name == "CREATE2" else None
        words = _mem_words(ln)
        base = f.mem_expansion_cost([(off, ln)]) + 2 * words  # EIP-3860
        if name == "CREATE2":
            base += 6 * words  # init-code keccak
        if ln > 49152:
            raise VmError("max initcode size exceeded")  # EIP-3860
        self._charge(f, log, base)
        f.mem_grow([(off, ln)])
        init = bytes(f.memory[off : off + ln])
        f.returndata = b""

        sender = self.sdb.ensure(f.address)
        if f.depth + 1 > MAX_DEPTH or sender.balance < value:
            f.stack.append(0)
            return None
        if name == "CREATE":
            preimage = rlp_encode([
                f.address.to_bytes(20, "big"),
                b"" if sender.nonce == 0 else
                sender.nonce.to_bytes((sender.nonce.bit_length() + 7) // 8,
                                      "big"),
            ])
        else:
            preimage = (b"\xff" + f.address.to_bytes(20, "big")
                        + salt.to_bytes(32, "big") + keccak256(init))
        new_addr = int.from_bytes(keccak256(preimage)[12:], "big")
        sender.nonce += 1  # caller nonce bumps even if the init frame fails
        self._touch_account(new_addr)

        avail = f.gas - log.gas_cost
        forwarded = avail - avail // 64  # EIP-150: all but one 64th

        tgt = self.sdb.get_account(new_addr)
        if tgt.nonce != 0 or tgt.code_hash != EMPTY_CODE_HASH:
            # address collision: the create fails consuming the forwarded
            # gas (geth ErrContractAddressCollision)
            log.gas_cost += forwarded
            f.stack.append(0)
            return None

        snap = self._snapshot()
        acc = self.sdb.ensure(new_addr)
        acc.nonce = 1  # EIP-161
        if value:
            sender.balance -= value
            acc.balance += value
        ok, ret, left = self.run_call(
            caller=f.address, address=new_addr, code_address=new_addr,
            calldata=b"", value=value, gas=forwarded,
            is_static=False, depth=f.depth + 1, init_code=init,
        )
        if ok:
            # code deposit: EIP-3541 0xEF check, EIP-170 size cap, 200/byte
            if ret[:1] == b"\xef":
                ok, left = False, 0  # invalid creation code: burn all
            elif len(ret) > 24576:
                ok, left = False, 0  # max code size exceeded
            elif 200 * len(ret) > left:
                ok, left = False, 0  # code store out of gas
            else:
                left -= 200 * len(ret)
                self.sdb.ensure(new_addr).code_hash = self.cdb.insert(ret)
        if not ok:
            # snapshot was taken after the nonce bump, so the bump
            # survives the rollback (EVM: creator nonce is never undone)
            self._rollback(snap)
            f.returndata = ret  # revert data propagates from init frames
        log.gas_cost += forwarded - left
        f.stack.append(new_addr if ok else 0)
        return None

    def _call(self, f: _Frame, name: str, log: GethExecStep):
        pop = f.stack.pop
        req_gas = pop()
        to = pop() & ADDR_MASK
        value = pop() if name in ("CALL", "CALLCODE") else 0
        in_off, in_ln = pop(), pop()
        out_off, out_ln = pop(), pop()
        if f.is_static and name == "CALL" and value != 0:
            raise VmError("write in static context")

        base = f.mem_expansion_cost([(in_off, in_ln), (out_off, out_ln)])
        if self._touch_account(to):
            base += COLD_ACCOUNT_COST - WARM_COST
        if value != 0:
            base += CALL_VALUE_COST
            if name == "CALL" and self.sdb.get_account(to).is_empty():
                base += CALL_NEW_ACCOUNT_COST
        self._charge(f, log, base)
        f.mem_grow([(in_off, in_ln), (out_off, out_ln)])

        avail = f.gas - log.gas_cost
        forwarded = min(req_gas, avail - avail // 64)
        child_gas = forwarded + (CALL_STIPEND if value != 0 else 0)

        args = bytes(f.memory[in_off : in_off + in_ln])
        sender = self.sdb.get_account(f.address)
        if f.depth + 1 > MAX_DEPTH or (value != 0 and sender.balance < value):
            # call does not execute: push failure, refund nothing extra
            f.returndata = b""
            f.stack.append(0)
            return None

        snap = self._snapshot()
        code_addr = to
        from zkevm_tpu.etypes import precompiles as pc

        if pc.is_precompile(code_addr):
            # native precompile execution (revm-precompile role,
            # bus-mapping/src/precompile.rs:9-42)
            if name == "CALL" and value:
                self.sdb.ensure(f.address).balance -= value
                self.sdb.ensure(to).balance += value
            ok, ret, cost = pc.execute(code_addr, args, child_gas)
            left = child_gas - cost if ok else 0
            if not ok:
                self._rollback(snap)
            f.returndata = ret
            ncopy = min(out_ln, len(ret))
            f.memory[out_off : out_off + ncopy] = ret[:ncopy]
            log.gas_cost += forwarded - left
            f.stack.append(1 if ok else 0)
            return None
        if name == "CALL":
            if value:
                self.sdb.ensure(f.address).balance -= value
                self.sdb.ensure(to).balance += value
            ok, ret, left = self.run_call(
                caller=f.address, address=to, code_address=to,
                calldata=args, value=value, gas=child_gas,
                is_static=f.is_static, depth=f.depth + 1,
            )
        elif name == "CALLCODE":
            ok, ret, left = self.run_call(
                caller=f.address, address=f.address, code_address=to,
                calldata=args, value=value, gas=child_gas,
                is_static=f.is_static, depth=f.depth + 1,
            )
        elif name == "DELEGATECALL":
            ok, ret, left = self.run_call(
                caller=f.caller, address=f.address, code_address=to,
                calldata=args, value=f.value, gas=child_gas,
                is_static=f.is_static, depth=f.depth + 1,
            )
        else:  # STATICCALL
            ok, ret, left = self.run_call(
                caller=f.address, address=to, code_address=to,
                calldata=args, value=0, gas=child_gas,
                is_static=True, depth=f.depth + 1,
            )
        if not ok:
            self._rollback(snap)
        f.returndata = ret
        n = min(out_ln, len(ret))
        f.memory[out_off : out_off + n] = ret[:n]
        # the frame pays base + forwarded, then gets the child's leftover
        # back (incl. unused stipend) -> net cost = base + forwarded - left
        log.gas_cost += forwarded - left
        f.stack.append(1 if ok else 0)
        return None


def trace_call(
    sdb: StateDB,
    cdb: CodeDB,
    *,
    caller: int,
    callee: int,
    calldata: bytes = b"",
    value: int = 0,
    gas: int = 10_000_000,
    block_ctx: dict | None = None,
    gas_price: int = 0,
    create: bool = False,
    access_list: list | None = None,
) -> GethExecTrace:
    """Execute the tx's root message call, emitting a struct log per
    opcode across all call depths. Runs the tx state prologue itself
    (nonce bump + value transfer, like geth's ApplyMessage) so the post
    state is the true tx post state; on a failed root call everything but
    the nonce is rolled back."""
    interp = Interpreter(
        sdb, cdb, origin=caller, gas_price=gas_price, block_ctx=block_ctx
    )
    # per-tx access-list warm-up (EIP-2929 §: tx.origin, tx.to, precompiles
    # 0x01-0x09 are always warm; EIP-2930 pre-warms the declared list)
    sdb.access_list_account = {caller} | set(range(1, 10))
    if callee is not None:
        sdb.access_list_account.add(callee)
    sdb.access_list_storage = set()
    al_gas = 0
    for a, keys in (access_list or []):
        sdb.access_list_account.add(a)
        al_gas += 2400
        for k in keys:
            sdb.access_list_storage.add((a, k))
            al_gas += 1900
    interp._original = {
        (a, k): v
        for a, acc in sdb.accounts.items()
        for k, v in acc.storage.items()
    }
    sender = sdb.ensure(caller)
    assert sender.balance >= value, "insufficient balance"
    # intrinsic gas (geth ApplyMessage / IntrinsicGas): 21000 + calldata
    # bytes at the EIP-2028 schedule (+ 32000 and the EIP-3860 initcode
    # word cost for creation txs), deducted BEFORE the interpreter runs
    intrinsic = 21000 + sum(4 if b == 0 else 16 for b in calldata) + al_gas
    if create:
        intrinsic += 32000 + 2 * _mem_words(len(calldata))
    assert gas >= intrinsic, "intrinsic gas exceeds the gas limit"
    if create:
        # contract address = keccak(rlp([sender, nonce-before-bump]))[12:]
        from zkevm_tpu.etypes.state import EMPTY_CODE_HASH
        from zkevm_tpu.etypes.tx import rlp_encode
        from zkevm_tpu.hash.keccak import keccak256

        n = sender.nonce
        preimage = rlp_encode([
            caller.to_bytes(20, "big"),
            b"" if n == 0 else n.to_bytes((n.bit_length() + 7) // 8, "big"),
        ])
        callee = int.from_bytes(keccak256(preimage)[12:], "big")
        sdb.access_list_account.add(callee)
    sender.nonce += 1
    snap = interp._snapshot()
    sender.balance -= value
    tgt = sdb.ensure(callee)
    tgt.balance += value
    if not create:
        ok, ret, gas_left = interp.run_call(
            caller=caller, address=callee, code_address=callee,
            calldata=calldata, value=value, gas=gas - intrinsic,
        )
    else:
        from zkevm_tpu.etypes.state import EMPTY_CODE_HASH

        if tgt.nonce != 0 or tgt.code_hash != EMPTY_CODE_HASH:
            ok, ret, gas_left = False, b"", 0  # address collision
        else:
            tgt.nonce = 1  # EIP-161
            ok, ret, gas_left = interp.run_call(
                caller=caller, address=callee, code_address=callee,
                calldata=b"", value=value, gas=gas - intrinsic,
                init_code=calldata,
            )
            if ok:
                if ret[:1] == b"\xef" or len(ret) > 24576 \
                        or 200 * len(ret) > gas_left:
                    ok, ret, gas_left = False, b"", 0
                else:
                    gas_left -= 200 * len(ret)
                    tgt.code_hash = cdb.insert(ret)
    if not ok:
        interp._rollback(snap)
    return GethExecTrace(
        gas_used=gas - gas_left,
        failed=not ok,
        return_value=ret,
        struct_logs=interp.steps,
        refund=interp.refund,
        logs=interp.logs,
        created=callee if create else None,
    )
