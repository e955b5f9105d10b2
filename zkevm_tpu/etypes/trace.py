"""Geth execution-trace structures + a mini-EVM tracer for tests.

Reference counterparts:
- GethExecTrace/GethExecStep (eth-types/src/lib.rs:348,658) — the struct-
  logger output the witness builder consumes;
- the Go tracer behind geth-utils (geth-utils/l2geth/trace.go) that the
  reference calls through cgo to produce those traces for its mock
  TestContext DSL. Here the tracer is a small in-process EVM interpreter
  covering the arithmetic / stack / memory / storage / control subset —
  enough to drive witness-generation and circuit tests without a node.
  (Production traces arrive as geth JSON and parse into the same
  dataclasses; `GethExecStep.from_structlog` handles that path.)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.etypes.opcodes import OPCODES, is_push, push_size
from zkevm_tpu.etypes.state import StateDB, CodeDB

WORD = (1 << 256) - 1


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

    @classmethod
    def from_structlog(cls, d: dict) -> "GethExecStep":
        from zkevm_tpu.etypes.opcodes import OpcodeId

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
        )


@dataclass
class GethExecTrace:
    gas_used: int
    failed: bool
    return_value: bytes
    struct_logs: list  # list[GethExecStep]


class TraceError(Exception):
    pass


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
) -> GethExecTrace:
    """Execute a single (depth-1, CALL-less) message call, emitting a
    struct-log step per opcode — the mini tracer for witness tests."""
    code = cdb.get(sdb.get_account(callee).code_hash)
    block_ctx = block_ctx or {}
    stack: list[int] = []
    memory = bytearray()
    pc = 0
    steps: list[GethExecStep] = []
    gas_left = gas
    storage_view: dict = {}
    ret = b""
    failed = False

    def mem_expand(end: int):
        if end > len(memory):
            memory.extend(b"\x00" * (-(-end // 32) * 32 - len(memory)))

    while pc < len(code) or (pc == len(code) and False):
        if pc >= len(code):
            break
        op = code[pc]
        info = OPCODES.get(op)
        if info is None:
            failed = True
            break
        if len(stack) < info.pops:
            failed = True
            break
        gas_cost = info.gas
        steps.append(
            GethExecStep(
                pc=pc,
                op=op,
                gas=gas_left,
                gas_cost=gas_cost,
                depth=1,
                stack=list(stack),
                memory=bytes(memory),
                storage=dict(storage_view),
            )
        )

        def pop():
            return stack.pop()

        def push(v):
            stack.append(v & WORD)

        nxt = pc + 1
        name = info.name
        if name == "STOP":
            gas_left -= gas_cost
            break
        elif name == "ADD":
            push(pop() + pop())
        elif name == "MUL":
            push(pop() * pop())
        elif name == "SUB":
            a = pop(); b = pop(); push(a - b)
        elif name == "DIV":
            a = pop(); b = pop(); push(0 if b == 0 else a // b)
        elif name == "MOD":
            a = pop(); b = pop(); push(0 if b == 0 else a % b)
        elif name == "ADDMOD":
            a, b, m = pop(), pop(), pop(); push(0 if m == 0 else (a + b) % m)
        elif name == "MULMOD":
            a, b, m = pop(), pop(), pop(); push(0 if m == 0 else (a * b) % m)
        elif name == "EXP":
            a, e = pop(), pop()
            gas_cost += 50 * ((e.bit_length() + 7) // 8)
            push(pow(a, e, 1 << 256))
        elif name == "LT":
            a, b = pop(), pop(); push(1 if a < b else 0)
        elif name == "GT":
            a, b = pop(), pop(); push(1 if a > b else 0)
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
        elif name == "CALLER":
            push(caller)
        elif name == "ADDRESS":
            push(callee)
        elif name == "CALLVALUE":
            push(value)
        elif name == "CALLDATASIZE":
            push(len(calldata))
        elif name == "CALLDATALOAD":
            off = pop()
            chunk = calldata[off : off + 32] if off < len(calldata) else b""
            push(int.from_bytes(chunk.ljust(32, b"\x00"), "big"))
        elif name == "TIMESTAMP":
            push(block_ctx.get("timestamp", 0))
        elif name == "NUMBER":
            push(block_ctx.get("number", 0))
        elif name == "CHAINID":
            push(block_ctx.get("chain_id", 1))
        elif name == "POP":
            pop()
        elif name == "MLOAD":
            off = pop()
            mem_expand(off + 32)
            push(int.from_bytes(memory[off : off + 32], "big"))
        elif name == "MSTORE":
            off, v = pop(), pop()
            mem_expand(off + 32)
            memory[off : off + 32] = v.to_bytes(32, "big")
        elif name == "MSTORE8":
            off, v = pop(), pop()
            mem_expand(off + 1)
            memory[off] = v & 0xFF
        elif name == "SLOAD":
            key = pop()
            v = sdb.get_storage(callee, key)
            storage_view[key] = v
            push(v)
        elif name == "SSTORE":
            key, v = pop(), pop()
            sdb.set_storage(callee, key, v)
            storage_view[key] = v
        elif name == "JUMP":
            dest = pop()
            if dest >= len(code) or code[dest] != 0x5B:
                failed = True
                break
            nxt = dest
        elif name == "JUMPI":
            dest, cond = pop(), pop()
            if cond != 0:
                if dest >= len(code) or code[dest] != 0x5B:
                    failed = True
                    break
                nxt = dest
        elif name == "PC":
            push(pc)
        elif name == "MSIZE":
            push(len(memory))
        elif name == "GAS":
            push(gas_left - gas_cost)
        elif name == "JUMPDEST":
            pass
        elif name == "PUSH0":
            push(0)
        elif is_push(op):
            size = push_size(op)
            push(int.from_bytes(code[pc + 1 : pc + 1 + size], "big"))
            nxt = pc + 1 + size
        elif 0x80 <= op <= 0x8F:  # DUP
            idx = op - 0x80
            push(stack[-1 - idx])
        elif 0x90 <= op <= 0x9F:  # SWAP
            idx = op - 0x8F
            stack[-1], stack[-1 - idx] = stack[-1 - idx], stack[-1]
        elif name == "RETURN":
            off, ln = pop(), pop()
            mem_expand(off + ln)
            ret = bytes(memory[off : off + ln])
            gas_left -= gas_cost
            break
        elif name == "REVERT":
            off, ln = pop(), pop()
            mem_expand(off + ln)
            ret = bytes(memory[off : off + ln])
            failed = True
            gas_left -= gas_cost
            break
        else:
            raise TraceError(f"unsupported opcode {name} in mini tracer")
        steps[-1].gas_cost = gas_cost
        gas_left -= gas_cost
        if gas_left < 0:
            failed = True
            break
        pc = nxt

    return GethExecTrace(
        gas_used=gas - gas_left,
        failed=failed,
        return_value=ret,
        struct_logs=steps,
    )
