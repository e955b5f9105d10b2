"""CircuitInputBuilder: geth trace -> RW operations + exec steps.

Reference counterpart: bus-mapping/src/circuit_input_builder.rs
(handle_block -> handle_tx -> per-step gen_associated_ops with the
fn_gen_associated_ops dispatch table, evm/opcodes.rs:180) and the
CircuitInputStateRef push helpers. This round covers the arithmetic /
stack / memory / storage / context / control opcode families on a single
call depth; call-tree, precompile and copy-event handling extend it in
later rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.etypes.opcodes import OPCODES, is_push
from zkevm_tpu.etypes.state import CodeDB, StateDB
from zkevm_tpu.etypes.trace import GethExecStep, GethExecTrace
from zkevm_tpu.witness.rw import (
    RW,
    AccountField,
    CallContextField,
    RwMap,
    RwRow,
    Target,
)

STACK_CAP = 1024


@dataclass
class ExecStep:
    """Per-opcode execution record (reference: circuit_input_builder's
    ExecStep) — the EVM circuit's row source. exec_state marks virtual
    steps (BeginTx/EndTx, reference evm/opcodes.rs:532
    gen_associated_steps); opcode steps leave it None (derived from op)."""

    pc: int
    op: int
    gas_left: int
    gas_cost: int
    rw_counter_start: int
    stack_pointer: int
    rw_indices: list = field(default_factory=list)
    exec_state: str | None = None


class CircuitInputBuilder:
    def __init__(self, sdb: StateDB, cdb: CodeDB):
        self.sdb = sdb
        self.cdb = cdb
        self.rws = RwMap()
        self.rwc = 1  # rw counter starts at 1 (row 0 is Start)
        self.steps: list[ExecStep] = []
        self.call_id = 1
        self.tx_id = 1
        self.rws.push(RwRow(0, RW.READ, Target.START))

    # -- push helpers (CircuitInputStateRef analog) ----------------------
    def _push(self, **kw) -> int:
        row = RwRow(rw_counter=self.rwc, **kw)
        self.rws.push(row)
        self.rwc += 1
        return row.rw_counter

    def stack_read(self, sp: int, value: int):
        return self._push(
            rw=RW.READ, tag=Target.STACK, id=self.call_id, address=sp, value=value
        )

    def stack_write(self, sp: int, value: int, prev: int = 0):
        return self._push(
            rw=RW.WRITE, tag=Target.STACK, id=self.call_id, address=sp, value=value,
            value_prev=prev,
        )

    def memory_word(self, rw: RW, word_addr: int, value: int, prev: int = 0):
        return self._push(
            rw=rw, tag=Target.MEMORY, id=self.call_id, address=word_addr,
            value=value, value_prev=prev,
        )

    def storage(self, rw: RW, addr: int, key: int, value: int, prev: int):
        return self._push(
            rw=rw, tag=Target.STORAGE, id=self.tx_id, address=addr,
            storage_key=key, value=value, value_prev=prev,
        )

    def call_context(self, f: CallContextField, value: int):
        # reads carry value_prev = value (RwTable read convention)
        return self._push(
            rw=RW.READ, tag=Target.CALL_CONTEXT, id=self.call_id,
            field=int(f), value=value, value_prev=value,
        )

    def account(self, rw: RW, addr: int, f: AccountField, value: int, prev: int):
        return self._push(
            rw=rw, tag=Target.ACCOUNT, id=0, address=addr, field=int(f),
            value=value, value_prev=prev,
        )

    # -- trace replay ----------------------------------------------------
    def handle_tx(
        self, trace: GethExecTrace, *, caller: int, callee: int, value: int = 0
    ) -> None:
        """Full tx replay: BeginTx (call-context reads, callee code-hash
        read, balance transfer) -> opcode steps -> EndTx (reference:
        gen_associated_steps BeginTx/EndTx, evm/opcodes.rs:532 +
        begin_end_tx.rs). Single call depth; receipts/refunds later."""
        logs = trace.struct_logs
        begin = ExecStep(
            pc=0, op=0, gas_left=(logs[0].gas if logs else 0), gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=STACK_CAP,
            exec_state="BeginTx",
        )
        begin.rw_indices.append(
            self.call_context(CallContextField.CALLER_ADDRESS, caller)
        )
        begin.rw_indices.append(
            self.call_context(CallContextField.CALLEE_ADDRESS, callee)
        )
        begin.rw_indices.append(self.call_context(CallContextField.VALUE, value))
        ch = self.sdb.get_account(callee).code_hash
        begin.rw_indices.append(
            self.account(RW.READ, callee, AccountField.CODE_HASH, ch, ch)
        )
        assert caller != callee, "self-transfer not supported yet"
        cal, cee = self.sdb.ensure(caller), self.sdb.ensure(callee)
        prev_cal, prev_cee = cal.balance, cee.balance
        assert cal.balance >= value, "insufficient balance"
        cal.balance -= value
        cee.balance += value
        begin.rw_indices.append(
            self.account(RW.WRITE, caller, AccountField.BALANCE, cal.balance, prev_cal)
        )
        begin.rw_indices.append(
            self.account(RW.WRITE, callee, AccountField.BALANCE, cee.balance, prev_cee)
        )
        self.steps.append(begin)

        self.handle_call(trace, caller=caller, callee=callee, value=value)

        last = logs[-1] if logs else None
        end = ExecStep(
            pc=0, op=0,
            gas_left=(last.gas - last.gas_cost) if last else 0, gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=STACK_CAP,
            exec_state="EndTx",
        )
        self.steps.append(end)
    def handle_call(
        self, trace: GethExecTrace, *, caller: int, callee: int, value: int = 0
    ) -> None:
        """Replay a single-depth call trace into RW ops + exec steps
        (reference: handle_tx's per-step loop, circuit_input_builder.rs:544)."""
        logs = trace.struct_logs
        storage_shadow = dict(self.sdb.get_account(callee).storage)
        for i, step in enumerate(logs):
            nxt = logs[i + 1] if i + 1 < len(logs) else None
            self._gen_step(step, nxt, caller=caller, callee=callee, call_value=value,
                           storage_shadow=storage_shadow)

    def _gen_step(self, step: GethExecStep, nxt, *, caller, callee, call_value,
                  storage_shadow) -> None:
        info = OPCODES[step.op]
        name = info.name
        sp = STACK_CAP - len(step.stack)  # stack pointer (reference convention)
        es = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas, gas_cost=step.gas_cost,
            rw_counter_start=self.rwc, stack_pointer=sp,
        )

        def top(k=0):
            return step.stack[-1 - k]

        def nxt_top(k=0):
            return nxt.stack[-1 - k] if nxt else 0

        if 0x80 <= step.op <= 0x8F:  # DUPn: 1 read + 1 write
            idx = step.op - 0x80
            es.rw_indices.append(self.stack_read(sp + idx, top(idx)))
            es.rw_indices.append(self.stack_write(sp - 1, nxt_top()))
        elif 0x90 <= step.op <= 0x9F:  # SWAPn: 2 reads + 2 writes
            idx = step.op - 0x8F
            es.rw_indices.append(self.stack_read(sp, top(0)))
            es.rw_indices.append(self.stack_read(sp + idx, top(idx)))
            es.rw_indices.append(self.stack_write(sp + idx, top(0), prev=top(idx)))
            es.rw_indices.append(self.stack_write(sp, top(idx), prev=top(0)))
        elif name in ("CALLER", "CALLVALUE", "ADDRESS", "CALLDATASIZE"):
            fmap = {
                "CALLER": (CallContextField.CALLER_ADDRESS, caller),
                "ADDRESS": (CallContextField.CALLEE_ADDRESS, callee),
                "CALLVALUE": (CallContextField.VALUE, call_value),
                "CALLDATASIZE": (CallContextField.CALL_DATA_LENGTH, nxt_top()),
            }
            f, v = fmap[name]
            es.rw_indices.append(self.call_context(f, v))
            es.rw_indices.append(self.stack_write(sp - 1, nxt_top()))
        elif name == "SLOAD":
            key = top(0)
            val = storage_shadow.get(key, 0)
            es.rw_indices.append(self.stack_read(sp, key))
            es.rw_indices.append(
                self.storage(RW.READ, callee, key, val, val)
            )
            es.rw_indices.append(self.stack_write(sp, val, prev=key))
        elif name == "SSTORE":
            key, val = top(0), top(1)
            prev = storage_shadow.get(key, 0)
            es.rw_indices.append(self.stack_read(sp, key))
            es.rw_indices.append(self.stack_read(sp + 1, val))
            es.rw_indices.append(self.storage(RW.WRITE, callee, key, val, prev))
            storage_shadow[key] = val
        elif name == "MLOAD":
            off = top(0)
            assert off % 32 == 0, "mini builder: word-aligned memory only"
            word = nxt_top()
            es.rw_indices.append(self.stack_read(sp, off))
            es.rw_indices.append(self.memory_word(RW.READ, off // 32, word, word))
            es.rw_indices.append(self.stack_write(sp, word, prev=off))
        elif name == "MSTORE":
            off, val = top(0), top(1)
            assert off % 32 == 0, "mini builder: word-aligned memory only"
            prev_word = int.from_bytes(step.memory[off : off + 32].ljust(32, b"\0"), "big")
            es.rw_indices.append(self.stack_read(sp, off))
            es.rw_indices.append(self.stack_read(sp + 1, val))
            es.rw_indices.append(self.memory_word(RW.WRITE, off // 32, val, prev_word))
        else:
            # generic stack op: read the popped operands, write the
            # produced values (they sit on top of the next step's stack)
            for k in range(info.pops):
                es.rw_indices.append(self.stack_read(sp + k, top(k)))
            for k in range(info.pushes):
                new_sp = sp + info.pops - 1 - k
                es.rw_indices.append(self.stack_write(new_sp, nxt_top(info.pushes - 1 - k)))

        self.steps.append(es)
