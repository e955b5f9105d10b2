"""CircuitInputBuilder: geth trace -> RW operations + exec steps.

Reference counterpart: bus-mapping/src/circuit_input_builder.rs
(handle_block -> handle_tx -> per-step gen_associated_ops with the
fn_gen_associated_ops dispatch table, evm/opcodes.rs:180), the
CircuitInputStateRef push helpers (input_state_ref.rs), and the side-event
collectors CopyEvent/ExpEvent (circuit_input_builder/execution.rs).

Covers: the arithmetic / stack / memory / storage / context / control
families, the CALL family with a real call tree (call ids, caller links,
static flags), EIP-2929 access-list rows, EIP-3529 refund rows, copy
events (CALLDATACOPY / CODECOPY / RETURNDATACOPY / SHA3 / LOG / RETURN),
exp events, and revert handling.

Reversion model deviation from the reference: the reference schedules
compensating writes at a precomputed rw_counter_end_of_reversion
(input_state_ref.rs push_op_reversible); here compensating writes are
emitted IMMEDIATELY after the failing call returns, in reverse journal
order. Same net state trajectory and the same read-after-write
consistency guarantees in the state circuit, without the two-pass counter
precomputation; revisit when EVM-circuit CALL gadgets need the
reference's exact row placement.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.etypes.opcodes import OPCODES, is_push, push_size
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
GAS_TX = 21000


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
    call_id: int = 1
    depth: int = 1
    # memory word count of the executing frame before/after the step
    # (the EVM circuit's mws chain; after != before only on
    # memory-expanding steps)
    mws: int = 0
    mws_after: int = 0


@dataclass
class Call:
    """One node of the call tree (reference:
    circuit_input_builder/call.rs Call)."""

    call_id: int
    caller_id: int
    depth: int
    caller_address: int
    address: int  # storage/context address
    code_address: int  # where the executing code lives
    code_hash: int
    value: int
    calldata: bytes
    is_static: bool
    is_root: bool
    is_success: bool
    start_log_index: int = 0
    is_create: bool = False  # creation frame: code = init code


class CopyDataType:
    """reference: copy_circuit CopyDataType numbering."""

    MEMORY = 1
    BYTECODE = 2
    TX_CALLDATA = 3
    TX_LOG = 4
    RLC_ACC = 5  # SHA3 input accumulator
    RETURN_DATA = 6
    RLC_SHA = 7  # sha256-precompile input accumulator


@dataclass
class CopyEvent:
    """A byte-copy side event (reference CopyEvent,
    circuit_input_builder.rs:37): the copy circuit's row source."""

    src_type: int
    src_id: int  # call id / code hash / tx id
    src_addr: int
    src_addr_end: int
    dst_type: int
    dst_id: int
    dst_addr: int
    rw_counter_start: int
    bytes_: list  # list[(byte, is_code)]


@dataclass
class ExpEvent:
    """EXP side event (reference ExpEvent): exp circuit row source."""

    identifier: int  # rw counter of the EXP step
    base: int
    exponent: int
    exponentiation: int


class GasMismatch(AssertionError):
    pass


class CircuitInputBuilder:
    def __init__(self, sdb: StateDB, cdb: CodeDB):
        self.sdb = sdb
        self.cdb = cdb
        self.rws = RwMap()
        self.rwc = 1  # rw counter starts at 1 (row 0 is Start)
        self.steps: list[ExecStep] = []
        self.calls: list[Call] = []
        self.copy_events: list[CopyEvent] = []
        self.exp_events: list[ExpEvent] = []
        # precompile side events (reference PrecompileEvents,
        # circuit_input_builder/execution.rs): consumed by the Sig /
        # SHA256 / ECC subcircuits in the full super composition
        self.ecrecover_sigs: list = []   # (z, (qx, qy), r, s)
        self.sha256_inputs: list = []    # input bytes
        self.ecadd_events: list = []     # ((x1,y1), (x2,y2), (x3,y3))
        self.ecmul_events: list = []     # ((x,y), k, (x3,y3))
        self.tx_id = 1
        self.next_call_id = 1
        self.refund = 0
        # tx-start storage values (SSTORE refund baseline, EIP-3529)
        self._original: dict = {}
        # journal of reversible writes: (rw_index into rws.rows)
        self.journal: list[int] = []
        self.rws.push(RwRow(0, RW.READ, Target.START))

    # -- push helpers (CircuitInputStateRef analog) ----------------------
    def _push(self, reversible=False, **kw) -> int:
        row = RwRow(rw_counter=self.rwc, **kw)
        self.rws.push(row)
        if reversible:
            self.journal.append(len(self.rws.rows) - 1)
        self.rwc += 1
        return row.rw_counter

    def stack_read(self, call_id: int, sp: int, value: int):
        return self._push(
            rw=RW.READ, tag=Target.STACK, id=call_id, address=sp, value=value,
            value_prev=value,
        )

    def stack_write(self, call_id: int, sp: int, value: int, prev: int = 0):
        return self._push(
            rw=RW.WRITE, tag=Target.STACK, id=call_id, address=sp, value=value,
            value_prev=prev,
        )

    def memory_word(self, call_id: int, rw: RW, word_addr: int, value: int,
                    prev: int = 0):
        return self._push(
            rw=rw, tag=Target.MEMORY, id=call_id, address=word_addr,
            value=value, value_prev=prev,
        )

    def storage(self, rw: RW, addr: int, key: int, value: int, prev: int):
        return self._push(
            rw=rw, tag=Target.STORAGE, id=self.tx_id, address=addr,
            storage_key=key, value=value, value_prev=prev,
            reversible=(rw == RW.WRITE),
        )

    def call_context(self, call_id: int, f: CallContextField, value: int,
                     rw: RW = RW.READ):
        # reads carry value_prev = value (RwTable read convention)
        return self._push(
            rw=rw, tag=Target.CALL_CONTEXT, id=call_id,
            field=int(f), value=value, value_prev=value,
        )

    def account(self, rw: RW, addr: int, f: AccountField, value: int,
                prev: int, reversible=False):
        return self._push(
            rw=rw, tag=Target.ACCOUNT, id=0, address=addr, field=int(f),
            value=value, value_prev=prev, reversible=reversible and rw == RW.WRITE,
        )

    def access_account(self, addr: int) -> tuple[int, bool]:
        """TxAccessListAccount write marking addr warm; returns
        (rw_index, was_warm)."""
        warm = addr in self.sdb.access_list_account
        self.sdb.access_list_account.add(addr)
        idx = self._push(
            rw=RW.WRITE, tag=Target.TX_ACCESS_LIST_ACCOUNT, id=self.tx_id,
            address=addr, value=1, value_prev=int(warm), reversible=True,
        )
        return idx, warm

    def access_slot(self, addr: int, key: int) -> tuple[int, bool]:
        warm = (addr, key) in self.sdb.access_list_storage
        self.sdb.access_list_storage.add((addr, key))
        idx = self._push(
            rw=RW.WRITE, tag=Target.TX_ACCESS_LIST_STORAGE, id=self.tx_id,
            address=addr, storage_key=key, value=1, value_prev=int(warm),
            reversible=True,
        )
        return idx, warm

    def refund_write(self, new: int):
        idx = self._push(
            rw=RW.WRITE, tag=Target.TX_REFUND, id=self.tx_id, value=new,
            value_prev=self.refund, reversible=True,
        )
        self.refund = new
        return idx

    # -- reversion --------------------------------------------------------
    def _checkpoint(self):
        return (
            len(self.journal),
            {a: acc.clone() for a, acc in self.sdb.accounts.items()},
            set(self.sdb.access_list_account),
            set(self.sdb.access_list_storage),
            self.refund,
        )

    def _revert_to(self, cp) -> list[int]:
        """Emit compensating writes for everything journaled since the
        checkpoint (reverse order), restore the shadow state, and return
        the new rows' rw indices."""
        jlen, accounts, ala, als, refund = cp
        out = []
        for ji in reversed(self.journal[jlen:]):
            r = self.rws.rows[ji]
            out.append(
                self._push(
                    rw=RW.WRITE, tag=r.tag, id=r.id, address=r.address,
                    field=r.field, storage_key=r.storage_key,
                    value=r.value_prev, value_prev=r.value,
                )
            )
        del self.journal[jlen:]
        self.sdb.accounts = accounts
        self.sdb.access_list_account = ala
        self.sdb.access_list_storage = als
        self.refund = refund
        return out

    # -- tx entry ---------------------------------------------------------
    def handle_tx(
        self, trace: GethExecTrace, *, caller: int, callee: int | None,
        value: int = 0, calldata: bytes = b"", create: bool = False,
        access_list: list | None = None,
    ) -> None:
        """Full tx replay: BeginTx (call-context reads, nonce bump, callee
        code-hash read, balance transfer) -> call tree -> EndTx
        (reference: gen_associated_steps BeginTx/EndTx, evm/opcodes.rs:532
        + execution/begin_end_tx.rs).

        `create=True` replays a contract-creation tx (reference:
        begin_end_tx.rs is_create leg + evm/opcodes/create.rs for the
        deposit): the root frame executes the tx data as init code
        against its keccak hash in the bytecode table, a
        TX_CALLDATA->BYTECODE copy event binds the two, and a successful
        RETURN deposits the runtime code (account CODE_HASH write +
        MEMORY->BYTECODE copy event, see `_gen_step`)."""
        logs = trace.struct_logs
        init_hash = None
        if create:
            assert trace.created is not None, "creation trace missing address"
            callee = trace.created
            init_hash = self.cdb.insert(bytes(calldata))
        # per-tx warm-up mirrors the tracer's
        # EIP-2929 warm-up mirrors the tracer: origin, to, precompiles
        # (+ the EIP-2930 declared access list)
        self.sdb.access_list_account = {caller, callee} | set(range(1, 10))
        self.sdb.access_list_storage = set()
        for a, keys in (access_list or []):
            self.sdb.access_list_account.add(a)
            for k in keys:
                self.sdb.access_list_storage.add((a, k))
        self._original = {
            (a, k): v
            for a, acc in self.sdb.accounts.items()
            for k, v in acc.storage.items()
        }

        root = Call(
            call_id=self.next_call_id, caller_id=0, depth=1,
            caller_address=caller, address=callee, code_address=callee,
            code_hash=(init_hash if create
                       else self.sdb.get_account(callee).code_hash),
            value=value,
            calldata=(b"" if create else bytes(calldata)),
            is_static=False, is_root=True,
            is_success=not trace.failed, is_create=create,
        )
        self.next_call_id += 1
        self.calls.append(root)

        begin = ExecStep(
            pc=0, op=0, gas_left=(logs[0].gas if logs else 0), gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=STACK_CAP,
            exec_state="BeginTx", call_id=root.call_id,
        )
        ri = begin.rw_indices
        ri.append(self.call_context(root.call_id, CallContextField.CALLER_ADDRESS, caller))
        ri.append(self.call_context(root.call_id, CallContextField.CALLEE_ADDRESS, callee))
        ri.append(self.call_context(root.call_id, CallContextField.VALUE, value))
        cal = self.sdb.ensure(caller)
        ri.append(
            self.account(RW.WRITE, caller, AccountField.NONCE, cal.nonce + 1, cal.nonce)
        )
        cal.nonce += 1
        if create:
            # init-code binding: tx data bytes == the bytecode-table
            # entry the root frame executes (begin_tx.rs is_create copy)
            init = bytes(calldata)
            self.copy_events.append(CopyEvent(
                src_type=CopyDataType.TX_CALLDATA, src_id=self.tx_id,
                src_addr=0, src_addr_end=len(init),
                dst_type=CopyDataType.BYTECODE, dst_id=init_hash,
                dst_addr=0, rw_counter_start=self.rwc,
                bytes_=[(b, _is_code_at(init, k))
                        for k, b in enumerate(init)],
            ))
        else:
            ch = self.sdb.get_account(callee).code_hash
            ri.append(self.account(RW.READ, callee, AccountField.CODE_HASH, ch, ch))
        assert caller != callee, "self-transfer not supported yet"
        # the value transfer is reversible: a failed tx keeps the nonce
        # bump but rolls the transfer (and all execution writes) back
        cp = self._checkpoint()
        if create:
            # EIP-161: the new contract account starts at nonce 1
            # (reverted with the rest on a failed creation tx)
            tgt = self.sdb.ensure(callee)
            assert tgt.nonce == 0, "creation address collision"
            ri.append(self.account(RW.WRITE, callee, AccountField.NONCE,
                                   1, 0, reversible=True))
            tgt.nonce = 1
        cee = self.sdb.ensure(callee)
        prev_cal, prev_cee = cal.balance, cee.balance
        assert cal.balance >= value, "insufficient balance"
        cal.balance -= value
        cee.balance += value
        ri.append(
            self.account(RW.WRITE, caller, AccountField.BALANCE, cal.balance,
                         prev_cal, reversible=True)
        )
        ri.append(
            self.account(RW.WRITE, callee, AccountField.BALANCE, cee.balance,
                         prev_cee, reversible=True)
        )
        self.steps.append(begin)

        end_i = self._walk(logs, 0, root)
        assert end_i == len(logs), f"unconsumed trace steps at {end_i}"
        if trace.failed:
            self._revert_to(cp)

        self._audit_gas(logs)

        last = logs[-1] if logs else None
        end = ExecStep(
            pc=0, op=0,
            gas_left=(last.gas - last.gas_cost) if last else 0, gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=STACK_CAP,
            exec_state="EndTx", call_id=root.call_id,
        )
        end.rw_indices.append(
            self._push(
                rw=RW.READ, tag=Target.TX_REFUND, id=self.tx_id,
                value=self.refund, value_prev=self.refund,
            )
        )
        self.steps.append(end)
        # multi-tx blocks: advance per-tx context (reference handle_block's
        # per-tx loop, circuit_input_builder.rs:294)
        self.tx_id += 1
        self.refund = 0
        self.journal.clear()

    # -- call-tree walk ----------------------------------------------------
    def _walk(self, logs: list[GethExecStep], i: int, call: Call) -> int:
        """Replay logs[i:] belonging to `call` (depth d); returns the
        index of the first step not in this call."""
        d = call.depth
        while i < len(logs) and logs[i].depth >= d:
            step = logs[i]
            if step.depth != d:
                raise AssertionError("depth discontinuity in trace")
            if step.error:
                self._gen_error_step(step, call)
                return i + 1
            name = OPCODES[step.op].name
            if name in ("CALL", "CALLCODE", "DELEGATECALL", "STATICCALL"):
                i = self._handle_call_op(logs, i, call)
            elif name in ("CREATE", "CREATE2"):
                i = self._handle_create_op(logs, i, call)
            else:
                nxt = logs[i + 1] if i + 1 < len(logs) else None
                if nxt is not None and nxt.depth < d:
                    nxt = None  # frame ends here; no successor in-frame
                self._gen_step(step, nxt, call)
                i += 1
                if name in ("RETURN", "REVERT", "STOP", "SELFDESTRUCT", "INVALID"):
                    break
        return i

    def _handle_call_op(self, logs, i, call: Call) -> int:
        """CALL-family: FOUR step rows (the EVM circuit is
        one-row-per-step with an 8-slot rw budget; the reference packs the
        same ~24 rws into one multi-row region, callop.rs):

            row 1 (op row):   6+has_value stack reads
            row 2 ("CallB"):  access-list + 2 balance rows + 4 child ctx
            row 3 ("CallC"):  5 child ctx + resume pc/sp saves
            row 4 ("CallD"):  resume gas/code-hash/self-addr saves +
                              child code-hash account read
            ... child frame rows ...
            "Restore" row:    7 ctx reads + the parent-stack result write

        then the parent's next opcode row resumes."""
        step = logs[i]
        name = OPCODES[step.op].name
        sp = STACK_CAP - len(step.stack)
        es = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas, gas_cost=step.gas_cost,
            rw_counter_start=self.rwc, stack_pointer=sp,
            call_id=call.call_id, depth=call.depth,
            mws=(len(step.memory) + 31) // 32,
        )
        self.steps.append(es)
        ri = es.rw_indices

        def top(k=0):
            return step.stack[-1 - k]

        has_value = name in ("CALL", "CALLCODE")
        nargs = 7 if has_value else 6
        for k in range(nargs):
            ri.append(self.stack_read(call.call_id, sp + k, top(k)))
        to = top(1) & ((1 << 160) - 1)
        value = top(2) if has_value else 0

        # find the return point: the next step at this call's depth
        j = i + 1
        while j < len(logs) and logs[j].depth > call.depth:
            j += 1
        executed = j > i + 1
        success = bool(logs[j].stack[-1]) if j < len(logs) else False

        in_off, in_ln = top(3 if has_value else 2), top(4 if has_value else 3)
        calldata = bytes(step.memory[in_off : in_off + in_ln].ljust(in_ln, b"\0")) \
            if in_ln else b""

        if name == "CALL":
            caddr, saddr, cval = call.address, to, value
        elif name == "CALLCODE":
            caddr, saddr, cval = call.address, call.address, value
        elif name == "DELEGATECALL":
            caddr, saddr, cval = call.caller_address, call.address, call.value
        else:  # STATICCALL
            caddr, saddr, cval = call.address, to, 0

        from zkevm_tpu.etypes import precompiles as pcmod

        if pcmod.is_precompile(to):
            return self._gen_precompile_call(
                logs, i, j, call, es, step, name, sp, nargs, to, value,
                calldata, top)

        child = Call(
            call_id=self.next_call_id, caller_id=call.call_id,
            depth=call.depth + 1, caller_address=caddr, address=saddr,
            code_address=to, code_hash=self.sdb.get_account(to).code_hash,
            value=cval, calldata=calldata,
            is_static=(call.is_static or name == "STATICCALL"),
            is_root=False, is_success=success,
        )
        self.next_call_id += 1

        if not executed:
            # depth limit / insufficient balance: no child frame ran
            # (single-row legacy layout; not yet circuit-constrained)
            es.exec_state = "CallNoExec"
            ai, _warm = self.access_account(to)
            ri.append(ai)
            ri.append(self.stack_write(call.call_id, sp + nargs - 1, 0))
            return j

        self.calls.append(child)
        cp = self._checkpoint()

        cont_steps = []

        def cont(tag):
            c = ExecStep(
                pc=step.pc, op=step.op, gas_left=step.gas,
                gas_cost=step.gas_cost, rw_counter_start=self.rwc,
                stack_pointer=sp, call_id=call.call_id, depth=call.depth,
                exec_state=tag,
            )
            self.steps.append(c)
            cont_steps.append(c)
            return c.rw_indices

        # --- row 2: access list, balance transfer, first child ctx ------
        ri = cont("CallB")
        ai, _warm = self.access_account(to)
        ri.append(ai)
        # uniform transfer rows for every variant (zero/self transfers
        # are no-op writes; keeps the circuit's slot layout fixed)
        xfer = value if name == "CALL" else 0
        recv_addr = to if name == "CALL" else call.address
        sender = self.sdb.ensure(call.address)
        ps = sender.balance
        sender.balance -= xfer
        ri.append(self.account(RW.WRITE, call.address, AccountField.BALANCE,
                               sender.balance, ps, reversible=True))
        recv = self.sdb.ensure(recv_addr)
        pr = recv.balance
        recv.balance += xfer
        ri.append(self.account(RW.WRITE, recv_addr, AccountField.BALANCE,
                               recv.balance, pr, reversible=True))
        for fld, v in [
            (CallContextField.CALLER_ID, call.call_id),
            (CallContextField.CALLER_ADDRESS, caddr),
            (CallContextField.CALLEE_ADDRESS, saddr),
            (CallContextField.CODE_ADDRESS, to),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))

        # --- rows 3-4: remaining ctx + caller resume-state saves --------
        resume_log = logs[j] if j < len(logs) else None
        resume_gas = resume_log.gas if resume_log else 0
        # caller's memory word count at resume (incl. the CALL's own
        # in/out-region expansion), packed into the STACK_POINTER save's
        # high half (framework convention; the circuit's mws chain
        # restores it on the Restore row)
        resume_mws = (len(resume_log.memory) + 31) // 32 if resume_log else 0
        es.mws_after = resume_mws  # the CALL1 row's mws-chain witness
        # child leftover L = the child's exit step's post-step gas
        k_exit = j - 1
        while k_exit > i and logs[k_exit].depth != call.depth + 1:
            k_exit -= 1
        leftover = logs[k_exit].gas - logs[k_exit].gas_cost
        save_gas = resume_gas - leftover  # S': resume = S' + L in-circuit

        ri = cont("CallC")
        for fld, v in [
            (CallContextField.VALUE, cval),
            (CallContextField.CALL_DATA_LENGTH, len(calldata)),
            (CallContextField.IS_STATIC, int(child.is_static)),
            (CallContextField.IS_SUCCESS, int(success)),
            (CallContextField.DEPTH, child.depth),
            (CallContextField.PROGRAM_COUNTER, step.pc + 1),
            (CallContextField.STACK_POINTER,
             sp + nargs - 1 + (resume_mws << 128)),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))

        ri = cont("CallD")
        for fld, v in [
            (CallContextField.GAS_LEFT, save_gas),
            (CallContextField.CODE_HASH, call.code_hash),
            (CallContextField.CALLER_SELF_ADDRESS, call.address),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))
        ri.append(self.account(RW.READ, to, AccountField.CODE_HASH,
                               child.code_hash, child.code_hash))
        for c_ in cont_steps:  # CALL2-4 rows carry the caller resume mws
            c_.mws = c_.mws_after = resume_mws

        # --- child frame -------------------------------------------------
        end_i = self._walk(logs, i + 1, child)
        assert end_i == j, f"child frame mismatch: {end_i} != {j}"
        if not success:
            self._revert_to(cp)

        # --- restore row: pop back into the caller frame -----------------
        rs = ExecStep(
            pc=step.pc, op=step.op, gas_left=leftover, gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=sp + nargs - 1,
            call_id=child.call_id, depth=child.depth, exec_state="Restore",
            mws=resume_mws, mws_after=resume_mws,
        )
        self.steps.append(rs)
        ri = rs.rw_indices
        for fld, v in [
            (CallContextField.CALLER_ID, call.call_id),
            (CallContextField.IS_SUCCESS, int(success)),
            (CallContextField.PROGRAM_COUNTER, step.pc + 1),
            (CallContextField.STACK_POINTER,
             sp + nargs - 1 + (resume_mws << 128)),
            (CallContextField.GAS_LEFT, save_gas),
            (CallContextField.CODE_HASH, call.code_hash),
            (CallContextField.CALLER_SELF_ADDRESS, call.address),
        ]:
            ri.append(self.call_context(child.call_id, fld, v))
        # result push (the parent's post-call stack top)
        ri.append(self.stack_write(call.call_id, sp + nargs - 1, int(success)))
        return j


    def _handle_create_op(self, logs, i, call: Call) -> int:
        """CREATE / CREATE2 (reference: bus-mapping/src/evm/opcodes/
        create.rs + evm_circuit/execution/create.rs), laid out like the
        CALL family's multi-row scheme:

            row 1 ("CreateA"): 3/4 stack arg reads + init-code memory
                               word reads (CopyTable anchor)
            row 2 ("CreateB"): caller nonce write, new-address access-
                               list row, new-account nonce write,
                               balance-transfer pair, first child ctx
            row 3 ("CallC")  : child ctx + caller resume pc/sp saves
            row 4 ("CallD")  : resume gas/code-hash/self-addr saves
            ... init frame rows (code = init, bound by the
                MEMORY->BYTECODE copy event) ...
            "Restore" row    : ctx reads + the address result write

        The deposit rows live on the init frame's RETURN (see _gen_step).
        """
        from zkevm_tpu.etypes.tx import rlp_encode
        from zkevm_tpu.hash.keccak import keccak256

        step = logs[i]
        name = OPCODES[step.op].name
        is2 = name == "CREATE2"
        sp = STACK_CAP - len(step.stack)
        es = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas,
            gas_cost=step.gas_cost, rw_counter_start=self.rwc,
            stack_pointer=sp, call_id=call.call_id, depth=call.depth,
            exec_state="CreateA", mws=(len(step.memory) + 31) // 32,
        )
        self.steps.append(es)
        ri = es.rw_indices

        def top(k=0):
            return step.stack[-1 - k]

        nargs = 4 if is2 else 3
        for k in range(nargs):
            ri.append(self.stack_read(call.call_id, sp + k, top(k)))
        value, off, ln = top(0), top(1), top(2)
        salt = top(3) if is2 else None
        init = bytes(step.memory[off : off + ln].ljust(ln, b"\0")) \
            if ln else b""
        init_hash = self.cdb.insert(init)

        # address derivation (the builder recomputes; on success it must
        # match the traced result)
        sender = self.sdb.ensure(call.address)
        if is2:
            pre = (b"\xff" + call.address.to_bytes(20, "big")
                   + salt.to_bytes(32, "big") + keccak256(init))
        else:
            n = sender.nonce
            pre = rlp_encode([
                call.address.to_bytes(20, "big"),
                b"" if n == 0 else
                n.to_bytes((n.bit_length() + 7) // 8, "big"),
            ])
        new_addr = int.from_bytes(keccak256(pre)[12:], "big")

        # return point: next step at this depth
        j = i + 1
        while j < len(logs) and logs[j].depth > call.depth:
            j += 1
        executed = j > i + 1
        result = logs[j].stack[-1] if j < len(logs) else 0
        success = bool(result)
        if success:
            assert result == new_addr, "created-address mismatch"
        if not executed:
            raise NotImplementedError(
                "no-exec CREATE (depth limit / balance / collision)")

        # init-code memory word reads anchoring the copy event
        rwc0 = self.rwc
        for w in range(off // 32, -(-(off + ln) // 32) if ln else off // 32):
            v = int.from_bytes(
                step.memory[32 * w : 32 * w + 32].ljust(32, b"\0"), "big")
            ri.append(self.memory_word(call.call_id, RW.READ, w, v, v))
        if ln:
            self.copy_events.append(CopyEvent(
                src_type=CopyDataType.MEMORY, src_id=call.call_id,
                src_addr=off, src_addr_end=off + ln,
                dst_type=CopyDataType.BYTECODE, dst_id=init_hash,
                dst_addr=0, rw_counter_start=rwc0,
                bytes_=[(b, _is_code_at(init, k))
                        for k, b in enumerate(init)],
            ))

        child = Call(
            call_id=self.next_call_id, caller_id=call.call_id,
            depth=call.depth + 1, caller_address=call.address,
            address=new_addr, code_address=new_addr, code_hash=init_hash,
            value=value, calldata=b"", is_static=False, is_root=False,
            is_success=success, is_create=True,
        )
        self.next_call_id += 1
        self.calls.append(child)

        cont_steps = []

        def cont(tag):
            c = ExecStep(
                pc=step.pc, op=step.op, gas_left=step.gas,
                gas_cost=step.gas_cost, rw_counter_start=self.rwc,
                stack_pointer=sp, call_id=call.call_id, depth=call.depth,
                exec_state=tag,
            )
            self.steps.append(c)
            cont_steps.append(c)
            return c.rw_indices

        # --- row 2: nonces, access list, transfer, first child ctx ------
        ri = cont("CreateB")
        ri.append(self.account(RW.WRITE, call.address, AccountField.NONCE,
                               sender.nonce + 1, sender.nonce))
        sender.nonce += 1
        ai, _warm = self.access_account(new_addr)
        ri.append(ai)
        # the child-frame state changes (incl. its nonce init and the
        # value transfer) revert if the init frame fails
        cp = self._checkpoint()
        tgt = self.sdb.ensure(new_addr)
        from zkevm_tpu.etypes.state import EMPTY_CODE_HASH

        if tgt.nonce != 0 or tgt.code_hash != EMPTY_CODE_HASH:
            raise NotImplementedError("CREATE address collision")
        ri.append(self.account(RW.WRITE, new_addr, AccountField.NONCE,
                               1, 0, reversible=True))
        tgt.nonce = 1
        ps = sender.balance
        sender.balance -= value
        ri.append(self.account(RW.WRITE, call.address,
                               AccountField.BALANCE, sender.balance, ps,
                               reversible=True))
        pr = tgt.balance
        tgt.balance += value
        ri.append(self.account(RW.WRITE, new_addr, AccountField.BALANCE,
                               tgt.balance, pr, reversible=True))
        for fld, v in [
            (CallContextField.CALLER_ID, call.call_id),
            (CallContextField.CALLER_ADDRESS, call.address),
            (CallContextField.CALLEE_ADDRESS, new_addr),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))

        # --- rows 3-4: remaining ctx + caller resume saves ---------------
        resume_log = logs[j] if j < len(logs) else None
        resume_gas = resume_log.gas if resume_log else 0
        resume_mws = (len(resume_log.memory) + 31) // 32 if resume_log else 0
        es.mws_after = resume_mws
        k_exit = j - 1
        while k_exit > i and logs[k_exit].depth != call.depth + 1:
            k_exit -= 1
        leftover = logs[k_exit].gas - logs[k_exit].gas_cost
        save_gas = resume_gas - leftover

        ri = cont("CallC")
        for fld, v in [
            (CallContextField.VALUE, value),
            (CallContextField.CALL_DATA_LENGTH, 0),
            (CallContextField.IS_STATIC, 0),
            (CallContextField.IS_SUCCESS, int(success)),
            (CallContextField.DEPTH, child.depth),
            (CallContextField.PROGRAM_COUNTER, step.pc + 1),
            (CallContextField.STACK_POINTER,
             sp + nargs - 1 + (resume_mws << 128)),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))

        ri = cont("CallD")
        for fld, v in [
            (CallContextField.GAS_LEFT, save_gas),
            (CallContextField.CODE_HASH, call.code_hash),
            (CallContextField.CALLER_SELF_ADDRESS, call.address),
        ]:
            ri.append(self.call_context(child.call_id, fld, v, rw=RW.WRITE))
        for c_ in cont_steps:
            c_.mws = c_.mws_after = resume_mws

        # --- init frame --------------------------------------------------
        end_i = self._walk(logs, i + 1, child)
        assert end_i == j, f"init frame mismatch: {end_i} != {j}"
        if not success:
            self._revert_to(cp)

        # --- restore row -------------------------------------------------
        rs = ExecStep(
            pc=step.pc, op=step.op, gas_left=leftover, gas_cost=0,
            rw_counter_start=self.rwc, stack_pointer=sp + nargs - 1,
            call_id=child.call_id, depth=child.depth, exec_state="Restore",
            mws=resume_mws, mws_after=resume_mws,
        )
        self.steps.append(rs)
        ri = rs.rw_indices
        for fld, v in [
            (CallContextField.CALLER_ID, call.call_id),
            (CallContextField.IS_SUCCESS, int(success)),
            (CallContextField.PROGRAM_COUNTER, step.pc + 1),
            (CallContextField.STACK_POINTER,
             sp + nargs - 1 + (resume_mws << 128)),
            (CallContextField.GAS_LEFT, save_gas),
            (CallContextField.CODE_HASH, call.code_hash),
            (CallContextField.CALLER_SELF_ADDRESS, call.address),
        ]:
            ri.append(self.call_context(child.call_id, fld, v))
        ri.append(self.stack_write(call.call_id, sp + nargs - 1,
                                   new_addr if success else 0))
        return j

    # -- precompile calls (reference: evm_circuit/execution/precompiles/
    # + bus-mapping/src/evm/opcodes/precompiles/) ------------------------
    _PRE_STATES = {1: "PreEcrecover", 2: "PreSha256",
                   6: "PreEcAdd", 7: "PreEcMul"}

    def _gen_precompile_call(self, logs, i, j, call, es, step, name,
                             sp, nargs, to: int, value: int,
                             calldata: bytes, top) -> int:
        """CALL family into a precompile: TWO step rows.

            row 1 ("PreCall1"):  the 6/7 stack arg reads (es, already
                                 pushed by the caller)
            row 2 ("Pre<name>"): warm access-list row + fixed-word input
                                 memory reads (or a copy event for
                                 SHA256) + output word write + result
                                 stack push + the precompile TABLE
                                 lookup binding input->output.

        The tracer executed the precompile natively (etypes/precompiles),
        so logs[j] (the parent's next step) carries the post-call stack/
        memory. Scope guards raise NotImplementedError for the shapes the
        circuit does not constrain yet (unaligned io, partial out words,
        value-bearing calls, failing precompiles)."""
        state = self._PRE_STATES.get(to)
        if state is None:
            raise NotImplementedError(f"precompile 0x{to:02x} call state")
        if value:
            raise NotImplementedError("value-bearing precompile call")
        es.exec_state = "PreCall1"
        cid = call.call_id
        has_value = nargs == 7
        in_off, in_ln = top(3 if has_value else 2), top(4 if has_value else 3)
        out_off, out_ln = top(5 if has_value else 4), top(6 if has_value else 5)
        if in_off % 32 or out_off % 32:
            raise NotImplementedError("unaligned precompile io")
        nxt = logs[j] if j < len(logs) else None
        assert nxt is not None and bool(nxt.stack[-1]), \
            "failing precompile calls not circuit-supported yet"

        def mem_word(mem: bytes, waddr: int) -> int:
            chunk = mem[32 * waddr : 32 * waddr + 32]
            return int.from_bytes(chunk.ljust(32, b"\x00"), "big")

        post_mws = (len(nxt.memory) + 31) // 32
        es.mws_after = post_mws  # PRE1 row's mws-chain witness
        row2 = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas,
            gas_cost=step.gas_cost, rw_counter_start=self.rwc,
            stack_pointer=sp, call_id=cid, depth=call.depth,
            exec_state=state, mws=post_mws, mws_after=post_mws,
        )
        self.steps.append(row2)
        ri = row2.rw_indices
        ai, warm = self.access_account(to)
        assert warm, "precompiles are warm from tx start (EIP-2929)"
        ri.append(ai)

        IN_WORDS = {1: 4, 6: 4, 7: 3}
        OUT_WORDS = {1: 1, 2: 1, 6: 2, 7: 2}
        if to == 2:
            # SHA256: arbitrary-length input via a copy event, SHA3-style
            rwc0 = self.rwc
            for w in range(in_off // 32,
                           -(-(in_off + in_ln) // 32) if in_ln
                           else in_off // 32):
                v = mem_word(step.memory, w)
                ri.append(self.memory_word(cid, RW.READ, w, v, v))
            self.copy_events.append(CopyEvent(
                src_type=CopyDataType.MEMORY, src_id=cid, src_addr=in_off,
                src_addr_end=in_off + in_ln,
                dst_type=CopyDataType.RLC_SHA, dst_id=cid, dst_addr=0,
                rw_counter_start=rwc0,
                bytes_=[(b, False) for b in
                        bytes(step.memory[in_off:in_off + in_ln]
                              .ljust(in_ln, b"\x00"))],
            ))
            self.sha256_inputs.append(
                bytes(step.memory[in_off:in_off + in_ln]
                      .ljust(in_ln, b"\x00")))
        else:
            nw = IN_WORDS[to]
            if in_ln != 32 * nw:
                raise NotImplementedError(
                    f"precompile 0x{to:02x} input len {in_ln}")
            for w in range(in_off // 32, in_off // 32 + nw):
                v = mem_word(step.memory, w)
                ri.append(self.memory_word(cid, RW.READ, w, v, v))

        # side events for the proving subcircuits
        args = bytes(step.memory[in_off:in_off + in_ln].ljust(in_ln, b"\0"))
        if to == 1:
            from zkevm_tpu.ec import secp256k1 as s256

            z = int.from_bytes(args[0:32], "big")
            v27 = int.from_bytes(args[32:64], "big")
            r = int.from_bytes(args[64:96], "big")
            s = int.from_bytes(args[96:128], "big")
            pub = s256.ecrecover(z, v27 - 27, r, s)
            self.ecrecover_sigs.append((z, pub, r, s))
        elif to == 6:
            x1 = int.from_bytes(args[0:32], "big")
            y1 = int.from_bytes(args[32:64], "big")
            x2 = int.from_bytes(args[64:96], "big")
            y2 = int.from_bytes(args[96:128], "big")
        elif to == 7:
            x1 = int.from_bytes(args[0:32], "big")
            y1 = int.from_bytes(args[32:64], "big")
            k = int.from_bytes(args[64:96], "big")

        # output words from the post-call memory
        own = OUT_WORDS[to]
        out_words = min(own, out_ln // 32)
        if out_ln % 32 or out_words != own:
            raise NotImplementedError("partial precompile output window")
        outw = []
        for w in range(out_off // 32, out_off // 32 + out_words):
            v = mem_word(nxt.memory, w)
            pv = mem_word(step.memory, w)
            ri.append(self.memory_word(cid, RW.WRITE, w, v, pv))
            outw.append(v)
        if to == 6:
            if (x1, y1) == (0, 0) or (x2, y2) == (0, 0):
                raise NotImplementedError("identity input to ecAdd")
            self.ecadd_events.append(((x1, y1), (x2, y2),
                                      (outw[0], outw[1])))
        elif to == 7:
            if (x1, y1) == (0, 0) or k == 0:
                raise NotImplementedError("degenerate ecMul input")
            self.ecmul_events.append(((x1, y1), k, (outw[0], outw[1])))

        # result push (success pinned to 1 above)
        ri.append(self.stack_write(cid, sp + nargs - 1, 1))
        return j

    # -- per-opcode dispatch ----------------------------------------------
    _ERROR_STATES = {
        "invalid jump": "ErrorInvalidJump",
        "stack underflow": "ErrorStack",
        "stack overflow": "ErrorStack",
        "invalid opcode": "ErrorInvalidOpcode",
        "out of gas": "ErrorOutOfGasConstant",
        "write in static context": "ErrorWriteProtection",
        "returndata out of bounds": "ErrorReturnDataOutOfBound",
    }

    def _gen_error_step(self, step: GethExecStep, call: Call) -> None:
        """Terminal error row for a frame (reference: the 24 error
        ExecutionStates, evm_circuit/step.rs:39 + execution/error_*.rs).
        The tracer pinned step.gas_cost = step.gas (non-revert errors
        consume the frame remainder)."""
        es_name = self._ERROR_STATES.get(step.error)
        if es_name is None:
            raise NotImplementedError(f"error kind {step.error!r}")
        # fail fast on witnesses the EVM circuit cannot yet satisfy, so
        # the failure is a clear NotImplementedError here instead of an
        # opaque MockProver error later:
        _CIRCUIT_ES = {"ErrorInvalidJump", "ErrorStack",
                       "ErrorInvalidOpcode", "ErrorOutOfGasConstant",
                       "ErrorWriteProtection", "ErrorOutOfGasMemory"}
        if es_name not in _CIRCUIT_ES:
            raise NotImplementedError(
                f"{es_name} has no EVM-circuit state yet")
        if es_name == "ErrorOutOfGasConstant" and \
                step.gas >= OPCODES[step.op].gas:
            # dynamic-gas OOG: MLOAD/MSTORE/MSTORE8 route to the
            # memory-expansion error state (quadratic gadget recomputes
            # the real requirement in-circuit); other dynamic-gas ops
            # (EXP/SSTORE sentry/CALL/copies) are still pending
            if step.op in (0x51, 0x52, 0x53):
                es_name = "ErrorOutOfGasMemory"
            else:
                raise NotImplementedError(
                    "dynamic-gas OOG error states not yet implemented")
        sp = STACK_CAP - len(step.stack)
        es = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas,
            gas_cost=step.gas_cost, rw_counter_start=self.rwc,
            stack_pointer=sp, exec_state=es_name, call_id=call.call_id,
            depth=call.depth, mws=(len(step.memory) + 31) // 32,
            mws_after=(len(step.memory) + 31) // 32,
        )
        if es_name == "ErrorInvalidJump":
            # the attempted destination (top of stack) is read so the
            # circuit can check it against the BytecodeTable; JUMPI also
            # reads the (necessarily nonzero) condition
            es.rw_indices.append(
                self.stack_read(call.call_id, sp, step.stack[-1]))
            if step.op == 0x57:
                es.rw_indices.append(
                    self.stack_read(call.call_id, sp + 1, step.stack[-2]))
        if es_name == "ErrorOutOfGasMemory":
            # the offset is read so the circuit can recompute the real
            # expansion requirement (or prove the huge-offset fast path)
            es.rw_indices.append(
                self.stack_read(call.call_id, sp, step.stack[-1]))
        self.steps.append(es)

    def _gen_step(self, step: GethExecStep, nxt, call: Call) -> None:
        info = OPCODES[step.op]
        name = info.name
        cid = call.call_id
        sp = STACK_CAP - len(step.stack)  # stack pointer (reference convention)
        es = ExecStep(
            pc=step.pc, op=step.op, gas_left=step.gas, gas_cost=step.gas_cost,
            rw_counter_start=self.rwc, stack_pointer=sp,
            call_id=cid, depth=call.depth,
            mws=(len(step.memory) + 31) // 32,
            mws_after=(len(nxt.memory) + 31) // 32 if nxt
            else (len(step.memory) + 31) // 32,
        )
        ri = es.rw_indices
        deferred_steps: list = []  # continuation rows (LogTopics)

        def top(k=0):
            return step.stack[-1 - k]

        def nxt_top(k=0):
            return nxt.stack[-1 - k] if nxt else 0

        def mem_word(mem: bytes, waddr: int) -> int:
            chunk = mem[32 * waddr : 32 * waddr + 32]
            return int.from_bytes(chunk.ljust(32, b"\x00"), "big")

        if 0x80 <= step.op <= 0x8F:  # DUPn: 1 read + 1 write
            idx = step.op - 0x80
            ri.append(self.stack_read(cid, sp + idx, top(idx)))
            ri.append(self.stack_write(cid, sp - 1, nxt_top()))
        elif 0x90 <= step.op <= 0x9F:  # SWAPn: 2 reads + 2 writes
            idx = step.op - 0x8F
            ri.append(self.stack_read(cid, sp, top(0)))
            ri.append(self.stack_read(cid, sp + idx, top(idx)))
            ri.append(self.stack_write(cid, sp + idx, top(0), prev=top(idx)))
            ri.append(self.stack_write(cid, sp, top(idx), prev=top(0)))
        elif name in ("CALLER", "CALLVALUE", "ADDRESS", "CALLDATASIZE",
                      "RETURNDATASIZE"):
            fmap = {
                "CALLER": (CallContextField.CALLER_ADDRESS, call.caller_address),
                "ADDRESS": (CallContextField.CALLEE_ADDRESS, call.address),
                "CALLVALUE": (CallContextField.VALUE, call.value),
                "CALLDATASIZE": (CallContextField.CALL_DATA_LENGTH,
                                 len(call.calldata)),
                "RETURNDATASIZE": (CallContextField.RETURN_DATA_LENGTH,
                                   nxt_top()),
            }
            f, v = fmap[name]
            ri.append(self.call_context(cid, f, v))
            ri.append(self.stack_write(cid, sp - 1, nxt_top()))
        elif name == "SELFBALANCE":
            ri.append(self.call_context(
                cid, CallContextField.CALLEE_ADDRESS, call.address))
            acc = self.sdb.get_account(call.address)
            ri.append(self.account(RW.READ, call.address,
                                   AccountField.BALANCE,
                                   acc.balance, acc.balance))
            ri.append(self.stack_write(cid, sp - 1, nxt_top()))
        elif name in ("BALANCE", "EXTCODESIZE", "EXTCODEHASH"):
            addr = top(0) & ((1 << 160) - 1)
            ri.append(self.stack_read(cid, sp, top(0)))
            ai, _ = self.access_account(addr)
            ri.append(ai)
            acc = self.sdb.get_account(addr)
            if name == "BALANCE":
                ri.append(self.account(RW.READ, addr, AccountField.BALANCE,
                                       acc.balance, acc.balance))
            else:
                ri.append(self.account(RW.READ, addr, AccountField.CODE_HASH,
                                       acc.code_hash, acc.code_hash))
            ri.append(self.stack_write(cid, sp, nxt_top(), prev=top(0)))
        elif name == "SLOAD":
            key = top(0)
            ri.append(self.stack_read(cid, sp, key))
            ai, _ = self.access_slot(call.address, key)
            ri.append(ai)
            val = self.sdb.get_storage(call.address, key)
            ri.append(self.storage(RW.READ, call.address, key, val, val))
            ri.append(self.stack_write(cid, sp, val, prev=key))
        elif name == "SSTORE":
            key, val = top(0), top(1)
            ri.append(self.stack_read(cid, sp, key))
            ri.append(self.stack_read(cid, sp + 1, val))
            ai, _ = self.access_slot(call.address, key)
            ri.append(ai)
            prev = self.sdb.get_storage(call.address, key)
            new_refund = self.refund + _sstore_refund_delta(
                self._original.get((call.address, key), 0), prev, val
            )
            if nxt is not None and nxt.refund != new_refund:
                raise GasMismatch(
                    f"refund mismatch at pc={step.pc}: "
                    f"{new_refund} != trace {nxt.refund}"
                )
            ri.append(self.refund_write(new_refund))
            ri.append(self.storage(RW.WRITE, call.address, key, val, prev))
            self.sdb.set_storage(call.address, key, val)
        elif name == "MLOAD":
            # uniformly TWO word reads (wa, wa+1): the circuit's one-hot
            # byte-alignment gadget recombines value = (M[wa]||M[wa+1])
            # [s : s+32]; an aligned load reads an untouched (zero or
            # stale) second word it then ignores (execution/memory.rs's
            # word-aligned rework, done mask-style here)
            off = top(0)
            if off >= 1 << 24:
                raise NotImplementedError("MLOAD offset >= 2^24")
            ri.append(self.stack_read(cid, sp, off))
            w0 = off // 32
            for w in range(w0, w0 + 2):
                v = mem_word(nxt.memory if nxt else step.memory, w)
                ri.append(self.memory_word(cid, RW.READ, w, v, v))
            ri.append(self.stack_write(cid, sp, nxt_top(), prev=off))
        elif name in ("MSTORE", "MSTORE8"):
            off, val = top(0), top(1)
            if off >= 1 << 24:
                raise NotImplementedError(f"{name} offset >= 2^24")
            ri.append(self.stack_read(cid, sp, off))
            ri.append(self.stack_read(cid, sp + 1, val))
            w0 = off // 32
            # MSTORE: always two word writes (aligned second = identity
            # write, sound: new == prev); MSTORE8: one
            nwords = 1 if name == "MSTORE8" else 2
            for w in range(w0, w0 + nwords):
                prev_w = mem_word(step.memory, w)
                new_w = mem_word(nxt.memory, w) if nxt else prev_w
                ri.append(self.memory_word(cid, RW.WRITE, w, new_w, prev_w))
        elif name == "MSIZE":
            ri.append(self.stack_write(cid, sp - 1, nxt_top()))
        elif name == "CALLDATALOAD":
            off = top(0)
            if not call.is_root:
                raise NotImplementedError(
                    "CALLDATALOAD in a child frame (memory-backed "
                    "calldata pending)")
            if off >= 1 << 24:
                raise NotImplementedError("CALLDATALOAD offset >= 2^24")
            ri.append(self.call_context(
                cid, CallContextField.CALL_DATA_LENGTH, len(call.calldata)))
            ri.append(self.stack_read(cid, sp, off))
            ri.append(self.stack_write(cid, sp, nxt_top(), prev=off))
        elif name in ("CALLDATACOPY", "CODECOPY", "RETURNDATACOPY"):
            doff, soff, ln = top(0), top(1), top(2)
            for k in range(3):
                ri.append(self.stack_read(cid, sp + k, top(k)))
            self._copy_to_memory(es, call, name, doff, soff, ln, step, nxt)
        elif name == "MCOPY":
            doff, soff, ln = top(0), top(1), top(2)
            for k in range(3):
                ri.append(self.stack_read(cid, sp + k, top(k)))
            if ln:
                if doff % 32 or soff % 32 or ln % 32:
                    raise NotImplementedError(
                        "unaligned MCOPY (word-anchored copy layout)")
                nw = ln // 32
                rwc0 = self.rwc
                # ALL source reads first, then all destination writes:
                # exactly the as-if-intermediate overlap semantics, and
                # two clean +1 rw-counter chains for the copy circuit
                for w in range(soff // 32, soff // 32 + nw):
                    v = mem_word(step.memory, w)
                    ri.append(self.memory_word(cid, RW.READ, w, v, v))
                for w in range(doff // 32, doff // 32 + nw):
                    prev_w = mem_word(step.memory, w)
                    new_w = mem_word(nxt.memory, w) if nxt else prev_w
                    ri.append(self.memory_word(cid, RW.WRITE, w, new_w,
                                               prev_w))
                data = bytes(step.memory[soff : soff + ln])
                self.copy_events.append(CopyEvent(
                    src_type=CopyDataType.MEMORY, src_id=cid,
                    src_addr=soff, src_addr_end=soff + ln,
                    dst_type=CopyDataType.MEMORY, dst_id=cid,
                    dst_addr=doff, rw_counter_start=rwc0,
                    bytes_=[(b, False) for b in data],
                ))
        elif name == "SHA3":
            off, ln = top(0), top(1)
            ri.append(self.stack_read(cid, sp, off))
            ri.append(self.stack_read(cid, sp + 1, ln))
            data = bytes(step.memory[off : off + ln].ljust(ln, b"\0")) if ln else b""
            rwc0 = self.rwc
            for w in range(off // 32, -(-(off + ln) // 32) if ln else off // 32):
                v = mem_word(step.memory, w)
                ri.append(self.memory_word(cid, RW.READ, w, v, v))
            self.copy_events.append(CopyEvent(
                src_type=CopyDataType.MEMORY, src_id=cid, src_addr=off,
                src_addr_end=off + ln, dst_type=CopyDataType.RLC_ACC,
                dst_id=cid, dst_addr=0, rw_counter_start=rwc0,
                bytes_=[(b, False) for b in data],
            ))
            ri.append(self.stack_write(cid, sp + 1, nxt_top()))
        elif name.startswith("LOG") and name != "LOG":  # LOG0..LOG4
            # LOG row: off/len + topic stack reads + memory words + the
            # TX_LOG address row; LOG1-4 then emit a "LogTopics"
            # continuation row carrying the TX_LOG topic writes (the
            # EVM circuit's 8-slot budget; data rows ride the CopyTable)
            ntopics = step.op - 0xA0
            off, ln = top(0), top(1)
            ri.append(self.stack_read(cid, sp, off))
            ri.append(self.stack_read(cid, sp + 1, ln))
            for k in range(ntopics):
                ri.append(self.stack_read(cid, sp + 2 + k, top(2 + k)))
            log_id = call.start_log_index + 1
            call.start_log_index += 1
            data = bytes(step.memory[off : off + ln].ljust(ln, b"\0")) if ln else b""
            # source memory word reads (the copy circuit's word anchors)
            rwc0 = self.rwc
            for w in range(off // 32, -(-(off + ln) // 32) if ln else off // 32):
                v = mem_word(step.memory, w)
                ri.append(self.memory_word(cid, RW.READ, w, v, v))
            # address + topics + data bytes as TxLog rows (witness/rw.rs TxLogOp)
            ri.append(self._push(
                rw=RW.WRITE, tag=Target.TX_LOG, id=self.tx_id,
                address=log_id, field=0, value=call.address,
            ))
            if ntopics:
                row_b = ExecStep(
                    pc=step.pc, op=step.op,
                    gas_left=step.gas - step.gas_cost, gas_cost=0,
                    rw_counter_start=self.rwc, stack_pointer=sp + 2,
                    exec_state="LogTopics", call_id=cid, depth=call.depth,
                    mws=es.mws_after, mws_after=es.mws_after,
                )
                for k in range(ntopics):
                    row_b.rw_indices.append(self._push(
                        rw=RW.WRITE, tag=Target.TX_LOG, id=self.tx_id,
                        address=log_id, field=1, storage_key=k,
                        value=top(2 + k),
                    ))
                deferred_steps.append(row_b)
            for k, b in enumerate(data):
                self._push(
                    rw=RW.WRITE, tag=Target.TX_LOG, id=self.tx_id,
                    address=log_id, field=2, storage_key=k, value=b,
                )
            self.copy_events.append(CopyEvent(
                src_type=CopyDataType.MEMORY, src_id=cid, src_addr=off,
                src_addr_end=off + ln, dst_type=CopyDataType.TX_LOG,
                dst_id=self.tx_id, dst_addr=log_id, rw_counter_start=rwc0,
                bytes_=[(b, False) for b in data],
            ))
        elif name == "EXP":
            a, e = top(0), top(1)
            ri.append(self.stack_read(cid, sp, a))
            ri.append(self.stack_read(cid, sp + 1, e))
            self.exp_events.append(ExpEvent(
                identifier=self.rwc, base=a, exponent=e,
                exponentiation=pow(a, e, 1 << 256),
            ))
            ri.append(self.stack_write(cid, sp + 1, nxt_top()))
        elif name in ("RETURN", "REVERT"):
            off, ln = top(0), top(1)
            ri.append(self.stack_read(cid, sp, off))
            ri.append(self.stack_read(cid, sp + 1, ln))
            if call.is_create and name == "RETURN":
                # code deposit (create.rs CodeStore leg): the returned
                # bytes become the account's code — CODE_HASH write +
                # a MEMORY->BYTECODE copy event binding memory bytes to
                # the deployed bytecode-table entry
                if not call.is_success:
                    raise NotImplementedError(
                        "failed code deposit (0xEF / size cap / "
                        "code-store OOG) has no circuit state yet")
                data = bytes(step.memory[off : off + ln].ljust(ln, b"\0")) \
                    if ln else b""
                dep_hash = self.cdb.insert(data)
                acc = self.sdb.ensure(call.address)
                prev_ch = acc.code_hash
                acc.code_hash = dep_hash
                rwc0 = self.rwc
                for w in range(off // 32,
                               -(-(off + ln) // 32) if ln else off // 32):
                    v = mem_word(step.memory, w)
                    ri.append(self.memory_word(cid, RW.READ, w, v, v))
                ri.append(self.account(
                    RW.WRITE, call.address, AccountField.CODE_HASH,
                    dep_hash, prev_ch, reversible=True))
                if ln:
                    self.copy_events.append(CopyEvent(
                        src_type=CopyDataType.MEMORY, src_id=cid,
                        src_addr=off, src_addr_end=off + ln,
                        dst_type=CopyDataType.BYTECODE, dst_id=dep_hash,
                        dst_addr=0, rw_counter_start=rwc0,
                        bytes_=[(b, _is_code_at(data, k))
                                for k, b in enumerate(data)],
                    ))
            elif ln:
                data = bytes(step.memory[off : off + ln].ljust(ln, b"\0"))
                self.copy_events.append(CopyEvent(
                    src_type=CopyDataType.MEMORY, src_id=cid, src_addr=off,
                    src_addr_end=off + ln, dst_type=CopyDataType.RETURN_DATA,
                    dst_id=cid, dst_addr=0, rw_counter_start=self.rwc,
                    bytes_=[(b, False) for b in data],
                ))
        else:
            # generic stack op: read the popped operands, write the
            # produced values (they sit on top of the next step's stack)
            for k in range(info.pops):
                ri.append(self.stack_read(cid, sp + k, top(k)))
            for k in range(info.pushes):
                new_sp = sp + info.pops - 1 - k
                ri.append(self.stack_write(cid, new_sp, nxt_top(info.pushes - 1 - k)))

        self.steps.append(es)
        self.steps.extend(deferred_steps)

    def _copy_to_memory(self, es, call, name, doff, soff, ln, step, nxt):
        """Copy event + destination memory word writes for the *COPY ops
        (reference: evm/opcodes/calldatacopy.rs etc. + CopyEvent)."""
        cid = call.call_id
        if name == "CALLDATACOPY":
            src, styp, sid = call.calldata, (
                CopyDataType.TX_CALLDATA if call.is_root else CopyDataType.MEMORY
            ), (self.tx_id if call.is_root else call.caller_id)
        elif name == "CODECOPY":
            src = self.cdb.get(call.code_hash)
            styp, sid = CopyDataType.BYTECODE, call.code_hash
        else:  # RETURNDATACOPY
            # source bytes are observable from the destination write
            src = bytes(nxt.memory[doff : doff + ln]) if nxt else b""
            styp, sid = CopyDataType.RETURN_DATA, call.call_id
        rwc0 = self.rwc
        if ln:
            data = src[soff : soff + ln] if name != "RETURNDATACOPY" else src
            data = bytes(data).ljust(ln, b"\x00")
            w0, w1 = doff // 32, -(-(doff + ln) // 32)
            for w in range(w0, w1):
                prev_w = int.from_bytes(
                    step.memory[32 * w : 32 * w + 32].ljust(32, b"\0"), "big"
                )
                new_w = int.from_bytes(
                    (nxt.memory[32 * w : 32 * w + 32] if nxt else b"").ljust(32, b"\0"),
                    "big",
                )
                es.rw_indices.append(
                    self.memory_word(cid, RW.WRITE, w, new_w, prev_w)
                )
            code = self.cdb.get(call.code_hash) if name == "CODECOPY" else None
            self.copy_events.append(CopyEvent(
                src_type=styp, src_id=sid, src_addr=soff,
                src_addr_end=soff + ln, dst_type=CopyDataType.MEMORY,
                dst_id=cid, dst_addr=doff, rw_counter_start=rwc0,
                bytes_=[
                    (b, _is_code_at(code, soff + k) if code is not None else False)
                    for k, b in enumerate(data)
                ],
            ))

    # -- sanitizers --------------------------------------------------------
    def _audit_gas(self, logs: list[GethExecStep]) -> None:
        """Per-frame gas chain: within a depth level, gas[i+1] ==
        gas[i] - gas_cost[i] (reference debug_assert at
        circuit_input_builder.rs:586-600)."""
        last_at_depth: dict[int, GethExecStep] = {}
        for s in logs:
            prev = last_at_depth.get(s.depth)
            if prev is not None and prev.gas - prev.gas_cost != s.gas:
                raise GasMismatch(
                    f"gas chain broken at pc={s.pc} depth={s.depth}: "
                    f"{prev.gas}-{prev.gas_cost} != {s.gas}"
                )
            last_at_depth[s.depth] = s
            # returning to depth d invalidates deeper frames
            for dd in [d for d in last_at_depth if d > s.depth]:
                del last_at_depth[dd]

    def check_post_state(self, expected: StateDB) -> list[str]:
        """Compare the replayed StateDB against the tracer's post state
        (reference: check_post_state, circuit_input_builder.rs:346-378)."""
        errs = []
        addrs = set(self.sdb.accounts) | set(expected.accounts)
        for a in sorted(addrs):
            mine, want = self.sdb.get_account(a), expected.get_account(a)
            if mine.balance != want.balance:
                errs.append(f"balance[{a:#x}]: {mine.balance} != {want.balance}")
            if mine.nonce != want.nonce:
                errs.append(f"nonce[{a:#x}]: {mine.nonce} != {want.nonce}")
            keys = set(mine.storage) | set(want.storage)
            for k in sorted(keys):
                mv = mine.storage.get(k, 0)
                wv = want.storage.get(k, 0)
                if mv != wv:
                    errs.append(f"storage[{a:#x}][{k}]: {mv} != {wv}")
        return errs


def _sstore_refund_delta(original: int, current: int, new: int) -> int:
    """EIP-3529 SSTORE refund change (mirrors the tracer's accounting;
    reference: geth gas model via the Go tracer)."""
    if new == current:
        return 0
    delta = 0
    if current == original:
        if original != 0 and new == 0:
            delta += 4800
    else:
        if original != 0:
            if current == 0:
                delta -= 4800
            elif new == 0:
                delta += 4800
        if new == original:
            delta += (20000 - 100) if original == 0 else (5000 - 2100 - 100)
    return delta


def _is_code_at(code: bytes, i: int) -> bool:
    """True if code[i] is an opcode (not push data)."""
    j = 0
    while j < len(code):
        if j == i:
            return True
        j += 1 + push_size(code[j])
    return False
