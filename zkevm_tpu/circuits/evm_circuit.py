"""EVM circuit: one constraint set per ExecutionState, dispatched by a
one-hot state vector, with RwTable + BytecodeTable lookups.

Reference counterpart: zkevm-circuits/src/evm_circuit.rs:40 with
evm_circuit/step.rs:39 (ExecutionState), evm_circuit/execution.rs:265
(ExecutionConfig dispatch), util/constraint_builder.rs:298
(EVMConstraintBuilder) and the per-state gadget files under
evm_circuit/execution/.

TPU-native redesign of the step layout: the reference packs each step
into <=21 rows x 154 columns with a CellManager; here a step is ONE row
of wide cells (state one-hot vector column, six 128-bit-half word cells,
budgeted RW lookup slots), so witness assignment is a row-per-step array
program and every gate evaluates as one (n_steps,) vector op. Per-state
constraints are merged into shared gates/lookups as sum_s sel_s * expr_s
(the same merging the reference's constraint builder does per column,
done here per slot).

Implemented states (69 merged states vs the reference's 79 execution
states — several reference states share one merged state here, e.g. the
comparator family): BeginTx, EndTx, EndBlock
(padding), STOP, PUSH1/2, POP, ADD/SUB, DUP1-16, SWAP1-16, MLOAD, MSTORE
(32-byte-aligned words), SLOAD, SSTORE (EIP-2929 access-list rows, gas
from the looked-up is_warm bit), JUMPDEST, JUMP, JUMPI (taken jumps
bytecode-checked to land on JUMPDEST), ISZERO, EQ, LT, GT (full 256-bit
compare via a 32-byte-limb LtGadget), CALLER, CALLVALUE, ADDRESS,
CALLDATASIZE, MUL/DIV/MOD + SHL/SHR (WordArithTable), AND/OR/XOR/NOT
(BitwiseTable), ADDMOD/MULMOD (512-bit word-arith tags), EXP (ExpTable +
byte-size gas), BYTE, SIGNEXTEND, SAR (pow2 + DIVMOD decompositions with
sign masks), COINBASE/TIMESTAMP/NUMBER/GASLIMIT/CHAINID/BASEFEE
(BlockTable), ORIGIN/GASPRICE (TxTable), PC, GAS, SELFBALANCE,
BALANCE/EXTCODEHASH (EIP-2929 warm/cold account access). Words are
(lo, hi) 128-bit halves, range-checked by the state circuit at the
lookup boundary. Known gaps, matching the witness builder's scope: CALL
family states, the SSTORE refund amount (the TX_REFUND row is proven
present but the delta is unconstrained), the memory-expansion gas term
(witnessed in an aux cell; the quadratic gadget is pending), and
byte-granular memory.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

import numpy as np

from zkevm_tpu.circuits.tables import BytecodeTable, RwTable
from zkevm_tpu.etypes.opcodes import OPCODES
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ColumnGroup, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr
from zkevm_tpu.witness.builder import ExecStep
from zkevm_tpu.witness.rw import RW, AccountField, CallContextField, RwMap, Target

FR = fr_spec()

STACK_CAP = 1024
M128 = (1 << 128) - 1
# secp256k1 group order (the ecrecover precompile's hash reduction)
_SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
M256 = (1 << 256) - 1
NSLOTS = 8  # RW lookup budget per step row (Restore uses all eight)

COLD_SLOAD_EXTRA = 2000  # 2100 cold - 100 warm
COLD_ACCOUNT_EXTRA = 2500  # 2600 cold - 100 warm (EIP-2929 account access)
SSTORE_CASES = (100, 2900, 20000)


def _opmap() -> list:
    """(opcode, tag) rows of the shared opcode->table-tag fixed map:
    BLOCK_CTX -> BlockField, TX_CTX -> TxFieldTag, ACCT_INFO ->
    AccountField. Opcode keys are disjoint so one table serves all."""
    from zkevm_tpu.circuits.pi_circuit import BlockField
    from zkevm_tpu.circuits.tx_circuit import TxFieldTag

    return [
        (0x41, int(BlockField.COINBASE)),
        (0x42, int(BlockField.TIMESTAMP)),
        (0x43, int(BlockField.NUMBER)),
        (0x45, int(BlockField.GAS_LIMIT)),
        (0x46, int(BlockField.CHAIN_ID)),
        (0x48, int(BlockField.BASE_FEE)),
        (0x32, int(TxFieldTag.CALLER_ADDRESS)),  # ORIGIN (no CREATE scope)
        (0x3A, int(TxFieldTag.GAS_PRICE)),
        (0x31, int(AccountField.BALANCE)),
        (0x3F, int(AccountField.CODE_HASH)),
    ]


class ES(IntEnum):
    """Execution states (reference step.rs:39; subset)."""

    BEGIN_TX = 0
    END_TX = 1
    END_BLOCK = 2
    STOP = 3
    PUSH = 4
    POP = 5
    ADD_SUB = 6
    DUP = 7
    SWAP = 8
    MLOAD = 9
    MSTORE = 10
    SLOAD = 11
    SSTORE = 12
    JUMPDEST = 13
    JUMP = 14
    JUMPI = 15
    ISZERO = 16
    EQ = 17
    LT_GT = 18
    CALLER = 19
    CALLVALUE = 20
    ADDRESS = 21
    CALLDATASIZE = 22
    MUL_DIV_MOD = 23  # execution/mul_div_mod.rs (WordArithTable lookup)
    SHL_SHR = 24  # execution/shl_shr.rs (pow2 + WordArithTable)
    AND_OR_XOR = 25  # execution/bitwise.rs (BitwiseTable lookup)
    NOT = 26  # execution/not.rs (XOR all-ones)
    BLOCK_CTX = 27  # execution/block_ctx.rs (BlockTable lookup)
    TX_CTX = 28  # ORIGIN/GASPRICE (execution/origin.rs, gasprice.rs)
    PC_GAS = 29  # execution/pc.rs, gas.rs
    ACCT_INFO = 30  # BALANCE/EXTCODEHASH (execution/balance.rs, ...)
    SELFBALANCE = 31  # execution/selfbalance.rs
    ADDMOD = 32  # execution/addmod.rs (DIVMOD512 WordArithTable lookup)
    MULMOD = 33  # execution/mulmod.rs (3 WordArithTable lookups)
    EXP = 34  # execution/exponentiation.rs (ExpTable lookup + byte size)
    BYTE = 35  # execution/byte.rs (pow2 + 2 DIVMOD lookups)
    SIGNEXTEND = 36  # execution/signextend.rs
    SAR = 37  # execution/sar.rs (SHR + sign mask)
    CALL1 = 38  # execution/callop.rs rows 1-4 (stack args)
    CALL2 = 39  # access list + balance transfer + child ctx
    CALL3 = 40  # child ctx + caller resume pc/sp saves
    CALL4 = 41  # resume gas/code-hash/self-addr saves + child code read
    RESTORE = 42  # frame pop: 7 ctx reads + the result push
    RETURN = 43  # execution/return_revert.rs (frame exit side)
    REVERT = 44
    RETURNDATASIZE = 45  # execution/returndatasize.rs
    SHA3 = 46  # execution/sha3.rs (CopyTable RLC_ACC event + KeccakTable)
    COPY = 47  # CALLDATACOPY/CODECOPY/RETURNDATACOPY (CopyTable event)
    LOG = 48  # execution/logs.rs (v1: LOG0; TX_LOG rows + CopyTable)
    # terminal error states (root-frame scope this round; reference:
    # step.rs:39 error variants + execution/error_*.rs)
    ERR_INVALID_JUMP = 49  # execution/error_invalid_jump.rs
    ERR_STACK = 50  # execution/error_stack.rs (under+overflow)
    ERR_INVALID_OP = 51  # execution/error_invalid_opcode.rs
    ERR_OOG = 52  # execution/error_oog_constant.rs
    # precompile calls: two-row states (reference:
    # evm_circuit/execution/precompiles/{ecrecover,sha256}.rs +
    # bus-mapping/src/evm/opcodes/precompiles/); row 1 = the CALL-family
    # stack args, row 2 = warm access + io words + table lookup + result
    PRE1 = 53       # shared stack-arg row
    PRE_EC = 54     # ecrecover (0x01): SigTable word-surface lookup
    PRE_SHA = 55    # sha256 (0x02): CopyTable RLC + Sha256Table lookup
    # byte-granular memory (execution/memory.rs word-aligned rework,
    # done here with a one-hot shift mask over (M[wa]||M[wa+1]) bytes)
    MSTORE8 = 56
    MSIZE = 57
    CALLDATALOAD = 58  # root-frame loads via per-byte TxTable lookups
    ERR_WRITE_PROT = 59  # error_write_protection.rs: write op in a
    #                      static context (SSTORE / LOGn / CREATE* /
    #                      SELFDESTRUCT; value-bearing CALL pending)
    ERR_OOG_MEM = 60  # error_oog_memory_copy.rs-family: dynamic OOG on
    #                   MLOAD/MSTORE/MSTORE8 (quadratic expansion term),
    #                   incl. the huge-offset fast path
    LOG_TOP = 61  # LOG1-4 continuation row: topic stack-reads land on
    #               the LOG row; this row emits the TX_LOG topic writes
    PRE_ECA = 62  # ecAdd (0x06): EcAddTable word-surface lookup
    #               (execution/precompiles/ec_add.rs)
    PRE_ECM = 63  # ecMul (0x07): EcMulTable word-surface lookup
    #               (execution/precompiles/ec_mul.rs)
    SLT_SGT = 64  # signed comparison (execution/signed_comparator.rs):
    #               the shared 32-limb lt grid over bias-adjusted
    #               operands x' = x + 2^255 - 2^256*msb(x), with both
    #               msb bits pinned by 16-limb range gadgets
    CODESIZE = 65  # execution/codesize.rs: own code length via the
    #                bytecode length surface
    EXTCODESIZE = 66  # execution/extcodesize.rs: account CODE_HASH read
    #                   + bytecode length surface lookup
    SDIV_SMOD = 67  # execution/sdiv_smod.rs: |a| = |q|*|b| + |r| on the
    #                 WordArithTable with per-half abs/carry bindings and
    #                 msb-pinned signs (shared with SLT_SGT)
    MCOPY = 68  # execution/mcopy.rs (EIP-5656): memory->memory CopyTable
    #             event (32-aligned, 32-multiple length)


NSTATES = len(ES)

# opcode-backed states: (fixed opcode | None), static gas, stack-pointer
# delta, rw count. Dynamic-gas states list their static base; the gc cell
# carries the total and is constrained per state below.
OP_STATES = {
    ES.STOP: (0x00, 0, 0, 0),
    ES.PUSH: (None, 3, -1, 1),
    ES.POP: (0x50, 2, 1, 1),
    ES.ADD_SUB: (None, 3, 1, 3),
    ES.DUP: (None, 3, -1, 2),
    ES.SWAP: (None, 3, 0, 4),
    ES.MLOAD: (0x51, 3, 0, 4),
    ES.MSTORE: (0x52, 3, 2, 4),
    ES.MSTORE8: (0x53, 3, 2, 3),
    ES.MSIZE: (0x59, 2, -1, 1),
    ES.CALLDATALOAD: (0x35, 3, 0, 3),
    ES.SLOAD: (0x54, 100, 0, 4),
    ES.SSTORE: (0x55, 100, 2, 5),
    ES.JUMPDEST: (0x5B, 1, 0, 0),
    ES.JUMP: (0x56, 8, 1, 1),
    ES.JUMPI: (0x57, 10, 2, 2),
    ES.ISZERO: (0x15, 3, 0, 2),
    ES.EQ: (0x14, 3, 1, 3),
    ES.LT_GT: (None, 3, 1, 3),
    ES.CALLER: (0x33, 2, -1, 2),
    ES.CALLVALUE: (0x34, 2, -1, 2),
    ES.ADDRESS: (0x30, 2, -1, 2),
    ES.CALLDATASIZE: (0x36, 2, -1, 2),
    ES.MUL_DIV_MOD: (None, 5, 1, 3),
    ES.SHL_SHR: (None, 3, 1, 3),
    ES.AND_OR_XOR: (None, 3, 1, 3),
    ES.NOT: (0x19, 3, 0, 2),
    ES.BLOCK_CTX: (None, 2, -1, 1),
    ES.TX_CTX: (None, 2, -1, 1),
    ES.PC_GAS: (None, 2, -1, 1),
    ES.ACCT_INFO: (None, 100, 0, 4),
    ES.SELFBALANCE: (0x47, 5, -1, 3),
    ES.ADDMOD: (0x08, 8, 2, 4),
    ES.MULMOD: (0x09, 8, 2, 4),
    ES.EXP: (0x0A, 10, 1, 3),
    ES.BYTE: (0x1A, 3, 1, 3),
    ES.SIGNEXTEND: (0x0B, 5, 1, 3),
    ES.SAR: (0x1D, 3, 1, 3),
    ES.CALL1: (None, 0, 0, 7),  # nrw actually 6+has_value (chain override)
    ES.CALL2: (None, 0, 0, 7),
    ES.CALL3: (None, 0, 0, 7),
    ES.CALL4: (None, 0, 0, 4),
    ES.RETURN: (0xF3, 0, 2, 2),
    ES.REVERT: (0xFD, 0, 2, 2),
    ES.RETURNDATASIZE: (0x3D, 2, -1, 2),
    ES.SHA3: (0x20, 30, 1, 3),  # + dynamic word/memexp terms
    ES.COPY: (None, 3, 3, 3),
    ES.LOG: (None, 375, 2, 3),
    ES.PRE1: (None, 0, 0, 7),     # nrw 6+has_value (chain override)
    ES.PRE_EC: (None, 0, 0, 7),   # warm + 4 in words + out word + result
    ES.PRE_SHA: (None, 0, 0, 3),  # warm + out + result (+opn copy reads)
    ES.PRE_ECA: (None, 0, 0, 8),  # warm + 4 in + 2 out words + result
    ES.PRE_ECM: (None, 0, 0, 7),  # warm + 3 in + 2 out words + result
    ES.SLT_SGT: (None, 3, 1, 3),
    ES.CODESIZE: (0x38, 2, -1, 1),
    ES.EXTCODESIZE: (None, 0, 0, 4),  # dynamic gas (2600 cold / 100 warm)
    ES.SDIV_SMOD: (None, 5, 1, 3),
    ES.MCOPY: (0x5E, 3, 3, 3),  # dynamic gas; rws 3 + 2*opn
}
STATIC_GAS_STATES = [
    s for s in OP_STATES
    if s not in (ES.MLOAD, ES.MSTORE, ES.MSTORE8, ES.SLOAD, ES.SSTORE,
                 ES.ACCT_INFO, ES.EXTCODESIZE,
                 ES.EXP, ES.CALL1, ES.CALL2, ES.CALL3, ES.CALL4,
                 ES.RETURN, ES.REVERT, ES.SHA3, ES.COPY, ES.LOG, ES.MCOPY,
                 ES.PRE1, ES.PRE_EC, ES.PRE_SHA, ES.PRE_ECA, ES.PRE_ECM)
]
NRW = {ES.BEGIN_TX: 7, ES.END_TX: 1, ES.END_BLOCK: 0, ES.RESTORE: 8,
       ES.ERR_INVALID_JUMP: 1, ES.ERR_STACK: 0, ES.ERR_INVALID_OP: 0,
       ES.ERR_OOG: 0, ES.ERR_WRITE_PROT: 0, ES.ERR_OOG_MEM: 1,
       ES.LOG_TOP: 4}
NRW.update({s: spec[3] for s, spec in OP_STATES.items()})
ERRS = (ES.ERR_INVALID_JUMP, ES.ERR_STACK, ES.ERR_INVALID_OP, ES.ERR_OOG,
        ES.ERR_WRITE_PROT, ES.ERR_OOG_MEM)
CALL_OPS = (0xF1, 0xF2, 0xF4, 0xFA)


@dataclass
class EvmConfig:
    q_step: Column  # fixed: 1 on every step-region row
    q_first: Column  # fixed: first region row
    q_last: Column  # fixed: last region row
    q_trans: Column  # fixed: region rows whose next row is also in region
    sel: ColumnGroup  # NSTATES one-hot
    tx_id: Column  # current transaction (1-based; +1 at EndTx)
    cid: Column  # root call id of the current tx
    pc: Column
    opcode: Column
    gas_left: Column
    gc: Column  # gas cost of this step
    sp: Column
    rwc: Column
    code_hash: Column  # low 128 bits of keccak256(code)
    code_hash_hi: Column
    callee: Column
    opn: Column  # push size / dup index / swap index operand
    is_sub: Column
    warm: Column  # EIP-2929 was-warm bit (from the access-list row)
    bb0: Column  # PUSH immediate bytes (big-endian first)
    bb1: Column
    w: list  # 6 words as (lo, hi) Column pairs
    carries: list  # 4 boolean carry cells
    pcell: list  # 3 free value_prev (lo, hi) pairs for slots 0..2
    aux: list  # 3 scalar aux cells: nonce/mexp/gcase, refund_new, refund_prev
    iz: dict  # IsZero gadget instances by name
    ltg: object  # 256-bit LtGadget (LT/GT + SHL/SHR shift decomposition)
    rt4: RangeTable
    rt8: RangeTable
    m_div: Column = None  # MUL_DIV_MOD one-hot bits (m_mul = 1 - div - mod)
    m_mod: Column = None
    bzc: Column = None  # materialized divisor-is-zero bit
    waen: Column = None  # materialized WordArithTable lookup enable
    nzc: Column = None  # ADDMOD/MULMOD: materialized modulus-is-zero bit
    am_en: Column = None  # ADDMOD lookup enable (state * N!=0)
    mm_en: Column = None  # MULMOD lookup enable
    vcell: Column = None  # materialized shift-is-valid bit (SHL/SHR)
    p2s: Column = None  # pow2 fixed table: (s+1, 2^s lo, 2^s hi)
    p2lo: Column = None
    p2hi: Column = None
    om_op: Column = None  # opcode -> table-tag fixed map
    om_tag: Column = None
    msb: ColumnGroup = None  # EXP exponent byte-size one-hot
    minv: Column = None  # inverse of the msb byte
    vcell2: Column = None  # materialized ExpTable lookup enable
    byv: Column = None  # BYTE index-valid bit (i < 32)
    sev: Column = None  # SIGNEXTEND index-valid bit (i < 31)
    sarm: Column = None  # SAR mask-lookup enable (valid & s0 != 0)
    dep: Column = None  # call depth (chained: BeginTx 1, CALL4 +1, ...)
    istc: Column = None  # current frame's is_static flag (chained)
    vnz: Column = None  # CALL1: transfer-value-nonzero bit
    ccid: Column = None  # CALL1-4: the child call id
    # error-state cells/gadgets (ERR_* states)
    ej_oob: Column = None  # invalid-jump: dest out-of-range flag
    ej_byte: Column = None  # invalid-jump: fetched byte at dest
    ej_isc: Column = None  # invalid-jump: is_code of that byte
    ej_len: Column = None  # invalid-jump: code length (oob case)
    es_ov: Column = None  # stack error: 1 = overflow, 0 = underflow
    es_pop: Column = None  # stack error / oog: opcode metadata cells
    es_push: Column = None
    og_gas: Column = None
    io_op: Column = None  # fixed: invalid opcodes (op+1)
    os_op: Column = None  # fixed: valid-opcode metadata (op+1, ...)
    os_pop: Column = None
    os_push: Column = None
    os_gas: Column = None
    ltg_ej: object = None
    ltg_es: object = None
    ltg_og: object = None
    pw_i: Column = None   # precompile input base word index
    pw_o: Column = None   # precompile output word index
    p_cnt: Column = None  # sha256 precompile 64-byte block count
    # byte-granular memory cells
    msk: ColumnGroup = None   # one-hot shift mask, msk[j] = [j == s]
    srb: ColumnGroup = None   # (M[wa] || M[wa+1]) bytes, big-endian
    vlb: ColumnGroup = None   # store-value / loaded-value bytes
    mwa: Column = None        # memory word address
    mby: list = None          # mwa / offset byte decomposition (3 bytes)
    mws: Column = None        # memory word count before the step (chain)
    mwsw: Column = None       # next-mws cell (constrained on MEM3 rows)
    mqd: list = None          # floor(mws^2/512) bytes (6)
    mqd2: list = None         # floor(mws'^2/512) bytes (6)
    mrdl: Column = None       # mws^2 mod 512, low byte
    mrdb: Column = None       # mws^2 mod 512, bit 8
    mrd2l: Column = None
    mrd2b: Column = None
    mlt: object = None        # LtGadget mws < words_needed
    # CALLDATALOAD cells
    inr: ColumnGroup = None   # in-range bits per loaded byte
    cl_lt_a: object = None
    cl_lt_b: object = None
    wp_op: Column = None  # fixed: static-context write opcodes (op+1)
    bigb: Column = None   # ERR_OOG_MEM huge-offset variant bit
    eg_nb: Column = None
    mgate: Column = None
    m8b: Column = None
    ltg_24: object = None
    ltg_sa: object = None  # SLT/SGT + SDIV/SMOD msb-pinning gadgets
    ltg_sb: object = None
    sdv_k: list = None  # SDIV/SMOD abs-binding carry bits
    srv: Column = None  # SDIV/SMOD materialized result sign
    sdv_en: Column = None  # SDIV/SMOD word-table-lookup enable
    icf: Column = None  # current frame is a CREATION frame (chained;
    #                     TxTable IS_CREATE-bound on BeginTx rows)


def _word(cs) -> tuple:
    return (cs.advice_column(), cs.advice_column())


def configure(
    cs: ConstraintSystem,
    rw_table: RwTable,
    bytecode_table: BytecodeTable,
    rt4: RangeTable | None = None,
    tx_table=None,
    rt8: RangeTable | None = None,
    rw_count=None,
    word_table=None,
    bitwise_table=None,
    block_table=None,
    exp_table=None,
    copy_table=None,
    bytecode_len_table=None,
    sig_word_table=None,
    ecadd_word_table=None,
    ecmul_word_table=None,
) -> EvmConfig:
    q_step = cs.fixed_column()
    q_first = cs.fixed_column()
    q_last = cs.fixed_column()
    q_trans = cs.fixed_column()
    sel = cs.advice_group("ev_sel", NSTATES)
    tx_id = cs.advice_column()
    cid = cs.advice_column()
    pc = cs.advice_column()
    opcode = cs.advice_column()
    gas_left = cs.advice_column()
    gc = cs.advice_column()
    sp = cs.advice_column()
    rwc = cs.advice_column()
    code_hash = cs.advice_column()
    code_hash_hi = cs.advice_column()
    callee = cs.advice_column()
    opn = cs.advice_column()
    is_sub = cs.advice_column()
    warm = cs.advice_column()
    bb0 = cs.advice_column()
    bb1 = cs.advice_column()
    w = [_word(cs) for _ in range(6)]
    carries = [cs.advice_column() for _ in range(4)]
    pcell = [_word(cs) for _ in range(3)]
    aux = [cs.advice_column() for _ in range(3)]
    m_div, m_mod = cs.advice_column(), cs.advice_column()
    bzc, waen, vcell = (cs.advice_column() for _ in range(3))
    nzc, am_en, mm_en = (cs.advice_column() for _ in range(3))
    vcell2 = cs.advice_column()
    byv, sev, sarm = (cs.advice_column() for _ in range(3))
    dep, istc, vnz, ccid = (cs.advice_column() for _ in range(4))
    icf = cs.advice_column()
    p2s, p2lo, p2hi = (cs.fixed_column() for _ in range(3))
    om_op, om_tag = cs.fixed_column(), cs.fixed_column()
    # error-state cells: invalid-jump (oob flag, fetched byte/is_code,
    # code length), stack over/underflow (pops/pushes + direction flag),
    # OOG-constant (required static gas)
    ej_oob, ej_byte, ej_isc, ej_len = (cs.advice_column() for _ in range(4))
    es_ov, es_pop, es_push, og_gas = (cs.advice_column() for _ in range(4))
    io_op = cs.fixed_column()  # invalid opcodes, stored op+1
    # valid-opcode metadata: (op+1, pops, pushes, static gas)
    os_op, os_pop, os_push, os_gas = (cs.fixed_column() for _ in range(4))
    rt4 = rt4 or RangeTable.configure(cs, 4)

    # in-range bit group (CALLDATALOAD byte padding, PUSH immediate
    # length, LOG topic count) — allocated early: the transition gate
    # reads inr[0] as the LOG continuation bit
    inr = cs.advice_group("ev_inr", 32)
    one = Const(1)
    qs, qt, qf, ql = q_step.cur(), q_trans.cur(), q_first.cur(), q_last.cur()
    S = [sel.columns[s].cur() for s in range(NSTATES)]
    SN = [sel.columns[s].rot(1) for s in range(NSTATES)]

    def comb(pair) -> Expr:  # lo + 2^128*hi
        return pair[0].cur() + Const(1 << 128) * pair[1].cur()

    # -- one-hot state vector --------------------------------------------
    cs.create_vector_gate("ev_sel_bool", qs * sel.q() * (sel.q() - one), NSTATES)
    ssum = Const(0)
    for s in S:
        ssum = ssum + s
    cs.create_gate("ev_sel_onehot", [qs * (ssum - one)])
    cs.create_gate("ev_first_last", [
        qf * (S[ES.BEGIN_TX] - one),
        qf * (rwc.cur() - one),  # rw counter starts at 1 (row 0 is Start)
        qf * (tx_id.cur() - one),
        qf * (cid.cur() - one),
        qf * (dep.cur() - one),
        qf * istc.cur(),
        ql * (S[ES.END_BLOCK] - one),
    ])

    # -- allowed state transitions ---------------------------------------
    # PRE_EC/PRE_SHA are reachable ONLY through a PRE1 row (their own
    # explicit rule); keeping them out of the generic successor lists is
    # what enforces that.
    opcode_states = [s for s in OP_STATES
                     if s not in (ES.PRE_EC, ES.PRE_SHA,
                                  ES.PRE_ECA, ES.PRE_ECM)]
    def allowed(next_states):
        acc = Const(0)
        for t in next_states:
            acc = acc + SN[t]
        return one - acc

    EXITS = (ES.STOP, ES.RETURN, ES.REVERT)
    ERRL = list(ERRS)
    CALL_CHAIN = {ES.CALL1: ES.CALL2, ES.CALL2: ES.CALL3, ES.CALL3: ES.CALL4}
    cs.create_gate("ev_transitions", [
        qt * S[ES.BEGIN_TX] * allowed(opcode_states + [ES.END_TX] + ERRL),
        qt * S[ES.END_TX] * allowed([ES.BEGIN_TX, ES.END_BLOCK]),
        qt * S[ES.END_BLOCK] * allowed([ES.END_BLOCK]),
        # child's first row / caller's resume row is a plain opcode row
        qt * S[ES.CALL4] * allowed(opcode_states + ERRL),
        qt * S[ES.RESTORE] * allowed(opcode_states + ERRL),
    ] + [
        qt * S[a] * allowed([b]) for a, b in CALL_CHAIN.items()
    ] + [
        qt * S[ES.PRE1] * allowed([ES.PRE_EC, ES.PRE_SHA,
                                   ES.PRE_ECA, ES.PRE_ECM]),
    ] + [
        qt * S[s] * allowed(opcode_states + [ES.END_TX] + ERRL)
        for s in (ES.PRE_EC, ES.PRE_SHA, ES.PRE_ECA, ES.PRE_ECM)
    ] + [
        qt * S[s] * allowed(opcode_states + [ES.END_TX] + ERRL)
        for s in opcode_states
        if s not in EXITS + (ES.CALL1, ES.CALL2, ES.CALL3, ES.CALL4,
                             ES.PRE1, ES.LOG)
    ] + [
        # LOG with topics continues into the LOG_TOP row; LOG0 exits
        # normally (the inr[0] bit is the topic-count prefix)
        qt * S[ES.LOG] * inr.columns[0].cur() * allowed([ES.LOG_TOP]),
        qt * S[ES.LOG] * (one - inr.columns[0].cur())
        * allowed(opcode_states + [ES.END_TX] + ERRL),
        qt * S[ES.LOG_TOP] * allowed(opcode_states + [ES.END_TX] + ERRL),
    ])
    # error rows fork on is-root like exits (the ev_exit_transitions
    # gate below, once the depth IsZero gadget exists): root -> EndTx,
    # nested -> Restore (the parent continues after the failed frame)
    # exit rows fork on is-root (the depth chain): root -> EndTx,
    # nested -> Restore; constrained below once the IsZero gadget for
    # depth-1 exists (ev_exit_transitions)

    # -- opcode binding + operand ranges ---------------------------------
    cs.create_gate("ev_opcode_bind", [
        S[s] * (opcode.cur() - Const(op))
        for s, (op, _, _, _) in OP_STATES.items()
        if op is not None
    ] + [
        S[ES.PUSH] * (opcode.cur() - Const(0x5F) - opn.cur()),
        S[ES.DUP] * (opcode.cur() - Const(0x80) - opn.cur()),
        S[ES.SWAP] * (opcode.cur() - Const(0x8F) - opn.cur()),
        S[ES.ADD_SUB] * (opcode.cur() - Const(0x01) - Const(2) * is_sub.cur()),
        S[ES.LT_GT] * (opcode.cur() - Const(0x10) - is_sub.cur()),
        qs * is_sub.cur() * (one - is_sub.cur()),
    ])
    rt4.lookup(cs, "ev_dup_n", [S[ES.DUP] * opn.cur()])
    rt4.lookup(cs, "ev_swap_n", [S[ES.SWAP] * (opn.cur() - one)])

    # -- gas costs ---------------------------------------------------------
    # gc carries the step's total gas cost; per state it is pinned to the
    # static schedule, or derived from the is_warm bit (EIP-2929) for the
    # storage ops (reference: execution/sload.rs, sstore.rs gas parts).
    gcase = aux[0].cur()  # SSTORE value-case cost; mexp words for MLOAD/MSTORE
    sstore_case = (gcase - Const(SSTORE_CASES[0])) * \
        (gcase - Const(SSTORE_CASES[1])) * (gcase - Const(SSTORE_CASES[2]))
    cs.create_gate("ev_gas_cost", [
        qs * warm.cur() * (one - warm.cur()),
    ] + [
        S[s] * (gc.cur() - Const(OP_STATES[s][1])) for s in STATIC_GAS_STATES
    ] + [
        S[ES.SLOAD] * (
            gc.cur() - Const(100) - Const(COLD_SLOAD_EXTRA) * (one - warm.cur())
        ),
        S[ES.SSTORE] * sstore_case,
        S[ES.SSTORE] * (
            gc.cur() - gcase - Const(2100) * (one - warm.cur())
        ),
        # MLOAD/MSTORE/MSTORE8 gas is fully constrained by the quadratic
        # memory-expansion gadget (ev_mexp below)
        # RETURN/REVERT: pure memory-expansion cost (aux witness; the
        # constrained gadget covers the MLOAD/MSTORE/MSTORE8 states)
        (S[ES.RETURN] + S[ES.REVERT]) * (gc.cur() - gcase),
        (S[ES.BEGIN_TX] + S[ES.END_TX] + S[ES.END_BLOCK]
         + S[ES.RESTORE] + S[ES.LOG_TOP]) * gc.cur(),
    ])

    # -- word semantics ---------------------------------------------------
    k = [c.cur() for c in carries]
    cs.create_gate(
        "ev_carry_bool", [qs * kc.cur() * (one - kc.cur()) for kc in carries]
    )
    TWO128 = Const(1 << 128)
    # ADD/SUB: x + y = z (mod 2^256) with (x, z) swapped for SUB
    f = is_sub.cur()
    x_lo = f * w[2][0].cur() + (one - f) * w[0][0].cur()
    x_hi = f * w[2][1].cur() + (one - f) * w[0][1].cur()
    z_lo = f * w[0][0].cur() + (one - f) * w[2][0].cur()
    z_hi = f * w[0][1].cur() + (one - f) * w[2][1].cur()
    cs.create_gate("ev_add_sub", [
        S[ES.ADD_SUB] * (x_lo + w[1][0].cur() - z_lo - k[0] * TWO128),
        S[ES.ADD_SUB] * (x_hi + w[1][1].cur() + k[0] - z_hi - k[1] * TWO128),
    ])
    # PUSH1-32 immediates: constrained in the byte-grid block below
    # (vlb bytes + inr in-range bits + msk one-hot over the length)
    # byte-granular memory gates live below (ev_mem_*), after the
    # comparison gadget imports
    # BeginTx: balance transfer caller_prev = caller_new + value (no
    # overflow: carries k1/k3 forced 0) and callee_new = callee_prev + value
    B = S[ES.BEGIN_TX]
    cs.create_gate("ev_begin_tx", [
        B * k[1],
        B * k[3],
        B * (code_hash.cur() - w[5][0].cur()),
        B * (code_hash_hi.cur() - w[5][1].cur()),
        B * (callee.cur() - comb(w[2])),
    ])
    caller_prev_lo = w[3][0].cur() + w[0][0].cur() - k[0] * TWO128
    caller_prev_hi = w[3][1].cur() + w[0][1].cur() + k[0]
    callee_new_lo = w[4][0].cur() + w[0][0].cur() - k[2] * TWO128
    callee_new_hi = w[4][1].cur() + w[0][1].cur() + k[2]

    # -- comparison / zero-test gadgets -----------------------------------
    from zkevm_tpu.gadgets import IsZero, LtGadget

    iz = {
        "jc_lo": IsZero.configure(cs, S[ES.JUMPI], w[1][0].cur(), "ev_iz_jclo"),
        "jc_hi": IsZero.configure(cs, S[ES.JUMPI], w[1][1].cur(), "ev_iz_jchi"),
        "a_lo": IsZero.configure(cs, S[ES.ISZERO], w[0][0].cur(), "ev_iz_alo"),
        "a_hi": IsZero.configure(cs, S[ES.ISZERO], w[0][1].cur(), "ev_iz_ahi"),
        "eq_lo": IsZero.configure(cs, S[ES.EQ],
                                  w[0][0].cur() - w[1][0].cur(), "ev_iz_eqlo"),
        "eq_hi": IsZero.configure(cs, S[ES.EQ],
                                  w[0][1].cur() - w[1][1].cur(), "ev_iz_eqhi"),
    }
    # LT/GT: full 256-bit compare; lhs/rhs swapped by the is_sub flag.
    # The same 32-byte gadget serves SHL/SHR as the shift-word
    # decomposition shift_lo = s0 + 256*srest (lhs=shift_lo, rhs=s0,
    # lt forced 0, limb0 and limbs 16..31 forced 0 — see ev_shift below).
    fge = is_sub.cur()
    lt_mode = S[ES.LT_GT]
    sh_mode = S[ES.SHL_SHR]
    # EXP borrows the 32-limb grid as the exponent byte decomposition
    # (lhs = exponent, rhs = 0 forces lt = 0 and limbs = the bytes)
    exp_mode = S[ES.EXP]
    # BYTE/SIGNEXTEND: lt = the index-validity bit; SAR shares the
    # SHL/SHR shift decomposition (lhs = shift_lo, rhs = s0)
    by_mode, se_mode, sar_mode = S[ES.BYTE], S[ES.SIGNEXTEND], S[ES.SAR]
    # CALL2 borrows the grid to byte-decompose the callee address word
    # (the CALL1 row's w1): to = the low 20 bytes
    call2_mode = S[ES.CALL2]
    # SLT/SGT: same grid over BIAS-ADJUSTED operands (signed_comparator
    # .rs role): x' = x + 2^255 - 2^256*msb(x_hi). The msb bits are
    # pinned by 16-limb lt gadgets (x_hi < 2^127 iff msb = 0); an
    # unpinned sign pair would let a forger fall back to the unsigned
    # compare (both biases cancel in the diff).
    slt_mode = S[ES.SLT_SGT]
    sdv_mode = S[ES.SDIV_SMOD]
    sign_mode = slt_mode + sdv_mode
    rt8 = rt8 or RangeTable.configure(cs, 8)
    ltg_sa = LtGadget.configure(cs, sign_mode, w[0][1].cur(),
                                Const(1 << 127), rt8, n_limbs=16,
                                name="ev_ltg_sa")
    ltg_sb = LtGadget.configure(cs, sign_mode, w[1][1].cur(),
                                Const(1 << 127), rt8, n_limbs=16,
                                name="ev_ltg_sb")
    s_a, s_b = one - ltg_sa.expr(), one - ltg_sb.expr()
    adj_a = comb(w[0]) + Const(1 << 255) - Const((1 << 256) % FR_MOD) * s_a
    adj_b = comb(w[1]) + Const(1 << 255) - Const((1 << 256) % FR_MOD) * s_b
    lhs = lt_mode * ((one - fge) * comb(w[0]) + fge * comb(w[1])) \
        + slt_mode * ((one - fge) * adj_a + fge * adj_b) \
        + (sh_mode + sar_mode) * w[0][0].cur() + exp_mode * comb(w[1]) \
        + (by_mode + se_mode) * comb(w[0]) \
        + call2_mode * (w[1][0].rot(-1) + Const(1 << 128) * w[1][1].rot(-1))
    rhs = lt_mode * ((one - fge) * comb(w[1]) + fge * comb(w[0])) \
        + slt_mode * ((one - fge) * adj_b + fge * adj_a) \
        + (sh_mode + sar_mode) * opn.cur() \
        + by_mode * Const(32) + se_mode * Const(31)
    ltg = LtGadget.configure(
        cs, lt_mode + slt_mode + sh_mode + exp_mode + by_mode + se_mode
        + sar_mode + call2_mode,
        lhs, rhs, rt8, n_limbs=32, name="ev_ltg")
    to_expr = Const(0)  # the CALL callee address (valid on CALL2 rows)
    for _i in range(20):
        to_expr = to_expr + Const(1 << (8 * _i)) * ltg.limbs[_i].cur()
    to_expr_r2 = Const(0)  # the same, seen from the CALL4 row
    for _i in range(20):
        to_expr_r2 = to_expr_r2 + Const(1 << (8 * _i)) * ltg.limbs[_i].rot(-2)
    cs.create_gate("ev_cmp_results", [
        S[ES.ISZERO] * (w[1][0].cur() - iz["a_lo"].expr() * iz["a_hi"].expr()),
        S[ES.ISZERO] * w[1][1].cur(),
        S[ES.EQ] * (w[2][0].cur() - iz["eq_lo"].expr() * iz["eq_hi"].expr()),
        S[ES.EQ] * w[2][1].cur(),
        S[ES.LT_GT] * (w[2][0].cur() - ltg.expr()),
        S[ES.LT_GT] * w[2][1].cur(),
        S[ES.SLT_SGT] * (opcode.cur() - Const(0x12) - is_sub.cur()),
        S[ES.SLT_SGT] * (w[2][0].cur() - ltg.expr()),
        S[ES.SLT_SGT] * w[2][1].cur(),
        # jump destinations are sub-2^128 (valid-jump scope)
        (S[ES.JUMP] + S[ES.JUMPI]) * w[0][1].cur(),
    ])
    jnz = one - iz["jc_lo"].expr() * iz["jc_hi"].expr()

    # -- byte-granular memory: MLOAD/MSTORE (unaligned), MSTORE8, MSIZE,
    # CALLDATALOAD (reference execution/{memory,msize,calldataload}.rs).
    # TPU-native design: no dynamic indexing — a 32-wide ONE-HOT mask
    # msk[j] = [j == s] (s = offset mod 32) turns the unaligned byte
    # select value[i] = src[s+i] into the degree-2 sum
    # sum_j msk[j]*src[j+i] over the 64-byte grid srb = M[wa] || M[wa+1],
    # evaluated as static vector ops over all step rows at once. --------
    ZERO_ = Const(0)
    msk = cs.advice_group("ev_msk", 32)
    srb = cs.advice_group("ev_srb", 64)
    vlb = cs.advice_group("ev_vlb", 32)
    mwa = cs.advice_column()
    mby = [cs.advice_column() for _ in range(3)]
    mws = cs.advice_column()
    mwsw = cs.advice_column()
    mqd = [cs.advice_column() for _ in range(6)]
    mqd2 = [cs.advice_column() for _ in range(6)]
    mrdl, mrdb, mrd2l, mrd2b = (cs.advice_column() for _ in range(4))
    ML, MS, M8 = S[ES.MLOAD], S[ES.MSTORE], S[ES.MSTORE8]
    MEM3 = ML + MS + M8
    # the addressing/expansion machinery also runs on ErrorOutOfGasMemory
    # rows (dynamic-OOG claims must recompute the real expansion cost),
    # except in the huge-offset variant (bigb) where the wa decomposition
    # cannot exist; mgate materializes the combined enable
    S_eogm = S[ES.ERR_OOG_MEM]
    bigb = cs.advice_column()   # ERR_OOG_MEM: huge-offset variant bit
    eg_nb = cs.advice_column()  # S_eogm * (1 - bigb), materialized
    mgate = cs.advice_column()  # MEM3 + eg_nb, materialized
    m8b = cs.advice_column()    # [opcode == MSTORE8] on mgate rows
    cs.create_gate("ev_mem_gate", [
        qs * bigb.cur() * (one - bigb.cur()),
        qs * (eg_nb.cur() - S_eogm * (one - bigb.cur())),
        qs * (mgate.cur() - MEM3 - eg_nb.cur()),
        mgate.cur() * m8b.cur() * (one - m8b.cur()),
        mgate.cur() * m8b.cur() * (opcode.cur() - Const(0x53)),
        mgate.cur() * (one - m8b.cur()) * (opcode.cur() - Const(0x51))
        * (opcode.cur() - Const(0x52)),
    ])
    MG = mgate.cur()
    mk = [msk.columns[j].cur() for j in range(32)]
    sb = [srb.columns[j].cur() for j in range(64)]
    vb = [vlb.columns[j].cur() for j in range(32)]
    s_expr = Const(0)
    msum = Const(0)
    for j in range(32):
        if j:
            s_expr = s_expr + Const(j) * mk[j]
        msum = msum + mk[j]
    mwa_rec = Const(0)
    for i in range(3):
        mwa_rec = mwa_rec + Const(1 << (8 * i)) * mby[i].cur()
    cs.create_vector_gate("ev_msk_bool",
                          (MG + S[ES.PUSH]) * msk.q() * (msk.q() - one), 32)
    cs.create_gate("ev_mem_addr", [
        MG * (msum - one),
        MG * (w[0][0].cur() - Const(32) * mwa.cur() - s_expr),
        MG * w[0][1].cur(),
        (MG + S[ES.CALLDATALOAD]) * (
            (MG * mwa.cur() + S[ES.CALLDATALOAD] * w[0][0].cur())
            - mwa_rec),
    ])
    rt8.lookup(cs, "ev_mby_range",
               [(MG + S[ES.CALLDATALOAD]) * c.cur() for c in mby])
    rt8.lookup(cs, "ev_srb_range", [MEM3 * c for c in sb])
    rt8.lookup(cs, "ev_vlb_range",
               [(MS + M8 + S[ES.CALLDATALOAD] + S[ES.PUSH]) * c
                for c in vb])

    def rec16(cells, start):  # big-endian 16 bytes -> 128-bit half
        acc = Const(0)
        for i in range(16):
            acc = acc + Const(1 << (8 * (15 - i))) * cells[start + i]
        return acc

    # word-cell <-> byte-grid bindings: MLOAD reads (w1, w2); MSTORE's
    # prev words are (w2, w4); MSTORE8's prev word is w2; the
    # store/loaded value is w1 (MSTORE/MSTORE8) via vlb
    cs.create_gate("ev_mem_bytes", [
        ML * (w[1][1].cur() - rec16(sb, 0)),
        ML * (w[1][0].cur() - rec16(sb, 16)),
        ML * (w[2][1].cur() - rec16(sb, 32)),
        ML * (w[2][0].cur() - rec16(sb, 48)),
        (MS + M8) * (w[2][1].cur() - rec16(sb, 0)),
        (MS + M8) * (w[2][0].cur() - rec16(sb, 16)),
        MS * (w[4][1].cur() - rec16(sb, 32)),
        MS * (w[4][0].cur() - rec16(sb, 48)),
        (MS + M8) * (w[1][1].cur() - rec16(vb, 0)),
        (MS + M8) * (w[1][0].cur() - rec16(vb, 16)),
    ])
    # MLOAD value halves (exprs consumed by the stack-write slot)
    mload_hi = Const(0)
    mload_lo = Const(0)
    for j in range(32):
        hi_j = Const(0)
        lo_j = Const(0)
        for i in range(16):
            hi_j = hi_j + Const(1 << (8 * (15 - i))) * sb[j + i]
            lo_j = lo_j + Const(1 << (8 * (15 - i))) * sb[j + 16 + i]
        mload_hi = mload_hi + mk[j] * hi_j
        mload_lo = mload_lo + mk[j] * lo_j
    # MSTORE new-word bytes: new[kb] = src[kb] + msk[kb-i]*(vlb[i]-src[kb])
    new_b = []
    for kb in range(64):
        e = sb[kb]
        for i in range(max(0, kb - 31), min(32, kb + 1)):
            e = e + mk[kb - i] * (vb[i] - sb[kb])
        new_b.append(e)

    def recn(byte_exprs, start):
        acc = Const(0)
        for i in range(16):
            acc = acc + Const(1 << (8 * (15 - i))) * byte_exprs[start + i]
        return acc

    mst_n0hi, mst_n0lo = recn(new_b, 0), recn(new_b, 16)
    mst_n1hi, mst_n1lo = recn(new_b, 32), recn(new_b, 48)
    # MSTORE8: single byte vlb[31] planted at position s of word wa
    n8 = [sb[kb] + mk[kb] * (vb[31] - sb[kb]) for kb in range(32)]
    m8_nhi, m8_nlo = recn(n8, 0), recn(n8, 16)

    # memory expansion (quadratic gas): words_needed = wa + 1 + [s != 0]
    # for the word ops, wa + 1 for MSTORE8; mws' = max(mws, needed);
    # gas = 3 + 3*(mws'-mws) + floor(mws'^2/512) - floor(mws^2/512)
    iz["moff"] = IsZero.configure(cs, MG, s_expr, "ev_iz_moff")
    m_needed = mwa.cur() + one \
        + (one - m8b.cur()) * (one - iz["moff"].expr())
    mlt = LtGadget.configure(cs, MG, mws.cur(), m_needed, rt8,
                             n_limbs=4, name="ev_mexp_lt")
    mqd_rec = Const(0)
    mqd2_rec = Const(0)
    for i in range(6):
        mqd_rec = mqd_rec + Const(1 << (8 * i)) * mqd[i].cur()
        mqd2_rec = mqd2_rec + Const(1 << (8 * i)) * mqd2[i].cur()
    cs.create_gate("ev_mexp", [
        MG * (mwsw.cur()
              - mlt.expr() * m_needed
              - (one - mlt.expr()) * mws.cur()),
        MG * (mws.cur() * mws.cur() - Const(512) * mqd_rec
              - mrdl.cur() - Const(256) * mrdb.cur()),
        MG * (mwsw.cur() * mwsw.cur() - Const(512) * mqd2_rec
              - mrd2l.cur() - Const(256) * mrd2b.cur()),
        MG * mrdb.cur() * (one - mrdb.cur()),
        MG * mrd2b.cur() * (one - mrd2b.cur()),
        # the real ops' gas; error rows bind og_gas instead (ev_eogm)
        MEM3 * (gc.cur() - Const(3)
                - Const(3) * (mwsw.cur() - mws.cur())
                - mqd2_rec + mqd_rec),
    ])
    rt8.lookup(cs, "ev_mexp_range", [
        MG * mrdl.cur(), MG * mrd2l.cur(),
    ] + [MG * c.cur() for c in mqd] + [MG * c.cur() for c in mqd2])
    # ErrorOutOfGasMemory: the claimed requirement og_gas is the REAL
    # static+expansion cost (normal variant), or the huge-offset floor
    # (off >= 2^24 makes the expansion cost exceed any block's gas)
    iz["eogm_hi"] = IsZero.configure(cs, S_eogm, w[0][1].cur(),
                                     "ev_iz_eogmhi")
    ltg_24 = LtGadget.configure(cs, S_eogm * bigb.cur(), w[0][0].cur(),
                                Const(1 << 24), rt8, n_limbs=16,
                                name="ev_eogm_lt24")
    cs.create_gate("ev_eogm", [
        eg_nb.cur() * (og_gas.cur() - Const(3)
                       - Const(3) * (mwsw.cur() - mws.cur())
                       - mqd2_rec + mqd_rec),
        S_eogm * bigb.cur() * (og_gas.cur() - Const(1 << 30)),
        # the huge-offset claim must be true: NOT(hi == 0 and lo < 2^24)
        S_eogm * bigb.cur() * iz["eogm_hi"].expr() * ltg_24.expr(),
    ])
    # MSIZE pushes 32 * mws (no expansion)
    cs.create_gate("ev_msize", [
        S[ES.MSIZE] * (w[0][0].cur() - Const(32) * mws.cur()),
        S[ES.MSIZE] * w[0][1].cur(),
    ])

    # CALLDATALOAD (root frame): per-byte TxTable lookups at off+i with
    # zero-padding beyond calldata length; vlb holds the value bytes
    CDL = S[ES.CALLDATALOAD]
    ib = [inr.columns[j].cur() for j in range(32)]
    cnt = Const(0)
    for j in range(32):
        cnt = cnt + ib[j]
    cs.create_vector_gate("ev_inr_bool",
                          (CDL + S[ES.PUSH]) * inr.q() * (inr.q() - one), 32)
    iz["cl32"] = IsZero.configure(cs, CDL, cnt - Const(32), "ev_iz_cl32")
    iz["cl0"] = IsZero.configure(cs, CDL, cnt, "ev_iz_cl0")
    cl_nz = one - iz["cl0"].expr()
    cdlen = w[1][0].cur()  # the CALL_DATA_LENGTH context read
    cl_lt_a = LtGadget.configure(cs, CDL, w[0][0].cur() + cnt, cdlen, rt8,
                                 n_limbs=4, name="ev_cdl_lta")
    cl_lt_b = LtGadget.configure(cs, CDL,
                                 cl_nz * (w[0][0].cur() + cnt - one),
                                 cdlen, rt8, n_limbs=4, name="ev_cdl_ltb")
    cs.create_gate("ev_cdl", [
        CDL * (dep.cur() - one),      # root frames only (tx calldata)
        CDL * w[0][1].cur(),          # offset < 2^24 via mby above
        CDL * w[1][1].cur(),
        # monotone in-range bits; out-of-range bytes are zero
        CDL * (one - iz["cl32"].expr()) * cl_lt_a.expr(),
        CDL * cl_nz * (one - cl_lt_b.expr()),
    ] + [
        CDL * ib[j + 1] * (one - ib[j]) for j in range(31)
    ] + [
        CDL * (one - ib[j]) * vb[j] for j in range(32)
    ])
    cdl_hi, cdl_lo = rec16(vb, 0), rec16(vb, 16)
    if tx_table is not None:
        from zkevm_tpu.circuits.tx_circuit import TxFieldTag
        CDATA = Const(int(TxFieldTag.CALL_DATA))
        CDLEN = Const(int(TxFieldTag.CALL_DATA_LENGTH))
        for j in range(32):
            en_j = CDL * ib[j]
            tx_table.lookup(cs, f"ev_cdl_b{j}", [
                en_j, en_j * tx_id.cur(), en_j * CDATA,
                en_j * (w[0][0].cur() + Const(j)), en_j * vb[j], ZERO_,
            ])
        tx_table.lookup(cs, "ev_cdl_len", [
            CDL, CDL * tx_id.cur(), CDL * CDLEN, Const(0),
            CDL * cdlen, ZERO_,
        ])
    else:
        cs.create_gate("ev_no_tx_table_cdl", [qs * CDL])

    # PUSH1-32 (execution/push.rs): immediates vlb[0..opn) each fetched
    # from the BytecodeTable at pc+1+i (is_code = 0), zero beyond opn;
    # value = big-endian recomposition selected by the msk one-hot over
    # the length (msk[j] = [j == opn-1])
    PU = S[ES.PUSH]
    pu_lo = Const(0)
    pu_hi = Const(0)
    for j in range(32):
        lo_j = Const(0)
        hi_j = Const(0)
        for i in range(max(0, j - 15), j + 1):
            lo_j = lo_j + Const(1 << (8 * (j - i))) * vb[i]
        for i in range(0, j - 15):
            hi_j = hi_j + Const(1 << (8 * (j - 16 - i))) * vb[i]
        pu_lo = pu_lo + mk[j] * lo_j
        pu_hi = pu_hi + mk[j] * hi_j
    cs.create_gate("ev_push", [
        PU * (msum - one),
        PU * (s_expr - opn.cur() + one),
        PU * (cnt - opn.cur()),
        PU * (w[0][0].cur() - pu_lo),
        PU * (w[0][1].cur() - pu_hi),
    ] + [
        PU * ib[j + 1] * (one - ib[j]) for j in range(31)
    ] + [
        PU * (one - ib[i]) * vb[i] for i in range(32)
    ])
    for i in range(32):
        bytecode_table.lookup(
            cs, f"ev_push_b{i}", PU * ib[i],
            code_hash.cur(), code_hash_hi.cur(), pc.cur() + Const(1 + i),
            vb[i], ZERO_,
        )

    # -- word arithmetic: MUL/DIV/MOD + SHL/SHR (execution/mul_div_mod.rs,
    # shl_shr.rs) against the WordArithTable satellite -------------------
    MDM, SHS = S[ES.MUL_DIV_MOD], S[ES.SHL_SHR]
    iz["mdm_blo"] = IsZero.configure(cs, MDM, w[1][0].cur(), "ev_iz_mdmblo")
    iz["mdm_bhi"] = IsZero.configure(cs, MDM, w[1][1].cur(), "ev_iz_mdmbhi")
    m_mul = one - m_div.cur() - m_mod.cur()
    bz = iz["mdm_blo"].expr() * iz["mdm_bhi"].expr()
    cs.create_gate("ev_mdm", [
        MDM * (opcode.cur() - Const(2) - Const(2) * m_div.cur()
               - Const(4) * m_mod.cur()),
        MDM * m_div.cur() * (one - m_div.cur()),
        MDM * m_mod.cur() * (one - m_mod.cur()),
        MDM * m_div.cur() * m_mod.cur(),
        # materialized bits (keep downstream lookup/gate degrees low)
        qs * (bzc.cur() - MDM * bz),
        qs * (waen.cur() - MDM * (m_mul + (one - m_mul) * (one - bzc.cur()))),
        # x/0 and x%0 push 0 (and skip the table lookup)
        MDM * bzc.cur() * (one - m_mul) * w[2][0].cur(),
        MDM * bzc.cur() * (one - m_mul) * w[2][1].cur(),
    ])
    # -- SDIV/SMOD (execution/sdiv_smod.rs): the unsigned division
    # identity on ABSOLUTE values (|a| = |q|*|b| + |r|, |r| < |b| in the
    # WordArithTable) plus per-half abs bindings with carry bits, signs
    # pinned by the shared msb gadgets. Cells: a=w0, b=w1, res=w2,
    # |a|=w3, |b|=w4, |res|=w5, other-abs (|r| for SDIV / |q| for
    # SMOD) = pcell[0]; is_sub = SMOD flag (opcode 0x05 + 2*f).
    SDV = sdv_mode
    fsm = is_sub.cur()
    sdv_k = [cs.advice_column() for _ in range(3)]
    srv = cs.advice_column()  # materialized result sign
    iz["sdv_blo"] = IsZero.configure(cs, SDV, w[1][0].cur(), "ev_iz_sdvblo")
    iz["sdv_bhi"] = IsZero.configure(cs, SDV, w[1][1].cur(), "ev_iz_sdvbhi")
    iz["sdv_rlo"] = IsZero.configure(cs, SDV, w[5][0].cur(), "ev_iz_sdvrlo")
    iz["sdv_rhi"] = IsZero.configure(cs, SDV, w[5][1].cur(), "ev_iz_sdvrhi")
    sdv_bz = iz["sdv_blo"].expr() * iz["sdv_bhi"].expr()
    sdv_nzres = one - iz["sdv_rlo"].expr() * iz["sdv_rhi"].expr()
    sdv_polys = [
        SDV * (opcode.cur() - Const(0x05) - Const(2) * fsm),
        # result sign: sign(a) xor sign(b) for SDIV, sign(a) for SMOD,
        # masked to zero when |res| = 0
        SDV * (srv.cur()
               - ((one - fsm) * (s_a + s_b - Const(2) * s_a * s_b)
                  + fsm * s_a) * sdv_nzres),
        # b = 0: result is 0 (and the table lookup is gated off)
        SDV * sdv_bz * w[2][0].cur(),
        SDV * sdv_bz * w[2][1].cur(),
        SDV * sdv_bz * w[5][0].cur(),
        SDV * sdv_bz * w[5][1].cur(),
    ]
    for (sg_, ab_, se_, kc) in ((w[0], w[3], s_a, sdv_k[0]),
                                (w[1], w[4], s_b, sdv_k[1]),
                                (w[2], w[5], srv.cur(), sdv_k[2])):
        sdv_polys += [
            SDV * kc.cur() * (one - kc.cur()),
            SDV * (one - se_) * (ab_[0].cur() - sg_[0].cur()),
            SDV * (one - se_) * (ab_[1].cur() - sg_[1].cur()),
            SDV * se_ * (sg_[0].cur() + ab_[0].cur()
                         - Const(1 << 128) * kc.cur()),
            SDV * se_ * (sg_[1].cur() + ab_[1].cur() + kc.cur()
                         - Const(1 << 128)),
        ]
    cs.create_gate("ev_sdiv_smod", sdv_polys)

    # SHL/SHR: opcode = 0x1B + is_sub; shift validity via the ltg
    # decomposition shift_lo = s0 + 256*srest (s0 = opn cell)
    srest = Const(0)
    for i in range(1, 16):
        srest = srest + Const(1 << (8 * (i - 1))) * ltg.limbs[i].cur()
    SARS = S[ES.SAR]
    SHX = SHS + SARS  # both decompose shift_lo = s0 + 256*srest
    iz["sh_hi"] = IsZero.configure(cs, SHX, w[0][1].cur(), "ev_iz_shhi")
    iz["sh_rest"] = IsZero.configure(cs, SHX, srest, "ev_iz_shrest")
    cs.create_gate("ev_shift", [
        SHS * (opcode.cur() - Const(0x1B) - is_sub.cur()),
        SHX * ltg.lt.cur(),
        SHX * ltg.limbs[0].cur(),
    ] + [
        SHX * ltg.limbs[i].cur() for i in range(16, 32)
    ] + [
        qs * (vcell.cur() - SHX * iz["sh_hi"].expr() * iz["sh_rest"].expr()),
        # invalid shift (>= 256): SHL/SHR result is 0
        (SHS - SHS * vcell.cur()) * w[2][0].cur(),
        (SHS - SHS * vcell.cur()) * w[2][1].cur(),
    ])
    # pow2 fixed table: w3 = 2^s0 when the shift is valid (key stored +1
    # so the disabled all-zero tuple stays out of the live entries)
    cs.lookup("ev_pow2", [
        (vcell.cur() * (opn.cur() + one), p2s.cur()),
        (vcell.cur() * w[3][0].cur(), p2lo.cur()),
        (vcell.cur() * w[3][1].cur(), p2hi.cur()),
    ])
    sdv_en_col = None
    if word_table is not None:
        fsh = is_sub.cur()
        # MUL: d=a*b; DIV: dividend = q*b + r exactly, r < b in-table;
        # MOD symmetric with q free
        word_table.lookup(
            cs, "ev_wa_mdm", waen.cur(),
            Const(2) - m_mul,
            (m_mul * w[0][0].cur() + m_div.cur() * w[2][0].cur()
             + m_mod.cur() * w[3][0].cur(),
             m_mul * w[0][1].cur() + m_div.cur() * w[2][1].cur()
             + m_mod.cur() * w[3][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
            (m_div.cur() * w[3][0].cur() + m_mod.cur() * w[2][0].cur(),
             m_div.cur() * w[3][1].cur() + m_mod.cur() * w[2][1].cur()),
            ((one - m_mul) * w[0][0].cur() + m_mul * w[2][0].cur(),
             (one - m_mul) * w[0][1].cur() + m_mul * w[2][1].cur()),
        )
        # SDIV/SMOD: |a| = |q|*|b| + |r|, |r| < |b| — the DIV-tag row
        # over the abs cells; |q| and |r| swap between w5/pcell0 by the
        # SMOD flag
        sdv_en_c = sdv_en_col = cs.advice_column()
        cs.create_gate("ev_sdv_en", [
            qs * (sdv_en_c.cur() - SDV * (one - sdv_bz))])
        qv_ = (((one - fsm) * w[5][0].cur() + fsm * pcell[0][0].cur()),
               ((one - fsm) * w[5][1].cur() + fsm * pcell[0][1].cur()))
        rv_ = ((fsm * w[5][0].cur() + (one - fsm) * pcell[0][0].cur()),
               (fsm * w[5][1].cur() + (one - fsm) * pcell[0][1].cur()))
        word_table.lookup(
            cs, "ev_wa_sdv", sdv_en_c.cur(),
            Const(2),
            qv_, (w[4][0].cur(), w[4][1].cur()), rv_,
            (w[3][0].cur(), w[3][1].cur()),
        )
        # SHL: value * 2^s0 mod 2^256; SHR: value = q*2^s0 + r exactly
        # (vcell is shared with SAR, so gate by the SHL/SHR state too)
        word_table.lookup(
            cs, "ev_wa_shift", SHS * vcell.cur(),
            one + fsh,
            ((one - fsh) * w[1][0].cur() + fsh * w[2][0].cur(),
             (one - fsh) * w[1][1].cur() + fsh * w[2][1].cur()),
            (w[3][0].cur(), w[3][1].cur()),
            (fsh * w[4][0].cur(), fsh * w[4][1].cur()),
            ((one - fsh) * w[2][0].cur() + fsh * w[1][0].cur(),
             (one - fsh) * w[2][1].cur() + fsh * w[1][1].cur()),
        )
    else:
        cs.create_gate("ev_no_word_table", [qs * (MDM + SHS + SDV)])

    # -- bitwise: AND/OR/XOR/NOT against the BitwiseTable ------------------
    AOX, NOTS = S[ES.AND_OR_XOR], S[ES.NOT]
    cs.create_gate("ev_aox", [
        AOX * (opcode.cur() - Const(0x16) - opn.cur()),
        AOX * opn.cur() * (opn.cur() - one) * (opn.cur() - Const(2)),
    ])
    if bitwise_table is not None:
        bitwise_table.lookup(
            cs, "ev_bw_aox", AOX, opn.cur() + one,
            (w[0][0].cur(), w[0][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
            (w[2][0].cur(), w[2][1].cur()),
        )
        bitwise_table.lookup(
            cs, "ev_bw_not", NOTS, Const(3),
            (w[0][0].cur(), w[0][1].cur()),
            (Const(M128), Const(M128)),
            (w[1][0].cur(), w[1][1].cur()),
        )
    else:
        cs.create_gate("ev_no_bitwise_table", [qs * (AOX + NOTS)])

    # -- modular arithmetic: ADDMOD / MULMOD over the 512 word-arith tags
    # (execution/addmod.rs, mulmod.rs) ------------------------------------
    AM, MM = S[ES.ADDMOD], S[ES.MULMOD]
    iz["n_lo"] = IsZero.configure(cs, AM + MM, w[2][0].cur(), "ev_iz_nlo")
    iz["n_hi"] = IsZero.configure(cs, AM + MM, w[2][1].cur(), "ev_iz_nhi")
    n_is_zero = iz["n_lo"].expr() * iz["n_hi"].expr()
    cs.create_gate("ev_mod_arith", [
        qs * (nzc.cur() - (AM + MM) * n_is_zero),
        qs * (am_en.cur() - AM * (one - nzc.cur())),
        qs * (mm_en.cur() - MM * (one - nzc.cur())),
        # N = 0 pushes 0
        qs * nzc.cur() * w[3][0].cur(),
        qs * nzc.cur() * w[3][1].cur(),
    ])
    if word_table is not None:
        amq, mmq = am_en.cur(), mm_en.cur()
        # (i) shared reduction: k1*N + a_red = a exactly, a_red < N
        # (reference addmod.rs/mulmod.rs both reduce a first so the
        # k2 quotient below always fits 256 bits)
        word_table.lookup(
            cs, "ev_wa_modred", amq + mmq, Const(2),
            (w[5][0].cur(), w[5][1].cur()),
            (w[2][0].cur(), w[2][1].cur()),
            (w[4][0].cur(), w[4][1].cur()),
            (w[0][0].cur(), w[0][1].cur()),
        )
        # (ii) MULMOD only: full product a_red * b = P_hi*2^256 + P_lo
        word_table.lookup(
            cs, "ev_wa_mmmul", mmq, Const(3),
            (w[4][0].cur(), w[4][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
            (Const(0), Const(0)),
            (pcell[0][0].cur(), pcell[0][1].cur()),
            (pcell[1][0].cur(), pcell[1][1].cur()),
        )
        # (iii) shared k2*N + r = e*2^256 + d with r < N in-table.
        # ADDMOD: d = a_red + b (the carry chain inlined, k0/k1 carries),
        # e = the carry bit; MULMOD: (d, e) = the product halves.
        am_dlo = w[4][0].cur() + w[1][0].cur() - k[0] * TWO128
        am_dhi = w[4][1].cur() + w[1][1].cur() + k[0] - k[1] * TWO128
        word_table.lookup(
            cs, "ev_wa_modk", amq + mmq, Const(4),
            (pcell[2][0].cur(), pcell[2][1].cur()),
            (w[2][0].cur(), w[2][1].cur()),
            (w[3][0].cur(), w[3][1].cur()),
            (amq * am_dlo + mmq * pcell[0][0].cur(),
             amq * am_dhi + mmq * pcell[0][1].cur()),
            (amq * k[1] + mmq * pcell[1][0].cur(),
             mmq * pcell[1][1].cur()),
        )
    else:
        cs.create_gate("ev_no_word_table_mod", [qs * (AM + MM)])

    # -- EXP: ExpTable lookup + exponent byte-size gas ---------------------
    # (execution/exponentiation.rs; ByteSizeGadget via the ltg byte grid)
    E = S[ES.EXP]
    iz["x_elo"] = IsZero.configure(cs, E, w[1][0].cur(), "ev_iz_xelo")
    iz["x_ehi"] = IsZero.configure(cs, E, w[1][1].cur(), "ev_iz_xehi")
    iz["x_e1"] = IsZero.configure(cs, E, w[1][0].cur() - one, "ev_iz_xe1")
    ez = iz["x_elo"].expr() * iz["x_ehi"].expr()  # exponent == 0
    eo = iz["x_e1"].expr() * iz["x_ehi"].expr()  # exponent == 1
    msb = cs.advice_group("ev_msb", 32)  # byte-size one-hot
    minv = cs.advice_column()
    MSB = [msb.columns[i].cur() for i in range(32)]
    msum = Const(0)
    size = Const(0)
    mbyte = Const(0)
    sfx = Const(0)
    run = Const(0)
    for i in range(31, -1, -1):
        sfx = sfx + MSB[i] * run  # sum of bytes ABOVE the msb position
        run = run + ltg.limbs[i].cur()
    for i in range(32):
        msum = msum + MSB[i]
        size = size + Const(i + 1) * MSB[i]
        mbyte = mbyte + MSB[i] * ltg.limbs[i].cur()
    cs.create_vector_gate("ev_msb_bool", qs * msb.q() * (msb.q() - one), 32)
    cs.create_gate("ev_exp", [
        # exactly one msb indicator unless the exponent is zero
        E * (msum - (one - ez)),
        # the indicated byte is nonzero; all bytes above it are zero
        E * (mbyte * minv.cur() - (one - ez)),
        E * sfx,
        # dynamic gas: 10 + 50 * byte_size(exponent)
        E * (gc.cur() - Const(10) - Const(50) * size),
        # special cases: e = 0 -> 1; e = 1 -> base
        E * ez * (w[2][0].cur() - one),
        E * ez * w[2][1].cur(),
        E * eo * (w[2][0].cur() - w[0][0].cur()),
        E * eo * (w[2][1].cur() - w[0][1].cur()),
        # materialized table enable: e >= 2
        qs * (vcell2.cur() - E * (one - ez) * (one - eo)),
    ])
    if exp_table is not None:
        exp_table.lookup(
            cs, "ev_exp_table", vcell2.cur(),
            (w[0][0].cur(), w[0][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
            (w[2][0].cur(), w[2][1].cur()),
        )
    else:
        cs.create_gate("ev_no_exp_table", [qs * vcell2.cur()])

    # -- BYTE / SIGNEXTEND / SAR (execution/byte.rs, signextend.rs,
    # sar.rs): byte indexing and sign propagation via pow2 + DIVMOD ------
    BY, SE = S[ES.BYTE], S[ES.SIGNEXTEND]
    TWO128c = Const(1 << 128)
    sg = carries[2].cur()  # sign bit (BEGIN_TX's k2 is free on these rows)
    iz["se_ph"] = IsZero.configure(cs, SE, w[3][1].cur(), "ev_iz_seph")
    iz["sar_sz"] = IsZero.configure(cs, SARS, opn.cur(), "ev_iz_sarsz")
    iz["sar_th"] = IsZero.configure(
        cs, SARS, pcell[1][1].cur(), "ev_iz_sarth")
    ph0 = iz["se_ph"].expr()
    sz = iz["sar_sz"].expr()
    th0 = iz["sar_th"].expr()
    se_tlo = ph0 * (TWO128c - w[3][0].cur())
    se_thi = ph0 * (TWO128c - one) + (one - ph0) * (TWO128c - w[3][1].cur())
    cs.create_gate("ev_byte_se_sar", [
        qs * (byv.cur() - BY * ltg.lt.cur()),
        qs * (sev.cur() - SE * ltg.lt.cur()),
        qs * (sarm.cur() - SARS * vcell.cur() * (one - sz)),
        # BYTE, i >= 32: result 0
        (BY - byv.cur()) * w[2][0].cur(),
        BY * w[2][1].cur(),  # result is always a single byte
        # SIGNEXTEND, i >= 31: result = x
        (SE - sev.cur()) * (w[2][0].cur() - w[1][0].cur()),
        (SE - sev.cur()) * (w[2][1].cur() - w[1][1].cur()),
        # SIGNEXTEND result: r + sign * (2^256 - 2^(8(i+1)))
        sev.cur() * (w[2][0].cur() - w[5][0].cur() - sg * se_tlo),
        sev.cur() * (w[2][1].cur() - w[5][1].cur() - sg * se_thi),
        # SAR mask cells (bb0/bb1 are free outside PUSH rows):
        # sarm rows: mask = 2^256 - 2^(256 - s0) split into halves
        sarm.cur() * (bb0.cur() - th0 * (TWO128c - pcell[1][0].cur())),
        sarm.cur() * (bb1.cur() - th0 * (TWO128c - one)
                      - (one - th0) * (TWO128c - pcell[1][1].cur())),
        # s0 = 0: mask is zero
        SARS * sz * bb0.cur(),
        SARS * sz * bb1.cur(),
        # SAR valid: result = q + sign * mask
        SARS * vcell.cur() * (w[2][0].cur() - w[4][0].cur() - sg * bb0.cur()),
        SARS * vcell.cur() * (w[2][1].cur() - w[4][1].cur() - sg * bb1.cur()),
        # SAR invalid (shift >= 256): result = sign ? all-ones : 0
        SARS * (one - vcell.cur()) * (w[2][0].cur() - sg * Const(M128)),
        SARS * (one - vcell.cur()) * (w[2][1].cur() - sg * Const(M128)),
    ])
    # byte-range + sign-split proofs for the extracted top bytes
    rt8.lookup(cs, "ev_sar_se_top", [
        (SARS * aux[0].cur() + sev.cur() * opn.cur()),
        (SARS + sev.cur()) * Const(2)
        * (SARS * aux[0].cur() + sev.cur() * opn.cur()
           - Const(128) * sg),
    ])
    # pow2 bindings
    cs.lookup("ev_pow2_byte", [
        (byv.cur() * (Const(249) - Const(8) * w[0][0].cur()), p2s.cur()),
        (byv.cur() * w[3][0].cur(), p2lo.cur()),
        (byv.cur() * w[3][1].cur(), p2hi.cur()),
    ])
    cs.lookup("ev_pow2_se1", [
        (sev.cur() * (Const(9) + Const(8) * w[0][0].cur()), p2s.cur()),
        (sev.cur() * w[3][0].cur(), p2lo.cur()),
        (sev.cur() * w[3][1].cur(), p2hi.cur()),
    ])
    cs.lookup("ev_pow2_se2", [
        (sev.cur() * (one + Const(8) * w[0][0].cur()), p2s.cur()),
        (sev.cur() * pcell[0][0].cur(), p2lo.cur()),
        (sev.cur() * pcell[0][1].cur(), p2hi.cur()),
    ])
    cs.lookup("ev_pow2_sar", [
        (sarm.cur() * (Const(257) - opn.cur()), p2s.cur()),
        (sarm.cur() * pcell[1][0].cur(), p2lo.cur()),
        (sarm.cur() * pcell[1][1].cur(), p2hi.cur()),
    ])
    if word_table is not None:
        # BYTE: x = q1 * 2^(8(31-i)) + r1 ; q1 = q2 * 256 + byte
        word_table.lookup(
            cs, "ev_wa_byte1", byv.cur(), Const(2),
            (w[4][0].cur(), w[4][1].cur()),
            (w[3][0].cur(), w[3][1].cur()),
            (pcell[0][0].cur(), pcell[0][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
        )
        word_table.lookup(
            cs, "ev_wa_byte2", byv.cur(), Const(2),
            (w[5][0].cur(), w[5][1].cur()),
            (Const(256), Const(0)),
            (w[2][0].cur(), w[2][1].cur()),
            (w[4][0].cur(), w[4][1].cur()),
        )
        # SIGNEXTEND: x = q * 2^(8(i+1)) + r ; r = b_top * 2^(8i) + r2
        word_table.lookup(
            cs, "ev_wa_se1", sev.cur(), Const(2),
            (w[4][0].cur(), w[4][1].cur()),
            (w[3][0].cur(), w[3][1].cur()),
            (w[5][0].cur(), w[5][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
        )
        word_table.lookup(
            cs, "ev_wa_se2", sev.cur(), Const(2),
            (opn.cur(), Const(0)),
            (pcell[0][0].cur(), pcell[0][1].cur()),
            (pcell[2][0].cur(), pcell[2][1].cur()),
            (w[5][0].cur(), w[5][1].cur()),
        )
        # SAR: x = b_top * 2^248 + rest (sign extract) ; x = q * 2^s0 + rem
        word_table.lookup(
            cs, "ev_wa_sar_top", SARS, Const(2),
            (aux[0].cur(), Const(0)),
            (Const(0), Const(1 << 120)),
            (pcell[0][0].cur(), pcell[0][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
        )
        word_table.lookup(
            cs, "ev_wa_sar_shr", SARS * vcell.cur(), Const(2),
            (w[4][0].cur(), w[4][1].cur()),
            (w[3][0].cur(), w[3][1].cur()),
            (pcell[2][0].cur(), pcell[2][1].cur()),
            (w[1][0].cur(), w[1][1].cur()),
        )
    else:
        cs.create_gate("ev_no_word_table_byte", [qs * (BY + SE + SARS)])

    # -- context / environment states -------------------------------------
    BCX, TCX, PCG, ACI = (S[ES.BLOCK_CTX], S[ES.TX_CTX], S[ES.PC_GAS],
                          S[ES.ACCT_INFO])
    # shared opcode -> table-tag map (opn carries the tag)
    map_en = BCX + TCX + ACI
    cs.lookup("ev_opmap", [
        (map_en * opcode.cur(), om_op.cur()),
        (map_en * opn.cur(), om_tag.cur()),
    ])
    cs.create_gate("ev_pc_gas", [
        PCG * (opcode.cur() - Const(0x58) - Const(2) * is_sub.cur()),
        PCG * (w[0][0].cur() - (one - is_sub.cur()) * pc.cur()
               - is_sub.cur() * (gas_left.cur() - Const(2))),
        PCG * w[0][1].cur(),
    ])
    XCS = S[ES.EXTCODESIZE]
    cs.create_gate("ev_acct_info", [
        (ACI + XCS) * (gc.cur() - Const(100)
                       - Const(COLD_ACCOUNT_EXTRA) * (one - warm.cur())),
    ])
    if block_table is not None:
        block_table.lookup(cs, "ev_blockctx", BCX, opn.cur(),
                           w[0][0].cur(), w[0][1].cur())
    else:
        cs.create_gate("ev_no_block_table", [qs * BCX])
    if tx_table is not None:
        tx_table.lookup(cs, "ev_txctx", [
            TCX, TCX * tx_id.cur(), TCX * opn.cur(), Const(0),
            TCX * w[0][0].cur(), TCX * w[0][1].cur(),
        ])
    else:
        cs.create_gate("ev_no_tx_table_ctx", [qs * TCX])


    # -- CALL family (execution/callop.rs + return_revert.rs) -------------
    # four-row step + Restore frame pop; see witness builder
    # _handle_call_op for the row/slot layout
    S1, S2, S3, S4 = S[ES.CALL1], S[ES.CALL2], S[ES.CALL3], S[ES.CALL4]
    RST = S[ES.RESTORE]
    hv = is_sub  # reused on CALL1: the has_value variant bit
    cc_bit, dc_bit = m_div, m_mod  # reused: is-CALL / is-DELEGATECALL
    iz["cv_lo"] = IsZero.configure(cs, S1, w[2][0].cur(), "ev_iz_cvlo")
    iz["cv_hi"] = IsZero.configure(cs, S1, w[2][1].cur(), "ev_iz_cvhi")
    vz = iz["cv_lo"].expr() * iz["cv_hi"].expr()
    F1, F2, F4, FA = (Const(c) for c in CALL_OPS)
    op_ = opcode.cur()
    st_bit1 = one - hv.cur() - dc_bit.cur()  # is-STATICCALL (on CALL1)
    cs.create_gate("ev_call_variant", [
        S1 * (op_ - F1) * (op_ - F2) * (op_ - F4) * (op_ - FA),
        S1 * cc_bit.cur() * (op_ - F1),
        S1 * dc_bit.cur() * (op_ - F4),
        S1 * (hv.cur() - cc_bit.cur()) * (op_ - F2),
        S1 * st_bit1 * (op_ - FA),
        S1 * cc_bit.cur() * (one - cc_bit.cur()),
        S1 * dc_bit.cur() * (one - dc_bit.cur()),
        S1 * dc_bit.cur() * hv.cur(),
        S1 * cc_bit.cur() * (one - hv.cur()),
        # no-value variants carry a zero value cell
        S1 * (one - hv.cur()) * w[2][0].cur(),
        S1 * (one - hv.cur()) * w[2][1].cur(),
        # vnz defined on the CALL1 row; the chain below copies it to rows
        # 2-4 (a qs-global definition would conflict with the chain)
        S1 * (vnz.cur() - (one - vz)),
        # static frames may not transfer value (tracer VmError analog)
        qs * istc.cur() * S1 * hv.cur() * vnz.cur(),
    ] + [
        # continuation rows share the opcode (bytecode re-fetch) and the
        # child id; variant bits are read by back-rotation instead
        qt * Sx * (col.rot(1) - col.cur())
        for Sx in (S1, S2, S3)
        for col in (opcode, ccid)
    ])

    # per-variant bits seen from later rows
    hv2, cc2, dc2 = hv.rot(-1), cc_bit.rot(-1), dc_bit.rot(-1)
    hv3, dc3 = hv.rot(-2), dc_bit.rot(-2)
    st3 = one - hv3 - dc3
    hv4, vnz4 = hv.rot(-3), vnz.rot(-3)
    st4 = one - hv4 - dc_bit.rot(-3)
    TWO160 = Const(1 << 160)
    cs.create_gate("ev_call_ctx_values", [
        # CALL2: caller address halves (w3) = parent self unless DELEGATE
        S2 * (one - dc2) * (w[3][0].cur() + TWO128 * w[3][1].cur()
                            - callee.cur()),
        # CALL2: child self address halves (w4)
        S2 * (w[4][0].cur() + TWO128 * w[4][1].cur()
              - (cc2 + one - hv2 - dc2) * to_expr
              - (hv2 - cc2 + dc2) * callee.cur()),
        # CALL2: code address halves (w5)
        S2 * (w[5][0].cur() + TWO128 * w[5][1].cur() - to_expr),
        # CALL3: the child VALUE word (w0): CALL/CALLCODE pass the stack
        # value, STATICCALL passes 0 (DELEGATECALL: caller value, witness)
        S3 * hv3 * (w[0][0].cur() - w[2][0].rot(-2)),
        S3 * hv3 * (w[0][1].cur() - w[2][1].rot(-2)),
        S3 * st3 * w[0][0].cur(),
        S3 * st3 * w[0][1].cur(),
        # CALL4: packed caller-self+static save halves (w0)
        S4 * (w[0][0].cur() + TWO128 * w[0][1].cur()
              - callee.cur() - TWO160 * istc.cur()),
        # CALL4: base gas = 100 + 2500*cold + 9000*value-transfer
        # (+ bb0: the memory-expansion witness; quadratic gadget pending)
        S4 * (aux[0].cur() - Const(100)
              - Const(2500) * (one - warm.rot(-2))
              - Const(9000) * hv4 * vnz4 - bb0.cur()),
    ])

    # exit rows: root -> EndTx, nested -> Restore (+ success binding)
    exq = S[ES.STOP] + S[ES.RETURN] + S[ES.REVERT]
    for e_ in ERRS:
        exq = exq + S[e_]
    iz["root"] = IsZero.configure(cs, exq, dep.cur() - one, "ev_iz_root")
    ir = iz["root"].expr()
    cs.create_gate("ev_exit_transitions", [
        qt * S[x] * (ir * allowed([ES.END_TX])
                     + (one - ir) * allowed([ES.RESTORE]))
        for x in EXITS + ERRS
    ] + [
        qt * (S[ES.STOP] + S[ES.RETURN]) * (one - ir)
        * (aux[1].rot(1) - one),
        qt * S[ES.REVERT] * (one - ir) * aux[1].rot(1),
        # static frames may not SSTORE (reference STATICCALL semantics)
        qs * istc.cur() * S[ES.SSTORE],
    ])

    # -- precompile calls: ecrecover (0x01) + sha256 (0x02) ---------------
    # (reference evm_circuit/execution/precompiles/{ecrecover,sha256}.rs)
    # Row 1 (PRE1): CALL-family stack args, same shifted layout as CALL1.
    # Row 2 (PRE_EC / PRE_SHA): warm access-list row, word-aligned io
    # (aux[2]/vcell = in/out word indices), table lookup, result push.
    P1, PEC, PSH = S[ES.PRE1], S[ES.PRE_EC], S[ES.PRE_SHA]
    PEA, PEM = S[ES.PRE_ECA], S[ES.PRE_ECM]
    PEX = PEC + PSH + PEA + PEM
    # fresh cells (several existing cells — vcell, byv, bzc, waen — are
    # qs-globally pinned by other states' materialization gates)
    pw_i = cs.advice_column()   # input base word index
    pw_o = cs.advice_column()   # output word index
    p_cnt = cs.advice_column()  # sha256 64-byte block count
    hvp = is_sub.rot(-1)  # has_value bit seen from row 2
    # the CALL1 shifted-slot convention lands the io args in the SAME
    # cells for both variants: inOff=w3, inLen=w4, outOff=pc0, outLen=pc1
    p_ioff = (w[3][0].rot(-1), w[3][1].rot(-1))
    p_iln = (w[4][0].rot(-1), w[4][1].rot(-1))
    p_ooff = (pcell[0][0].rot(-1), pcell[0][1].rot(-1))
    p_oln = (pcell[1][0].rot(-1), pcell[1][1].rot(-1))
    op_p = opcode.cur()
    FF1, FF2, FF4, FFA = (Const(c) for c in CALL_OPS)
    par_v = w[1][0].cur() - Const(27)  # ecrecover parity from the v word
    SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
    N_LO, N_HI = Const(SECP_N & M128), Const(SECP_N >> 128)
    p_slack = bb0.cur() + Const(16) * carries[0].cur()
    cs.create_gate("ev_precompile", [
        # PRE1: a CALL-family opcode with the has_value bit pinned
        P1 * (op_p - FF1) * (op_p - FF2) * (op_p - FF4) * (op_p - FFA),
        P1 * is_sub.cur() * (op_p - FF1) * (op_p - FF2),
        P1 * (one - is_sub.cur()) * (op_p - FF4) * (op_p - FFA),
        P1 * is_sub.cur() * (one - is_sub.cur()),
        # value-bearing precompile calls out of scope (builder guard)
        P1 * is_sub.cur() * w[2][0].cur(),
        P1 * is_sub.cur() * w[2][1].cur(),
        # row 2: the stack `to` word pins the precompile address
        PEC * (w[1][0].rot(-1) - one),
        PSH * (w[1][0].rot(-1) - Const(2)),
        PEA * (w[1][0].rot(-1) - Const(6)),
        PEM * (w[1][0].rot(-1) - Const(7)),
        PEX * w[1][1].rot(-1),
        # io offsets word-aligned, high halves zero
        PEX * (Const(32) * pw_i.cur() - p_ioff[0]),
        PEX * p_ioff[1],
        PEX * (Const(32) * pw_o.cur() - p_ooff[0]),
        PEX * p_ooff[1],
        # ecrecover: fixed io lengths (in 128, out 32)
        PEC * (p_iln[0] - Const(128)),
        PEC * p_iln[1],
        PEC * (p_oln[0] - Const(32)),
        PEC * p_oln[1],
        # sha256: out 32; opn = ceil(len/32) via the nibble slack;
        # byv = ceil(opn/2) = the 64-byte block count
        PSH * (p_oln[0] - Const(32)),
        PSH * p_oln[1],
        PSH * p_iln[1],
        PSH * (Const(32) * opn.cur() - p_slack - p_iln[0]),
        PSH * carries[0].cur() * (one - carries[0].cur()),
        PSH * (Const(2) * p_cnt.cur() - opn.cur())
        * (Const(2) * p_cnt.cur() - opn.cur() - one),
        # ecAdd: in 128 (4 words), out 64 (2 words); ecMul: in 96, out 64
        # (EIP-196 fixed io; the builder rejects other shapes)
        PEA * (p_iln[0] - Const(128)),
        PEM * (p_iln[0] - Const(96)),
        (PEA + PEM) * p_iln[1],
        (PEA + PEM) * (p_oln[0] - Const(64)),
        (PEA + PEM) * p_oln[1],
        # gas: warm access (100) + cost (+ aux[0] memexp witness)
        PEC * (gc.cur() - Const(3100) - aux[0].cur()),
        PSH * (gc.cur() - Const(160) - Const(12) * p_cnt.cur()
               - aux[0].cur()),
        # EIP-1108 prices: ecAdd 150, ecMul 6000 (+100 warm access)
        PEA * (gc.cur() - Const(250) - aux[0].cur()),
        PEM * (gc.cur() - Const(6100) - aux[0].cur()),
        # ecrecover: v word = 27 + parity, clean high half
        PEC * par_v * (par_v - one),
        PEC * w[1][1].cur(),
        # ecrecover: raw hash word = zr + q*n, split at 2^128
        # (q, c1 boolean; zr canonical via the sig-table lookup)
        PEC * m_div.cur() * (m_div.cur() - one),
        PEC * m_mod.cur() * (m_mod.cur() - one),
        PEC * (pcell[2][0].cur() + m_div.cur() * N_LO
               - w[0][0].cur() - m_mod.cur() * TWO128),
        PEC * (pcell[2][1].cur() + m_div.cur() * N_HI + m_mod.cur()
               - w[0][1].cur()),
        # precompile calls never appear in static-frame WRITE violation
        # scope (they do not write state), so no istc gate needed
    ])
    rt4.lookup(cs, "ev_presha_slack", [PSH * bb0.cur()])
    if sig_word_table is not None:
        sig_word_table.lookup(cs, "ev_pre_ecrecover", [
            PEC,
            PEC * pcell[2][0].cur(), PEC * pcell[2][1].cur(),  # z halves
            PEC * w[2][0].cur(), PEC * w[2][1].cur(),          # r halves
            PEC * w[3][0].cur(), PEC * w[3][1].cur(),          # s halves
            PEC * par_v,
            PEC * w[4][0].cur(), PEC * w[4][1].cur(),          # addr out
        ])
    else:
        cs.create_gate("ev_no_sig_word_table", [qs * PEC])
    if ecadd_word_table is not None:
        # input words x1,y1,x2,y2 in w[0..3]; output x3,y3 in w[4..5]
        ecadd_word_table.lookup(cs, "ev_pre_ecadd", [
            PEA,
            PEA * w[0][0].cur(), PEA * w[0][1].cur(),
            PEA * w[1][0].cur(), PEA * w[1][1].cur(),
            PEA * w[2][0].cur(), PEA * w[2][1].cur(),
            PEA * w[3][0].cur(), PEA * w[3][1].cur(),
            PEA * w[4][0].cur(), PEA * w[4][1].cur(),
            PEA * w[5][0].cur(), PEA * w[5][1].cur(),
        ])
    else:
        cs.create_gate("ev_no_ecadd_word_table", [qs * PEA])
    if ecmul_word_table is not None:
        # input point px,py in w[0..1], scalar k in w[2]; output in w[4..5]
        ecmul_word_table.lookup(cs, "ev_pre_ecmul", [
            PEM,
            PEM * w[0][0].cur(), PEM * w[0][1].cur(),
            PEM * w[1][0].cur(), PEM * w[1][1].cur(),
            PEM * w[2][0].cur(), PEM * w[2][1].cur(),
            PEM * w[4][0].cur(), PEM * w[4][1].cur(),
            PEM * w[5][0].cur(), PEM * w[5][1].cur(),
        ])
    else:
        cs.create_gate("ev_no_ecmul_word_table", [qs * PEM])
    # PRE_SHA's digest binding flows through the CopyTable (the copy
    # circuit proves memory bytes -> RLC -> Sha256Table -> digest, and
    # the event row carries the digest halves) — same chain as SHA3's
    # keccak binding; the lookup lives with the other copy lookups below.

    # -- SHA3 / COPY / LOG (CopyTable-backed states) -----------------------
    # Shared discipline: 32-byte-aligned memory-side offset (the copy
    # circuit's word-anchored layout; same restriction as MLOAD/MSTORE),
    # len < 2^128, word count opn = ceil(len/32) pinned by a [0,32) slack
    # (rt4 nibble bb0 + the carries[0] bit), memexp gas term in aux[0].
    ZERO2 = Const(0)
    S3, CP, LG = S[ES.SHA3], S[ES.COPY], S[ES.LOG]
    MC = S[ES.MCOPY]
    LGT = S[ES.LOG_TOP]
    cpl = S3 + CP + LG + MC
    # LOG topic count: the first four inr bits (free on LOG rows; the
    # CALLDATALOAD/PUSH consumers gate their own uses)
    lg_cnt = ib[0] + ib[1] + ib[2] + ib[3]
    slack = bb0.cur() + Const(16) * carries[0].cur()
    c_cd, c_cc = carries[1].cur(), carries[2].cur()
    rdc = one - c_cd - c_cc
    cs.create_gate("ev_copy_ops", [
        cpl * (w[0][0].cur() - Const(32) * w[3][0].cur()),
        cpl * w[0][1].cur(),
        cpl * w[1][1].cur(),
        cpl * (Const(32) * opn.cur() - slack - w[1][0].cur()),
        S3 * (gc.cur() - Const(30) - Const(6) * opn.cur() - aux[0].cur()),
        CP * (gc.cur() - Const(3) - Const(3) * opn.cur() - aux[0].cur()),
        MC * (gc.cur() - Const(3) - Const(3) * opn.cur() - aux[0].cur()),
        # MCOPY: src offset 32-aligned too (pcell[2] = src word index)
        MC * (w[2][0].cur() - Const(32) * pcell[2][0].cur()),
        MC * w[2][1].cur(),
        LG * (gc.cur() - Const(375) - Const(375) * lg_cnt
              - Const(8) * w[1][0].cur() - aux[0].cur()),
        # COPY opcode selection bits (CALLDATACOPY/CODECOPY/RETURNDATACOPY)
        CP * c_cd * c_cc,
        CP * (opcode.cur() - Const(0x37) * c_cd - Const(0x39) * c_cc
              - Const(0x3E) * rdc),
        CP * w[2][1].cur(),  # src offset < 2^128
        # LOG0-4: topic count bound through the inr bit prefix
        LG * (opcode.cur() - Const(0xA0) - lg_cnt),
        qs * istc.cur() * LG,
    ] + [
        LG * ib[i] * (one - ib[i]) for i in range(4)
    ] + [
        LG * ib[i + 1] * (one - ib[i]) for i in range(3)
    ] + [
        # a continuation row shares the opcode; topic-less LOGs skip it
        qt * LG * ib[0] * (opcode.rot(1) - opcode.cur()),
        # LOG: the emitting account address split into halves for TX_LOG
        LG * (callee.cur() - w[2][0].cur() - TWO128 * w[2][1].cur()),
    ])
    rt4.lookup(cs, "ev_copy_slack", [cpl * bb0.cur()])

    if copy_table is not None:
        MEMC, RLCC, TXLC, CDC, BCC, RDC_ = (Const(1), Const(5), Const(4),
                                            Const(3), Const(2), Const(6))
        copy_table.lookup(cs, "ev_sha3_copy", [
            S3, S3 * MEMC, S3 * RLCC, S3 * cid.cur(), ZERO2,
            S3 * cid.cur(), ZERO2, S3 * w[0][0].cur(), ZERO2,
            S3 * w[1][0].cur(), S3 * (rwc.cur() + Const(2)),
            S3 * opn.cur(), S3 * w[2][0].cur(), S3 * w[2][1].cur(),
        ])
        t_src_cp = Const(6) - Const(3) * c_cd - Const(4) * c_cc
        sid_lo = (c_cd * tx_id.cur() + c_cc * code_hash.cur()
                  + rdc * cid.cur())
        sid_hi = c_cc * code_hash_hi.cur()
        copy_table.lookup(cs, "ev_copy_copy", [
            CP, CP * t_src_cp, CP * MEMC, CP * sid_lo, CP * sid_hi,
            CP * cid.cur(), ZERO2, CP * w[0][0].cur(),
            CP * w[2][0].cur(), CP * w[1][0].cur(),
            CP * (rwc.cur() + Const(3)), CP * opn.cur(), ZERO2, ZERO2,
        ])
        # (the CopyTable's rwc_first carries the DST-write start; the
        # src reads occupy [rwc+3, rwc+3+opn) and the circuit pins
        # rwc_w = rwc_s + n_words on mm anchors)
        copy_table.lookup(cs, "ev_mcopy_copy", [
            MC, MC * MEMC, MC * MEMC, MC * cid.cur(), ZERO2,
            MC * cid.cur(), ZERO2, MC * w[0][0].cur(),
            MC * w[2][0].cur(), MC * w[1][0].cur(),
            MC * (rwc.cur() + Const(3) + opn.cur()), MC * opn.cur(),
            ZERO2, ZERO2,
        ])
        # creation-frame RETURN: memory bytes -> the deposited bytecode
        # entry (w4 = keccak(deposited); nonzero length only). vnz is
        # free on RETURN rows (CALL1 pins it elsewhere); pin it to
        # [ret_len != 0] and pin w4 to the EMPTY hash when len = 0.
        R_ic = S[ES.RETURN] * icf.cur()
        iz["dep_lo"] = IsZero.configure(cs, R_ic, w[1][0].cur(),
                                        "ev_iz_deplo")
        iz["dep_hi"] = IsZero.configure(cs, R_ic, w[1][1].cur(),
                                        "ev_iz_dephi")
        from zkevm_tpu.etypes.state import EMPTY_CODE_HASH as _ECH2

        cs.create_gate("ev_return_deposit", [
            R_ic * (vnz.cur()
                    - (one - iz["dep_lo"].expr() * iz["dep_hi"].expr())),
            R_ic * (one - vnz.cur()) * (w[4][0].cur()
                                        - Const(_ECH2 & M128)),
            R_ic * (one - vnz.cur()) * (w[4][1].cur()
                                        - Const(_ECH2 >> 128)),
        ])
        RDEP = S[ES.RETURN] * icf.cur() * vnz.cur()
        copy_table.lookup(cs, "ev_return_deposit_copy", [
            RDEP, RDEP * MEMC, RDEP * BCC, RDEP * cid.cur(), ZERO2,
            RDEP * w[4][0].cur(), RDEP * w[4][1].cur(),
            RDEP * w[0][0].cur(), ZERO2, RDEP * w[1][0].cur(),
            RDEP * (rwc.cur() + Const(2)), RDEP * opn.cur(),
            ZERO2, ZERO2,
        ])
        copy_table.lookup(cs, "ev_log_copy", [
            LG, LG * MEMC, LG * TXLC, LG * cid.cur(), ZERO2,
            LG * tx_id.cur(), LG * aux[1].cur(), LG * w[0][0].cur(),
            LG * aux[1].cur(), LG * w[1][0].cur(),
            LG * (rwc.cur() + Const(2) + lg_cnt), LG * opn.cur(),
            ZERO2, ZERO2,
        ])
        # sha256 precompile input: memory -> RLC_SHA event; the event's
        # digest halves (sha256-table-bound in the copy circuit) must
        # equal the output memory word w[4]
        SHAC = Const(7)  # CopyDataType.RLC_SHA
        copy_table.lookup(cs, "ev_presha_copy", [
            PSH, PSH * MEMC, PSH * SHAC, PSH * cid.cur(), ZERO2,
            PSH * cid.cur(), ZERO2, PSH * p_ioff[0], ZERO2,
            PSH * p_iln[0], PSH * (rwc.cur() + one),
            PSH * opn.cur(), PSH * w[4][0].cur(), PSH * w[4][1].cur(),
        ])

    # -- per-state step transitions --------------------------------------
    def trans(cell, nxt_exprs: dict, default):
        """cell(+1) = sum_s sel_s * expr_s."""
        acc = Const(0)
        for s in range(NSTATES):
            e = nxt_exprs.get(ES(s), default(ES(s)))
            acc = acc + S[s] * e
        return qt * (cell.rot(1) - acc)

    CONT = (ES.CALL1, ES.CALL2, ES.CALL3)  # continuation rows: keep state
    ps_restore = warm.cur()  # packed parent-static bit on the Restore row
    pc_next = {ES.BEGIN_TX: Const(0), ES.END_TX: Const(0), ES.END_BLOCK: Const(0),
               ES.PUSH: pc.cur() + one + opn.cur(),
               ES.JUMP: w[0][0].cur(),
               ES.JUMPI: jnz * w[0][0].cur() + (one - jnz) * (pc.cur() + one),
               ES.CALL4: Const(0),  # child starts at pc 0
               ES.LOG: pc.cur() + one - inr.columns[0].cur(),
               ES.LOG_TOP: pc.cur() + one,
               ES.RESTORE: w[3][0].cur()}  # saved resume pc
    sp_next = {ES.BEGIN_TX: Const(STACK_CAP), ES.END_TX: Const(STACK_CAP),
               ES.END_BLOCK: Const(STACK_CAP),
               ES.LOG_TOP: sp.cur() + opcode.cur() - Const(0xA0),
               ES.CALL4: Const(STACK_CAP),  # child starts empty
               ES.RESTORE: w[4][0].cur()}  # saved resume sp
    for x in CONT:
        pc_next[x] = pc.cur()
        sp_next[x] = sp.cur()
    # precompile rows: PRE1 is a continuation; row 2 resumes the parent
    # at pc+1 with sp popped to the result slot (sp + 5 + has_value)
    pc_next[ES.PRE1] = pc.cur()
    sp_next[ES.PRE1] = sp.cur()
    pc_next[ES.PRE_EC] = pc.cur() + one
    pc_next[ES.PRE_SHA] = pc.cur() + one
    sp_next[ES.PRE_EC] = sp.cur() + Const(5) + is_sub.rot(-1)
    sp_next[ES.PRE_SHA] = sp.cur() + Const(5) + is_sub.rot(-1)
    for _ps in (ES.PRE_ECA, ES.PRE_ECM):
        pc_next[_ps] = pc.cur() + one
        sp_next[_ps] = sp.cur() + Const(5) + is_sub.rot(-1)
    for x in EXITS + ERRS:  # next row (EndTx or Restore) re-binds everything
        pc_next[x] = pc.rot(1)
        sp_next[x] = sp.rot(1)
    for s, (op, cost, dsp, _) in OP_STATES.items():
        if s not in pc_next:
            pc_next[s] = pc.cur() + one
        if s not in sp_next:
            sp_next[s] = sp.cur() + Const(dsp) if dsp >= 0 else sp.cur() - Const(-dsp)
    # at EndTx the next row is a fresh BeginTx: its own gate re-binds
    # code_hash/callee from the account read, and gas restarts, so those
    # chains are FREED across the boundary (next = its own rot(1) makes
    # the EndTx term cancel). Exit rows are likewise freed into the
    # Restore/EndTx row, which re-binds from the saved context reads.
    def freed(cell, extra):
        d = {ES.END_TX: cell.rot(1)}
        for x in EXITS:
            d[x] = cell.rot(1)
        d.update(extra)
        return d

    child_gas = opn.cur() + Const(2300) * hv4 * vnz4  # fwd + stipend
    cs.create_gate("ev_step_next", [
        trans(pc, pc_next, lambda s: pc.cur()),
        trans(sp, sp_next, lambda s: sp.cur()),
        trans(gas_left, freed(gas_left, {
            ES.CALL1: gas_left.cur(), ES.CALL2: gas_left.cur(),
            ES.CALL3: gas_left.cur(),
            ES.CALL4: child_gas,
            ES.PRE1: gas_left.cur(),
            # resume gas = saved base + the child leftover this row holds
            ES.RESTORE: gas_left.cur() + w[5][0].cur(),
        }), lambda s: gas_left.cur() - gc.cur()),
        trans(rwc, {ES.CALL1: rwc.cur() + Const(6) + hv.cur(),
                    ES.PRE1: rwc.cur() + Const(6) + hv.cur(),
                    ES.PRE_SHA: rwc.cur() + Const(3) + opn.cur(),
                    # error rows: own reads + the journal's compensating
                    # writes emitted before EndTx (opn, as with REVERT)
                    ES.ERR_INVALID_JUMP: rwc.cur() + one
                    + (opcode.cur() - Const(0x56)) + opn.cur(),
                    ES.ERR_STACK: rwc.cur() + opn.cur(),
                    ES.ERR_INVALID_OP: rwc.cur() + opn.cur(),
                    ES.ERR_OOG: rwc.cur() + opn.cur(),
                    ES.ERR_WRITE_PROT: rwc.cur() + opn.cur(),
                    ES.ERR_OOG_MEM: rwc.cur() + one + opn.cur(),
                    ES.SHA3: rwc.cur() + Const(3) + opn.cur(),
                    ES.COPY: rwc.cur() + Const(3) + opn.cur(),
                    ES.MCOPY: rwc.cur() + Const(3)
                    + Const(2) * opn.cur(),
                    # creation-frame RETURN: + opn deposit word reads
                    # + the CODE_HASH write
                    ES.RETURN: rwc.cur() + Const(2)
                    + icf.cur() * (opn.cur() + one),
                    ES.LOG: rwc.cur() + Const(2)
                    + (opcode.cur() - Const(0xA0)) + opn.cur() + one
                    + (one - inr.columns[0].cur()) * w[1][0].cur(),
                    ES.LOG_TOP: rwc.cur() + opcode.cur() - Const(0xA0)
                    + w[1][0].rot(-1),
                    # REVERT: the journal's compensating writes are
                    # emitted right after the frame's rows (builder
                    # _revert_to); opn carries their count. Bounded by
                    # the state circuit's total-rws binding; an explicit
                    # reversible-write counter chain is a later item.
                    ES.REVERT: rwc.cur() + Const(2) + opn.cur()},
              lambda s: rwc.cur() + Const(NRW[s])),
        trans(code_hash, freed(code_hash, {
            ES.CALL4: w[1][0].cur(), ES.RESTORE: w[0][0].cur()}),
              lambda s: code_hash.cur()),
        trans(code_hash_hi, freed(code_hash_hi, {
            ES.CALL4: w[1][1].cur(), ES.RESTORE: w[0][1].cur()}),
              lambda s: code_hash_hi.cur()),
        trans(callee, freed(callee, {
            ES.CALL4: (cc_bit.rot(-3) + one - hv4 - dc_bit.rot(-3))
            * to_expr_r2
            + (hv4 - cc_bit.rot(-3) + dc_bit.rot(-3)) * callee.cur(),
            ES.RESTORE: w[1][0].cur() + TWO128 * w[1][1].cur()
            - TWO160 * ps_restore,
        }), lambda s: callee.cur()),
        trans(tx_id, {ES.END_TX: tx_id.cur() + one},
              lambda s: tx_id.cur()),
        # root call ids are sound without an explicit chain: every slot
        # keyed by cid must hit a real RwTable row, so a forged cid has
        # no matching rows; freed across the tx boundary
        trans(cid, freed(cid, {ES.CALL4: ccid.cur(),
                               ES.RESTORE: w[2][0].cur()}),
              lambda s: cid.cur()),
        # call depth and the static flag
        trans(dep, {ES.END_TX: Const(1), ES.CALL4: dep.cur() + one,
                    ES.RESTORE: dep.cur() - one},
              lambda s: dep.cur()),
        # memory word count: constrained next-value on the byte-granular
        # memory states, witnessed (mwsw) on the other memory-touching
        # states until their own expansion gadgets land, 0 for a fresh
        # frame, restored from the packed STACK_POINTER save's high half
        trans(mws, dict(
            [(x, mws.rot(1)) for x in EXITS + ERRS]
            + [(x, mwsw.cur()) for x in
               (ES.MLOAD, ES.MSTORE, ES.MSTORE8, ES.SHA3, ES.COPY,
                ES.LOG, ES.MCOPY, ES.CALL1, ES.PRE1)]
            + [(ES.BEGIN_TX, Const(0)), (ES.END_TX, mws.rot(1)),
               (ES.END_BLOCK, Const(0)), (ES.CALL4, Const(0)),
               (ES.RESTORE, w[4][1].cur())]),
              lambda s: mws.cur()),
        trans(istc, {ES.END_TX: Const(0),
                     ES.CALL4: istc.cur() + st4 - istc.cur() * st4,
                     ES.RESTORE: ps_restore},
              lambda s: istc.cur()),
        # creation-frame flag: freed across tx boundaries (the next
        # BeginTx re-binds it from the TxTable); CALL children and
        # Restore resume into non-create frames (create frames making
        # calls are circuit-tier out of scope this round)
        trans(icf, {ES.END_TX: icf.rot(1), ES.END_BLOCK: icf.rot(1),
                    ES.CALL4: Const(0), ES.RESTORE: Const(0)},
              lambda s: icf.cur()),
    ])
    cs.create_gate("ev_icf_bool", [qs * icf.cur() * (one - icf.cur())])

    # -- RW lookup slots --------------------------------------------------
    # spec per (state, slot): field exprs after `enabled`
    ZERO = Const(0)
    CC, ACC, STK, MEM, STO, ALS, RFD = (
        int(Target.CALL_CONTEXT), int(Target.ACCOUNT), int(Target.STACK),
        int(Target.MEMORY), int(Target.STORAGE),
        int(Target.TX_ACCESS_LIST_STORAGE), int(Target.TX_REFUND),
    )

    def stack_rd(addr, v):
        return [ZERO, Const(STK), cid.cur(), addr, ZERO, ZERO,
                v[0], v[1], v[0], v[1]]

    def stack_wr(addr, v, p):
        return [one, Const(STK), cid.cur(), addr, ZERO, ZERO,
                v[0], v[1], p[0], p[1]]

    def wc(i):  # word cell exprs
        return (w[i][0].cur(), w[i][1].cur())

    def pc_(i):
        return (pcell[i][0].cur(), pcell[i][1].cur())

    slots: list[list] = [[] for _ in range(NSLOTS)]

    def use(state, i, fields, en=None):
        """fields: [is_write, tag, id, address, field_tag, storage_key,
        vlo, vhi, plo, phi] (rw_counter added here). `en` (0/1 expr)
        gates the whole slot within the state (variant-dependent slots);
        every field is multiplied so a disabled slot is the zero tuple."""
        if en is None:
            slots[i].append((state, [one, rwc.cur() + Const(i)] + fields))
        else:
            slots[i].append(
                (state,
                 [en, en * (rwc.cur() + Const(i))] + [en * f for f in fields])
            )

    # BeginTx (order mirrors builder.handle_tx)
    use(ES.BEGIN_TX, 0, [ZERO, Const(CC), cid.cur(), ZERO,
                         Const(int(CallContextField.CALLER_ADDRESS)), ZERO,
                         *wc(1), *wc(1)])
    use(ES.BEGIN_TX, 1, [ZERO, Const(CC), cid.cur(), ZERO,
                         Const(int(CallContextField.CALLEE_ADDRESS)), ZERO,
                         *wc(2), *wc(2)])
    use(ES.BEGIN_TX, 2, [ZERO, Const(CC), cid.cur(), ZERO,
                         Const(int(CallContextField.VALUE)), ZERO,
                         *wc(0), *wc(0)])
    use(ES.BEGIN_TX, 3, [one, Const(ACC), ZERO, comb(w[1]),
                         Const(int(AccountField.NONCE)), ZERO,
                         aux[0].cur() + one, ZERO, aux[0].cur(), ZERO])
    # slot 4: callee CODE_HASH read — or, for creation txs (icf), the
    # new account's EIP-161 NONCE write (0 -> 1); w5 then carries the
    # init-code hash, bound by the TX_CALLDATA->BYTECODE copy lookup
    icb = icf.cur()
    use(ES.BEGIN_TX, 4, [
        icb, Const(ACC), ZERO, comb(w[2]),
        Const(int(AccountField.CODE_HASH))
        + icb * Const(int(AccountField.NONCE)
                      - int(AccountField.CODE_HASH)), ZERO,
        (one - icb) * w[5][0].cur() + icb,
        (one - icb) * w[5][1].cur(),
        (one - icb) * w[5][0].cur(),
        (one - icb) * w[5][1].cur(),
    ])
    use(ES.BEGIN_TX, 5, [one, Const(ACC), ZERO, comb(w[1]),
                         Const(int(AccountField.BALANCE)), ZERO,
                         *wc(3), caller_prev_lo, caller_prev_hi])
    use(ES.BEGIN_TX, 6, [one, Const(ACC), ZERO, comb(w[2]),
                         Const(int(AccountField.BALANCE)), ZERO,
                         callee_new_lo, callee_new_hi, *wc(4)])
    # EndTx: final refund read
    use(ES.END_TX, 0, [ZERO, Const(RFD), tx_id.cur(), ZERO, ZERO, ZERO,
                       aux[1].cur(), ZERO, aux[1].cur(), ZERO])
    # stack ops (CC reads used value_prev = value; first reads of a CALL
    # CONTEXT group keep builder's value_prev = value convention)
    spc = sp.cur()
    use(ES.PUSH, 0, stack_wr(spc - one, wc(0), pc_(0)))
    use(ES.POP, 0, stack_rd(spc, wc(0)))
    use(ES.ADD_SUB, 0, stack_rd(spc, wc(0)))
    use(ES.ADD_SUB, 1, stack_rd(spc + one, wc(1)))
    use(ES.ADD_SUB, 2, stack_wr(spc + one, wc(2), wc(1)))
    use(ES.DUP, 0, stack_rd(spc + opn.cur(), wc(0)))
    use(ES.DUP, 1, stack_wr(spc - one, wc(0), pc_(1)))
    use(ES.SWAP, 0, stack_rd(spc, wc(0)))
    use(ES.SWAP, 1, stack_rd(spc + opn.cur(), wc(1)))
    use(ES.SWAP, 2, stack_wr(spc + opn.cur(), wc(0), wc(1)))
    use(ES.SWAP, 3, stack_wr(spc, wc(1), wc(0)))
    # byte-granular memory: both adjacent words are always touched by the
    # word ops (aligned MSTORE's second write is an identity write)
    use(ES.MLOAD, 0, stack_rd(spc, wc(0)))
    use(ES.MLOAD, 1, [ZERO, Const(MEM), cid.cur(), mwa.cur(), ZERO, ZERO,
                      *wc(1), *wc(1)])
    use(ES.MLOAD, 2, [ZERO, Const(MEM), cid.cur(), mwa.cur() + one,
                      ZERO, ZERO, *wc(2), *wc(2)])
    use(ES.MLOAD, 3, stack_wr(spc, (mload_lo, mload_hi), wc(0)))
    use(ES.MSTORE, 0, stack_rd(spc, wc(0)))
    use(ES.MSTORE, 1, stack_rd(spc + one, wc(1)))
    use(ES.MSTORE, 2, [one, Const(MEM), cid.cur(), mwa.cur(), ZERO, ZERO,
                       mst_n0lo, mst_n0hi, *wc(2)])
    use(ES.MSTORE, 3, [one, Const(MEM), cid.cur(), mwa.cur() + one,
                       ZERO, ZERO, mst_n1lo, mst_n1hi, *wc(4)])
    use(ES.MSTORE8, 0, stack_rd(spc, wc(0)))
    use(ES.MSTORE8, 1, stack_rd(spc + one, wc(1)))
    use(ES.MSTORE8, 2, [one, Const(MEM), cid.cur(), mwa.cur(), ZERO, ZERO,
                        m8_nlo, m8_nhi, *wc(2)])
    use(ES.MSIZE, 0, stack_wr(spc - one, wc(0), pc_(0)))
    use(ES.CALLDATALOAD, 0, [
        ZERO, Const(CC), cid.cur(), ZERO,
        Const(int(CallContextField.CALL_DATA_LENGTH)), ZERO,
        w[1][0].cur(), ZERO, w[1][0].cur(), ZERO])
    use(ES.CALLDATALOAD, 1, stack_rd(spc, wc(0)))
    use(ES.CALLDATALOAD, 2, stack_wr(spc, (cdl_lo, cdl_hi), wc(0)))
    # SLOAD: key read, access-list write (is_warm in value_prev),
    # storage read, value push
    use(ES.SLOAD, 0, stack_rd(spc, wc(0)))
    use(ES.SLOAD, 1, [one, Const(ALS), tx_id.cur(), callee.cur(), ZERO,
                      comb(w[0]), one, ZERO, warm.cur(), ZERO])
    use(ES.SLOAD, 2, [ZERO, Const(STO), tx_id.cur(), callee.cur(), ZERO,
                      comb(w[0]), *wc(1), *wc(1)])
    use(ES.SLOAD, 3, stack_wr(spc, wc(1), wc(0)))
    # SSTORE: key+value reads, access-list write, refund write, storage write
    use(ES.SSTORE, 0, stack_rd(spc, wc(0)))
    use(ES.SSTORE, 1, stack_rd(spc + one, wc(1)))
    use(ES.SSTORE, 2, [one, Const(ALS), tx_id.cur(), callee.cur(), ZERO,
                       comb(w[0]), one, ZERO, warm.cur(), ZERO])
    use(ES.SSTORE, 3, [one, Const(RFD), tx_id.cur(), ZERO, ZERO, ZERO,
                       aux[1].cur(), ZERO, aux[2].cur(), ZERO])
    use(ES.SSTORE, 4, [one, Const(STO), tx_id.cur(), callee.cur(), ZERO,
                       comb(w[0]), *wc(1), *pc_(2)])

    use(ES.JUMP, 0, stack_rd(spc, wc(0)))
    use(ES.JUMPI, 0, stack_rd(spc, wc(0)))
    use(ES.JUMPI, 1, stack_rd(spc + one, wc(1)))
    use(ES.ISZERO, 0, stack_rd(spc, wc(0)))
    use(ES.ISZERO, 1, stack_wr(spc, wc(1), wc(0)))
    for s_cmp in (ES.EQ, ES.LT_GT, ES.SLT_SGT, ES.MUL_DIV_MOD,
                  ES.SDIV_SMOD, ES.SHL_SHR, ES.AND_OR_XOR):
        use(s_cmp, 0, stack_rd(spc, wc(0)))
        use(s_cmp, 1, stack_rd(spc + one, wc(1)))
        use(s_cmp, 2, stack_wr(spc + one, wc(2), wc(1)))
    use(ES.NOT, 0, stack_rd(spc, wc(0)))
    use(ES.NOT, 1, stack_wr(spc, wc(1), wc(0)))
    for s_mod in (ES.ADDMOD, ES.MULMOD):
        use(s_mod, 0, stack_rd(spc, wc(0)))
        use(s_mod, 1, stack_rd(spc + one, wc(1)))
        use(s_mod, 2, stack_rd(spc + Const(2), wc(2)))
        use(s_mod, 3, stack_wr(spc + Const(2), wc(3), wc(2)))
    for s_bin in (ES.EXP, ES.BYTE, ES.SIGNEXTEND, ES.SAR):
        use(s_bin, 0, stack_rd(spc, wc(0)))
        use(s_bin, 1, stack_rd(spc + one, wc(1)))
        use(s_bin, 2, stack_wr(spc + one, wc(2), wc(1)))
    # -- CALL family (see _handle_call_op's row/slot layout) --------------
    ALAT = int(Target.TX_ACCESS_LIST_ACCOUNT)
    hvc = hv.cur()
    # row 1: stack args; slots shift by has_value (gas, to, [value],
    # inOff, inLen, retOff, retLen)
    use(ES.CALL1, 0, stack_rd(spc, wc(0)))
    use(ES.CALL1, 1, stack_rd(spc + one, wc(1)))
    arg = [wc(2), wc(3), wc(4), pc_(0), pc_(1)]
    for kk in range(2, 6):
        v = tuple(hvc * arg[kk - 2][j] + (one - hvc) * arg[kk - 1][j]
                  for j in range(2))
        use(ES.CALL1, kk, stack_rd(spc + Const(kk), v))
    use(ES.CALL1, 6, stack_rd(spc + Const(6), pc_(1)), en=hvc)
    # PRE1: same shifted stack-arg layout as CALL1
    use(ES.PRE1, 0, stack_rd(spc, wc(0)))
    use(ES.PRE1, 1, stack_rd(spc + one, wc(1)))
    argp = [wc(2), wc(3), wc(4), pc_(0), pc_(1)]
    for kk in range(2, 6):
        v = tuple(hvc * argp[kk - 2][j] + (one - hvc) * argp[kk - 1][j]
                  for j in range(2))
        use(ES.PRE1, kk, stack_rd(spc + Const(kk), v))
    use(ES.PRE1, 6, stack_rd(spc + Const(6), pc_(1)), en=hvc)
    # PRE_EC: warm access + 4 input words + output word + result push
    use(ES.PRE_EC, 0, [one, Const(ALAT), tx_id.cur(), one, ZERO, ZERO,
                       one, ZERO, one, ZERO])
    for kk in range(4):
        use(ES.PRE_EC, 1 + kk,
            [ZERO, Const(MEM), cid.cur(), pw_i.cur() + Const(kk),
             ZERO, ZERO, *wc(kk), *wc(kk)])
    use(ES.PRE_EC, 5, [one, Const(MEM), cid.cur(), pw_o.cur(),
                       ZERO, ZERO, *wc(4), *pc_(0)])
    use(ES.PRE_EC, 6, stack_wr(spc + Const(5) + hvp, (one, ZERO),
                               pc_(1)))
    # PRE_ECA (ecAdd): warm + 4 input word reads + 2 output writes + result
    use(ES.PRE_ECA, 0, [one, Const(ALAT), tx_id.cur(), Const(6), ZERO,
                        ZERO, one, ZERO, one, ZERO])
    for kk in range(4):
        use(ES.PRE_ECA, 1 + kk,
            [ZERO, Const(MEM), cid.cur(), pw_i.cur() + Const(kk),
             ZERO, ZERO, *wc(kk), *wc(kk)])
    use(ES.PRE_ECA, 5, [one, Const(MEM), cid.cur(), pw_o.cur(),
                        ZERO, ZERO, *wc(4), *pc_(0)])
    use(ES.PRE_ECA, 6, [one, Const(MEM), cid.cur(), pw_o.cur() + one,
                        ZERO, ZERO, *wc(5), *pc_(1)])
    use(ES.PRE_ECA, 7, stack_wr(spc + Const(5) + hvp, (one, ZERO),
                                pc_(2)))
    # PRE_ECM (ecMul): warm + 3 input word reads + 2 output writes + result
    use(ES.PRE_ECM, 0, [one, Const(ALAT), tx_id.cur(), Const(7), ZERO,
                        ZERO, one, ZERO, one, ZERO])
    for kk in range(3):
        use(ES.PRE_ECM, 1 + kk,
            [ZERO, Const(MEM), cid.cur(), pw_i.cur() + Const(kk),
             ZERO, ZERO, *wc(kk), *wc(kk)])
    use(ES.PRE_ECM, 4, [one, Const(MEM), cid.cur(), pw_o.cur(),
                        ZERO, ZERO, *wc(4), *pc_(0)])
    use(ES.PRE_ECM, 5, [one, Const(MEM), cid.cur(), pw_o.cur() + one,
                        ZERO, ZERO, *wc(5), *pc_(1)])
    use(ES.PRE_ECM, 6, stack_wr(spc + Const(5) + hvp, (one, ZERO),
                                pc_(2)))
    # PRE_SHA: warm access; the opn input-word reads live in the copy
    # event's rwc range; then output word + result at rwc+1+opn/+2+opn
    use(ES.PRE_SHA, 0, [one, Const(ALAT), tx_id.cur(), Const(2),
                        ZERO, ZERO, one, ZERO, one, ZERO])
    slots[1].append((ES.PRE_SHA, [
        one, rwc.cur() + one + opn.cur(),
        one, Const(MEM), cid.cur(), pw_o.cur(), ZERO, ZERO,
        *wc(4), *pc_(0)]))
    slots[2].append((ES.PRE_SHA, [
        one, rwc.cur() + Const(2) + opn.cur(),
        one, Const(STK), cid.cur(), spc + Const(5) + hvp, ZERO, ZERO,
        one, ZERO, *pc_(1)]))
    # row 2: access list + transfer + first child ctx
    x_lo = cc_bit.rot(-1) * w[2][0].rot(-1)
    x_hi = cc_bit.rot(-1) * w[2][1].rot(-1)
    use(ES.CALL2, 0, [one, Const(ALAT), tx_id.cur(), to_expr, ZERO, ZERO,
                      one, ZERO, warm.cur(), ZERO])
    use(ES.CALL2, 1, [one, Const(ACC), ZERO, callee.cur(),
                      Const(int(AccountField.BALANCE)), ZERO,
                      *wc(0),
                      w[0][0].cur() + x_lo - k[0] * TWO128,
                      w[0][1].cur() + x_hi + k[0]])
    use(ES.CALL2, 2, [one, Const(ACC), ZERO,
                      cc_bit.rot(-1) * to_expr
                      + (one - cc_bit.rot(-1)) * callee.cur(),
                      Const(int(AccountField.BALANCE)), ZERO,
                      *wc(1),
                      w[1][0].cur() - x_lo + k[1] * TWO128,
                      w[1][1].cur() - x_hi - k[1]])

    def ctxw(fld, vlo, vhi=ZERO):
        return [one, Const(CC), ccid.cur(), ZERO, Const(int(fld)), ZERO,
                vlo, vhi, vlo, vhi]

    use(ES.CALL2, 3, ctxw(CallContextField.CALLER_ID, cid.cur()))
    use(ES.CALL2, 4, ctxw(CallContextField.CALLER_ADDRESS,
                          w[3][0].cur(), w[3][1].cur()))
    use(ES.CALL2, 5, ctxw(CallContextField.CALLEE_ADDRESS,
                          w[4][0].cur(), w[4][1].cur()))
    use(ES.CALL2, 6, ctxw(CallContextField.CODE_ADDRESS,
                          w[5][0].cur(), w[5][1].cur()))
    # row 3: remaining child ctx + resume pc/sp saves
    use(ES.CALL3, 0, ctxw(CallContextField.VALUE,
                          w[0][0].cur(), w[0][1].cur()))
    use(ES.CALL3, 1, ctxw(CallContextField.CALL_DATA_LENGTH,
                          w[4][0].rot(-2)))
    use(ES.CALL3, 2, ctxw(CallContextField.IS_STATIC,
                          istc.cur() + st3 - istc.cur() * st3))
    use(ES.CALL3, 3, ctxw(CallContextField.IS_SUCCESS, aux[2].cur()))
    use(ES.CALL3, 4, ctxw(CallContextField.DEPTH, dep.cur() + one))
    use(ES.CALL3, 5, ctxw(CallContextField.PROGRAM_COUNTER, pc.cur() + one))
    # the caller's resume mws rides the save's high half (the mws chain
    # carries the caller's post-expansion count on the CALL rows)
    use(ES.CALL3, 6, ctxw(CallContextField.STACK_POINTER,
                          sp.cur() + Const(5) + hv.rot(-2),
                          mws.cur()))
    # row 4: resume gas / code hash / packed self+static saves + child code
    use(ES.CALL4, 0, ctxw(CallContextField.GAS_LEFT,
                          gas_left.cur() - aux[0].cur() - opn.cur()))
    use(ES.CALL4, 1, ctxw(CallContextField.CODE_HASH,
                          code_hash.cur(), code_hash_hi.cur()))
    use(ES.CALL4, 2, ctxw(CallContextField.CALLER_SELF_ADDRESS,
                          w[0][0].cur(), w[0][1].cur()))
    use(ES.CALL4, 3, [ZERO, Const(ACC), ZERO, to_expr_r2,
                      Const(int(AccountField.CODE_HASH)), ZERO,
                      *wc(1), *wc(1)])

    def ctxr(fld, vlo, vhi=ZERO):
        return [ZERO, Const(CC), cid.cur(), ZERO, Const(int(fld)), ZERO,
                vlo, vhi, vlo, vhi]

    # Restore: the 7 saved-context reads + the caller-stack result push
    use(ES.RESTORE, 0, ctxr(CallContextField.CALLER_ID, w[2][0].cur()))
    use(ES.RESTORE, 1, ctxr(CallContextField.IS_SUCCESS, aux[1].cur()))
    use(ES.RESTORE, 2, ctxr(CallContextField.PROGRAM_COUNTER, w[3][0].cur()))
    use(ES.RESTORE, 3, ctxr(CallContextField.STACK_POINTER, w[4][0].cur(),
                            w[4][1].cur()))
    use(ES.RESTORE, 4, ctxr(CallContextField.GAS_LEFT, w[5][0].cur()))
    use(ES.RESTORE, 5, ctxr(CallContextField.CODE_HASH,
                            w[0][0].cur(), w[0][1].cur()))
    use(ES.RESTORE, 6, ctxr(CallContextField.CALLER_SELF_ADDRESS,
                            w[1][0].cur(), w[1][1].cur()))
    use(ES.RESTORE, 7, [one, Const(STK), w[2][0].cur(), w[4][0].cur(),
                        ZERO, ZERO, aux[1].cur(), ZERO, *pc_(0)])
    # RETURN/REVERT: the offset/length pops (return-data copy semantics
    # land with copy-circuit v2)
    for s_exit in (ES.RETURN, ES.REVERT):
        use(s_exit, 0, stack_rd(spc, wc(0)))
        use(s_exit, 1, stack_rd(spc + one, wc(1)))
    # RETURN in a CREATION frame (icf): code deposit — after the opn
    # memory word reads (which ride the copy event's rwc range), the
    # created account's CODE_HASH flips EMPTY -> keccak(deposited), and
    # a MEMORY->BYTECODE copy event binds the memory bytes to the
    # deposited bytecode entry (reference create.rs code-store leg)
    icr_ = icf.cur()
    from zkevm_tpu.etypes.state import EMPTY_CODE_HASH as _ECH

    slots[2].append((ES.RETURN, [
        icr_, icr_ * (rwc.cur() + Const(2) + opn.cur()),
        icr_, icr_ * Const(ACC), ZERO, icr_ * callee.cur(),
        icr_ * Const(int(AccountField.CODE_HASH)), ZERO,
        icr_ * w[4][0].cur(), icr_ * w[4][1].cur(),
        icr_ * Const(_ECH & M128), icr_ * Const(_ECH >> 128),
    ]))
    # context/environment pushes
    for s_push in (ES.BLOCK_CTX, ES.TX_CTX, ES.PC_GAS):
        use(s_push, 0, stack_wr(spc - one, wc(0), pc_(0)))
    # BALANCE/EXTCODEHASH: addr pop, EIP-2929 access-list write, account
    # read (field tag = opn via ev_opmap), value push
    ALA = int(Target.TX_ACCESS_LIST_ACCOUNT)
    use(ES.ACCT_INFO, 0, stack_rd(spc, wc(0)))
    use(ES.ACCT_INFO, 1, [one, Const(ALA), tx_id.cur(), comb(w[0]), ZERO,
                          ZERO, one, ZERO, warm.cur(), ZERO])
    use(ES.ACCT_INFO, 2, [ZERO, Const(ACC), ZERO, comb(w[0]), opn.cur(),
                          ZERO, *wc(1), *wc(1)])
    use(ES.ACCT_INFO, 3, stack_wr(spc, wc(1), wc(0)))
    # CODESIZE: one push (own code length, len-table-bound)
    use(ES.CODESIZE, 0, stack_wr(spc - one, wc(0), pc_(0)))
    # EXTCODESIZE: addr read, access-list row, CODE_HASH read, len push
    use(ES.EXTCODESIZE, 0, stack_rd(spc, wc(0)))
    use(ES.EXTCODESIZE, 1, [one, Const(ALA), tx_id.cur(), comb(w[0]),
                            ZERO, ZERO, one, ZERO, warm.cur(), ZERO])
    use(ES.EXTCODESIZE, 2, [ZERO, Const(ACC), ZERO, comb(w[0]),
                            Const(int(AccountField.CODE_HASH)), ZERO,
                            *wc(1), *wc(1)])
    use(ES.EXTCODESIZE, 3, stack_wr(spc, wc(2), wc(0)))
    # SELFBALANCE: callee-address context read, balance read, push
    use(ES.SELFBALANCE, 0, [ZERO, Const(CC), cid.cur(), ZERO,
                            Const(int(CallContextField.CALLEE_ADDRESS)),
                            ZERO, *wc(2), *wc(2)])
    use(ES.SELFBALANCE, 1, [ZERO, Const(ACC), ZERO, comb(w[2]),
                            Const(int(AccountField.BALANCE)), ZERO,
                            *wc(0), *wc(0)])
    use(ES.SELFBALANCE, 2, stack_wr(spc - one, wc(0), pc_(1)))
    for s_ctx, fld in [
        (ES.CALLER, CallContextField.CALLER_ADDRESS),
        (ES.CALLVALUE, CallContextField.VALUE),
        (ES.ADDRESS, CallContextField.CALLEE_ADDRESS),
        (ES.CALLDATASIZE, CallContextField.CALL_DATA_LENGTH),
        (ES.RETURNDATASIZE, CallContextField.RETURN_DATA_LENGTH),
    ]:
        use(s_ctx, 0, [ZERO, Const(CC), cid.cur(), ZERO,
                       Const(int(fld)), ZERO, *wc(0), *wc(0)])
        use(s_ctx, 1, stack_wr(spc - one, wc(0), pc_(1)))

    # SHA3: off/len reads + the digest write AFTER the nw memory reads
    use(ES.SHA3, 0, stack_rd(spc, wc(0)))
    use(ES.SHA3, 1, stack_rd(spc + one, wc(1)))
    slots[2].append((ES.SHA3,
                     [one, rwc.cur() + Const(2) + opn.cur()]
                     + stack_wr(spc + one, wc(2), pc_(2))))
    # COPY: dst_off / src_off / len reads (builder top(0..2) order)
    use(ES.COPY, 0, stack_rd(spc, wc(0)))
    use(ES.COPY, 1, stack_rd(spc + one, wc(2)))
    use(ES.COPY, 2, stack_rd(spc + Const(2), wc(1)))
    # MCOPY: dst, src, len (same cell roles as COPY)
    use(ES.MCOPY, 0, stack_rd(spc, wc(0)))
    use(ES.MCOPY, 1, stack_rd(spc + one, wc(2)))
    use(ES.MCOPY, 2, stack_rd(spc + Const(2), wc(1)))
    # LOG0-4: off/len reads, topic reads (inr-gated), the TX_LOG address
    # row after the word reads; topic TX_LOG writes land on the LOG_TOP
    # continuation row (data rows ride the copy circuit)
    TXL = int(Target.TX_LOG)
    use(ES.LOG, 0, stack_rd(spc, wc(0)))
    use(ES.LOG, 1, stack_rd(spc + one, wc(1)))
    lg_tw = [w[4], w[5], pcell[0], pcell[1]]  # topic word cells
    for ti in range(4):
        use(ES.LOG, 2 + ti,
            stack_rd(spc + Const(2 + ti),
                     (lg_tw[ti][0].cur(), lg_tw[ti][1].cur())),
            en=ib[ti])
    slots[6].append((ES.LOG,
                     [one, rwc.cur() + Const(2) + lg_cnt + opn.cur(),
                      one, Const(TXL), tx_id.cur(), aux[1].cur(), ZERO,
                      ZERO, w[2][0].cur(), w[2][1].cur(), ZERO, ZERO]))
    for ti in range(4):
        use(ES.LOG_TOP, ti,
            [one, Const(TXL), tx_id.cur(), aux[1].rot(-1), one, Const(ti),
             lg_tw[ti][0].rot(-1), lg_tw[ti][1].rot(-1), ZERO, ZERO],
            en=inr.columns[ti].rot(-1))

    # -- error states (execution/error_*.rs; root-frame scope) -------------
    S_ej, S_es = S[ES.ERR_INVALID_JUMP], S[ES.ERR_STACK]
    S_eio, S_eog = S[ES.ERR_INVALID_OP], S[ES.ERR_OOG]
    S_ewp = S[ES.ERR_WRITE_PROT]
    err_any = S_ej + S_es + S_eio + S_eog + S_ewp + S_eogm
    use(ES.ERR_INVALID_JUMP, 0, stack_rd(spc, wc(0)))  # attempted dest
    use(ES.ERR_OOG_MEM, 0, stack_rd(spc, wc(0)))  # the memory offset
    is_jumpi = opcode.cur() - Const(0x56)  # 0/1 given the opcode bind
    # JUMPI error rows also read the condition, which must be nonzero
    # (a false condition falls through and cannot error)
    use(ES.ERR_INVALID_JUMP, 1, stack_rd(spc + one, wc(1)), en=is_jumpi)
    iz["ej_hi"] = IsZero.configure(cs, S_ej, w[0][1].cur(), "ev_iz_ejhi")
    iz["ej_jd"] = IsZero.configure(cs, S_ej, ej_byte.cur() - Const(0x5B),
                                   "ev_iz_ejjd")
    iz["ej_clo"] = IsZero.configure(cs, S_ej * is_jumpi, w[1][0].cur(),
                                    "ev_iz_ejclo")
    iz["ej_chi"] = IsZero.configure(cs, S_ej * is_jumpi, w[1][1].cur(),
                                    "ev_iz_ejchi")
    hz, jd = iz["ej_hi"].expr(), iz["ej_jd"].expr()
    ltg_ej = LtGadget.configure(cs, S_ej * ej_oob.cur(), w[0][0].cur(),
                                ej_len.cur(), rt8, n_limbs=16, name="ev_ejlt")
    es_lhs = es_ov.cur() * (sp.cur() + es_pop.cur()) \
        + (one - es_ov.cur()) * Const(STACK_CAP)
    es_rhs = es_ov.cur() * es_push.cur() \
        + (one - es_ov.cur()) * (sp.cur() + es_pop.cur())
    ltg_es = LtGadget.configure(cs, S_es, es_lhs, es_rhs, rt8, n_limbs=2,
                                name="ev_eslt")
    ltg_og = LtGadget.configure(cs, S_eog + S_eogm, gas_left.cur(),
                                og_gas.cur(), rt8, n_limbs=4,
                                name="ev_oglt")
    err_polys = [
        err_any * (gc.cur() - gas_left.cur()),  # remainder consumed
        # a nested errored frame pops as UNSUCCESSFUL: the Restore row's
        # is-success read must be 0 (same shape as REVERT's binding)
        qt * err_any * (one - ir) * aux[1].rot(1),
        qs * ej_oob.cur() * (one - ej_oob.cur()),
        qs * es_ov.cur() * (one - es_ov.cur()),
        S_ej * (opcode.cur() - Const(0x56)) * (opcode.cur() - Const(0x57)),
        # in-range dest: hi limb must be 0 and the fetched byte must NOT
        # be an is_code JUMPDEST
        S_ej * (one - ej_oob.cur()) * (one - hz),
        S_ej * (one - ej_oob.cur()) * jd * ej_isc.cur(),
        # out-of-range dest: NOT(hi == 0 and lo < code_len)
        S_ej * ej_oob.cur() * hz * ltg_ej.expr(),
        # a JUMPI error needs a taken branch: cond != 0
        S_ej * is_jumpi * iz["ej_clo"].expr() * iz["ej_chi"].expr(),
        # stack violation / gas shortfall must actually hold
        S_es * (ltg_es.expr() - one),
        (S_eog + S_eogm) * (ltg_og.expr() - one),
    ]
    if bytecode_len_table is not None:
        bytecode_len_table.lookup(
            cs, "ev_ejmp_len", S_ej * ej_oob.cur(),
            code_hash.cur(), code_hash_hi.cur(), ej_len.cur())
        # CODESIZE: own code length pushed (w0)
        CSZ = S[ES.CODESIZE]
        bytecode_len_table.lookup(
            cs, "ev_codesize", CSZ,
            code_hash.cur(), code_hash_hi.cur(), w[0][0].cur())
        # EXTCODESIZE: the read account hash (w1) -> length pushed (w2)
        bytecode_len_table.lookup(
            cs, "ev_extcodesize", S[ES.EXTCODESIZE],
            w[1][0].cur(), w[1][1].cur(), w[2][0].cur())
        cs.create_gate("ev_codesize_hi", [
            CSZ * w[0][1].cur(),
            S[ES.EXTCODESIZE] * w[2][1].cur(),
        ])
    else:  # no length surface: out-of-range jump errors unsupported
        err_polys.append(S_ej * ej_oob.cur())
        err_polys.append(qs * S[ES.CODESIZE])
        err_polys.append(qs * S[ES.EXTCODESIZE])
    cs.create_gate("ev_error", err_polys)
    bytecode_table.lookup(
        cs, "ev_ejmp_byte", S_ej * (one - ej_oob.cur()),
        code_hash.cur(), code_hash_hi.cur(), w[0][0].cur(),
        ej_byte.cur(), ej_isc.cur())
    # opcode must really be invalid / really have these pops/pushes/gas
    cs.lookup("ev_err_invop", [(S_eio * (opcode.cur() + one), io_op.cur())])
    # write-protection: the frame IS static and the opcode IS a write op
    wp_op = cs.fixed_column()
    cs.create_gate("ev_err_wp", [S_ewp * (one - istc.cur())])
    cs.lookup("ev_err_wp_op", [(S_ewp * (opcode.cur() + one), wp_op.cur())])
    cs.lookup("ev_err_stack_meta", [
        (S_es * (opcode.cur() + one), os_op.cur()),
        (S_es * es_pop.cur(), os_pop.cur()),
        (S_es * es_push.cur(), os_push.cur()),
    ])
    cs.lookup("ev_err_oog_meta", [
        (S_eog * (opcode.cur() + one), os_op.cur()),
        (S_eog * og_gas.cur(), os_gas.cur()),
    ])

    for i in range(NSLOTS):
        inputs = [Const(0)] * len(RwTable.FIELDS)
        for state, fields in slots[i]:
            for j, e in enumerate(fields):
                inputs[j] = inputs[j] + S[state] * e
        rw_table.lookup(cs, f"ev_rw_slot{i}", inputs)

    # -- bytecode lookups --------------------------------------------------
    # error rows fetch their (real, is_code) opcode byte too: the error
    # claim is about the actual instruction at pc
    op_en = Const(0)
    for s in opcode_states + list(ERRS):
        op_en = op_en + S[s]
    bytecode_table.lookup(
        cs, "ev_opcode_fetch", op_en,
        code_hash.cur(), code_hash_hi.cur(), pc.cur(), opcode.cur(), one,
    )
    # taken jumps must land on a JUMPDEST byte (execution/jump.rs, jumpi.rs)
    jump_en = S[ES.JUMP] + S[ES.JUMPI] * jnz
    bytecode_table.lookup(
        cs, "ev_jumpdest", jump_en,
        code_hash.cur(), code_hash_hi.cur(), w[0][0].cur(), Const(0x5B), one,
    )

    # -- rw-set completeness: the final rw counter equals the state
    # circuit's real-row count (end_block.rs total-rws argument; combined
    # with the contiguous counter chain this pins the RwTable exactly)
    if rw_count is not None:
        cs.lookup("ev_total_rws", [
            (ql, rw_count[0]), (ql * rwc.cur(), rw_count[1]),
        ])

    # -- TxTable binding (BeginTx word cells == the signed tx's fields) --
    if tx_table is not None:
        from zkevm_tpu.circuits.tx_circuit import TxFieldTag

        for nm, tag, wi in [
            ("caller", TxFieldTag.CALLER_ADDRESS, 1),
            ("value", TxFieldTag.VALUE, 0),
        ]:
            tx_table.lookup(cs, f"ev_tx_{nm}", [
                B, B * tx_id.cur(), B * Const(int(tag)), ZERO,
                B * w[wi][0].cur(), B * w[wi][1].cur(),
            ])
        # callee binds for message calls; creation txs derive the
        # address (keccak(rlp([caller, nonce])) binding is a documented
        # later item — the ctx row carries the derived address)
        b_nc = B * (one - icb)
        tx_table.lookup(cs, "ev_tx_callee", [
            b_nc, b_nc * tx_id.cur(),
            b_nc * Const(int(TxFieldTag.CALLEE_ADDRESS)), ZERO,
            b_nc * w[2][0].cur(), b_nc * w[2][1].cur(),
        ])
        # the creation flag itself is the signed tx's is_create bit
        tx_table.lookup(cs, "ev_tx_is_create", [
            B, B * tx_id.cur(), B * Const(int(TxFieldTag.IS_CREATE)),
            ZERO, B * icb, ZERO,
        ])
        # creation txs: init-code length = the tx's calldata length
        b_cr = B * icb
        tx_table.lookup(cs, "ev_tx_initlen", [
            b_cr, b_cr * tx_id.cur(),
            b_cr * Const(int(TxFieldTag.CALL_DATA_LENGTH)), ZERO,
            b_cr * pcell[1][0].cur(), ZERO,
        ])
    if copy_table is not None:
        # creation txs: the executed init code (code_hash = w5, via
        # ev_begin_tx) IS the tx calldata — the memless TX_CALLDATA ->
        # BYTECODE copy event binds them byte by byte
        b_cr = B * icf.cur()
        Z2 = Const(0)
        copy_table.lookup(cs, "ev_begin_create_copy", [
            b_cr, b_cr * Const(3), b_cr * Const(2),  # TX_CALLDATA, BYTECODE
            b_cr * tx_id.cur(), Z2,
            b_cr * w[5][0].cur(), b_cr * w[5][1].cur(),
            Z2, Z2,  # memless events anchor at address 0
            b_cr * pcell[1][0].cur(),  # length = CALL_DATA_LENGTH
            Z2,  # memless rwc chain starts at 0
            b_cr * pcell[0][0].cur(),  # word count (event-pinned)
            Z2, Z2,
        ])

    return EvmConfig(
        q_step, q_first, q_last, q_trans, sel, tx_id, cid, pc, opcode,
        gas_left, gc, sp, rwc, code_hash, code_hash_hi, callee, opn,
        is_sub, warm, bb0, bb1, w, carries, pcell, aux, iz, ltg, rt4, rt8,
        m_div, m_mod, bzc, waen, nzc, am_en, mm_en, vcell,
        p2s, p2lo, p2hi, om_op, om_tag, msb, minv, vcell2, byv, sev, sarm,
        dep, istc, vnz, ccid,
        ej_oob, ej_byte, ej_isc, ej_len, es_ov, es_pop, es_push, og_gas,
        io_op, os_op, os_pop, os_push, os_gas, ltg_ej, ltg_es, ltg_og,
        pw_i, pw_o, p_cnt,
        msk, srb, vlb, mwa, mby, mws, mwsw, mqd, mqd2,
        mrdl, mrdb, mrd2l, mrd2b, mlt, inr, cl_lt_a, cl_lt_b,
        wp_op=wp_op, bigb=bigb, eg_nb=eg_nb, mgate=mgate, m8b=m8b,
        ltg_24=ltg_24, ltg_sa=ltg_sa, ltg_sb=ltg_sb, sdv_k=sdv_k, srv=srv,
        sdv_en=sdv_en_col, icf=icf,
    )


_CALL_CONT = {"CallB": ES.CALL2, "CallC": ES.CALL3, "CallD": ES.CALL4,
              "Restore": ES.RESTORE,
              "PreCall1": ES.PRE1, "PreEcrecover": ES.PRE_EC,
              "PreSha256": ES.PRE_SHA, "LogTopics": ES.LOG_TOP,
              "PreEcAdd": ES.PRE_ECA, "PreEcMul": ES.PRE_ECM}


_ERROR_ES = {
    "ErrorInvalidJump": ES.ERR_INVALID_JUMP,
    "ErrorStack": ES.ERR_STACK,
    "ErrorInvalidOpcode": ES.ERR_INVALID_OP,
    "ErrorOutOfGasConstant": ES.ERR_OOG,
    "ErrorWriteProtection": ES.ERR_WRITE_PROT,
    "ErrorOutOfGasMemory": ES.ERR_OOG_MEM,
}


def _state_of(step: ExecStep) -> ES:
    if step.exec_state == "BeginTx":
        return ES.BEGIN_TX
    if step.exec_state == "EndTx":
        return ES.END_TX
    if step.exec_state in _ERROR_ES:
        return _ERROR_ES[step.exec_state]
    if step.exec_state in _CALL_CONT:
        return _CALL_CONT[step.exec_state]
    if step.exec_state == "CallNoExec":
        raise NotImplementedError("no-exec CALL rows not yet constrained")
    if step.exec_state is not None and step.exec_state != "Exec":
        # Hard-fail on any virtual-row tag we don't recognise: falling
        # through to the opcode map would silently misdispatch (e.g. a
        # precompile continuation row landing on ES.CALL1).
        raise NotImplementedError(
            f"exec_state {step.exec_state!r} not in EVM circuit scope")
    op = step.op
    if 0x60 <= op <= 0x7F:
        return ES.PUSH
    if 0x80 <= op <= 0x8F:
        return ES.DUP
    if 0x90 <= op <= 0x9F:
        return ES.SWAP
    m = {0x00: ES.STOP, 0x50: ES.POP, 0x01: ES.ADD_SUB, 0x03: ES.ADD_SUB,
         0x51: ES.MLOAD, 0x52: ES.MSTORE, 0x53: ES.MSTORE8,
         0x5E: ES.MCOPY,
         0x59: ES.MSIZE, 0x35: ES.CALLDATALOAD,
         0x54: ES.SLOAD, 0x55: ES.SSTORE,
         0x5B: ES.JUMPDEST, 0x56: ES.JUMP, 0x57: ES.JUMPI,
         0x15: ES.ISZERO, 0x14: ES.EQ, 0x10: ES.LT_GT, 0x11: ES.LT_GT,
         0x12: ES.SLT_SGT, 0x13: ES.SLT_SGT,
         0x33: ES.CALLER, 0x34: ES.CALLVALUE, 0x30: ES.ADDRESS,
         0x36: ES.CALLDATASIZE,
         0x02: ES.MUL_DIV_MOD, 0x04: ES.MUL_DIV_MOD, 0x06: ES.MUL_DIV_MOD,
         0x05: ES.SDIV_SMOD, 0x07: ES.SDIV_SMOD,
         0x1B: ES.SHL_SHR, 0x1C: ES.SHL_SHR,
         0x16: ES.AND_OR_XOR, 0x17: ES.AND_OR_XOR, 0x18: ES.AND_OR_XOR,
         0x19: ES.NOT,
         0x41: ES.BLOCK_CTX, 0x42: ES.BLOCK_CTX, 0x43: ES.BLOCK_CTX,
         0x45: ES.BLOCK_CTX, 0x46: ES.BLOCK_CTX, 0x48: ES.BLOCK_CTX,
         0x32: ES.TX_CTX, 0x3A: ES.TX_CTX,
         0x58: ES.PC_GAS, 0x5A: ES.PC_GAS,
         0x31: ES.ACCT_INFO, 0x3F: ES.ACCT_INFO,
         0x38: ES.CODESIZE, 0x3B: ES.EXTCODESIZE,
         0x47: ES.SELFBALANCE,
         0x08: ES.ADDMOD, 0x09: ES.MULMOD, 0x0A: ES.EXP,
         0x1A: ES.BYTE, 0x0B: ES.SIGNEXTEND, 0x1D: ES.SAR,
         0xF1: ES.CALL1, 0xF2: ES.CALL1, 0xF4: ES.CALL1, 0xFA: ES.CALL1,
         0xF3: ES.RETURN, 0xFD: ES.REVERT,
         0x3D: ES.RETURNDATASIZE,
         0x20: ES.SHA3,
         0x37: ES.COPY, 0x39: ES.COPY, 0x3E: ES.COPY,
         0xA0: ES.LOG, 0xA1: ES.LOG, 0xA2: ES.LOG, 0xA3: ES.LOG,
         0xA4: ES.LOG}
    if op not in m:
        raise NotImplementedError(f"opcode {op:#x} not in EVM circuit scope")
    return m[op]


def assign(
    cs: ConstraintSystem,
    cfg: EvmConfig,
    n: int,
    steps: list[ExecStep],
    rws: RwMap,
    asg: Assignment | None = None,
    calls: list | None = None,
    codes: list | None = None,
) -> Assignment:
    """Per-tx context (tx_id, call id, callee, code hash) is derived from
    the steps themselves: each BeginTx's account-code-hash / callee reads
    seed the following rows (multi-tx blocks supported). `calls` (the
    builder's call list) supplies per-frame code hash / self address /
    static flags for multi-call traces; single-frame traces may omit it."""
    asg = asg if asg is not None else Assignment(cs, n)
    calls_map = {c.call_id: c for c in calls} if calls else {}
    cfg.rt4.load(asg)
    cfg.rt8.load(asg)
    # pow2 fixed table: entry for shift s at key s+1 (row 0 stays zero
    # for the disabled-consumer tuple)
    assert n >= 258
    asg.set_ints(cfg.p2s, 1, range(1, 257))
    asg.set_ints(cfg.p2lo, 1, [(1 << s) & M128 for s in range(256)])
    asg.set_ints(cfg.p2hi, 1, [(1 << s) >> 128 for s in range(256)])
    omap = _opmap()
    asg.set_ints(cfg.om_op, 1, [op for op, _ in omap])
    asg.set_ints(cfg.om_tag, 1, [t for _, t in omap])
    # error-state metadata tables: invalid opcodes + (pops, pushes, gas)
    invalid_ops = [op for op in range(256)
                   if op not in OPCODES or OPCODES[op].name == "INVALID"]
    asg.set_ints(cfg.io_op, 1, [op + 1 for op in invalid_ops])
    # static-context write opcodes (error_write_protection.rs)
    asg.set_ints(cfg.wp_op, 1,
                 [op + 1 for op in
                  (0x55, 0xA0, 0xA1, 0xA2, 0xA3, 0xA4, 0xF0, 0xF5, 0xFF)])
    valid_ops = [(op, i) for op, i in OPCODES.items() if i.name != "INVALID"]
    asg.set_ints(cfg.os_op, 1, [op + 1 for op, _ in valid_ops])
    asg.set_ints(cfg.os_pop, 1, [i.pops for _, i in valid_ops])
    asg.set_ints(cfg.os_push, 1, [i.pushes for _, i in valid_ops])
    asg.set_ints(cfg.os_gas, 1, [i.gas for _, i in valid_ops])
    # code bytes by code-hash int, for invalid-jump byte/is_code witness
    codes_by_hash = {}
    if codes:
        from zkevm_tpu.etypes.opcodes import push_size
        from zkevm_tpu.hash.keccak import keccak256

        for code in codes:
            h = int.from_bytes(keccak256(code), "big")
            is_code = []
            pdl = 0
            for b in code:
                is_code.append(1 if pdl == 0 else 0)
                pdl = push_size(b) if pdl == 0 else pdl - 1
            codes_by_hash[h] = (code, is_code)
    m = cs.usable_rows(n) - 1  # the lookup-active region
    assert len(steps) <= m
    one = FR.encode(1)
    by_rwc = {row.rw_counter: row for row in rws.rows}

    asg.cols[cfg.q_step][:m] = one
    asg.cols[cfg.q_first][0] = one
    asg.cols[cfg.q_last][m - 1] = one
    asg.cols[cfg.q_trans][: m - 1] = one

    ch_lo = ch_hi = 0
    callee = 0
    cur_tx = 1
    cur_ccid = 0

    end_gas = 0
    end_rwc = 1
    for r, step in enumerate(steps):
        st = _state_of(step)
        if st == ES.BEGIN_TX:
            vals0 = [by_rwc[i] for i in step.rw_indices]
            callee = vals0[1].value
            ch = vals0[4].value
            ch_lo, ch_hi = ch & M128, ch >> 128
        if calls_map and step.call_id in calls_map:
            c_ = calls_map[step.call_id]
            callee = c_.address
            ch_lo, ch_hi = c_.code_hash & M128, c_.code_hash >> 128
            asg.set_int(cfg.istc, r, int(c_.is_static))
            asg.set_int(cfg.icf, r, int(c_.is_create))
        asg.set_int(cfg.dep, r, step.depth)
        asg.set_int(cfg.sel.columns[int(st)], r, 1)
        asg.set_int(cfg.tx_id, r, cur_tx)
        asg.set_int(cfg.cid, r, step.call_id)
        asg.set_int(cfg.opcode, r, step.op if st not in
                    (ES.BEGIN_TX, ES.END_TX) else 0)
        asg.set_int(cfg.pc, r, step.pc if st not in
                    (ES.BEGIN_TX, ES.END_TX, ES.STOP) else
                    (step.pc if st == ES.STOP else 0))
        asg.set_int(cfg.gas_left, r, step.gas_left)
        asg.set_int(cfg.gc, r, step.gas_cost)
        asg.set_int(cfg.sp, r, step.stack_pointer)
        asg.set_int(cfg.rwc, r, step.rw_counter_start)
        asg.set_int(cfg.code_hash, r, ch_lo)
        asg.set_int(cfg.code_hash_hi, r, ch_hi)
        asg.set_int(cfg.callee, r, callee)
        asg.set_int(cfg.mws, r, step.mws)
        asg.set_int(cfg.mwsw, r, step.mws_after)
        if st == ES.END_TX:
            cur_tx += 1
        end_gas = step.gas_left - step.gas_cost
        end_rwc = step.rw_counter_start + len(step.rw_indices)

        vals = [by_rwc[i] for i in step.rw_indices]
        if st == ES.STOP:
            _set_inv(asg, cfg.iz["root"], r, step.depth - 1)

        def put_word(wi, v):
            asg.set_int(cfg.w[wi][0], r, int(v) & M128)
            asg.set_int(cfg.w[wi][1], r, int(v) >> 128)

        def put_pcell(i, v):
            asg.set_int(cfg.pcell[i][0], r, int(v) & M128)
            asg.set_int(cfg.pcell[i][1], r, int(v) >> 128)

        if st in ERRS:
            info = OPCODES.get(step.op)
            _set_inv(asg, cfg.iz["root"], r, step.depth - 1)
            if r + 1 < len(steps):  # journal gap before EndTx (cf REVERT)
                asg.set_int(cfg.opn, r,
                            steps[r + 1].rw_counter_start
                            - step.rw_counter_start - len(step.rw_indices))
            if st == ES.ERR_OOG_MEM:
                off = vals[0].value
                put_word(0, off)
                if off >> 128 == 0 and off < (1 << 24):
                    wa, s_off = divmod(off, 32)
                    asg.set_int(cfg.eg_nb, r, 1)
                    asg.set_int(cfg.mgate, r, 1)
                    asg.set_int(cfg.m8b, r, int(step.op == 0x53))
                    asg.set_int(cfg.mwa, r, wa)
                    for i in range(3):
                        asg.set_int(cfg.mby[i], r, (wa >> (8 * i)) & 0xFF)
                    asg.set_int(cfg.msk.columns[s_off], r, 1)
                    _set_inv(asg, cfg.iz["moff"], r, s_off)
                    needed = wa + 1 + (1 if (s_off and step.op != 0x53)
                                       else 0)
                    cfg.mlt.assign_rows(asg, r, [step.mws], [needed])
                    nxt_mws = max(step.mws, needed)
                    asg.set_int(cfg.mwsw, r, nxt_mws)
                    qd, rd = divmod(step.mws * step.mws, 512)
                    qd2, rd2 = divmod(nxt_mws * nxt_mws, 512)
                    for i in range(6):
                        asg.set_int(cfg.mqd[i], r, (qd >> (8 * i)) & 0xFF)
                        asg.set_int(cfg.mqd2[i], r, (qd2 >> (8 * i)) & 0xFF)
                    asg.set_int(cfg.mrdl, r, rd & 0xFF)
                    asg.set_int(cfg.mrdb, r, rd >> 8)
                    asg.set_int(cfg.mrd2l, r, rd2 & 0xFF)
                    asg.set_int(cfg.mrd2b, r, rd2 >> 8)
                    need_gas = 3 + 3 * (nxt_mws - step.mws) + qd2 - qd
                else:
                    asg.set_int(cfg.bigb, r, 1)
                    _set_inv(asg, cfg.iz["eogm_hi"], r, off >> 128)
                    cfg.ltg_24.assign_rows(asg, r, [off & M128], [1 << 24])
                    need_gas = 1 << 30
                asg.set_int(cfg.og_gas, r, need_gas)
                cfg.ltg_og.assign_rows(asg, r, [step.gas_left], [need_gas])
            if st == ES.ERR_INVALID_JUMP:
                dest = vals[0].value
                put_word(0, dest)
                _set_inv(asg, cfg.iz["ej_hi"], r, dest >> 128)
                if step.op == 0x57:  # JUMPI: the (nonzero) condition
                    cond = vals[1].value
                    put_word(1, cond)
                    _set_inv(asg, cfg.iz["ej_clo"], r, cond & M128)
                    _set_inv(asg, cfg.iz["ej_chi"], r, cond >> 128)
                code, is_code = codes_by_hash[(ch_hi << 128) | ch_lo]
                oob = dest >> 128 != 0 or (dest & M128) >= len(code)
                asg.set_int(cfg.ej_oob, r, int(oob))
                if oob:
                    asg.set_int(cfg.ej_len, r, len(code))
                    cfg.ltg_ej.assign_rows(asg, r, [dest & M128],
                                           [len(code)])
                    _set_inv(asg, cfg.iz["ej_jd"], r, (-0x5B) % FR_MOD)
                else:
                    b = code[dest]
                    asg.set_int(cfg.ej_byte, r, b)
                    asg.set_int(cfg.ej_isc, r, is_code[dest])
                    _set_inv(asg, cfg.iz["ej_jd"], r, (b - 0x5B) % FR_MOD)
            elif st == ES.ERR_STACK:
                ov = 1 if step.stack_pointer + info.pops < info.pushes else 0
                asg.set_int(cfg.es_ov, r, ov)
                asg.set_int(cfg.es_pop, r, info.pops)
                asg.set_int(cfg.es_push, r, info.pushes)
                if ov:
                    cfg.ltg_es.assign_rows(
                        asg, r, [step.stack_pointer + info.pops],
                        [info.pushes])
                else:
                    cfg.ltg_es.assign_rows(
                        asg, r, [STACK_CAP],
                        [step.stack_pointer + info.pops])
            elif st == ES.ERR_OOG:
                asg.set_int(cfg.og_gas, r, info.gas)
                cfg.ltg_og.assign_rows(asg, r, [step.gas_left], [info.gas])

        if st == ES.BEGIN_TX:
            caller_addr = vals[0].value
            callee_addr = vals[1].value
            tx_value = vals[2].value
            put_word(0, tx_value)
            put_word(1, caller_addr)
            put_word(2, callee_addr)
            asg.set_int(cfg.aux[0], r, vals[3].value_prev)  # old nonce
            is_cr = bool(calls_map and step.call_id in calls_map
                         and calls_map[step.call_id].is_create)
            if is_cr:
                # vals[4] is the new account's NONCE write; w5 carries
                # the init-code hash (copy-lookup-bound)
                assert vals[4].value == 1
                ih_ = calls_map[step.call_id].code_hash
                put_word(5, ih_)
                init_code = codes_by_hash[ih_][0]
                asg.set_int(cfg.pcell[1][0], r, len(init_code))
                asg.set_int(cfg.pcell[0][0], r, -(-len(init_code) // 32))
            else:
                put_word(5, vals[4].value)  # code hash word
            put_word(3, vals[5].value)  # caller new balance
            put_word(4, vals[6].value_prev)  # callee prev balance
            # carries of the two balance additions
            k0 = 1 if (vals[5].value & M128) + (tx_value & M128) > M128 else 0
            k2 = 1 if (vals[6].value_prev & M128) + (tx_value & M128) > M128 else 0
            asg.set_int(cfg.carries[0], r, k0)
            asg.set_int(cfg.carries[2], r, k2)
        elif st == ES.END_TX:
            asg.set_int(cfg.aux[1], r, vals[0].value)  # final refund
        elif st == ES.PUSH:
            v = vals[0].value
            nb = step.op - 0x5F
            asg.set_int(cfg.opn, r, nb)
            asg.set_int(cfg.msk.columns[nb - 1], r, 1)
            imm = v.to_bytes(nb, "big")
            for i in range(nb):
                asg.set_int(cfg.vlb.columns[i], r, imm[i])
                asg.set_int(cfg.inr.columns[i], r, 1)
            put_word(0, v)
            put_pcell(0, _group_prev(rws, vals[0]))
        elif st == ES.POP:
            put_word(0, vals[0].value)
        elif st == ES.ADD_SUB:
            asg.set_int(cfg.is_sub, r, 1 if step.op == 0x03 else 0)
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            put_word(2, vals[2].value)
            a, b, c = vals[0].value, vals[1].value, vals[2].value
            x, z = (c, a) if step.op == 0x03 else (a, c)
            k0 = 1 if (x & M128) + (b & M128) > M128 else 0
            k1 = 1 if ((x >> 128) + (b >> 128) + k0) > M128 else 0
            asg.set_int(cfg.carries[0], r, k0)
            asg.set_int(cfg.carries[1], r, k1)
        elif st == ES.DUP:
            asg.set_int(cfg.opn, r, step.op - 0x80)
            put_word(0, vals[0].value)
            put_pcell(1, _group_prev(rws, vals[1]))
        elif st == ES.SWAP:
            asg.set_int(cfg.opn, r, step.op - 0x8F)
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
        elif st in (ES.MLOAD, ES.MSTORE, ES.MSTORE8):
            off = vals[0].value
            wa, s_off = divmod(off, 32)
            put_word(0, off)
            asg.set_int(cfg.mwa, r, wa)
            for i in range(3):
                asg.set_int(cfg.mby[i], r, (wa >> (8 * i)) & 0xFF)
            asg.set_int(cfg.msk.columns[s_off], r, 1)
            if st == ES.MLOAD:
                w0v, w1v = vals[1].value, vals[2].value
                put_word(1, w0v)
                put_word(2, w1v)
                src = w0v.to_bytes(32, "big") + w1v.to_bytes(32, "big")
            elif st == ES.MSTORE:
                put_word(1, vals[1].value)  # store value
                p0, p1 = vals[2].value_prev, vals[3].value_prev
                put_word(2, p0)
                asg.set_int(cfg.w[4][0], r, p1 & M128)
                asg.set_int(cfg.w[4][1], r, p1 >> 128)
                src = p0.to_bytes(32, "big") + p1.to_bytes(32, "big")
                for i, b in enumerate(vals[1].value.to_bytes(32, "big")):
                    asg.set_int(cfg.vlb.columns[i], r, b)
            else:  # MSTORE8
                put_word(1, vals[1].value)
                p0 = vals[2].value_prev
                put_word(2, p0)
                src = p0.to_bytes(32, "big") + bytes(32)
                for i, b in enumerate(vals[1].value.to_bytes(32, "big")):
                    asg.set_int(cfg.vlb.columns[i], r, b)
            for i, b in enumerate(src):
                asg.set_int(cfg.srb.columns[i], r, b)
            # memory-expansion gadget
            asg.set_int(cfg.mgate, r, 1)
            asg.set_int(cfg.m8b, r, int(st == ES.MSTORE8))
            needed = wa + 1 + (1 if (s_off and st != ES.MSTORE8) else 0)
            _set_inv(asg, cfg.iz["moff"], r, s_off)
            cfg.mlt.assign_rows(asg, r, [step.mws], [needed])
            nxt_mws = max(step.mws, needed)
            assert step.mws_after == nxt_mws, (
                f"mws mismatch at pc={step.pc}: builder {step.mws_after} "
                f"!= gadget {nxt_mws}")
            qd, rd = divmod(step.mws * step.mws, 512)
            qd2, rd2 = divmod(nxt_mws * nxt_mws, 512)
            for i in range(6):
                asg.set_int(cfg.mqd[i], r, (qd >> (8 * i)) & 0xFF)
                asg.set_int(cfg.mqd2[i], r, (qd2 >> (8 * i)) & 0xFF)
            asg.set_int(cfg.mrdl, r, rd & 0xFF)
            asg.set_int(cfg.mrdb, r, rd >> 8)
            asg.set_int(cfg.mrd2l, r, rd2 & 0xFF)
            asg.set_int(cfg.mrd2b, r, rd2 >> 8)
        elif st == ES.MSIZE:
            put_word(0, vals[0].value)
            put_pcell(0, _group_prev(rws, vals[0]))
        elif st == ES.CALLDATALOAD:
            cdlen = vals[0].value
            off = vals[1].value
            value = vals[2].value
            asg.set_int(cfg.w[1][0], r, cdlen)
            put_word(0, off)
            for i in range(3):
                asg.set_int(cfg.mby[i], r, (off >> (8 * i)) & 0xFF)
            for i, b in enumerate(value.to_bytes(32, "big")):
                asg.set_int(cfg.vlb.columns[i], r, b)
            cnt = min(32, max(0, cdlen - off))
            for i in range(cnt):
                asg.set_int(cfg.inr.columns[i], r, 1)
            _set_inv(asg, cfg.iz["cl32"], r, cnt - 32)
            _set_inv(asg, cfg.iz["cl0"], r, cnt)
            cfg.cl_lt_a.assign_rows(asg, r, [off + cnt], [cdlen])
            cfg.cl_lt_b.assign_rows(
                asg, r, [off + cnt - 1 if cnt else 0], [cdlen])
        elif st == ES.SLOAD:
            put_word(0, vals[0].value)  # key
            asg.set_int(cfg.warm, r, vals[1].value_prev)
            put_word(1, vals[2].value)  # storage value
        elif st == ES.SSTORE:
            put_word(0, vals[0].value)  # key
            put_word(1, vals[1].value)  # new value
            asg.set_int(cfg.warm, r, vals[2].value_prev)
            asg.set_int(cfg.aux[1], r, vals[3].value)  # refund new
            asg.set_int(cfg.aux[2], r, vals[3].value_prev)  # refund prev
            was_warm = vals[2].value_prev
            gcase = step.gas_cost - 2100 * (1 - was_warm)
            asg.set_int(cfg.aux[0], r, gcase)
            put_pcell(2, _group_prev(rws, vals[4]))
        elif st == ES.JUMP:
            put_word(0, vals[0].value)
        elif st == ES.JUMPI:
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            _set_inv(asg, cfg.iz["jc_lo"], r, vals[1].value & M128)
            _set_inv(asg, cfg.iz["jc_hi"], r, vals[1].value >> 128)
        elif st == ES.ISZERO:
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            _set_inv(asg, cfg.iz["a_lo"], r, vals[0].value & M128)
            _set_inv(asg, cfg.iz["a_hi"], r, vals[0].value >> 128)
        elif st in (ES.EQ, ES.LT_GT):
            a, b_, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, a)
            put_word(1, b_)
            put_word(2, res)
            if st == ES.EQ:
                _set_inv(asg, cfg.iz["eq_lo"], r,
                         ((a & M128) - (b_ & M128)) % FR_MOD)
                _set_inv(asg, cfg.iz["eq_hi"], r,
                         ((a >> 128) - (b_ >> 128)) % FR_MOD)
            else:
                is_gt = 1 if step.op == 0x11 else 0
                asg.set_int(cfg.is_sub, r, is_gt)
                lhs, rhs = (b_, a) if is_gt else (a, b_)
                lt = 1 if lhs < rhs else 0
                assert res == lt
                diff = lhs - rhs + lt * (1 << 256)
                asg.set_int(cfg.ltg.lt, r, lt)
                for i, c in enumerate(cfg.ltg.limbs):
                    asg.set_int(c, r, (diff >> (8 * i)) & 0xFF)
        elif st == ES.SLT_SGT:
            a, b_, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, a)
            put_word(1, b_)
            put_word(2, res)
            is_sgt = 1 if step.op == 0x13 else 0
            asg.set_int(cfg.is_sub, r, is_sgt)
            cfg.ltg_sa.assign_rows(asg, r, [a >> 128], [1 << 127])
            cfg.ltg_sb.assign_rows(asg, r, [b_ >> 128], [1 << 127])
            sa_, sb_ = (a >> 255) & 1, (b_ >> 255) & 1
            adj_av = a + (1 << 255) - (sa_ << 256)
            adj_bv = b_ + (1 << 255) - (sb_ << 256)
            lhs_v, rhs_v = ((adj_bv, adj_av) if is_sgt
                            else (adj_av, adj_bv))
            lt = 1 if lhs_v < rhs_v else 0
            assert res == lt
            diff = lhs_v - rhs_v + lt * (1 << 256)
            asg.set_int(cfg.ltg.lt, r, lt)
            for i, c in enumerate(cfg.ltg.limbs):
                asg.set_int(c, r, (diff >> (8 * i)) & 0xFF)
        elif st in (ES.CALLER, ES.CALLVALUE, ES.ADDRESS, ES.CALLDATASIZE,
                    ES.RETURNDATASIZE):
            put_word(0, vals[0].value)
            put_pcell(1, _group_prev(rws, vals[1]))
        elif st == ES.MUL_DIV_MOD:
            a, b_, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, a)
            put_word(1, b_)
            put_word(2, res)
            is_div = 1 if step.op == 0x04 else 0
            is_mod = 1 if step.op == 0x06 else 0
            asg.set_int(cfg.m_div, r, is_div)
            asg.set_int(cfg.m_mod, r, is_mod)
            _set_inv(asg, cfg.iz["mdm_blo"], r, b_ & M128)
            _set_inv(asg, cfg.iz["mdm_bhi"], r, b_ >> 128)
            bz = 1 if b_ == 0 else 0
            asg.set_int(cfg.bzc, r, bz)
            asg.set_int(cfg.waen, r, 1 if (not is_div and not is_mod) or not bz
                        else 0)
            if b_ and (is_div or is_mod):
                put_word(3, a % b_ if is_div else a // b_)
        elif st == ES.SDIV_SMOD:
            a, b_, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, a)
            put_word(1, b_)
            put_word(2, res)
            is_smod = 1 if step.op == 0x07 else 0
            asg.set_int(cfg.is_sub, r, is_smod)
            cfg.ltg_sa.assign_rows(asg, r, [a >> 128], [1 << 127])
            cfg.ltg_sb.assign_rows(asg, r, [b_ >> 128], [1 << 127])
            sa_, sb_ = (a >> 255) & 1, (b_ >> 255) & 1
            aa = (1 << 256) - a if sa_ else a
            ab = (1 << 256) - b_ if sb_ else b_
            qv = aa // ab if ab else 0
            rv = aa % ab if ab else 0
            absres = qv if not is_smod else rv
            other = rv if not is_smod else qv
            put_word(3, aa)
            put_word(4, ab)
            put_word(5, absres)
            put_pcell(0, other)
            sres = ((sa_ ^ sb_) if not is_smod else sa_) \
                if absres != 0 else 0
            asg.set_int(cfg.srv, r, sres)
            # sanity: signed result matches the trace
            want = ((1 << 256) - absres if sres else absres) if ab else 0
            assert res == want, (res, want)
            for (sv, av, sgn_), kc in zip(
                    ((a, aa, sa_), (b_, ab, sb_), (res, absres, sres)),
                    cfg.sdv_k):
                if sgn_:
                    asg.set_int(kc, r, 1 if (sv & M128) else 0)
            _set_inv(asg, cfg.iz["sdv_blo"], r, b_ & M128)
            _set_inv(asg, cfg.iz["sdv_bhi"], r, b_ >> 128)
            _set_inv(asg, cfg.iz["sdv_rlo"], r, absres & M128)
            _set_inv(asg, cfg.iz["sdv_rhi"], r, absres >> 128)
            if ab and cfg.sdv_en is not None:
                asg.set_int(cfg.sdv_en, r, 1)
        elif st == ES.SHL_SHR:
            shift, value, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, shift)
            put_word(1, value)
            put_word(2, res)
            is_shr = 1 if step.op == 0x1C else 0
            asg.set_int(cfg.is_sub, r, is_shr)
            s0 = shift & 0xFF
            asg.set_int(cfg.opn, r, s0)
            shift_lo = shift & M128
            diff = shift_lo - s0  # >= 0, divisible by 256
            for i, c in enumerate(cfg.ltg.limbs):
                asg.set_int(c, r, (diff >> (8 * i)) & 0xFF)
            srest = diff >> 8
            _set_inv(asg, cfg.iz["sh_hi"], r, shift >> 128)
            _set_inv(asg, cfg.iz["sh_rest"], r, srest)
            valid = 1 if (shift >> 128) == 0 and srest == 0 else 0
            asg.set_int(cfg.vcell, r, valid)
            if valid:
                put_word(3, 1 << s0)
                if is_shr:
                    put_word(4, value - (value >> s0) * (1 << s0))
        elif st == ES.AND_OR_XOR:
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            put_word(2, vals[2].value)
            asg.set_int(cfg.opn, r, step.op - 0x16)
        elif st == ES.NOT:
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
        elif st in (ES.BLOCK_CTX, ES.TX_CTX):
            put_word(0, vals[0].value)
            asg.set_int(cfg.opn, r, dict(_opmap())[step.op])
            put_pcell(0, _group_prev(rws, vals[0]))
        elif st == ES.PC_GAS:
            put_word(0, vals[0].value)
            asg.set_int(cfg.is_sub, r, 1 if step.op == 0x5A else 0)
            put_pcell(0, _group_prev(rws, vals[0]))
        elif st == ES.ACCT_INFO:
            put_word(0, vals[0].value)  # address
            asg.set_int(cfg.warm, r, vals[1].value_prev)
            put_word(1, vals[2].value)  # account field value
            asg.set_int(cfg.opn, r, dict(_opmap())[step.op])
        elif st == ES.CODESIZE:
            put_word(0, vals[0].value)
            put_pcell(0, _group_prev(rws, vals[0]))
        elif st == ES.EXTCODESIZE:
            put_word(0, vals[0].value)  # address
            asg.set_int(cfg.warm, r, vals[1].value_prev)
            put_word(1, vals[2].value)  # account code hash
            put_word(2, vals[3].value)  # code length
        elif st == ES.SELFBALANCE:
            put_word(2, vals[0].value)  # callee address
            put_word(0, vals[1].value)  # balance
            put_pcell(1, _group_prev(rws, vals[2]))
        elif st == ES.SHA3:
            off, ln = vals[0].value, vals[1].value
            dg = vals[-1].value
            nw = len(vals) - 3
            put_word(0, off)
            put_word(1, ln)
            put_word(2, dg)
            put_word(3, off // 32)
            put_pcell(2, _group_prev(rws, vals[-1]))
            asg.set_int(cfg.opn, r, nw)
            slack_v = 32 * nw - ln
            asg.set_int(cfg.bb0, r, slack_v & 15)
            asg.set_int(cfg.carries[0], r, slack_v >> 4)
            asg.set_int(cfg.aux[0], r, step.gas_cost - 30 - 6 * nw)
        elif st == ES.COPY:
            doff, soff, ln = (vals[0].value, vals[1].value, vals[2].value)
            nw = len(vals) - 3
            put_word(0, doff)
            put_word(1, ln)
            put_word(2, soff)
            put_word(3, doff // 32)
            asg.set_int(cfg.opn, r, nw)
            slack_v = 32 * nw - ln
            asg.set_int(cfg.bb0, r, slack_v & 15)
            asg.set_int(cfg.carries[0], r, slack_v >> 4)
            asg.set_int(cfg.carries[1], r, 1 if step.op == 0x37 else 0)
            asg.set_int(cfg.carries[2], r, 1 if step.op == 0x39 else 0)
            asg.set_int(cfg.aux[0], r, step.gas_cost - 3 - 3 * nw)
        elif st == ES.MCOPY:
            doff, soff, ln = (vals[0].value, vals[1].value, vals[2].value)
            nw = (len(vals) - 3) // 2
            put_word(0, doff)
            put_word(1, ln)
            put_word(2, soff)
            put_word(3, doff // 32)
            put_pcell(2, soff // 32)
            asg.set_int(cfg.opn, r, nw)
            asg.set_int(cfg.aux[0], r, step.gas_cost - 3 - 3 * nw)
        elif st == ES.LOG:
            off, ln = vals[0].value, vals[1].value
            ntop = step.op - 0xA0
            nw = len(vals) - 3 - ntop
            log_row = vals[2 + ntop + nw]
            put_word(0, off)
            put_word(1, ln)
            put_word(2, callee)
            put_word(3, off // 32)
            tw_cfg = [cfg.w[4], cfg.w[5], cfg.pcell[0], cfg.pcell[1]]
            for ti in range(ntop):
                tv = vals[2 + ti].value
                asg.set_int(cfg.inr.columns[ti], r, 1)
                asg.set_int(tw_cfg[ti][0], r, tv & M128)
                asg.set_int(tw_cfg[ti][1], r, tv >> 128)
            asg.set_int(cfg.opn, r, nw)
            slack_v = 32 * nw - ln
            asg.set_int(cfg.bb0, r, slack_v & 15)
            asg.set_int(cfg.carries[0], r, slack_v >> 4)
            asg.set_int(cfg.aux[0], r,
                        step.gas_cost - 375 - 375 * ntop - 8 * ln)
            asg.set_int(cfg.aux[1], r, log_row.address)
        elif st in (ES.ADDMOD, ES.MULMOD):
            a, b_, N = vals[0].value, vals[1].value, vals[2].value
            res = vals[3].value
            put_word(0, a)
            put_word(1, b_)
            put_word(2, N)
            put_word(3, res)
            _set_inv(asg, cfg.iz["n_lo"], r, N & M128)
            _set_inv(asg, cfg.iz["n_hi"], r, N >> 128)
            nz = 1 if N == 0 else 0
            asg.set_int(cfg.nzc, r, nz)
            asg.set_int(cfg.am_en if st == ES.ADDMOD else cfg.mm_en,
                        r, 1 - nz)
            if N:
                a_red = a % N
                put_word(4, a_red)
                put_word(5, a // N)
                if st == ES.ADDMOD:
                    s_full = a_red + b_
                    asg.set_int(
                        cfg.carries[0], r,
                        1 if (a_red & M128) + (b_ & M128) > M128 else 0)
                    asg.set_int(cfg.carries[1], r, s_full >> 256)
                    put_pcell(2, s_full // N)
                else:
                    full = a_red * b_
                    put_pcell(0, full & M256)
                    put_pcell(1, full >> 256)
                    put_pcell(2, full // N)
        elif st == ES.EXP:
            base, e_, res = vals[0].value, vals[1].value, vals[2].value
            put_word(0, base)
            put_word(1, e_)
            put_word(2, res)
            _set_inv(asg, cfg.iz["x_elo"], r, e_ & M128)
            _set_inv(asg, cfg.iz["x_ehi"], r, e_ >> 128)
            _set_inv(asg, cfg.iz["x_e1"], r, ((e_ & M128) - 1) % FR_MOD)
            for i, c in enumerate(cfg.ltg.limbs):
                asg.set_int(c, r, (e_ >> (8 * i)) & 0xFF)
            if e_:
                nbytes = (e_.bit_length() + 7) // 8
                asg.set_int(cfg.msb.columns[nbytes - 1], r, 1)
                mb = (e_ >> (8 * (nbytes - 1))) & 0xFF
                asg.set_int(cfg.minv, r, pow(mb, FR_MOD - 2, FR_MOD))
            asg.set_int(cfg.vcell2, r, 1 if e_ >= 2 else 0)
        elif st == ES.BYTE:
            i_, x = vals[0].value, vals[1].value
            put_word(0, i_)
            put_word(1, x)
            put_word(2, vals[2].value)
            valid = 1 if i_ < 32 else 0
            asg.set_int(cfg.byv, r, valid)
            lt_assign(asg, cfg.ltg, r, i_, 32)
            if valid:
                P = 1 << (8 * (31 - i_))
                q1, r1 = divmod(x, P)
                put_word(3, P)
                put_word(4, q1)
                put_pcell(0, r1)
                put_word(5, q1 >> 8)
        elif st == ES.SIGNEXTEND:
            i_, x = vals[0].value, vals[1].value
            put_word(0, i_)
            put_word(1, x)
            put_word(2, vals[2].value)
            valid = 1 if i_ < 31 else 0
            asg.set_int(cfg.sev, r, valid)
            lt_assign(asg, cfg.ltg, r, i_, 31)
            if valid:
                P = 1 << (8 * (i_ + 1))
                P256 = P >> 8
                q_, rr_ = divmod(x, P)
                btop, r2 = divmod(rr_, P256)
                put_word(3, P)
                put_word(4, q_)
                put_word(5, rr_)
                put_pcell(0, P256)
                put_pcell(2, r2)
                asg.set_int(cfg.opn, r, btop)
                asg.set_int(cfg.carries[2], r, 1 if btop >= 128 else 0)
                _set_inv(asg, cfg.iz["se_ph"], r, P >> 128)
        elif st == ES.CALL1:
            hv_ = 1 if step.op in (0xF1, 0xF2) else 0
            cc_ = 1 if step.op == 0xF1 else 0
            dc_ = 1 if step.op == 0xF4 else 0
            asg.set_int(cfg.is_sub, r, hv_)
            asg.set_int(cfg.m_div, r, cc_)
            asg.set_int(cfg.m_mod, r, dc_)
            put_word(0, vals[0].value)  # gas_req
            put_word(1, vals[1].value)  # to word
            if hv_:
                v_ = vals[2].value
                put_word(2, v_)
                put_word(3, vals[3].value)
                put_word(4, vals[4].value)
                put_pcell(0, vals[5].value)
                put_pcell(1, vals[6].value)
            else:
                v_ = 0
                put_word(3, vals[2].value)
                put_word(4, vals[3].value)
                put_pcell(0, vals[4].value)
                put_pcell(1, vals[5].value)
            _set_inv(asg, cfg.iz["cv_lo"], r, v_ & M128)
            _set_inv(asg, cfg.iz["cv_hi"], r, v_ >> 128)
            asg.set_int(cfg.vnz, r, 1 if v_ else 0)
            cur_ccid = by_rwc[steps[r + 1].rw_indices[3]].id
            asg.set_int(cfg.ccid, r, cur_ccid)
        elif st == ES.CALL2:
            asg.set_int(cfg.ccid, r, cur_ccid)
            asg.set_int(cfg.warm, r, vals[0].value_prev)
            new_s, prev_s = vals[1].value, vals[1].value_prev
            new_r, prev_r = vals[2].value, vals[2].value_prev
            xfer = prev_s - new_s
            put_word(0, new_s)
            put_word(1, new_r)
            asg.set_int(cfg.carries[0], r,
                        1 if (new_s & M128) + (xfer & M128) > M128 else 0)
            asg.set_int(cfg.carries[1], r,
                        1 if (new_r & M128) < (xfer & M128) else 0)
            # the callee address word byte grid (from the CALL1 row)
            to_word = by_rwc[steps[r - 1].rw_indices[1]].value
            for i, c in enumerate(cfg.ltg.limbs):
                asg.set_int(c, r, (to_word >> (8 * i)) & 0xFF)
            put_word(3, vals[4].value)  # caller address halves
            put_word(4, vals[5].value)  # child self address halves
            put_word(5, vals[6].value)  # code address halves
        elif st == ES.CALL3:
            asg.set_int(cfg.ccid, r, cur_ccid)
            put_word(0, vals[0].value)  # child VALUE word
            asg.set_int(cfg.aux[2], r, vals[3].value)  # is_success
        elif st == ES.CALL4:
            asg.set_int(cfg.ccid, r, cur_ccid)
            save_gas = vals[0].value
            child_gas = steps[r + 1].gas_left
            c1 = steps[r - 3]
            hv_ = 1 if c1.op in (0xF1, 0xF2) else 0
            vnz_ = 1 if (hv_ and by_rwc[c1.rw_indices[2]].value) else 0
            fwd = child_gas - (2300 if vnz_ else 0)
            asg.set_int(cfg.opn, r, fwd)
            gcb = step.gas_left - fwd - save_gas
            asg.set_int(cfg.aux[0], r, gcb)
            warm_ = by_rwc[steps[r - 2].rw_indices[0]].value_prev
            mexp = gcb - 100 - 2500 * (1 - warm_) - 9000 * vnz_
            assert mexp >= 0, "negative call base-gas residual"
            asg.set_int(cfg.bb0, r, mexp)
            put_word(0, vals[2].value)  # packed self+static save halves
            put_word(1, vals[3].value)  # child code hash halves
        elif st == ES.PRE1:
            hv_ = 1 if step.op in (0xF1, 0xF2) else 0
            asg.set_int(cfg.is_sub, r, hv_)
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            if hv_:
                put_word(2, vals[2].value)
                put_word(3, vals[3].value)
                put_word(4, vals[4].value)
                put_pcell(0, vals[5].value)
                put_pcell(1, vals[6].value)
            else:
                put_word(3, vals[2].value)
                put_word(4, vals[3].value)
                put_pcell(0, vals[4].value)
                put_pcell(1, vals[5].value)
        elif st == ES.PRE_EC:
            # vals: [access, hash, v, r, s, out word, result]
            for kk in range(4):
                put_word(kk, vals[1 + kk].value)
            put_word(4, vals[5].value)
            put_pcell(0, vals[5].value_prev)
            asg.set_int(cfg.pw_i, r, vals[1].address)
            asg.set_int(cfg.pw_o, r, vals[5].address)
            put_pcell(1, _group_prev(rws, vals[6]))
            asg.set_int(cfg.aux[0], r, step.gas_cost - 3100)
            raw = vals[1].value
            q_ = raw // _SECP_N
            zr = raw - q_ * _SECP_N
            c1 = 1 if (zr & M128) + q_ * (_SECP_N & M128) >= (1 << 128) \
                else 0
            asg.set_int(cfg.m_div, r, q_)
            asg.set_int(cfg.m_mod, r, c1)
            put_pcell(2, zr)
        elif st in (ES.PRE_ECA, ES.PRE_ECM):
            # ecAdd vals: [access, x1, y1, x2, y2, out0, out1, result]
            # ecMul vals: [access, px, py, k, out0, out1, result]
            nin = 4 if st == ES.PRE_ECA else 3
            for kk in range(nin):
                put_word(kk, vals[1 + kk].value)
            out0, out1 = vals[1 + nin], vals[2 + nin]
            put_word(4, out0.value)
            put_word(5, out1.value)
            put_pcell(0, out0.value_prev)
            put_pcell(1, out1.value_prev)
            asg.set_int(cfg.pw_i, r, vals[1].address)
            asg.set_int(cfg.pw_o, r, out0.address)
            put_pcell(2, _group_prev(rws, vals[3 + nin]))
            base_g = 250 if st == ES.PRE_ECA else 6100
            asg.set_int(cfg.aux[0], r, step.gas_cost - base_g)
        elif st == ES.PRE_SHA:
            # vals: [access, <opn copy-range reads>, out word, result]
            outv = vals[-2]
            put_word(4, outv.value)
            put_pcell(0, outv.value_prev)
            asg.set_int(cfg.pw_o, r, outv.address)
            put_pcell(1, _group_prev(rws, vals[-1]))
            nw = len(vals) - 3
            asg.set_int(cfg.opn, r, nw)
            prev_step = steps[r - 1]
            hv_ = 1 if prev_step.op in (0xF1, 0xF2) else 0
            in_off = by_rwc[prev_step.rw_indices[2 + hv_]].value
            iln = by_rwc[prev_step.rw_indices[3 + hv_]].value
            asg.set_int(cfg.pw_i, r, in_off // 32)
            slack_v = 32 * nw - iln
            asg.set_int(cfg.bb0, r, slack_v & 15)
            asg.set_int(cfg.carries[0], r, slack_v >> 4)
            cnt_ = (nw + 1) // 2
            asg.set_int(cfg.p_cnt, r, cnt_)
            asg.set_int(cfg.aux[0], r, step.gas_cost - 160 - 12 * cnt_)
        elif st == ES.RESTORE:
            asg.set_int(cfg.w[2][0], r, vals[0].value)  # caller id
            asg.set_int(cfg.aux[1], r, vals[1].value)  # success
            asg.set_int(cfg.w[3][0], r, vals[2].value)  # resume pc
            # resume sp (lo) + caller mws (hi) — the packed save
            asg.set_int(cfg.w[4][0], r, vals[3].value & M128)
            asg.set_int(cfg.w[4][1], r, vals[3].value >> 128)
            asg.set_int(cfg.w[5][0], r, vals[4].value)  # saved base gas
            put_word(0, vals[5].value)  # caller code hash
            put_word(1, vals[6].value)  # packed caller self+static
            asg.set_int(cfg.warm, r, vals[6].value >> 160)
            put_pcell(0, _group_prev(rws, vals[7]))
        elif st in (ES.RETURN, ES.REVERT):
            put_word(0, vals[0].value)
            put_word(1, vals[1].value)
            asg.set_int(cfg.aux[0], r, step.gas_cost)  # mexp witness
            _set_inv(asg, cfg.iz["root"], r, step.depth - 1)
            if st == ES.REVERT and r + 1 < len(steps):
                gap = (steps[r + 1].rw_counter_start
                       - step.rw_counter_start - 2)
                asg.set_int(cfg.opn, r, gap)
            if st == ES.RETURN and calls_map \
                    and step.call_id in calls_map \
                    and calls_map[step.call_id].is_create:
                # code deposit: [off, len, <nw mem reads>, hash write]
                ln_ = vals[1].value
                nw_ = len(vals) - 3
                asg.set_int(cfg.opn, r, nw_)
                put_word(4, vals[-1].value)  # deposited code hash
                if "dep_lo" in cfg.iz:
                    _set_inv(asg, cfg.iz["dep_lo"], r, ln_ & M128)
                    _set_inv(asg, cfg.iz["dep_hi"], r, ln_ >> 128)
                asg.set_int(cfg.vnz, r, 1 if ln_ else 0)
        elif st == ES.SAR:
            shift, x = vals[0].value, vals[1].value
            put_word(0, shift)
            put_word(1, x)
            put_word(2, vals[2].value)
            btop, rest = divmod(x, 1 << 248)
            asg.set_int(cfg.aux[0], r, btop)
            put_pcell(0, rest)
            sgn = 1 if btop >= 128 else 0
            asg.set_int(cfg.carries[2], r, sgn)
            s0 = shift & 0xFF
            asg.set_int(cfg.opn, r, s0)
            diff = (shift & M128) - s0
            for i, c in enumerate(cfg.ltg.limbs):
                asg.set_int(c, r, (diff >> (8 * i)) & 0xFF)
            _set_inv(asg, cfg.iz["sh_hi"], r, shift >> 128)
            _set_inv(asg, cfg.iz["sh_rest"], r, diff >> 8)
            _set_inv(asg, cfg.iz["sar_sz"], r, s0)
            valid = 1 if shift < 256 else 0
            asg.set_int(cfg.vcell, r, valid)
            asg.set_int(cfg.sarm, r, 1 if (valid and s0) else 0)
            if valid:
                P = 1 << s0
                q_, rem = divmod(x, P)
                put_word(3, P)
                put_word(4, q_)
                put_pcell(2, rem)
                if s0:
                    T = 1 << (256 - s0)
                    put_pcell(1, T)
                    _set_inv(asg, cfg.iz["sar_th"], r, T >> 128)
                    mask = (1 << 256) - T
                    asg.set_int(cfg.bb0, r, mask & M128)
                    asg.set_int(cfg.bb1, r, mask >> 128)

    # EndBlock padding
    for r in range(len(steps), m):
        asg.set_int(cfg.sel.columns[int(ES.END_BLOCK)], r, 1)
        asg.set_int(cfg.dep, r, 1)
        asg.set_int(cfg.tx_id, r, cur_tx)
        asg.set_int(cfg.cid, r, steps[-1].call_id if steps else 1)
        asg.set_int(cfg.gas_left, r, end_gas)
        asg.set_int(cfg.sp, r, STACK_CAP)
        asg.set_int(cfg.rwc, r, end_rwc)
        asg.set_int(cfg.code_hash, r, ch_lo)
        asg.set_int(cfg.code_hash_hi, r, ch_hi)
        asg.set_int(cfg.callee, r, callee)
    return asg


def lt_assign(asg: Assignment, ltg, row: int, lhs: int, rhs: int) -> None:
    """Witness the 32-limb LtGadget at one row: lt = [lhs < rhs] and the
    byte decomposition of lhs - rhs + lt*2^256."""
    lt = 1 if lhs < rhs else 0
    diff = lhs - rhs + lt * (1 << 256)
    asg.set_int(ltg.lt, row, lt)
    for i, c in enumerate(ltg.limbs):
        asg.set_int(c, row, (diff >> (8 * i)) & 0xFF)


def _set_inv(asg: Assignment, gadget, row: int, value: int) -> None:
    if value % FR_MOD:
        asg.set_int(gadget.inv, row, pow(value % FR_MOD, FR_MOD - 2, FR_MOD))


def word_arith_ops(steps: list[ExecStep], rws: RwMap) -> list:
    """Collect the WordArithTable rows the EVM steps will look up
    (the satellite circuit's witness; one op per MUL/DIV/MOD/valid-shift
    step)."""
    from zkevm_tpu.circuits.word_arith import WordArithOp, WordOp

    by_rwc = {row.rw_counter: row for row in rws.rows}
    ops = []
    for step in steps:
        st = _state_of(step)
        if st in (ES.ADDMOD, ES.MULMOD):
            vals = [by_rwc[i] for i in step.rw_indices]
            a, b, N, res = (v.value for v in vals[:4])
            if not N:
                continue
            a_red = a % N
            ops.append(WordArithOp(WordOp.DIVMOD, a // N, N, a_red))
            if st == ES.ADDMOD:
                ops.append(
                    WordArithOp(WordOp.DIVMOD512, (a_red + b) // N, N, res))
            else:
                full = a_red * b
                ops.append(WordArithOp(WordOp.MUL512, a_red, b, 0))
                ops.append(WordArithOp(WordOp.DIVMOD512, full // N, N, res))
            continue
        if st in (ES.BYTE, ES.SIGNEXTEND, ES.SAR):
            vals = [by_rwc[i] for i in step.rw_indices]
            i_, x = vals[0].value, vals[1].value
            if st == ES.BYTE and i_ < 32:
                P = 1 << (8 * (31 - i_))
                q1, r1 = divmod(x, P)
                ops.append(WordArithOp(WordOp.DIVMOD, q1, P, r1))
                ops.append(WordArithOp(WordOp.DIVMOD, q1 >> 8, 256, q1 & 0xFF))
            elif st == ES.SIGNEXTEND and i_ < 31:
                P = 1 << (8 * (i_ + 1))
                q_, rr_ = divmod(x, P)
                btop, r2 = divmod(rr_, P >> 8)
                ops.append(WordArithOp(WordOp.DIVMOD, q_, P, rr_))
                ops.append(WordArithOp(WordOp.DIVMOD, btop, P >> 8, r2))
            elif st == ES.SAR:
                btop, rest = divmod(x, 1 << 248)
                ops.append(WordArithOp(WordOp.DIVMOD, btop, 1 << 248, rest))
                if i_ < 256:
                    q_, rem = divmod(x, 1 << (i_ & 0xFF))
                    ops.append(
                        WordArithOp(WordOp.DIVMOD, q_, 1 << (i_ & 0xFF), rem))
            continue
        if st == ES.SDIV_SMOD:
            vals = [by_rwc[i] for i in step.rw_indices]
            a, b = vals[0].value, vals[1].value
            aa = (1 << 256) - a if a >> 255 else a
            ab = (1 << 256) - b if b >> 255 else b
            if ab:
                q, rem = divmod(aa, ab)
                ops.append(WordArithOp(WordOp.DIVMOD, q, ab, rem))
            continue
        if st not in (ES.MUL_DIV_MOD, ES.SHL_SHR):
            continue
        vals = [by_rwc[i] for i in step.rw_indices]
        x, y, res = vals[0].value, vals[1].value, vals[2].value
        if st == ES.MUL_DIV_MOD:
            if step.op == 0x02:
                ops.append(WordArithOp(WordOp.MUL, x, y, 0))
            elif y:  # DIV/MOD with nonzero divisor
                q, rem = divmod(x, y)
                ops.append(WordArithOp(WordOp.DIVMOD, q, y, rem))
        else:  # SHL/SHR
            shift, value = x, y
            if shift < 256:
                p = 1 << shift
                if step.op == 0x1B:
                    ops.append(WordArithOp(WordOp.MUL, value, p, 0))
                else:
                    q, rem = divmod(value, p)
                    ops.append(WordArithOp(WordOp.DIVMOD, q, p, rem))
    return ops


def exp_events(steps: list[ExecStep], rws: RwMap) -> list:
    """(base, exponent) pairs the EXP steps look up in the ExpTable
    (exponent >= 2 only; 0/1 are handled inline by the EXP state)."""
    by_rwc = {row.rw_counter: row for row in rws.rows}
    evs = []
    for step in steps:
        if step.exec_state is None and step.op == 0x0A:
            vals = [by_rwc[i] for i in step.rw_indices]
            if vals[1].value >= 2:
                evs.append((vals[0].value, vals[1].value))
    return evs


def bitwise_events(steps: list[ExecStep], rws: RwMap) -> list:
    """Collect the BitwiseTable rows the EVM steps will look up."""
    from zkevm_tpu.circuits.bitwise_circuit import BitOp, BitwiseEvent

    by_rwc = {row.rw_counter: row for row in rws.rows}
    evs = []
    for step in steps:
        st = _state_of(step)
        if st == ES.AND_OR_XOR:
            vals = [by_rwc[i] for i in step.rw_indices]
            evs.append(BitwiseEvent(BitOp(step.op - 0x15),
                                    vals[0].value, vals[1].value))
        elif st == ES.NOT:
            vals = [by_rwc[i] for i in step.rw_indices]
            evs.append(BitwiseEvent(BitOp.XOR, vals[0].value,
                                    (1 << 256) - 1))
    return evs


def _group_prev(rws: RwMap, row) -> int:
    """The value this row's group held before it (for free value_prev
    cells): the closest earlier row with the same key, else row.value_prev."""
    key = row.sort_key()[:5]
    best = None
    for r in rws.rows:
        if r.sort_key()[:5] == key and r.rw_counter < row.rw_counter:
            if best is None or r.rw_counter > best.rw_counter:
                best = r
    return best.value if best is not None else row.value_prev
