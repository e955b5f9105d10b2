"""EVM opcode table: ids, mnemonics, stack effects, constant gas.

Reference counterpart: eth-types/src/evm_types/opcode_ids.rs +
eth-types/src/evm_types/gas_utils.rs (constant-gas portion). Dynamic gas
(memory expansion, cold/warm access, copies) is computed by the opcode
handlers in zkevm_tpu.witness.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum


@dataclass(frozen=True)
class OpInfo:
    name: str
    pops: int
    pushes: int
    gas: int  # constant part


class OpcodeId(IntEnum):
    STOP = 0x00
    ADD = 0x01
    MUL = 0x02
    SUB = 0x03
    DIV = 0x04
    SDIV = 0x05
    MOD = 0x06
    SMOD = 0x07
    ADDMOD = 0x08
    MULMOD = 0x09
    EXP = 0x0A
    SIGNEXTEND = 0x0B
    LT = 0x10
    GT = 0x11
    SLT = 0x12
    SGT = 0x13
    EQ = 0x14
    ISZERO = 0x15
    AND = 0x16
    OR = 0x17
    XOR = 0x18
    NOT = 0x19
    BYTE = 0x1A
    SHL = 0x1B
    SHR = 0x1C
    SAR = 0x1D
    SHA3 = 0x20
    ADDRESS = 0x30
    BALANCE = 0x31
    ORIGIN = 0x32
    CALLER = 0x33
    CALLVALUE = 0x34
    CALLDATALOAD = 0x35
    CALLDATASIZE = 0x36
    CALLDATACOPY = 0x37
    CODESIZE = 0x38
    CODECOPY = 0x39
    GASPRICE = 0x3A
    EXTCODESIZE = 0x3B
    EXTCODECOPY = 0x3C
    RETURNDATASIZE = 0x3D
    RETURNDATACOPY = 0x3E
    EXTCODEHASH = 0x3F
    BLOCKHASH = 0x40
    COINBASE = 0x41
    TIMESTAMP = 0x42
    NUMBER = 0x43
    DIFFICULTY = 0x44
    GASLIMIT = 0x45
    CHAINID = 0x46
    SELFBALANCE = 0x47
    BASEFEE = 0x48
    POP = 0x50
    MLOAD = 0x51
    MSTORE = 0x52
    MSTORE8 = 0x53
    SLOAD = 0x54
    SSTORE = 0x55
    JUMP = 0x56
    JUMPI = 0x57
    PC = 0x58
    MSIZE = 0x59
    GAS = 0x5A
    JUMPDEST = 0x5B
    PUSH0 = 0x5F
    PUSH1 = 0x60  # PUSH1..PUSH32 = 0x60..0x7F
    PUSH32 = 0x7F
    DUP1 = 0x80  # DUP1..DUP16
    DUP16 = 0x8F
    SWAP1 = 0x90  # SWAP1..SWAP16
    SWAP16 = 0x9F
    LOG0 = 0xA0
    LOG4 = 0xA4
    CREATE = 0xF0
    CALL = 0xF1
    CALLCODE = 0xF2
    RETURN = 0xF3
    DELEGATECALL = 0xF4
    CREATE2 = 0xF5
    STATICCALL = 0xFA
    REVERT = 0xFD
    INVALID = 0xFE
    SELFDESTRUCT = 0xFF


GAS_QUICK, GAS_FASTEST, GAS_FAST, GAS_MID, GAS_SLOW, GAS_EXT = 2, 3, 5, 8, 10, 20

OPCODES: dict[int, OpInfo] = {}


def _op(code, name, pops, pushes, gas):
    OPCODES[code] = OpInfo(name, pops, pushes, gas)


_op(0x00, "STOP", 0, 0, 0)
for c, nm in [(0x01, "ADD"), (0x03, "SUB")]:
    _op(c, nm, 2, 1, GAS_FASTEST)
for c, nm in [(0x02, "MUL"), (0x04, "DIV"), (0x05, "SDIV"), (0x06, "MOD"), (0x07, "SMOD")]:
    _op(c, nm, 2, 1, GAS_FAST)
_op(0x08, "ADDMOD", 3, 1, GAS_MID)
_op(0x09, "MULMOD", 3, 1, GAS_MID)
_op(0x0A, "EXP", 2, 1, GAS_SLOW)
_op(0x0B, "SIGNEXTEND", 2, 1, GAS_FAST)
for c, nm in [(0x10, "LT"), (0x11, "GT"), (0x12, "SLT"), (0x13, "SGT"), (0x14, "EQ")]:
    _op(c, nm, 2, 1, GAS_FASTEST)
_op(0x15, "ISZERO", 1, 1, GAS_FASTEST)
for c, nm in [(0x16, "AND"), (0x17, "OR"), (0x18, "XOR")]:
    _op(c, nm, 2, 1, GAS_FASTEST)
_op(0x19, "NOT", 1, 1, GAS_FASTEST)
_op(0x1A, "BYTE", 2, 1, GAS_FASTEST)
for c, nm in [(0x1B, "SHL"), (0x1C, "SHR"), (0x1D, "SAR")]:
    _op(c, nm, 2, 1, GAS_FASTEST)
_op(0x20, "SHA3", 2, 1, 30)
_op(0x30, "ADDRESS", 0, 1, GAS_QUICK)
_op(0x31, "BALANCE", 1, 1, 100)
_op(0x32, "ORIGIN", 0, 1, GAS_QUICK)
_op(0x33, "CALLER", 0, 1, GAS_QUICK)
_op(0x34, "CALLVALUE", 0, 1, GAS_QUICK)
_op(0x35, "CALLDATALOAD", 1, 1, GAS_FASTEST)
_op(0x36, "CALLDATASIZE", 0, 1, GAS_QUICK)
_op(0x37, "CALLDATACOPY", 3, 0, GAS_FASTEST)
_op(0x38, "CODESIZE", 0, 1, GAS_QUICK)
_op(0x39, "CODECOPY", 3, 0, GAS_FASTEST)
_op(0x3A, "GASPRICE", 0, 1, GAS_QUICK)
# EIP-2929 warm base costs; cold surcharge is dynamic (witness handlers)
_op(0x3B, "EXTCODESIZE", 1, 1, 100)
_op(0x3C, "EXTCODECOPY", 4, 0, 100)
_op(0x3D, "RETURNDATASIZE", 0, 1, GAS_QUICK)
_op(0x3E, "RETURNDATACOPY", 3, 0, GAS_FASTEST)
_op(0x3F, "EXTCODEHASH", 1, 1, 100)
_op(0x40, "BLOCKHASH", 1, 1, GAS_EXT)
_op(0x41, "COINBASE", 0, 1, GAS_QUICK)
_op(0x42, "TIMESTAMP", 0, 1, GAS_QUICK)
_op(0x43, "NUMBER", 0, 1, GAS_QUICK)
_op(0x44, "DIFFICULTY", 0, 1, GAS_QUICK)
_op(0x45, "GASLIMIT", 0, 1, GAS_QUICK)
_op(0x46, "CHAINID", 0, 1, GAS_QUICK)
_op(0x47, "SELFBALANCE", 0, 1, GAS_FAST)
_op(0x48, "BASEFEE", 0, 1, GAS_QUICK)
_op(0x50, "POP", 1, 0, GAS_QUICK)
_op(0x51, "MLOAD", 1, 1, GAS_FASTEST)
_op(0x52, "MSTORE", 2, 0, GAS_FASTEST)
_op(0x53, "MSTORE8", 2, 0, GAS_FASTEST)
_op(0x54, "SLOAD", 1, 1, 100)
_op(0x55, "SSTORE", 2, 0, 100)
_op(0x56, "JUMP", 1, 0, GAS_MID)
_op(0x57, "JUMPI", 2, 0, GAS_SLOW)
_op(0x58, "PC", 0, 1, GAS_QUICK)
_op(0x59, "MSIZE", 0, 1, GAS_QUICK)
_op(0x5A, "GAS", 0, 1, GAS_QUICK)
_op(0x5B, "JUMPDEST", 0, 0, 1)
_op(0x5E, "MCOPY", 3, 0, GAS_FASTEST)  # EIP-5656 (Cancun)
_op(0x5F, "PUSH0", 0, 1, GAS_QUICK)
for i in range(32):
    _op(0x60 + i, f"PUSH{i+1}", 0, 1, GAS_FASTEST)
for i in range(16):
    _op(0x80 + i, f"DUP{i+1}", i + 1, i + 2, GAS_FASTEST)
for i in range(16):
    _op(0x90 + i, f"SWAP{i+1}", i + 2, i + 2, GAS_FASTEST)
for i in range(5):
    _op(0xA0 + i, f"LOG{i}", 2 + i, 0, 375)
_op(0xF0, "CREATE", 3, 1, 32000)
_op(0xF1, "CALL", 7, 1, 100)
_op(0xF2, "CALLCODE", 7, 1, 100)
_op(0xF3, "RETURN", 2, 0, 0)
_op(0xF4, "DELEGATECALL", 6, 1, 100)
_op(0xF5, "CREATE2", 4, 1, 32000)
_op(0xFA, "STATICCALL", 6, 1, 100)
_op(0xFD, "REVERT", 2, 0, 0)
_op(0xFE, "INVALID", 0, 0, 0)
_op(0xFF, "SELFDESTRUCT", 1, 0, 5000)


def is_push(code: int) -> bool:
    return 0x60 <= code <= 0x7F


def push_size(code: int) -> int:
    return code - 0x5F if is_push(code) else 0
