"""Ethereum types layer (reference counterpart: eth-types/, ~6.8k LoC —
/root/reference/eth-types/src/lib.rs): words, opcode ids + gas schedule,
geth trace structures, StateDB/CodeDB, bytecode builder."""

from zkevm_tpu.etypes.opcodes import OpcodeId, OPCODES
from zkevm_tpu.etypes.state import Account, CodeDB, StateDB

__all__ = ["OpcodeId", "OPCODES", "Account", "CodeDB", "StateDB"]
