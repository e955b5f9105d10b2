"""Shared lookup-table fabric + challenge/RLC idiom.

Reference counterparts:
- `Challenges { evm_word, keccak_input, lookup_input }`
  (zkevm-circuits/src/util.rs:55-66): three after-phase-0 challenges that
  every subcircuit shares; word values and variable-length byte streams
  are bound as random linear combinations (RLC) under them.
- `table.rs` (zkevm-circuits/src/table.rs:208-3322): each shared table
  (KeccakTable, BytecodeTable, ...) is a set of columns one circuit FILLS
  and other circuits LOOK UP — the composition mechanism of the zkEVM.

TPU-native difference: a table here is a set of *expressions* (columns at
rotations, selector-gated), not dedicated columns — the owning circuit's
own working columns serve as the table surface directly, so exposing a
table costs zero extra commitments. Consumers register ordinary lookups
against the exprs. Disabled rows compress to the all-zero tuple, which
only matches consumers' disabled (all-zero) input tuples.

RLC conventions (shared by producers and consumers):
- byte-stream RLC (keccak_input): acc = 0; for each byte in stream order:
  acc = acc * r + byte.
- word/hash RLC (evm_word): same fold over the 32 digest bytes in digest
  order (digest[0] first).
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.plonk.cs import Challenge, ConstraintSystem
from zkevm_tpu.plonk.expr import Expr


@dataclass
class Challenges:
    """The shared challenge set (util.rs:55). All three are usable after
    phase 0: phase-0 advice carries raw bytes/bits, phase-1 advice carries
    the RLC accumulators."""

    evm_word: Challenge
    keccak_input: Challenge
    lookup_input: Challenge

    @classmethod
    def configure(cls, cs: ConstraintSystem) -> "Challenges":
        return cls(
            cs.challenge_usable_after(0),
            cs.challenge_usable_after(0),
            cs.challenge_usable_after(0),
        )


def rlc_bytes(data: bytes, r: int) -> int:
    """Host-side golden for the byte-stream RLC convention above."""
    acc = 0
    for b in data:
        acc = (acc * r + b) % FR_MOD
    return acc


@dataclass
class KeccakTable:
    """One row per FINAL sponge permutation (table.rs:1435 KeccakTable:
    is_enabled, input_rlc, input_len, output). Filled by the keccak table
    circuit; consumed by bytecode/tx/... circuits. The digest is exposed
    both as RLC(evm_word) and as (lo, hi) 128-bit halves — the halves are
    free expressions over the digest bit rows (no extra columns) and let
    phase-0 consumers (RwTable word-lo-hi fabric, EVM circuit code_hash)
    link hashes without touching phase-1."""

    enabled: Expr
    input_rlc: Expr  # RLC(keccak_input) over the unpadded message bytes
    input_len: Expr
    output_rlc: Expr  # RLC(evm_word) over the 32 digest bytes
    output_lo: Expr  # low 128 bits of the big-endian digest integer
    output_hi: Expr

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               input_rlc: Expr, input_len: Expr, output_rlc: Expr) -> None:
        """Register `keccak(stream with rlc/len) == digest with output_rlc`
        gated by q (q must be 0/1; all inputs are multiplied by it)."""
        cs.lookup(
            name,
            [
                (q, self.enabled),
                (q * input_rlc, self.input_rlc),
                (q * input_len, self.input_len),
                (q * output_rlc, self.output_rlc),
            ],
        )

    def lookup_word(self, cs: ConstraintSystem, name: str, q: Expr,
                    input_rlc: Expr, input_len: Expr,
                    output_lo: Expr, output_hi: Expr) -> None:
        """Like lookup, but against the digest's (lo, hi) word halves."""
        cs.lookup(
            name,
            [
                (q, self.enabled),
                (q * input_rlc, self.input_rlc),
                (q * input_len, self.input_len),
                (q * output_lo, self.output_lo),
                (q * output_hi, self.output_hi),
            ],
        )


@dataclass
class RwTable:
    """The state circuit's canonical 12-expression surface
    (table.rs:613 RwTable): [enabled, rw_counter, is_write, tag, id,
    address, field_tag, storage_key, value_lo, value_hi, value_prev_lo,
    value_prev_hi]. Values are 128-bit halves (see state_circuit docstring
    on the word-lo-hi choice). Disabled rows compress to the all-zero
    tuple because every expression is q_active-gated."""

    exprs: list

    FIELDS = [
        "enabled", "rw_counter", "is_write", "tag", "id", "address",
        "field_tag", "storage_key", "value_lo", "value_hi",
        "value_prev_lo", "value_prev_hi",
    ]

    @classmethod
    def from_state(cls, cfg) -> "RwTable":
        qa = cfg.q_active.cur()
        return cls([
            qa,
            qa * cfg.rwc.cur(),
            qa * cfg.is_write.cur(),
            qa * cfg.tag.cur(),
            qa * cfg.id.cur(),
            qa * cfg.address.cur(),
            qa * cfg.field_tag.cur(),
            qa * cfg.storage_key.cur(),
            qa * cfg.value_lo.cur(),
            qa * cfg.value_hi.cur(),
            qa * cfg.value_prev_lo.cur(),
            qa * cfg.value_prev_hi.cur(),
        ])

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        """inputs: 12 expressions in FIELDS order, ALREADY gated (all-zero
        when the consuming slot is disabled)."""
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class BytecodeTable:
    """(code_hash_lo, code_hash_hi, index, byte, is_code) rows
    (table.rs:1182 BytecodeTable) — the EVM circuit's opcode-fetch
    surface. The hash is keccak256(code) as 128-bit halves (phase-0,
    consistent with the RwTable's account code-hash words)."""

    enabled: Expr
    code_hash: Expr  # low 128 bits of keccak256(code)
    code_hash_hi: Expr
    index: Expr
    byte: Expr
    is_code: Expr

    @classmethod
    def from_config(cls, cfg) -> "BytecodeTable":
        """Surface over the bytecode circuit's body rows (either mode)."""
        qb = cfg.q_body.cur()
        return cls(
            enabled=qb,
            code_hash=qb * cfg.code_hash.cur(),
            code_hash_hi=qb * cfg.code_hash_hi.cur(),
            index=qb * cfg.index.cur(),
            byte=qb * cfg.byte.cur(),
            is_code=qb * cfg.is_code.cur(),
        )

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               code_hash: Expr, code_hash_hi: Expr, index: Expr,
               byte: Expr, is_code: Expr) -> None:
        cs.lookup(
            name,
            [
                (q, self.enabled),
                (q * code_hash, self.code_hash),
                (q * code_hash_hi, self.code_hash_hi),
                (q * index, self.index),
                (q * byte, self.byte),
                (q * is_code, self.is_code),
            ],
        )


@dataclass
class BytecodeLenTable:
    """(code_hash_lo, code_hash_hi, code_length) — one row per bytecode,
    derived from the LAST body row (fixed q_body & ~q_cont, length =
    index + 1), so the length is bound by the same keccak length
    accumulator the bytecode circuit proves. Reference: the Header-tag
    rows of table.rs:1182 BytecodeTable (value = code length)."""

    enabled: Expr
    code_hash: Expr
    code_hash_hi: Expr
    length: Expr

    @classmethod
    def from_config(cls, cfg) -> "BytecodeLenTable":
        from zkevm_tpu.plonk.expr import Const

        ql = cfg.q_body.cur() - cfg.q_cont.cur()  # 1 on last body rows
        return cls(
            enabled=ql,
            code_hash=ql * cfg.code_hash.cur(),
            code_hash_hi=ql * cfg.code_hash_hi.cur(),
            length=ql * (cfg.index.cur() + Const(1)),
        )

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               code_hash: Expr, code_hash_hi: Expr, length: Expr) -> None:
        cs.lookup(
            name,
            [
                (q, self.enabled),
                (q * code_hash, self.code_hash),
                (q * code_hash_hi, self.code_hash_hi),
                (q * length, self.length),
            ],
        )


@dataclass
class ExpTable:
    """(base_rlc, exponent_rlc, result_rlc) exponentiation rows
    (table.rs:2127 ExpTable, one entry per EXP event)."""

    enabled: Expr
    base: Expr
    exponent: Expr
    result: Expr

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               base: Expr, exponent: Expr, result: Expr) -> None:
        cs.lookup(
            name,
            [
                (q, self.enabled),
                (q * base, self.base),
                (q * exponent, self.exponent),
                (q * result, self.result),
            ],
        )
