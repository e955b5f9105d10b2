"""Bytecode circuit: unrolled bytecode rows with push-data/is_code tracking.

Reference counterpart: zkevm-circuits/src/bytecode_circuit/circuit.rs:46 +
bytecode_unroller.rs (2.4k LoC): every deployed bytecode unrolls to a
header row (its length) followed by one row per byte, with `is_code`
distinguishing opcodes from PUSH-data bytes; the table feeds BytecodeTable
lookups from the EVM circuit.

Two modes:
- standalone (`configure(cs)`): code_hash (lo, hi) are phase-0 advice
  columns carrying keccak256(code) as 128-bit halves, constant per
  bytecode but otherwise unconstrained (cheap tests).
- linked (`configure(cs, challenges, keccak_table)`): a running phase-1
  byte RLC (keccak_input challenge) accumulates over each bytecode's
  bytes, and the LAST body row of each bytecode looks up
  (1, byte_rlc, length, hash_lo, hash_hi) in the shared KeccakTable —
  the reference's keccak code-hash link (bytecode_circuit/circuit.rs:46),
  with the digest as word halves so phase-0 consumers (EVM circuit,
  RwTable account rows) link hashes without randomness.
  Empty bytecodes have no body rows and are not hash-linked (the
  reference's empty-hash special case, deferred).

Row semantics: tag=1 header (byte column holds the length), tag=0 body.
pdl = push-data bytes remaining BEFORE this row; is_code = (pdl == 0).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.etypes.opcodes import push_size
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.hash.keccak import keccak256
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const

FR = fr_spec()


@dataclass
class BytecodeConfig:
    q_body: Column  # 1 on body rows
    q_cont: Column  # 1 on body rows whose NEXT row continues the same bytecode
    t_byte: Column  # fixed push table: byte value 0..255
    t_psize: Column  # fixed push table: push size of that byte
    tag: Column
    code_hash: Column  # low 128 bits of keccak256(code)
    code_hash_hi: Column  # high 128 bits
    index: Column
    byte: Column
    psize: Column
    pdl: Column
    pdl_inv: Column
    is_code: Column
    # linked mode only (None when standalone)
    q_first: Column | None = None  # 1 on the first body row of each bytecode
    brlc: Column | None = None  # phase-1 running byte RLC (keccak_input)


def configure(cs: ConstraintSystem, challenges=None, keccak_table=None) -> BytecodeConfig:
    linked = keccak_table is not None
    q_body = cs.fixed_column()
    q_cont = cs.fixed_column()
    t_byte = cs.fixed_column()
    t_psize = cs.fixed_column()
    tag = cs.advice_column()
    code_hash = cs.advice_column()
    code_hash_hi = cs.advice_column()
    index = cs.advice_column()
    byte = cs.advice_column()
    psize = cs.advice_column()
    pdl = cs.advice_column()
    pdl_inv = cs.advice_column()
    is_code = cs.advice_column()

    one = Const(1)
    # is_code is the is-zero witness of pdl
    cs.create_gate(
        "bytecode_is_code",
        [
            q_body.cur() * (is_code.cur() - (one - pdl.cur() * pdl_inv.cur())),
            q_body.cur() * pdl.cur() * is_code.cur(),
        ],
    )
    # transitions while the same bytecode continues
    cs.create_gate(
        "bytecode_step",
        [
            q_cont.cur() * (index.next() - index.cur() - one),
            q_cont.cur() * (code_hash.next() - code_hash.cur()),
            q_cont.cur() * (code_hash_hi.next() - code_hash_hi.cur()),
            q_cont.cur()
            * (
                pdl.next()
                - is_code.cur() * psize.cur()
                - (one - is_code.cur()) * (pdl.cur() - one)
            ),
        ],
    )
    # push-size lookup binds psize to byte (and range-checks byte)
    cs.lookup(
        "bytecode_push_table",
        [
            (q_body.cur() * byte.cur(), t_byte.cur()),
            (q_body.cur() * psize.cur(), t_psize.cur()),
        ],
    )

    q_first = brlc = None
    if linked:
        q_first = cs.fixed_column()
        brlc = cs.advice_column(phase=1)
        r = challenges.keccak_input.expr()
        cs.create_gate(
            "bytecode_rlc",
            [
                q_first.cur() * (brlc.cur() - byte.cur()),
                (q_body.cur() - q_first.cur())
                * (brlc.cur() - (brlc.prev() * r + byte.cur())),
            ],
        )
        # last body row (q_body=1, q_cont=0): keccak(code bytes) == hash
        q_last = q_body.cur() - q_cont.cur()
        keccak_table.lookup_word(
            cs,
            "bytecode_code_hash",
            q_last,
            brlc.cur(),
            index.cur() + one,
            code_hash.cur(),
            code_hash_hi.cur(),
        )

    return BytecodeConfig(
        q_body, q_cont, t_byte, t_psize, tag, code_hash, code_hash_hi,
        index, byte, psize, pdl, pdl_inv, is_code, q_first, brlc,
    )


def assign_fixed(
    cs: ConstraintSystem, cfg: BytecodeConfig, n: int, asg: Assignment | None = None
) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    asg.set_ints(cfg.t_byte, 0, list(range(256)))
    asg.set_ints(cfg.t_psize, 0, [push_size(b) for b in range(256)])
    return asg


def unroll(code: bytes):
    """-> list of row dicts (header + per-byte) for one bytecode."""
    full = int.from_bytes(keccak256(code), "big")
    h = full & ((1 << 128) - 1)
    h_hi = full >> 128
    rows = [dict(tag=1, code_hash=h, code_hash_hi=h_hi, index=0,
                 byte=len(code), psize=0, pdl=0)]
    pdl = 0
    for i, b in enumerate(code):
        is_code = 1 if pdl == 0 else 0
        # psize is assigned unconditionally from the byte value (matching the
        # reference bytecode_circuit/circuit.rs:712 push_data_size): the push
        # table lookup (byte, psize) must hold on EVERY body row, including
        # push-data rows whose byte happens to be a PUSH opcode; the pdl
        # transition gates by is_code so data-row psize is inert.
        ps = push_size(b)
        rows.append(
            dict(tag=0, code_hash=h, code_hash_hi=h_hi, index=i, byte=b,
                 psize=ps, pdl=pdl)
        )
        pdl = ps if is_code else pdl - 1
    return rows


def assign(
    cs: ConstraintSystem,
    cfg: BytecodeConfig,
    n: int,
    codes: list,
    asg: Assignment | None = None,
):
    linked = cfg.brlc is not None
    asg = assign_fixed(cs, cfg, n, asg)
    r = 0
    one = FR.encode(1)
    spans = []  # (first body row, code) per non-empty bytecode
    for code in codes:
        rows = unroll(code)
        if linked and len(code):
            spans.append((r + 1, code))
        for j, row in enumerate(rows):
            if row["tag"] == 0:
                asg.cols[cfg.q_body][r] = one
                if j + 1 < len(rows):
                    asg.cols[cfg.q_cont][r] = one
                if linked and j == 1:
                    asg.cols[cfg.q_first][r] = one
            asg.set_int(cfg.tag, r, row["tag"])
            asg.set_int(cfg.code_hash, r, row["code_hash"])
            asg.set_int(cfg.code_hash_hi, r, row["code_hash_hi"])
            asg.set_int(cfg.index, r, row["index"])
            asg.set_int(cfg.byte, r, row["byte"])
            asg.set_int(cfg.psize, r, row["psize"])
            asg.set_int(cfg.pdl, r, row["pdl"])
            asg.set_int(
                cfg.pdl_inv, r, 0 if row["pdl"] == 0 else pow(row["pdl"], FR_MOD - 2, FR_MOD)
            )
            asg.set_int(cfg.is_code, r, 1 if row["pdl"] == 0 else 0)
            r += 1
    assert r <= cs.usable_rows(n) - 1
    if linked:
        return BytecodeWitness(asg, cfg, spans)
    return asg


@dataclass
class BytecodeWitness:
    """Linked-mode assignment; phase-1 columns (brlc, code_hash) depend on
    the keccak_input / evm_word challenges (same split as
    keccak_table.KeccakWitness)."""

    asg: Assignment
    cfg: BytecodeConfig
    spans: list  # (first body row, code) per non-empty bytecode

    def fill_phase1(self, r_keccak: int, r_word: int) -> None:
        cfg, asg = self.cfg, self.asg
        for start, code in self.spans:
            acc = 0
            for i, b in enumerate(code):
                acc = (acc * r_keccak + b) % FR_MOD
                asg.set_int(cfg.brlc, start + i, acc)

    def witness_phases(self, challenges):
        """create_proof callback (see keccak_table.KeccakWitness)."""
        cfg = self.cfg

        def cb(phase: int, ch: dict) -> dict:
            if phase == 1:
                self.fill_phase1(ch[challenges.keccak_input], ch[challenges.evm_word])
            return {
                c: self.asg.cols[c]
                for c in self.asg.cs.advice_columns
                if c.phase == phase
            }

        return cb
