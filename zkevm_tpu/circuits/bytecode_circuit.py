"""Bytecode circuit: unrolled bytecode rows with push-data/is_code tracking.

Reference counterpart: zkevm-circuits/src/bytecode_circuit/circuit.rs:46 +
bytecode_unroller.rs (2.4k LoC): every deployed bytecode unrolls to a
header row (its length) followed by one row per byte, with `is_code`
distinguishing opcodes from PUSH-data bytes; the table feeds BytecodeTable
lookups from the EVM circuit. This implementation reproduces the row
structure and constraints; the keccak code-hash link (lookup into the
keccak table) is a later-round item — code_hash is carried as a column
and kept consistent across each bytecode's rows.

Columns: q_first(f), q_body(f), u8×push table (f), tag(a), code_hash(a),
index(a), byte(a), psize(a), pdl(a), pdl_inv(a), is_code(a).

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
    code_hash: Column
    index: Column
    byte: Column
    psize: Column
    pdl: Column
    pdl_inv: Column
    is_code: Column


def configure(cs: ConstraintSystem) -> BytecodeConfig:
    q_body = cs.fixed_column()
    q_cont = cs.fixed_column()
    t_byte = cs.fixed_column()
    t_psize = cs.fixed_column()
    tag = cs.advice_column()
    code_hash = cs.advice_column()
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
    return BytecodeConfig(
        q_body, q_cont, t_byte, t_psize, tag, code_hash, index, byte, psize,
        pdl, pdl_inv, is_code,
    )


def assign_fixed(cs: ConstraintSystem, cfg: BytecodeConfig, n: int) -> Assignment:
    asg = Assignment(cs, n)
    asg.set_ints(cfg.t_byte, 0, list(range(256)))
    asg.set_ints(cfg.t_psize, 0, [push_size(b) for b in range(256)])
    return asg


def unroll(code: bytes):
    """-> list of row dicts (header + per-byte) for one bytecode."""
    h = int.from_bytes(keccak256(code), "big") % FR_MOD
    rows = [dict(tag=1, code_hash=h, index=0, byte=len(code), psize=0, pdl=0)]
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
            dict(tag=0, code_hash=h, index=i, byte=b, psize=ps, pdl=pdl)
        )
        pdl = ps if is_code else pdl - 1
    return rows


def assign(cs: ConstraintSystem, cfg: BytecodeConfig, n: int, codes: list) -> Assignment:
    asg = assign_fixed(cs, cfg, n)
    r = 0
    one = FR.encode(1)
    for code in codes:
        rows = unroll(code)
        for j, row in enumerate(rows):
            if row["tag"] == 0:
                asg.cols[cfg.q_body][r] = one
                if j + 1 < len(rows):
                    asg.cols[cfg.q_cont][r] = one
            asg.set_int(cfg.tag, r, row["tag"])
            asg.set_int(cfg.code_hash, r, row["code_hash"])
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
    return asg
