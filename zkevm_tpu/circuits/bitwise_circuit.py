"""Bitwise table circuit: 256-bit AND / OR / XOR rows.

Reference counterpart: evm_circuit/execution/bitwise.rs, which looks up
each of the 32 byte triples (a_i, b_i, a_i op b_i) in the Fixed
byte-operation table (table.rs FixedTableTag::BitwiseAnd/Or/Xor — a
3 * 2^16-row table requiring k >= 18). TPU-native redesign: a satellite
circuit of 32 rows per operation where each byte is split into two
NIBBLES checked against a 3 * 16 * 16 = 768-row fixed nibble-op table —
sound at any k >= 10, two lookup arguments total, and the 256-bit words
are rebuilt with big-endian running accumulators (position-free fold
acc = 256*acc + byte).

Row group layout (R = 32 rows per op, anchor = row 0):
    row i (0..15):  byte 31-i (the HI half, most significant first)
    row i (16..31): byte 31-i (the LO half)
    acc_x restarts at the anchor and at row 16 (q_half); the completed
    halves sit at rotations +15 (hi) and +31 (lo) from the anchor.

Lookup surface: (enabled, tag, a_lo, a_hi, b_lo, b_hi, r_lo, r_hi).
Tags: 1 = AND, 2 = OR, 3 = XOR. NOT is served by consumers as
a XOR (2^256 - 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

import numpy as np

from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

R = 32  # rows per operation
M128 = (1 << 128) - 1
M256 = (1 << 256) - 1


class BitOp(IntEnum):
    AND = 1
    OR = 2
    XOR = 3


def _apply(tag: int, a: int, b: int) -> int:
    return a & b if tag == BitOp.AND else (a | b if tag == BitOp.OR else a ^ b)


@dataclass
class BitwiseTable:
    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, en: Expr,
               tag: Expr, a: tuple, b: tuple, r: tuple) -> None:
        """en must be 0/1; word args are (lo, hi) expression pairs."""
        ins = [en, en * tag]
        for w in (a, b, r):
            ins.append(en * w[0])
            ins.append(en * w[1])
        cs.lookup(name, list(zip(ins, self.exprs)))


@dataclass
class BitwiseConfig:
    q_anchor: Column  # fixed: first row of each group
    q_half: Column  # fixed: row 16 of each group (lo-half restart)
    q_en: Column  # fixed: every table row
    # nibble-op fixed table (tag, x, y, x op y)
    t_tag: Column
    t_x: Column
    t_y: Column
    t_z: Column
    tag: Column
    ab: Column  # a byte
    bb: Column
    rb: Column
    nibs: list  # a_h, a_l, b_h, b_l, r_h, r_l
    acc_a: Column
    acc_b: Column
    acc_r: Column
    table: BitwiseTable


def configure(cs: ConstraintSystem) -> BitwiseConfig:
    q_anchor = cs.fixed_column()
    q_half = cs.fixed_column()
    q_en = cs.fixed_column()
    t_tag, t_x, t_y, t_z = (cs.fixed_column() for _ in range(4))
    tag = cs.advice_column()
    ab, bb, rb = (cs.advice_column() for _ in range(3))
    nibs = [cs.advice_column() for _ in range(6)]
    acc_a, acc_b, acc_r = (cs.advice_column() for _ in range(3))

    one = Const(1)
    qe, qa, qh = q_en.cur(), q_anchor.cur(), q_half.cur()
    a_h, a_l, b_h, b_l, r_h, r_l = (c.cur() for c in nibs)

    polys = [
        # tag domain + constancy within the group
        qa * (tag.cur() - one) * (tag.cur() - Const(2)) * (tag.cur() - Const(3)),
        (qe - qa) * (tag.cur() - tag.prev()),
        # byte = 16*hi + lo nibble composition
        qe * (ab.cur() - Const(16) * a_h - a_l),
        qe * (bb.cur() - Const(16) * b_h - b_l),
        qe * (rb.cur() - Const(16) * r_h - r_l),
    ]
    # big-endian accumulator folds, restarting at anchor and half rows
    for acc, byte in ((acc_a, ab), (acc_b, bb), (acc_r, rb)):
        polys.append((qa + qh) * (acc.cur() - byte.cur()))
        polys.append(
            (qe - qa - qh) * (acc.cur() - Const(256) * acc.prev() - byte.cur())
        )
    cs.create_gate("bw_table", polys)

    # nibble-op lookups (hi and lo nibble triples)
    cs.lookup("bw_nib_hi", [
        (qe * tag.cur(), t_tag.cur()),
        (qe * a_h, t_x.cur()),
        (qe * b_h, t_y.cur()),
        (qe * r_h, t_z.cur()),
    ])
    cs.lookup("bw_nib_lo", [
        (qe * tag.cur(), t_tag.cur()),
        (qe * a_l, t_x.cur()),
        (qe * b_l, t_y.cur()),
        (qe * r_l, t_z.cur()),
    ])

    table = BitwiseTable([
        qa,
        qa * tag.cur(),
        qa * acc_a.rot(31), qa * acc_a.rot(15),
        qa * acc_b.rot(31), qa * acc_b.rot(15),
        qa * acc_r.rot(31), qa * acc_r.rot(15),
    ])
    return BitwiseConfig(
        q_anchor, q_half, q_en, t_tag, t_x, t_y, t_z, tag, ab, bb, rb,
        nibs, acc_a, acc_b, acc_r, table,
    )


def load_nibble_table(cfg: BitwiseConfig, asg: Assignment) -> None:
    """768 rows: (tag, x, y, x op y) for all nibble pairs, vectorized.
    Row 0 stays (0,0,0,0) — the disabled-consumer tuple — because the
    table region starts at row 1."""
    xs = np.arange(256, dtype=np.uint64)
    x, y = xs >> 4, xs & 15
    rows_tag = []
    rows_x = []
    rows_y = []
    rows_z = []
    for t, op in ((1, np.bitwise_and), (2, np.bitwise_or), (3, np.bitwise_xor)):
        rows_tag.append(np.full(256, t, dtype=np.uint64))
        rows_x.append(x)
        rows_y.append(y)
        rows_z.append(op(x, y))
    assert asg.n >= 1 + 768
    asg.set_u64s(cfg.t_tag, 1, np.concatenate(rows_tag))
    asg.set_u64s(cfg.t_x, 1, np.concatenate(rows_x))
    asg.set_u64s(cfg.t_y, 1, np.concatenate(rows_y))
    asg.set_u64s(cfg.t_z, 1, np.concatenate(rows_z))


@dataclass
class BitwiseEvent:
    tag: BitOp
    a: int
    b: int

    @property
    def r(self) -> int:
        return _apply(self.tag, self.a, self.b)


def assign(
    cs: ConstraintSystem,
    cfg: BitwiseConfig,
    n: int,
    events: list[BitwiseEvent],
    asg: Assignment | None = None,
    start: int = 0,
) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    load_nibble_table(cfg, asg)
    m = cs.usable_rows(n) - 1
    assert start + R * len(events) <= m, "bitwise region overflow"

    for k, ev in enumerate(events):
        r0 = start + R * k
        a, b = int(ev.a) & M256, int(ev.b) & M256
        r = _apply(int(ev.tag), a, b)
        asg.set_int(cfg.q_anchor, r0, 1)
        asg.set_int(cfg.q_half, r0 + 16, 1)
        acc = {"a": 0, "b": 0, "r": 0}
        for i in range(R):
            row = r0 + i
            byte_idx = 31 - i
            av = (a >> (8 * byte_idx)) & 0xFF
            bv = (b >> (8 * byte_idx)) & 0xFF
            rv = (r >> (8 * byte_idx)) & 0xFF
            asg.set_int(cfg.q_en, row, 1)
            asg.set_int(cfg.tag, row, int(ev.tag))
            asg.set_int(cfg.ab, row, av)
            asg.set_int(cfg.bb, row, bv)
            asg.set_int(cfg.rb, row, rv)
            for col, v in zip(cfg.nibs,
                              (av >> 4, av & 15, bv >> 4, bv & 15,
                               rv >> 4, rv & 15)):
                asg.set_int(col, row, v)
            if i in (0, 16):
                acc = {"a": av, "b": bv, "r": rv}
            else:
                acc = {"a": acc["a"] * 256 + av,
                       "b": acc["b"] * 256 + bv,
                       "r": acc["r"] * 256 + rv}
            asg.set_int(cfg.acc_a, row, acc["a"])
            asg.set_int(cfg.acc_b, row, acc["b"])
            asg.set_int(cfg.acc_r, row, acc["r"])
    return asg
