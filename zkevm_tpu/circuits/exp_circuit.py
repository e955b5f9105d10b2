"""Exp circuit: EXP-opcode exponentiation-by-squaring over 256-bit words.

Reference counterpart: zkevm-circuits/src/exp_circuit.rs:34 (ExpTable +
MulAddWords steps, 7 rows/step) and the OddParity/parity split of
bus-mapping's exp unrolling (circuit_input_builder.rs:89).

TPU-native redesign: one row per square-and-multiply step, with ALL word
arithmetic hoisted into the WordArithTable satellite (the same 16-row
byte-grid circuit the EVM's MUL/DIV/SHL/ADDMOD states use), so this
circuit carries no byte cells at all — two lookups per row replace the
reference's inline MulAdd byte grids:

    halve:  tag DIVMOD,  e = q*2 + r  (exact, r < 2 boolean, q and e
            byte-range-proven in-table)
    mul:    tag MUL,     d = a * m (mod 2^256) with a = base (odd step)
            or m (even step), m = next row's d

Rows run top-down per event (first row = the full exponent, the ExpTable
surface row); the recursion is

    r = 1 (odd):  d = base * d_next,  e_next = e - 1
    r = 0 (even): d = d_next^2,       e_next = q = e / 2
    last row:     e = 2, d = base^2

The exponent chain stays sound without in-circuit byte cells because
every e in the chain is the `d` operand of its row's halving lookup and
the table byte-decomposes d unconditionally (word_arith.py) — a forged
borrow/carry that pushes a 128-bit half out of range has no table row.

ExpTable surface (first row of each event): (enabled, base_lo, base_hi,
exponent_lo, exponent_hi, exponentiation_lo, exponentiation_hi) — the
EVM EXP state binds its stack words with one lookup (table.rs ExpTable).
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.circuits.word_arith import WordArithOp, WordArithTable, WordOp
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

M128 = (1 << 128) - 1
M256 = (1 << 256) - 1


@dataclass
class ExpTable:
    """(enabled, base, exponent, exponentiation) as (lo, hi) pairs."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, en: Expr,
               base: tuple, exponent: tuple, result: tuple) -> None:
        ins = [en]
        for w in (base, exponent, result):
            ins.append(en * w[0])
            ins.append(en * w[1])
        cs.lookup(name, list(zip(ins, self.exprs)))


@dataclass
class ExpConfig:
    q_step: Column  # fixed: 1 on every non-last step row
    q_last: Column  # fixed: 1 on the last step row of an event
    q_first: Column  # fixed: 1 on the first row of an event (the table)
    b_lo: Column  # base
    b_hi: Column
    e_lo: Column  # exponent
    e_hi: Column
    d_lo: Column  # exponentiation
    d_hi: Column
    qu_lo: Column  # halving quotient
    qu_hi: Column
    parity: Column  # r in e = 2q + r
    beta: Column  # odd-step borrow of e - 1
    table: ExpTable


def configure(cs: ConstraintSystem, word_table: WordArithTable) -> ExpConfig:
    q_step = cs.fixed_column()
    q_last = cs.fixed_column()
    q_first = cs.fixed_column()
    b_lo, b_hi = cs.advice_column(), cs.advice_column()
    e_lo, e_hi = cs.advice_column(), cs.advice_column()
    d_lo, d_hi = cs.advice_column(), cs.advice_column()
    qu_lo, qu_hi = cs.advice_column(), cs.advice_column()
    parity = cs.advice_column()
    beta = cs.advice_column()

    one = Const(1)
    qs_, ql, qf = q_step.cur(), q_last.cur(), q_first.cur()
    qe = qs_ + ql  # every event row
    r = parity.cur()
    bt = beta.cur()

    cs.create_gate("exp_step", [
        qe * bt * (bt - one),
        # odd: e_next = e - 1 (beta = the 128-bit borrow)
        qs_ * r * (e_lo.rot(1) - e_lo.cur() + one - bt * Const(1 << 128)),
        qs_ * r * (e_hi.rot(1) - e_hi.cur() + bt),
        # even: e_next = q
        qs_ * (one - r) * (e_lo.rot(1) - qu_lo.cur()),
        qs_ * (one - r) * (e_hi.rot(1) - qu_hi.cur()),
        # base is shared down the chain
        qs_ * (b_lo.rot(1) - b_lo.cur()),
        qs_ * (b_hi.rot(1) - b_hi.cur()),
        # last step: exponent = 2
        ql * (e_lo.cur() - Const(2)),
        ql * e_hi.cur(),
    ])

    # halve: e = q*2 + r exactly, r < 2 (also byte-range-proves q and e)
    word_table.lookup(
        cs, "exp_halve", qe, Const(int(WordOp.DIVMOD)),
        (qu_lo.cur(), qu_hi.cur()),
        (Const(2), Const(0)),
        (r, Const(0)),
        (e_lo.cur(), e_hi.cur()),
    )
    # mul: d = (odd ? base : d_next) * (step ? d_next : base) mod 2^256
    # (on the last row both operands are base: d = base^2)
    mla = (qs_ * (r * b_lo.cur() + (one - r) * d_lo.rot(1))
           + ql * b_lo.cur())
    mha = (qs_ * (r * b_hi.cur() + (one - r) * d_hi.rot(1))
           + ql * b_hi.cur())
    mlb = qs_ * d_lo.rot(1) + ql * b_lo.cur()
    mhb = qs_ * d_hi.rot(1) + ql * b_hi.cur()
    word_table.lookup(
        cs, "exp_mul", qe, Const(int(WordOp.MUL)),
        (mla, mha), (mlb, mhb), (Const(0), Const(0)),
        (d_lo.cur(), d_hi.cur()),
    )

    table = ExpTable([
        qf,
        qf * b_lo.cur(), qf * b_hi.cur(),
        qf * e_lo.cur(), qf * e_hi.cur(),
        qf * d_lo.cur(), qf * d_hi.cur(),
    ])
    return ExpConfig(q_step, q_last, q_first, b_lo, b_hi, e_lo, e_hi,
                     d_lo, d_hi, qu_lo, qu_hi, parity, beta, table)


def unroll_event(base: int, exponent: int):
    """-> rows (top-down) of the square-and-multiply recursion over
    mod-2^256 words. exponent must be >= 2 (the EVM EXP state handles
    0/1 inline, as in the reference)."""
    assert exponent >= 2
    rows = []
    e = exponent
    while e > 2:
        rows.append(dict(
            base=base, exponent=e, exponentiation=pow(base, e, 1 << 256),
            quotient=e // 2, parity=e & 1,
        ))
        e = e - 1 if e & 1 else e // 2
    rows.append(dict(
        base=base, exponent=2, exponentiation=base * base & M256,
        quotient=1, parity=0,
    ))
    return rows


def word_arith_ops(events: list) -> list[WordArithOp]:
    """The satellite-table rows the exp chain rows look up."""
    ops = []
    for base, exponent in events:
        for j, row in enumerate(unroll_event(base, exponent)):
            ops.append(WordArithOp(
                WordOp.DIVMOD, row["quotient"], 2, row["parity"]))
            if row["exponent"] == 2:
                ops.append(WordArithOp(WordOp.MUL, base, base, 0))
            elif row["parity"]:
                nxt = pow(base, row["exponent"] - 1, 1 << 256)
                ops.append(WordArithOp(WordOp.MUL, base, nxt, 0))
            else:
                nxt = pow(base, row["exponent"] // 2, 1 << 256)
                ops.append(WordArithOp(WordOp.MUL, nxt, nxt, 0))
    return ops


def assign(
    cs: ConstraintSystem,
    cfg: ExpConfig,
    n: int,
    events: list,
    asg: Assignment | None = None,
    start: int = 0,
) -> Assignment:
    """events: list of (base, exponent) pairs, exponent >= 2."""
    asg = asg if asg is not None else Assignment(cs, n)
    rr = start
    for base, exponent in events:
        rows = unroll_event(base, exponent)
        for j, row in enumerate(rows):
            col = cfg.q_last if j == len(rows) - 1 else cfg.q_step
            asg.set_int(col, rr, 1)
            if j == 0:
                asg.set_int(cfg.q_first, rr, 1)
            asg.set_int(cfg.b_lo, rr, base & M128)
            asg.set_int(cfg.b_hi, rr, base >> 128)
            asg.set_int(cfg.e_lo, rr, row["exponent"] & M128)
            asg.set_int(cfg.e_hi, rr, row["exponent"] >> 128)
            asg.set_int(cfg.d_lo, rr, row["exponentiation"] & M128)
            asg.set_int(cfg.d_hi, rr, row["exponentiation"] >> 128)
            asg.set_int(cfg.qu_lo, rr, row["quotient"] & M128)
            asg.set_int(cfg.qu_hi, rr, row["quotient"] >> 128)
            asg.set_int(cfg.parity, rr, row["parity"])
            if row["parity"] and row["exponent"] > 2:
                asg.set_int(cfg.beta, rr,
                            1 if (row["exponent"] & M128) == 0 else 0)
            rr += 1
    assert rr <= cs.usable_rows(n) - 1
    return asg
