"""ModExp circuit: base^exponent mod modulus over 256-bit operands.

Reference counterpart: zkevm-circuits' modexp circuit (the 0x05
precompile restricted to <=32-byte operands, scroll's misc-precompiled
modexp over a dynamic modulus; SURVEY §2.2 ModExp row).

TPU-native design: a square-and-multiply ladder over the
dynamic-modulus ForeignMulDyn gadget (gadgets/bigint.py) — one foreign
mul per row, 2 rows per exponent bit (MSB first):

    b0: acc^2 mod m            (state row: acc, bit, accumulators)
    b1: (acc^2) * base mod m
    next b0 selects r@b1 if the bit was set, else r@b0, and folds the
    bit into per-limb exponent accumulators (the same 88/88/80 segment
    scheme as the sig circuit's scalar binding)

The ladder starts at acc = 1; m = 1 degenerates naturally (1 mod 1 = 0,
and the whole chain collapses to 0 — the precompile's correct answer).
m = 0 has no witness (the gadget's r < m canonicality is unsatisfiable);
the EVM-side precompile call handling pins that case to 0 before the
table lookup (next wiring step).

ModExpTable surface (region start rows): (enabled, base limbs, exponent
limbs, modulus limbs, result limbs) — 13 exprs of 88-bit limbs.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.bigint import LB, NL, ForeignMulDyn, to_limbs
from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

NBITS = 256
SEGS = (88, 88, 80)  # exponent bits per limb segment (LSB..MSB limbs)
BLK = 2


def region_rows() -> int:
    return BLK * NBITS + 1  # + the result-bind row


@dataclass
class ModExpTable:
    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class ModExpConfig:
    q_start: Column  # region row 0 (a b0 row; the table surface)
    q_b0: Column
    q_b1: Column
    q_fin: Column  # the result-bind row after the last block
    q_seg: list  # NL-1: non-first segment-start b0 rows
    q_chain: Column
    q_fm: Column  # fixed: mul rows (b0 + b1)
    fm: ForeignMulDyn
    bl: list  # chained base limbs
    el: list  # chained exponent limbs
    rl: list  # chained result limbs
    bit: Column
    acc: Column
    table: ModExpTable


def configure(cs: ConstraintSystem, rt8: RangeTable) -> ModExpConfig:
    q_start = cs.fixed_column()
    q_b0 = cs.fixed_column()
    q_b1 = cs.fixed_column()
    q_fin = cs.fixed_column()
    q_seg = [cs.fixed_column() for _ in range(NL - 1)]
    q_chain = cs.fixed_column()
    q_fm = cs.fixed_column()
    fm = ForeignMulDyn.configure(cs, q_fm.cur(), rt8, name="mx")

    bl = [cs.advice_column() for _ in range(NL)]
    el = [cs.advice_column() for _ in range(NL)]
    rl = [cs.advice_column() for _ in range(NL)]
    bit, acc = cs.advice_column(), cs.advice_column()

    one = Const(1)
    polys: list = []
    qc = q_chain.cur()
    for c in bl + el + rl + fm.m:
        polys.append(qc * (c.rot(1) - c.cur()))

    b0, b1_, qs_, qf = q_b0.cur(), q_b1.cur(), q_start.cur(), q_fin.cur()
    bb = bit.cur()
    polys.append(b0 * bb * (one - bb))
    # first block: acc = 1
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(qs_ * (fm.a[i].cur() - o1))
    # b0: a = b = acc ; b1: a = r@b0, b = base
    for i in range(NL):
        polys.append(b0 * (fm.b[i].cur() - fm.a[i].cur()))
        polys.append(b1_ * (fm.a[i].cur() - fm.r[i].rot(-1)))
        polys.append(b1_ * (fm.b[i].cur() - bl[i].cur()))
    # non-first b0 rows: acc = bit_prev ? r@b1(-1) : r@b0(-2)
    nfb = b0 - qs_
    bp = bit.rot(-BLK)
    for i in range(NL):
        polys.append(nfb * (fm.a[i].cur() - bp * fm.r[i].rot(-1)
                            - (one - bp) * fm.r[i].rot(-2)))
    # the final row binds the chained result limbs the same way
    for i in range(NL):
        polys.append(qf * (rl[i].cur() - bp * fm.r[i].rot(-1)
                           - (one - bp) * fm.r[i].rot(-2)))
    # exponent-bit accumulation with per-limb segments (MSB-first)
    seg_starts = qs_
    for q in q_seg:
        seg_starts = seg_starts + q.cur()
    within = b0 - seg_starts
    polys.append(seg_starts * (acc.cur() - bb))
    polys.append(within * (acc.cur() - Const(2) * acc.rot(-BLK) - bb))
    for j, q in enumerate(q_seg):  # q_seg[j] closes limb NL-1-j
        polys.append(q.cur() * (acc.rot(-BLK) - el[NL - 1 - j].cur()))
    polys.append(qf * (acc.rot(-BLK) - el[0].cur()))

    cs.create_gate("modexp_region", polys)

    table = ModExpTable(
        [qs_]
        + [qs_ * c.cur() for c in bl]
        + [qs_ * c.cur() for c in el]
        + [qs_ * c.cur() for c in fm.m]
        + [qs_ * c.cur() for c in rl]
    )
    return ModExpConfig(q_start, q_b0, q_b1, q_fin, q_seg, q_chain, q_fm,
                        fm, bl, el, rl, bit, acc, table)


@dataclass
class ModExpEvent:
    base: int
    exponent: int
    modulus: int  # >= 1 in-circuit (0 is pinned by the consumer)

    @property
    def result(self) -> int:
        return pow(self.base, self.exponent, self.modulus)


def assign(
    cs: ConstraintSystem,
    cfg: ModExpConfig,
    n: int,
    events: list[ModExpEvent],
    asg: Assignment | None = None,
    start: int = 0,
) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    R = region_rows()
    base_row = start
    for ev in events:
        b_, e_, m_ = ev.base, ev.exponent, ev.modulus
        assert m_ >= 1
        blv, elv = to_limbs(b_), to_limbs(e_)
        rlv = to_limbs(ev.result)
        for rr in range(R):
            row = base_row + rr
            if rr < R - 1:
                asg.set_int(cfg.q_chain, row, 1)
            for c, v in zip(cfg.bl, blv):
                asg.set_int(c, row, v)
            for c, v in zip(cfg.el, elv):
                asg.set_int(c, row, v)
            for c, v in zip(cfg.rl, rlv):
                asg.set_int(c, row, v)
        asg.set_int(cfg.q_start, base_row, 1)
        asg.set_int(cfg.q_fin, base_row + BLK * NBITS, 1)
        for c, v in zip(cfg.fm.m, to_limbs(m_)):
            asg.set_int(c, base_row + BLK * NBITS, v)
        asg.set_int(cfg.q_seg[0], base_row + BLK * SEGS[2], 1)
        asg.set_int(cfg.q_seg[1], base_row + BLK * (SEGS[2] + SEGS[1]), 1)
        accv = 1
        a1 = 0
        for j in range(NBITS):
            r0 = base_row + BLK * j
            bi = NBITS - 1 - j
            bv = (e_ >> bi) & 1
            a1 = bv if j in (0, SEGS[2], SEGS[2] + SEGS[1]) else 2 * a1 + bv
            asg.set_int(cfg.q_b0, r0, 1)
            asg.set_int(cfg.q_b1, r0 + 1, 1)
            asg.set_int(cfg.q_fm, r0, 1)
            asg.set_int(cfg.q_fm, r0 + 1, 1)
            asg.set_int(cfg.bit, r0, bv)
            asg.set_int(cfg.acc, r0, a1)
            sq = cfg.fm.assign_row(asg, r0, accv, accv, m_)
            mu = cfg.fm.assign_row(asg, r0 + 1, sq, b_ % (1 << 256), m_)
            accv = mu if bv else sq
        assert accv == ev.result
        base_row += R
    assert base_row - start <= cs.usable_rows(n) - 1
    return asg
