"""MulAddWord gadget: 256-bit a*b + c = d (mod 2^256) with overflow
carries (reference: gadgets/src/mul_add.rs — used by MUL/DIV/MOD/EXP
word arithmetic).

Words are 4x64-bit little-endian limb columns (each limb assumed
range-checked to 64 bits by the caller's word decomposition, as in the
reference where word bytes are checked elsewhere); the two 128-bit-half
identities carry through carry_lo/carry_hi which ARE range-checked here
(u16-limb decomposition, 80 bits — covering mul_add.rs's 72-bit bound).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

CARRY_BITS = 80  # covers mul_add.rs's 72-bit carry bound


@dataclass
class MulAddWord:
    a: list  # 4 columns, 64-bit limbs little-endian
    b: list
    c_lo: Column  # 128-bit halves
    c_hi: Column
    d_lo: Column
    d_hi: Column
    carry_lo: list  # range-table-width limb columns
    carry_hi: list
    limb_bits: int
    overflow: Column  # carry_hi total (the mod-2^256 overflow witness)

    @classmethod
    def configure(
        cls, cs: ConstraintSystem, q: Expr, table: RangeTable, name: str = "mul_add"
    ) -> "MulAddWord":
        nlimb = -(-CARRY_BITS // table.bits)
        a = [cs.advice_column() for _ in range(4)]
        b = [cs.advice_column() for _ in range(4)]
        c_lo, c_hi = cs.advice_column(), cs.advice_column()
        d_lo, d_hi = cs.advice_column(), cs.advice_column()
        carry_lo = [cs.advice_column() for _ in range(nlimb)]
        carry_hi = [cs.advice_column() for _ in range(nlimb)]
        overflow = cs.advice_column()
        g = cls(a, b, c_lo, c_hi, d_lo, d_hi, carry_lo, carry_hi, table.bits, overflow)

        t0 = a[0].cur() * b[0].cur()
        t1 = a[0].cur() * b[1].cur() + a[1].cur() * b[0].cur()
        t2 = (
            a[0].cur() * b[2].cur()
            + a[1].cur() * b[1].cur()
            + a[2].cur() * b[0].cur()
        )
        t3 = (
            a[0].cur() * b[3].cur()
            + a[1].cur() * b[2].cur()
            + a[2].cur() * b[1].cur()
            + a[3].cur() * b[0].cur()
        )
        clo = g._carry_expr(carry_lo)
        chi = g._carry_expr(carry_hi)
        two64 = Const(1 << 64)
        two128 = Const(1 << 128)
        cs.create_gate(
            name,
            [
                q
                * (
                    t0 + t1 * two64 + c_lo.cur()
                    - (d_lo.cur() + clo * two128)
                ),
                q
                * (
                    t2 + t3 * two64 + c_hi.cur() + clo
                    - (d_hi.cur() + chi * two128)
                ),
                q * (overflow.cur() - chi),
            ],
        )
        table.lookup(
            cs, f"{name}_carry_range", [q * c.cur() for c in carry_lo + carry_hi]
        )
        return g

    def _carry_expr(self, cols) -> Expr:
        acc = Const(0)
        for i, c in enumerate(cols):
            acc = acc + Const(1 << (self.limb_bits * i)) * c.cur()
        return acc

    def assign_rows(self, asg: Assignment, start: int, avals, bvals, cvals) -> list:
        """avals/bvals/cvals: iterables of 256-bit ints. Returns the list
        of d = (a*b + c) mod 2^256 results."""
        ds = []
        m64 = (1 << 64) - 1
        m128 = (1 << 128) - 1
        for r, (av, bv, cv) in enumerate(zip(avals, bvals, cvals)):
            av, bv, cv = int(av), int(bv), int(cv)
            al = [(av >> (64 * i)) & m64 for i in range(4)]
            bl = [(bv >> (64 * i)) & m64 for i in range(4)]
            t0 = al[0] * bl[0]
            t1 = al[0] * bl[1] + al[1] * bl[0]
            t2 = al[0] * bl[2] + al[1] * bl[1] + al[2] * bl[0]
            t3 = al[0] * bl[3] + al[1] * bl[2] + al[2] * bl[1] + al[3] * bl[0]
            d = (av * bv + cv) & ((1 << 256) - 1)
            d_lo, d_hi = d & m128, (d >> 128) & m128
            c_lo, c_hi = cv & m128, (cv >> 128) & m128
            carry_lo = (t0 + (t1 << 64) + c_lo - d_lo) >> 128
            carry_hi = (t2 + (t3 << 64) + c_hi + carry_lo - d_hi) >> 128
            row = start + r
            for i in range(4):
                asg.set_int(self.a[i], row, al[i])
                asg.set_int(self.b[i], row, bl[i])
            asg.set_int(self.c_lo, row, c_lo)
            asg.set_int(self.c_hi, row, c_hi)
            asg.set_int(self.d_lo, row, d_lo)
            asg.set_int(self.d_hi, row, d_hi)
            w = self.limb_bits
            mask = (1 << w) - 1
            for i in range(len(self.carry_lo)):
                asg.set_int(self.carry_lo[i], row, (carry_lo >> (w * i)) & mask)
                asg.set_int(self.carry_hi[i], row, (carry_hi >> (w * i)) & mask)
            asg.set_int(self.overflow, row, carry_hi)
            ds.append(d)
        return ds
