"""LessThan / Comparator gadgets (reference: gadgets/src/less_than.rs,
gadgets/src/comparator.rs).

lt ∈ {0,1} witnesses lhs < rhs; diff = lhs - rhs + lt*2^(16*n_limbs) is
decomposed into u16 limbs, each range-checked against a shared u16 (or
narrower) RangeTable — sound for operands < 2^(16*n_limbs)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr


@dataclass
class LtGadget:
    lt: Column
    limbs: list  # diff limb columns, little-endian
    bits_per_limb: int
    q: Expr

    @classmethod
    def configure(
        cls,
        cs: ConstraintSystem,
        q: Expr,
        lhs: Expr,
        rhs: Expr,
        table: RangeTable,
        n_limbs: int = 2,
        name: str = "lt",
    ) -> "LtGadget":
        bits = table.bits
        lt = cs.advice_column()
        limbs = [cs.advice_column() for _ in range(n_limbs)]
        g = cls(lt, limbs, bits, q)
        rng = 1 << (bits * n_limbs)
        diff = Const(0)
        for i, c in enumerate(limbs):
            diff = diff + Const(1 << (bits * i)) * c.cur()
        cs.create_gate(
            name,
            [
                q * (diff - (lhs - rhs + lt.cur() * Const(rng))),
                q * lt.cur() * (Const(1) - lt.cur()),  # boolean
            ],
        )
        table.lookup(cs, f"{name}_range", [q * c.cur() for c in limbs])
        return g

    def expr(self) -> Expr:
        """1 iff lhs < rhs (on enabled rows)."""
        return self.lt.cur()

    def assign_rows(self, asg: Assignment, start: int, lhs_vals, rhs_vals) -> None:
        """lhs/rhs: int iterables (small unsigned values < 2^(bits*limbs))."""
        lhs = np.asarray(list(lhs_vals), dtype=object)
        rhs = np.asarray(list(rhs_vals), dtype=object)
        k = len(lhs)
        rng = 1 << (self.bits_per_limb * len(self.limbs))
        lt = np.array([1 if int(a) < int(b) else 0 for a, b in zip(lhs, rhs)])
        diff = np.array(
            [int(a) - int(b) + int(f) * rng for a, b, f in zip(lhs, rhs, lt)],
            dtype=object,
        )
        asg.set_u64s(self.lt, start, lt.astype(np.uint64))
        mask = (1 << self.bits_per_limb) - 1
        for i, c in enumerate(self.limbs):
            limb = np.array(
                [(int(d) >> (self.bits_per_limb * i)) & mask for d in diff],
                dtype=np.uint64,
            )
            asg.set_u64s(c, start, limb)


@dataclass
class Comparator:
    """(lt, eq) pair (comparator.rs): lt = lhs < rhs, eq = lhs == rhs."""

    lt: LtGadget
    eq: "IsEqual"

    @classmethod
    def configure(cls, cs, q, lhs, rhs, table, n_limbs=2, name="cmp"):
        from zkevm_tpu.gadgets.is_zero import IsEqual

        lt = LtGadget.configure(cs, q, lhs, rhs, table, n_limbs, f"{name}_lt")
        eq = IsEqual.configure(cs, q, lhs, rhs, f"{name}_eq")
        return cls(lt, eq)

    def expr(self):
        return self.lt.expr(), self.eq.expr()
