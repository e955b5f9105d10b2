"""IsZero / IsEqual gadgets (reference: gadgets/src/is_zero.rs,
gadgets/src/is_equal.rs; used by ~every execution gadget via
EVMConstraintBuilder)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()


@dataclass
class IsZero:
    """Witnesses inv = value^-1 (0 if value == 0); exposes the degree-
    deg(value)+1 expression `1 - value*inv` which is 1 iff value == 0.

    Constraints (is_zero.rs:59): q * value * (1 - value*inv) == 0 and
    q * inv * (1 - value*inv) == 0 (the second pins is_zero to 0 for
    nonzero values even under adversarial inv)."""

    inv: Column
    value_expr: Expr

    @classmethod
    def configure(
        cls, cs: ConstraintSystem, q: Expr, value_expr: Expr, name: str = "is_zero"
    ) -> "IsZero":
        inv = cs.advice_column()
        g = cls(inv, value_expr)
        e = g.expr()
        cs.create_gate(name, [q * value_expr * e, q * inv.cur() * e])
        return g

    def expr(self) -> Expr:
        return Const(1) - self.value_expr * self.inv.cur()

    def assign_rows(self, asg: Assignment, start: int, values_mont: np.ndarray) -> None:
        """values_mont: (k, 16) Montgomery rows of the gadget's value —
        fills inv with the batched Fermat inverse (0 -> 0)."""
        inv = np.asarray(ff.inv(FR, values_mont))
        asg.set_mont(self.inv, start, inv)


@dataclass
class IsEqual:
    """is_equal(lhs, rhs) = is_zero(lhs - rhs) (is_equal.rs)."""

    iz: IsZero

    @classmethod
    def configure(
        cls, cs: ConstraintSystem, q: Expr, lhs: Expr, rhs: Expr, name: str = "is_equal"
    ) -> "IsEqual":
        return cls(IsZero.configure(cs, q, lhs - rhs, name))

    def expr(self) -> Expr:
        return self.iz.expr()

    def assign_rows(
        self, asg: Assignment, start: int, lhs_mont: np.ndarray, rhs_mont: np.ndarray
    ) -> None:
        diff = np.asarray(ff.sub(FR, lhs_mont, rhs_mont))
        self.iz.assign_rows(asg, start, diff)
