"""BinaryNumber gadget (reference: gadgets/src/binary_number.rs): encodes
a small tag as boolean bit columns with `value()` and `value_equals(t)`
expressions (used by e.g. the state circuit's tag dispatch)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr


@dataclass
class BinaryNumber:
    bits: list  # bit columns, MOST significant first (binary_number.rs:67)

    @classmethod
    def configure(
        cls, cs: ConstraintSystem, q: Expr, n_bits: int, name: str = "bin"
    ) -> "BinaryNumber":
        cols = [cs.advice_column() for _ in range(n_bits)]
        cs.create_gate(
            f"{name}_bool",
            [q * c.cur() * (Const(1) - c.cur()) for c in cols],
        )
        return cls(cols)

    def value(self) -> Expr:
        acc = Const(0)
        for c in self.bits:
            acc = acc * Const(2) + c.cur()
        return acc

    def value_equals(self, t: int, rotation: int = 0) -> Expr:
        """Degree-n_bits indicator: product of (bit or 1-bit) matching t's
        binary expansion."""
        acc = Const(1)
        n = len(self.bits)
        for i, c in enumerate(self.bits):
            bit = (t >> (n - 1 - i)) & 1
            term = c.rot(rotation) if bit else Const(1) - c.rot(rotation)
            acc = acc * term
        return acc

    def assign_rows(self, asg: Assignment, start: int, values) -> None:
        vals = np.asarray(list(values), dtype=np.uint64)
        n = len(self.bits)
        for i, c in enumerate(self.bits):
            asg.set_u64s(c, start, (vals >> np.uint64(n - 1 - i)) & np.uint64(1))
