"""Fixed range tables (reference: zkevm-circuits/src/table.rs:3210
FixedTableTag::Range16/32/64/256... and the u8/u16 lookup columns every
LtChip/byte decomposition consults)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem


@dataclass
class RangeTable:
    """A fixed column holding 0..2^bits-1 (rows beyond that stay 0, which
    keeps 0 in the table — harmless, matches halo2 default-fill)."""

    col: Column
    bits: int

    @classmethod
    def configure(cls, cs: ConstraintSystem, bits: int) -> "RangeTable":
        return cls(cs.fixed_column(), bits)

    def load(self, asg: Assignment) -> None:
        size = 1 << self.bits
        assert size <= asg.n, f"range table 2^{self.bits} needs n >= {size}"
        asg.set_u64s(self.col, 0, np.arange(size, dtype=np.uint64))

    def lookup(self, cs: ConstraintSystem, name: str, exprs) -> None:
        """Register an independent `expr in [0, 2^bits)` lookup per expr
        (one lookup argument each — a single multi-pair lookup would
        require the exprs to land on the SAME table row)."""
        for i, e in enumerate(exprs):
            cs.lookup(f"{name}#{i}", [(e, self.col.cur())])
