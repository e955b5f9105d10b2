"""FlexGate: a general-purpose native-field arithmetic chip.

Reference counterpart: halo2-base's `FlexGateConfig` (scroll-tech/halo2-lib
branch `develop`, SURVEY.md §1 L0) — the workhorse under halo2-ecc and the
snark-verifier aggregation circuits. Every scalar computation of the
in-circuit PLONK verifier (transcript challenge math, vanishing/Lagrange
evaluations, gate-expression evaluation at x, SHPLONK scalar combination)
is laid down as FlexGate rows.

Row shape (one operation per row):

    advice  a, b, c, o
    fixed   qa, qb, qc, qm, qk, qo

    gate:   qa*a + qb*b + qc*c + qm*a*b + qk - qo*o == 0

All-zero coefficient rows are no-ops, so the chip needs no master
selector and unused tail rows are trivially satisfied. Values flow
between rows through copy constraints (the permutation argument), exactly
like halo2-base's vertical-gate wiring; operands passed as Python ints
are fresh witness cells, operands passed as `Cell`s are copy-constrained
to their producing cell.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem


@dataclass(frozen=True)
class Cell:
    """A (column, row) handle whose witnessed value is known host-side."""

    col: Column
    row: int
    val: int


@dataclass
class FlexGate:
    a: Column
    b: Column
    c: Column
    o: Column
    qa: Column
    qb: Column
    qc: Column
    qm: Column
    qk: Column
    qo: Column

    @classmethod
    def configure(cls, cs: ConstraintSystem, name: str = "flex") -> "FlexGate":
        a, b, c, o = (cs.advice_column() for _ in range(4))
        qa, qb, qc, qm, qk, qo = (cs.fixed_column() for _ in range(6))
        for col in (a, b, c, o):
            cs.enable_equality(col)
        g = (
            qa.cur() * a.cur()
            + qb.cur() * b.cur()
            + qc.cur() * c.cur()
            + qm.cur() * a.cur() * b.cur()
            + qk.cur()
            - qo.cur() * o.cur()
        )
        cs.create_gate(name, [g])
        return cls(a, b, c, o, qa, qb, qc, qm, qk, qo)


class FlexCtx:
    """Assignment context: appends one row per operation, wiring Cell
    operands via copy constraints. Constraints (cs.copy) are recorded at
    assignment time, so the row budget must be identical across witnesses
    of the same statement — the verifier circuit guarantees this because
    its op sequence depends only on the (fixed) vk shape.
    """

    def __init__(self, cs: ConstraintSystem, cfg: FlexGate,
                 asg: Assignment, start: int):
        self.cs = cs
        self.cfg = cfg
        self.asg = asg
        self.row = start

    # -- core row emitter -------------------------------------------------
    def _operand(self, col: Column, v) -> int:
        """Place operand v (int or Cell) into (col, current row)."""
        if isinstance(v, Cell):
            self.asg.set_int(col, self.row, v.val)
            self.cs.copy(col, self.row, v.col, v.row)
            return v.val
        self.asg.set_int(col, self.row, int(v) % FR_MOD)
        return int(v) % FR_MOD

    def raw(self, qa: int, qb: int, qc: int, qm: int, qk: int, qo: int,
            a=0, b=0, c=0) -> Cell | None:
        cfg, asg, row = self.cfg, self.asg, self.row
        av = self._operand(cfg.a, a)
        bv = self._operand(cfg.b, b)
        cv = self._operand(cfg.c, c)
        for col, q in ((cfg.qa, qa), (cfg.qb, qb), (cfg.qc, qc),
                       (cfg.qm, qm), (cfg.qk, qk), (cfg.qo, qo)):
            asg.set_int(col, row, q % FR_MOD)
        out = None
        if qo:
            ov = (qa * av + qb * bv + qc * cv + qm * av * bv + qk) % FR_MOD
            ov = ov * pow(qo, FR_MOD - 2, FR_MOD) % FR_MOD
            asg.set_int(cfg.o, row, ov)
            out = Cell(cfg.o, row, ov)
        else:
            lhs = (qa * av + qb * bv + qc * cv + qm * av * bv + qk) % FR_MOD
            assert lhs == 0, f"flex assert failed at row {row}: {lhs}"
        self.row += 1
        return out

    # -- ops ---------------------------------------------------------------
    def constant(self, k: int) -> Cell:
        """o == k (a pinned constant cell)."""
        return self.raw(0, 0, 0, 0, k, 1)

    def witness(self, v: int) -> Cell:
        """An unconstrained witness load (o free; use as later operand)."""
        return self.raw(1, 0, 0, 0, 0, 1, a=int(v) % FR_MOD)

    def add(self, x, y) -> Cell:
        return self.raw(1, 1, 0, 0, 0, 1, a=x, b=y)

    def sub(self, x, y) -> Cell:
        return self.raw(1, -1, 0, 0, 0, 1, a=x, b=y)

    def neg(self, x) -> Cell:
        return self.raw(-1, 0, 0, 0, 0, 1, a=x)

    def mul(self, x, y) -> Cell:
        return self.raw(0, 0, 0, 1, 0, 1, a=x, b=y)

    def mul_add(self, x, y, z) -> Cell:
        """x*y + z."""
        return self.raw(0, 0, 1, 1, 0, 1, a=x, b=y, c=z)

    def add_const(self, x, k: int) -> Cell:
        return self.raw(1, 0, 0, 0, k, 1, a=x)

    def mul_const(self, x, k: int) -> Cell:
        return self.raw(k, 0, 0, 0, 0, 1, a=x)

    def assert_eq(self, x, y) -> None:
        self.raw(1, -1, 0, 0, 0, 0, a=x, b=y)

    def assert_const(self, x, k: int) -> None:
        self.raw(1, 0, 0, 0, -k, 0, a=x)

    def assert_bool(self, x) -> None:
        """x * x == x."""
        self.raw(-1, 0, 0, 1, 0, 0, a=x, b=x)

    def assert_mul(self, x, y, z) -> None:
        """x*y == z."""
        self.raw(0, 0, -1, 1, 0, 0, a=x, b=y, c=z)

    def inv(self, x) -> Cell:
        """x^-1 (x must be nonzero; unsatisfiable otherwise)."""
        xv = x.val if isinstance(x, Cell) else int(x) % FR_MOD
        w = pow(xv, FR_MOD - 2, FR_MOD)
        # row: a*b == 1 with a copied from x; returns the b cell
        cfg, row = self.cfg, self.row
        self.raw(0, 0, 0, 1, -1, 0, a=x, b=w)
        return Cell(cfg.b, row, w)

    def div(self, x, y) -> Cell:
        return self.mul(x, self.inv(y))

    def select(self, bit, x, y) -> Cell:
        """bit ? x : y (bit must already be boolean-constrained)."""
        d = self.sub(x, y)
        return self.mul_add(bit, d, y)

    def inner_product(self, xs, ys) -> Cell:
        acc = None
        for x, y in zip(xs, ys):
            acc = self.mul(x, y) if acc is None else self.mul_add(x, y, acc)
        return acc if acc is not None else self.constant(0)

    def horner(self, coeffs, x) -> Cell:
        """coeffs[0] + x*(coeffs[1] + x*(...)) — coeffs lowest-first."""
        acc = None
        for cf in reversed(list(coeffs)):
            if acc is None:
                acc = cf if isinstance(cf, Cell) else self.constant(cf)
            else:
                acc = self.mul_add(acc, x, cf)
        return acc if acc is not None else self.constant(0)

    def pow2k(self, x, k: int) -> Cell:
        """x^(2^k) by k squarings."""
        acc = x
        for _ in range(k):
            acc = self.mul(acc, acc)
        return acc

    def pow(self, x, e: int) -> Cell:
        """x^e, square-and-multiply (e a host constant)."""
        if e == 0:
            return self.constant(1)
        acc = None
        for bit in bin(e)[2:]:
            if acc is not None:
                acc = self.mul(acc, acc)
            if bit == "1":
                acc = x if acc is None else self.mul(acc, x)
        return acc

    def sum(self, xs) -> Cell:
        acc = None
        for x in xs:
            acc = (x if isinstance(x, Cell) else self.constant(x)) \
                if acc is None else self.add(acc, x)
        return acc if acc is not None else self.constant(0)

    def decompose(self, x, nbits: int, limb_bits: int) -> list[Cell]:
        """x == sum limb_i 2^(limb_bits*i), limbs witnessed (range checks
        are the CALLER's responsibility — e.g. via a RangeTable lookup)."""
        xv = x.val if isinstance(x, Cell) else int(x) % FR_MOD
        nl = (nbits + limb_bits - 1) // limb_bits
        limbs = [self.witness((xv >> (limb_bits * i)) & ((1 << limb_bits) - 1))
                 for i in range(nl)]
        acc = limbs[-1]
        for i in range(nl - 2, -1, -1):
            acc = self.mul_add(acc, 1 << limb_bits, limbs[i])
        self.assert_eq(acc, x)
        return limbs
