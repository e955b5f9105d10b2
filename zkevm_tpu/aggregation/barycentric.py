"""In-circuit barycentric evaluation of the blob polynomial at z.

Reference counterpart: aggregator/src/aggregation/barycentric.rs
(BarycentricEvaluationConfig — evaluates the 4096-coefficient blob
polynomial at the challenge z over the BLS12-381 SCALAR field, emulated
with 88-bit limbs inside the Fr circuit). Statement proved here:

    y == (z^n - 1)/n * sum_i c_i * w_i / (z - w_i)   (mod BLS_R)

over the bit-reversed EIP-4844 domain {w_i}. Row machine over ONE
mul-add ForeignMul instance (a*b + e = q*BLS_R + r, gadgets/bigint.py):

per coefficient i, 4 rows:
  r0:  d_i * 1 + w_i == z          (w_i from fixed limb columns; binds
                                    d_i = z - w_i, canonical)
  r1:  d_i * v_i + 0 == 1          (v_i = (z - w_i)^-1)
  r2:  c_i * v_i + 0 == u_i
  r3:  u_i * w_i + acc == acc'     (fold c_i w_i v_i into the sum)
epilogue (k = log2 n squarings, config-static):
  seed row (r0 with w = 0):  z * 1 + 0 == z   (reload z into the r chain)
  k squaring rows            r -> r^2          (z -> z^n)
  zn1:  z^n * 1 + (R-1)                        (z^n - 1)
  f:    zn1 * n^{-1} + 0
  y:    acc_total * f + 0, r bound to the y limb columns

z limbs, y limbs and the coefficient cells are exposed as chained advice
columns for the caller (BatchCircuit blob section / tests) to bind.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.aggregation.blob import BLS_R, blob_domain
from zkevm_tpu.gadgets.bigint import NL, ForeignMul, to_limbs
from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const

COEFF_ROWS = 4


@dataclass
class BarycentricConfig:
    n_coeffs: int
    q_rows: list  # COEFF_ROWS per-row-type selectors
    q_sq: Column
    q_zn1: Column
    q_f: Column
    q_y: Column
    q_chain: Column
    fm: ForeignMul
    w: list  # NL fixed columns: the domain point w_i on r0 rows
    z: list  # NL advice (chained through the region)
    y: list  # NL advice (chained; bound on the final row)
    c: list  # NL advice: coefficient limbs on r2 rows
    acc: list  # NL advice: running sum on r3 rows

    @classmethod
    def configure(cls, cs: ConstraintSystem, rt8: RangeTable,
                  n_coeffs: int, name: str = "bary") -> "BarycentricConfig":
        k = n_coeffs.bit_length() - 1
        assert (1 << k) == n_coeffs, "n_coeffs must be a power of two"
        q_rows = [cs.fixed_column() for _ in range(COEFF_ROWS)]
        q_sq, q_zn1, q_f, q_y = (cs.fixed_column() for _ in range(4))
        q_chain = cs.fixed_column()
        q_en = (q_rows[0].cur() + q_rows[1].cur() + q_rows[2].cur()
                + q_rows[3].cur() + q_sq.cur() + q_zn1.cur() + q_f.cur()
                + q_y.cur())
        fm = ForeignMul.configure(cs, q_en, BLS_R, rt8, name=name,
                                  with_addend=True)
        w = [cs.fixed_column() for _ in range(NL)]
        z = [cs.advice_column() for _ in range(NL)]
        y = [cs.advice_column() for _ in range(NL)]
        c = [cs.advice_column() for _ in range(NL)]
        acc = [cs.advice_column() for _ in range(NL)]
        for col in z + y + c:
            cs.enable_equality(col)

        one = Const(1)
        ninv = pow(n_coeffs, BLS_R - 2, BLS_R)
        polys = []
        qc = q_chain.cur()
        for i in range(NL):
            polys.append(qc * (z[i].rot(1) - z[i].cur()))
            polys.append(qc * (y[i].rot(1) - y[i].cur()))
        r0, r1, r2, r3 = (q.cur() for q in q_rows)
        for i in range(NL):
            o1 = one if i == 0 else Const(0)
            # r0 (also the epilogue seed row): a=d, b=1, e=w_i, r=z
            polys.append(r0 * (fm.b[i].cur() - o1))
            polys.append(r0 * (fm.e[i].cur() - w[i].cur()))
            polys.append(r0 * (fm.r[i].cur() - z[i].cur()))
            # r1: a=d (r0's a), b=v, e=0, r=1
            polys.append(r1 * (fm.a[i].cur() - fm.a[i].rot(-1)))
            polys.append(r1 * (fm.e[i].cur()))
            polys.append(r1 * (fm.r[i].cur() - o1))
            # r2: a=c_i, b=v (r1's b), e=0, r=u
            polys.append(r2 * (fm.a[i].cur() - c[i].cur()))
            polys.append(r2 * (fm.b[i].cur() - fm.b[i].rot(-1)))
            polys.append(r2 * (fm.e[i].cur()))
            # r3: a=u (r2's r), b=w_i (at rot -3), e=acc_prev, r=acc'
            polys.append(r3 * (fm.a[i].cur() - fm.r[i].rot(-1)))
            polys.append(r3 * (fm.b[i].cur() - w[i].rot(-3)))
            polys.append(r3 * (fm.e[i].cur() - acc[i].rot(-COEFF_ROWS)))
            polys.append(r3 * (fm.r[i].cur() - acc[i].cur()))
            # squaring: a = b = previous row's r, e = 0
            polys.append(q_sq.cur() * (fm.a[i].cur() - fm.r[i].rot(-1)))
            polys.append(q_sq.cur() * (fm.b[i].cur() - fm.r[i].rot(-1)))
            polys.append(q_sq.cur() * (fm.e[i].cur()))
            # zn1: a = z^n (prev r), b = 1, e = R-1
            polys.append(q_zn1.cur() * (fm.a[i].cur() - fm.r[i].rot(-1)))
            polys.append(q_zn1.cur() * (fm.b[i].cur() - o1))
            polys.append(q_zn1.cur()
                         * (fm.e[i].cur() - Const(to_limbs(BLS_R - 1)[i])))
            # f: a = zn1 (prev r), b = n^{-1} const, e = 0
            polys.append(q_f.cur() * (fm.a[i].cur() - fm.r[i].rot(-1)))
            polys.append(q_f.cur()
                         * (fm.b[i].cur() - Const(to_limbs(ninv)[i])))
            polys.append(q_f.cur() * (fm.e[i].cur()))
            # y: a = acc_total (last r3 row, rot -(4+k)), b = f (prev r),
            # e = 0, r = y
            polys.append(q_y.cur() * (fm.a[i].cur() - acc[i].rot(-(4 + k))))
            polys.append(q_y.cur() * (fm.b[i].cur() - fm.r[i].rot(-1)))
            polys.append(q_y.cur() * (fm.e[i].cur()))
            polys.append(q_y.cur() * (fm.r[i].cur() - y[i].cur()))
        cs.create_gate(f"{name}_region", polys)
        return cls(n_coeffs, q_rows, q_sq, q_zn1, q_f, q_y, q_chain, fm,
                   w, z, y, c, acc)

    def total_rows(self) -> int:
        k = self.n_coeffs.bit_length() - 1
        return self.n_coeffs * COEFF_ROWS + 1 + k + 3

    def assign(self, asg: Assignment, coeffs: list[int], z: int,
               start: int = 0) -> dict:
        """Fill the region; returns y plus the (col, row) handles of the
        z / y / coefficient cells for external copy binding."""
        n = self.n_coeffs
        k = n.bit_length() - 1
        assert len(coeffs) == n
        dom = blob_domain(n)
        R = BLS_R
        z %= R
        zl = to_limbs(z)
        fm = self.fm
        accv = 0
        coeff_cells = []
        row = start
        for i in range(n):
            wi = dom[i]
            wl = to_limbs(wi)
            d = (z - wi) % R
            v = pow(d, R - 2, R)
            cv = coeffs[i] % R
            u = cv * v % R
            for rr in range(COEFF_ROWS):
                asg.set_int(self.q_rows[rr], row + rr, 1)
            for j in range(NL):
                asg.set_int(self.w[j], row, wl[j])
            fm.assign_row(asg, row, d, 1, wi)
            fm.assign_row(asg, row + 1, d, v, 0)
            fm.assign_row(asg, row + 2, cv, v, 0)
            accv_new = (u * wi + accv) % R
            fm.assign_row(asg, row + 3, u, wi, accv)
            cl = to_limbs(cv)
            al = to_limbs(accv_new)
            for j in range(NL):
                asg.set_int(self.c[j], row + 2, cl[j])
                asg.set_int(self.acc[j], row + 3, al[j])
            coeff_cells.append([(self.c[j], row + 2) for j in range(NL)])
            accv = accv_new
            row += COEFF_ROWS
        # epilogue
        asg.set_int(self.q_rows[0], row, 1)  # seed: d=z, w=0 -> r=z
        for j in range(NL):
            asg.set_int(self.w[j], row, 0)
        zp = fm.assign_row(asg, row, z, 1, 0)
        row += 1
        for _ in range(k):
            asg.set_int(self.q_sq, row, 1)
            zp = fm.assign_row(asg, row, zp, zp, 0)
            row += 1
        asg.set_int(self.q_zn1, row, 1)
        zn1 = fm.assign_row(asg, row, zp, 1, R - 1)
        row += 1
        asg.set_int(self.q_f, row, 1)
        f = fm.assign_row(asg, row, zn1, pow(n, R - 2, R), 0)
        row += 1
        asg.set_int(self.q_y, row, 1)
        yv = fm.assign_row(asg, row, accv, f, 0)
        end_row = row
        ylim = to_limbs(yv)
        for rr in range(start, end_row + 1):
            for j in range(NL):
                asg.set_int(self.z[j], rr, zl[j])
                asg.set_int(self.y[j], rr, ylim[j])
            if rr < end_row:
                asg.set_int(self.q_chain, rr, 1)
        return {
            "y": yv,
            "row_end": end_row + 1,
            "z_cells": [(self.z[j], start) for j in range(NL)],
            "y_cells": [(self.y[j], start) for j in range(NL)],
            "coeff_cells": coeff_cells,
        }
