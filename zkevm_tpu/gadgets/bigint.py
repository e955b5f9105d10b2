"""Non-native big-integer arithmetic gadget: a*b ≡ r (mod m) for a
foreign modulus m inside the BN254-Fr constraint system.

Reference counterpart: halo2-base/halo2-ecc's CRT bigint chip
(scroll-tech/halo2-lib, SURVEY §1 L0) — the layer under the Sig circuit
(secp256k1 ECDSA), the ECC circuit (BN254 precompiles' non-native Fq),
and the aggregation stack's in-circuit pairing verifier. This module is
the round-2 groundwork: the core mul-mod identity as a standalone,
tested gadget in this framework's array-column idiom.

Representation: NL limbs of LB bits, little-endian (default 3x88 — the
reference's production config, aggregator/src/param.rs limb_bits=88,
num_limbs=3). All limbs are u8-chunk range-checked.

mul_mod constraint (the schoolbook-with-carries identity, checked over
the 2^LB base so no term overflows Fr):

    a * b = q * m + r          (as integers)

    t_k   = sum_{i+j=k} a_i b_j - q_i m_j        k in 0..2NL-2
    acc_0 = t_0 - r_0,  acc_k = c_{k-1} + t_k - r_k (r_k = 0 for k>=NL)
    acc_k = c_k * 2^LB                            (c_k witnessed, signed)
    c_{2NL-2} = 0

Each carry c_k is bounded by ~NL*2^(LB+2), so it is range-checked via a
SHIFTED decomposition (c_k + 2^CB in [0, 2^(CB+1))) with CB = LB + 16.
r is constrained canonical (r < m) by a borrow-chain comparison against
the constant modulus limbs; q < 2^(NL*LB) by its limb range checks,
which together with the integer sizes makes the identity sound.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

LB = 88  # limb bits (aggregator/src/param.rs)
NL = 3  # limbs (264 bits: covers secp256k1 Fp/Fq and BN254 Fq)
CB = LB + 16  # carry magnitude bound (bits)


def to_limbs(v: int, nl: int = NL, lb: int = LB) -> list:
    return [(v >> (lb * i)) & ((1 << lb) - 1) for i in range(nl)]


def from_limbs(limbs) -> int:
    return sum(int(v) << (LB * i) for i, v in enumerate(limbs))


@dataclass
class ForeignMul:
    """One mul-add-mod instance: on rows where q_en is 1, the row's
    (a, b, e, q, r) limb cells satisfy a*b + e = q*m + r with r canonical
    (e is an optional addend, allocated when with_addend=True — it makes
    modular ADDITION free: a=x, b=1, e=y gives r = x + y mod m)."""

    modulus: int
    a: list  # NL limb columns
    b: list
    q: list
    r: list
    carries: list  # 2NL-1 shifted carry columns
    borrows: list  # NL borrow bools of the r < m comparison
    chunks: dict  # column -> list of u8 chunk columns (range decomposition)
    e: list | None = None  # NL addend limb columns (with_addend only)

    @classmethod
    def configure(cls, cs: ConstraintSystem, q_en: Expr, modulus: int,
                  rt8: RangeTable, name: str = "fmul",
                  with_addend: bool = False) -> "ForeignMul":
        m_limbs = to_limbs(modulus)
        a = [cs.advice_column() for _ in range(NL)]
        b = [cs.advice_column() for _ in range(NL)]
        qq = [cs.advice_column() for _ in range(NL)]
        r = [cs.advice_column() for _ in range(NL)]
        carries = [cs.advice_column() for _ in range(2 * NL - 1)]
        borrows = [cs.advice_column() for _ in range(NL)]
        e = [cs.advice_column() for _ in range(NL)] if with_addend else None
        g = cls(modulus, a, b, qq, r, carries, borrows, {}, e)

        one = Const(1)
        B2 = Const(1 << LB)

        # -- limb range checks via u8 chunk decomposition -----------------
        chunk_gates = []
        for cols in (a, b, qq, r) + ((e,) if e else ()):
            for col in cols:
                nch = LB // 8
                chs = [cs.advice_column() for _ in range(nch)]
                g.chunks[col] = chs
                acc = Const(0)
                for i, ch in enumerate(reversed(chs)):
                    acc = acc * Const(256) + ch.cur()
                chunk_gates.append(q_en * (col.cur() - acc))
                rt8.lookup(cs, f"{name}_u8_{col.index}",
                           [q_en * ch.cur() for ch in chs])
        cs.create_gate(f"{name}_limbs", chunk_gates)

        # -- carry-chain product identity ---------------------------------
        SH = Const(1 << CB)
        id_gates = []
        prev_c = None
        for k in range(2 * NL - 1):
            t = Const(0)
            for i in range(NL):
                j = k - i
                if 0 <= j < NL:
                    t = t + a[i].cur() * b[j].cur()
                    t = t - qq[i].cur() * Const(m_limbs[j])
            if k < NL:
                t = t - r[k].cur()
                if e is not None:
                    t = t + e[k].cur()
            if prev_c is not None:
                t = t + prev_c
            ck = carries[k].cur() - SH  # shifted storage: c = cell - 2^CB
            if k == 2 * NL - 2:
                id_gates.append(q_en * (t))  # final carry must be zero...
                id_gates.append(q_en * (carries[k].cur() - SH))
            else:
                id_gates.append(q_en * (t - ck * B2))
            prev_c = ck
        cs.create_gate(f"{name}_identity", id_gates)
        # carry cells in [0, 2^(CB+1)): u8 chunks
        for col in carries[:-1]:
            nch = (CB + 1 + 7) // 8
            chs = [cs.advice_column() for _ in range(nch)]
            g.chunks[col] = chs
            acc = Const(0)
            for i, ch in enumerate(reversed(chs)):
                acc = acc * Const(256) + ch.cur()
            cs.create_gate(f"{name}_carry_{col.index}",
                           [q_en * (col.cur() - acc)])
            rt8.lookup(cs, f"{name}_c8_{col.index}",
                       [q_en * ch.cur() for ch in chs])

        # -- canonicality: r < m via borrow-chain subtraction --------------
        # d_i = m_i - r_i - borrow_{i-1} + borrow_i * 2^LB  must be a limb;
        # the top borrow is 0 and (m - 1 - r) >= 0 overall. Using m-1 so
        # r == m is excluded.
        m1_limbs = to_limbs(modulus - 1)
        sub_gates = []
        prev_b = Const(0)
        for i in range(NL):
            bi = borrows[i].cur()
            sub_gates.append(q_en * bi * (one - bi))
            d = (Const(m1_limbs[i]) - r[i].cur() - prev_b + bi * B2)
            # d is a valid limb: reuse chunk machinery
            nch = LB // 8
            chs = [cs.advice_column() for _ in range(nch)]
            g.chunks[borrows[i]] = chs
            acc = Const(0)
            for j, ch in enumerate(reversed(chs)):
                acc = acc * Const(256) + ch.cur()
            sub_gates.append(q_en * (d - acc))
            rt8.lookup(cs, f"{name}_d8_{i}",
                       [q_en * ch.cur() for ch in chs])
            prev_b = bi
        sub_gates.append(q_en * borrows[NL - 1].cur())  # no final borrow
        cs.create_gate(f"{name}_canon", sub_gates)
        return g

    def assign_row(self, asg: Assignment, row: int, av: int, bv: int,
                   ev: int = 0) -> int:
        """Fill one row's cells for a*b + e mod m; returns r."""
        m = self.modulus
        assert ev == 0 or self.e is not None
        prod = av * bv + ev
        qv, rv = divmod(prod, m)
        vals = {tuple(self.a): av, tuple(self.b): bv,
                tuple(self.q): qv, tuple(self.r): rv}
        if self.e is not None:
            vals[tuple(self.e)] = ev
        for cols, v in vals.items():
            for i, col in enumerate(cols):
                limb = (v >> (LB * i)) & ((1 << LB) - 1)
                asg.set_int(col, row, limb)
                for j, ch in enumerate(self.chunks[col]):
                    asg.set_int(ch, row, (limb >> (8 * j)) & 0xFF)
        # carries
        a_l, b_l = to_limbs(av), to_limbs(bv)
        q_l, r_l = to_limbs(qv), to_limbs(rv)
        e_l = to_limbs(ev)
        m_l = to_limbs(m)
        c = 0
        for k in range(2 * NL - 1):
            t = c
            for i in range(NL):
                j = k - i
                if 0 <= j < NL:
                    t += a_l[i] * b_l[j] - q_l[i] * m_l[j]
            if k < NL:
                t -= r_l[k]
                t += e_l[k]
            if k < 2 * NL - 2:
                assert t % (1 << LB) == 0, (k, t)
                c = t >> (LB)  # exact (floor == exact when divisible)
                cell = c + (1 << CB)
                assert 0 <= cell < (1 << (CB + 1)), (k, c)
                asg.set_int(self.carries[k], row, cell)
                for j, ch in enumerate(self.chunks[self.carries[k]]):
                    asg.set_int(ch, row, (cell >> (8 * j)) & 0xFF)
            else:
                assert t == 0, t  # the full identity closes
                asg.set_int(self.carries[k], row, 1 << CB)
        # borrows + diff chunks for r < m
        m1_l = to_limbs(m - 1)
        pb = 0
        for i in range(NL):
            d = m1_l[i] - r_l[i] - pb
            bi = 1 if d < 0 else 0
            d += bi << LB
            asg.set_int(self.borrows[i], row, bi)
            for j, ch in enumerate(self.chunks[self.borrows[i]]):
                asg.set_int(ch, row, (d >> (8 * j)) & 0xFF)
            pb = bi
        assert pb == 0
        return rv


@dataclass
class ForeignMulDyn:
    """ForeignMul with the modulus read from ADVICE limb columns (the
    ModExp precompile's per-event modulus; reference misc-precompile
    modexp circuit). Same identity + canonicality, with q_i*m_j as
    advice-times-advice terms and the r < m borrow chain against the
    modulus cells (borrow-in 1 excludes r == m)."""

    m: list  # NL modulus limb columns
    a: list
    b: list
    q: list
    r: list
    carries: list
    borrows: list
    chunks: dict

    @classmethod
    def configure(cls, cs: ConstraintSystem, q_en: Expr,
                  rt8: RangeTable, name: str = "fmuld") -> "ForeignMulDyn":
        m = [cs.advice_column() for _ in range(NL)]
        a = [cs.advice_column() for _ in range(NL)]
        b = [cs.advice_column() for _ in range(NL)]
        qq = [cs.advice_column() for _ in range(NL)]
        r = [cs.advice_column() for _ in range(NL)]
        carries = [cs.advice_column() for _ in range(2 * NL - 1)]
        borrows = [cs.advice_column() for _ in range(NL)]
        g = cls(m, a, b, qq, r, carries, borrows, {})

        one = Const(1)
        B2 = Const(1 << LB)

        chunk_gates = []
        for cols in (m, a, b, qq, r):
            for col in cols:
                nch = LB // 8
                chs = [cs.advice_column() for _ in range(nch)]
                g.chunks[col] = chs
                acc = Const(0)
                for i, ch in enumerate(reversed(chs)):
                    acc = acc * Const(256) + ch.cur()
                chunk_gates.append(q_en * (col.cur() - acc))
                rt8.lookup(cs, f"{name}_u8_{col.index}",
                           [q_en * ch.cur() for ch in chs])
        cs.create_gate(f"{name}_limbs", chunk_gates)

        SH = Const(1 << CB)
        id_gates = []
        prev_c = None
        for k in range(2 * NL - 1):
            t = Const(0)
            for i in range(NL):
                j = k - i
                if 0 <= j < NL:
                    t = t + a[i].cur() * b[j].cur()
                    t = t - qq[i].cur() * m[j].cur()
            if k < NL:
                t = t - r[k].cur()
            if prev_c is not None:
                t = t + prev_c
            ck = carries[k].cur() - SH
            if k == 2 * NL - 2:
                id_gates.append(q_en * t)
                id_gates.append(q_en * (carries[k].cur() - SH))
            else:
                id_gates.append(q_en * (t - ck * B2))
            prev_c = ck
        cs.create_gate(f"{name}_identity", id_gates)
        for col in carries[:-1]:
            nch = (CB + 1 + 7) // 8
            chs = [cs.advice_column() for _ in range(nch)]
            g.chunks[col] = chs
            acc = Const(0)
            for i, ch in enumerate(reversed(chs)):
                acc = acc * Const(256) + ch.cur()
            cs.create_gate(f"{name}_carry_{col.index}",
                           [q_en * (col.cur() - acc)])
            rt8.lookup(cs, f"{name}_c8_{col.index}",
                       [q_en * ch.cur() for ch in chs])

        # r < m: m_i - r_i - b_in + b_out*2^LB is a valid limb, b_in0 = 1
        sub_gates = []
        prev_b = one
        for i in range(NL):
            bi = borrows[i].cur()
            sub_gates.append(q_en * bi * (one - bi))
            d = m[i].cur() - r[i].cur() - prev_b + bi * B2
            nch = LB // 8
            chs = [cs.advice_column() for _ in range(nch)]
            g.chunks[borrows[i]] = chs
            acc = Const(0)
            for j, ch in enumerate(reversed(chs)):
                acc = acc * Const(256) + ch.cur()
            sub_gates.append(q_en * (d - acc))
            rt8.lookup(cs, f"{name}_d8_{i}",
                       [q_en * ch.cur() for ch in chs])
            prev_b = bi
        sub_gates.append(q_en * borrows[NL - 1].cur())
        cs.create_gate(f"{name}_canon", sub_gates)
        return g

    def assign_row(self, asg: Assignment, row: int, av: int, bv: int,
                   mv: int) -> int:
        """Fill one row for a*b mod mv (mv >= 1); returns r."""
        prod = av * bv
        qv, rv = divmod(prod, mv)
        vals = {tuple(self.m): mv, tuple(self.a): av, tuple(self.b): bv,
                tuple(self.q): qv, tuple(self.r): rv}
        for cols, v in vals.items():
            for i, col in enumerate(cols):
                limb = (v >> (LB * i)) & ((1 << LB) - 1)
                asg.set_int(col, row, limb)
                for j, ch in enumerate(self.chunks[col]):
                    asg.set_int(ch, row, (limb >> (8 * j)) & 0xFF)
        a_l, b_l = to_limbs(av), to_limbs(bv)
        q_l, r_l = to_limbs(qv), to_limbs(rv)
        m_l = to_limbs(mv)
        c = 0
        for k in range(2 * NL - 1):
            t = c
            for i in range(NL):
                j = k - i
                if 0 <= j < NL:
                    t += a_l[i] * b_l[j] - q_l[i] * m_l[j]
            if k < NL:
                t -= r_l[k]
            if k < 2 * NL - 2:
                assert t % (1 << LB) == 0, (k, t)
                c = t >> LB
                cell = c + (1 << CB)
                assert 0 <= cell < (1 << (CB + 1)), (k, c)
                asg.set_int(self.carries[k], row, cell)
                for j, ch in enumerate(self.chunks[self.carries[k]]):
                    asg.set_int(ch, row, (cell >> (8 * j)) & 0xFF)
            else:
                assert t == 0, t
                asg.set_int(self.carries[k], row, 1 << CB)
        pb = 1
        for i in range(NL):
            d = m_l[i] - r_l[i] - pb
            bi = 1 if d < 0 else 0
            d += bi << LB
            asg.set_int(self.borrows[i], row, bi)
            for j, ch in enumerate(self.chunks[self.borrows[i]]):
                asg.set_int(ch, row, (d >> (8 * j)) & 0xFF)
            pb = bi
        assert pb == 0, "r >= m"
        return rv
