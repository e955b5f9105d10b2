"""Word-arithmetic table circuit: 256-bit a*b + c = d (mod 2^256) rows.

Reference counterpart: the MulAddWords gadget family inlined in the EVM
circuit's multi-row steps (zkevm-circuits/src/evm_circuit/util/
math_gadget/mul_add_words.rs, consumed by execution/mul_div_mod.rs and
execution/shl_shr.rs). The reference affords ~500 byte-lookup cells per
step because a step spans 21 rows and byte cells share lookup columns
vertically; this framework's EVM circuit is one-row-per-step (wide), so
inlining the byte decompositions would cost ~84 lookup ARGUMENTS per
word-mul state. TPU-native answer: hoist word multiplication into a
satellite table circuit with a VERTICAL 16-row byte grid — 16 byte
columns total (16 lookup arguments, shared by every consumer state) — and
let the EVM circuit bind (tag, a, b, c, d) word tuples with one lookup.

Row group layout (R = 16 rows per operation, anchor = row 0):

    rows  0..3   g1 = a's 64-bit limbs, one per row, 8 bytes little-endian
    rows  4..7   g1 = b's limbs
    rows  8..11  g1 = c's limbs
    rows 12..13  g1 = carry_lo bytes 0..7 / 8..9 (rest forced 0)
    rows 14..15  g1 = carry_hi bytes 0..7 / 8..9 (rest forced 0)
    rows  8..11  g2 = D = b - c - 1 limb bytes (c < b witness, tags 2/4)
    rows  0..3   g2 = e bytes (512 tags: e_lo rows 0..1, e_hi rows 2..3)
    rows  4..7   g2 = d bytes (512 tags: d_lo rows 4..5, d_hi rows 6..7)
    rows 14..15  g2 = carry2 bytes 0..7 / 8..9 (512 tags; rest forced 0)

Anchor-row identities over the limb sums (t_k = sum_{i+j=k} a_i b_j):

    t0 + t1*2^64 + c_lo = d_lo + carry_lo*2^128
    t2 + t3*2^64 + c_hi + carry_lo = d_hi + carry_hi*2^128

Tags:
    1 = MUL        d = a*b + c mod 2^256, overflow free (c is the addend;
                   the EVM's MUL/SHL pass c = 0)
    2 = DIVMOD     additionally carry_hi = 0 (no 2^256 wrap: a*b + c = d
                   EXACTLY) and c < b via a borrowed limb subtraction
                   D = b - c - 1 (so DIV/MOD/SHR remainders are canonical
                   without any consumer-side range check)
    3 = MUL512     full product: a*b + c = e*2^256 + d with the high word
                   e on the surface; d AND e byte-decomposed in-table
                   (their cells are intermediates for consumers like
                   MULMOD, never stack words, so the table supplies the
                   128-bit-half range proof itself)
    4 = DIVMOD512  MUL512 plus the c < b remainder check — the k*N + r
                   side of ADDMOD/MULMOD (reference mulmod.rs's
                   MulAddWords512Gadget + LtWordGadget)

The b = 0 divisor case never reaches this table: EVM-side gadgets gate
the lookup off and pin the pushed result to 0 (reference
mul_div_mod.rs's divisor_is_zero path).

d_lo/d_hi are bound by consumers to stack-traffic words (state-circuit
range-checked at the RwTable boundary), same convention as every other
word cell in the EVM circuit.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

R = 16  # rows per operation
M64 = (1 << 64) - 1
M128 = (1 << 128) - 1
M256 = (1 << 256) - 1


class WordOp(IntEnum):
    MUL = 1
    DIVMOD = 2
    MUL512 = 3
    DIVMOD512 = 4


@dataclass
class WordArithTable:
    """Lookup surface: (enabled, tag, a_lo, a_hi, b_lo, b_hi, c_lo, c_hi,
    d_lo, d_hi, e_lo, e_hi), all anchor-gated (disabled rows are the zero
    tuple; e is the 512-tag product high word, 0 for tags 1/2)."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, en: Expr,
               tag: Expr, a: tuple, b: tuple, c: tuple, d: tuple,
               e: tuple | None = None) -> None:
        """en must be 0/1; word args are (lo, hi) expression pairs."""
        ins = [en, en * tag]
        for w in (a, b, c, d):
            ins.append(en * w[0])
            ins.append(en * w[1])
        if e is None:
            ins.extend([Const(0), Const(0)])
        else:
            ins.extend([en * e[0], en * e[1]])
        cs.lookup(name, list(zip(ins, self.exprs)))


@dataclass
class WordArithConfig:
    q_anchor: Column  # fixed: first row of each 16-row group
    q_en: Column  # fixed: every table row
    tag: Column
    a_lo: Column
    a_hi: Column
    b_lo: Column
    b_hi: Column
    c_lo: Column
    c_hi: Column
    d_lo: Column
    d_hi: Column
    e_lo: Column  # 512-tag product high word (0 on tags 1/2)
    e_hi: Column
    g1: list  # 8 byte columns: operand/carry grid
    g2: list  # 8 byte columns: c < b subtraction + 512-tag d/e/carry2 grid
    borrows: list  # 4 boolean columns (anchor row): limb borrow chain
    table: WordArithTable
    n_ops: int  # capacity in operations (set by assign-time region size)


def _byte_sum(cols: list, rot: int) -> Expr:
    acc = Const(0)
    for j, c in enumerate(cols):
        acc = acc + Const(1 << (8 * j)) * c.rot(rot)
    return acc


def configure(cs: ConstraintSystem, rt8: RangeTable) -> WordArithConfig:
    q_anchor = cs.fixed_column()
    q_en = cs.fixed_column()
    tag = cs.advice_column()
    a_lo, a_hi = cs.advice_column(), cs.advice_column()
    b_lo, b_hi = cs.advice_column(), cs.advice_column()
    c_lo, c_hi = cs.advice_column(), cs.advice_column()
    d_lo, d_hi = cs.advice_column(), cs.advice_column()
    e_lo, e_hi = cs.advice_column(), cs.advice_column()
    g1 = [cs.advice_column() for _ in range(8)]
    g2 = [cs.advice_column() for _ in range(8)]
    borrows = [cs.advice_column() for _ in range(4)]

    one = Const(1)
    qa = q_anchor.cur()
    al = [_byte_sum(g1, i) for i in range(4)]
    bl = [_byte_sum(g1, 4 + i) for i in range(4)]
    cl = [_byte_sum(g1, 8 + i) for i in range(4)]
    dl2 = [_byte_sum(g2, 8 + i) for i in range(4)]  # D = b - c - 1 limbs
    carry_lo = _byte_sum(g1, 12) + Const(1 << 64) * (
        g1[0].rot(13) + Const(1 << 8) * g1[1].rot(13)
    )
    carry_hi = _byte_sum(g1, 14) + Const(1 << 64) * (
        g1[0].rot(15) + Const(1 << 8) * g1[1].rot(15)
    )
    carry2 = _byte_sum(g2, 14) + Const(1 << 64) * (
        g2[0].rot(15) + Const(1 << 8) * g2[1].rot(15)
    )
    # 512-tag byte decompositions of e and d (128-bit half range proofs)
    el_sum = _byte_sum(g2, 0) + Const(1 << 64) * _byte_sum(g2, 1)
    eh_sum = _byte_sum(g2, 2) + Const(1 << 64) * _byte_sum(g2, 3)
    dl_sum = _byte_sum(g2, 4) + Const(1 << 64) * _byte_sum(g2, 5)
    dh_sum = _byte_sum(g2, 6) + Const(1 << 64) * _byte_sum(g2, 7)

    two64 = Const(1 << 64)
    two128 = Const(1 << 128)
    t0 = al[0] * bl[0]
    t1 = al[0] * bl[1] + al[1] * bl[0]
    t2 = al[0] * bl[2] + al[1] * bl[1] + al[2] * bl[0]
    t3 = al[0] * bl[3] + al[1] * bl[2] + al[2] * bl[1] + al[3] * bl[0]
    t4 = al[1] * bl[3] + al[2] * bl[2] + al[3] * bl[1]
    t5 = al[2] * bl[3] + al[3] * bl[2]
    t6 = al[3] * bl[3]

    # tag indicators over the domain {1, 2, 3, 4} (Lagrange basis)
    t = tag.cur()
    inv = lambda x: Const(pow(x % FR_MOD, FR_MOD - 2, FR_MOD))
    ind2 = (t - one) * (t - Const(3)) * (t - Const(4)) * inv(2)
    ind3 = (t - one) * (t - Const(2)) * (t - Const(4)) * inv(-2)
    ind4 = (t - one) * (t - Const(2)) * (t - Const(3)) * inv(6)
    is_rem = ind2 + ind4  # c < b remainder tags
    is512 = ind3 + ind4  # full-product tags

    polys = [
        # tag domain
        qa * (t - one) * (t - Const(2)) * (t - Const(3)) * (t - Const(4)),
        # word <-> limb bindings
        qa * (a_lo.cur() - al[0] - two64 * al[1]),
        qa * (a_hi.cur() - al[2] - two64 * al[3]),
        qa * (b_lo.cur() - bl[0] - two64 * bl[1]),
        qa * (b_hi.cur() - bl[2] - two64 * bl[3]),
        qa * (c_lo.cur() - cl[0] - two64 * cl[1]),
        qa * (c_hi.cur() - cl[2] - two64 * cl[3]),
        # mul-add identities (low 256 bits)
        qa * (t0 + t1 * two64 + c_lo.cur() - d_lo.cur() - carry_lo * two128),
        qa * (t2 + t3 * two64 + c_hi.cur() + carry_lo - d_hi.cur()
              - carry_hi * two128),
        # DIVMOD: exact — the full overflow (mul_add_words.rs overflow()),
        # not just carry_hi: every product limb above 2^256 must vanish
        qa * ind2 * (carry_hi + t4 + t5 + t6),
        # 512 tags: high-word identities + in-table e range proof
        qa * is512 * (t4 + t5 * two64 + carry_hi - el_sum - carry2 * two128),
        qa * is512 * (t6 + carry2 - eh_sum),
        # d byte decomposition, ALL tags: without it the (d, carry)
        # split is ambiguous by 2^128 multiples whenever the consumer
        # cell is not otherwise range-bound (EXP/MULMOD intermediates)
        qa * (d_lo.cur() - dl_sum),
        qa * (d_hi.cur() - dh_sum),
        # e columns: the byte sums on 512 tags, 0 otherwise
        qa * (e_lo.cur() - is512 * el_sum),
        qa * (e_hi.cur() - is512 * eh_sum),
    ]
    # carry rows use only bytes 0..1 of rows 13/15
    for j in range(2, 8):
        polys.append(qa * g1[j].rot(13))
        polys.append(qa * g1[j].rot(15))
        polys.append(qa * is512 * g2[j].rot(15))
    # remainder tags: c < b  <=>  b - (c+1) = D with no final borrow,
    # limb-wise (a field-wide 256-bit subtraction would wrap past p)
    bin_ = one  # borrow-in of limb 0 is the "+1"
    for i in range(4):
        bo = borrows[i].cur()
        polys.append(qa * bo * (one - bo))
        polys.append(
            qa * is_rem
            * (bl[i] - cl[i] - bin_ + bo * two64 - dl2[i])
        )
        bin_ = bo
    polys.append(qa * is_rem * borrows[3].cur())  # no underflow: c < b
    cs.create_gate("wa_table", polys)

    rt8.lookup(cs, "wa_g1_u8", [q_en.cur() * c.cur() for c in g1])
    rt8.lookup(cs, "wa_g2_u8", [q_en.cur() * c.cur() for c in g2])

    table = WordArithTable([
        qa,
        qa * tag.cur(),
        qa * a_lo.cur(), qa * a_hi.cur(),
        qa * b_lo.cur(), qa * b_hi.cur(),
        qa * c_lo.cur(), qa * c_hi.cur(),
        qa * d_lo.cur(), qa * d_hi.cur(),
        qa * e_lo.cur(), qa * e_hi.cur(),
    ])
    return WordArithConfig(
        q_anchor, q_en, tag, a_lo, a_hi, b_lo, b_hi, c_lo, c_hi, d_lo, d_hi,
        e_lo, e_hi, g1, g2, borrows, table, 0,
    )


@dataclass
class WordArithOp:
    """One table row group: e*2^256 + d = a*b + c (e = 0 unless 512)."""

    tag: WordOp
    a: int
    b: int
    c: int

    @property
    def d(self) -> int:
        return (self.a * self.b + self.c) & M256

    @property
    def e(self) -> int:
        if self.tag in (WordOp.MUL512, WordOp.DIVMOD512):
            return (self.a * self.b + self.c) >> 256
        return 0


def assign(
    cs: ConstraintSystem,
    cfg: WordArithConfig,
    n: int,
    ops: list[WordArithOp],
    asg: Assignment | None = None,
    start: int = 0,
) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    m = cs.usable_rows(n) - 1
    assert start + R * len(ops) <= m, "word-arith region overflow"

    for k, op in enumerate(ops):
        r0 = start + R * k
        asg.set_int(cfg.q_anchor, r0, 1)
        for r in range(r0, r0 + R):
            asg.set_int(cfg.q_en, r, 1)
        a, b, c = int(op.a), int(op.b), int(op.c)
        assert 0 <= a <= M256 and 0 <= b <= M256 and 0 <= c <= M256
        d, e = op.d, op.e
        if op.tag == WordOp.DIVMOD:
            assert a * b + c == d, "DIVMOD op wraps 2^256"
        if op.tag in (WordOp.DIVMOD, WordOp.DIVMOD512):
            assert c < b, "remainder not canonical"
        asg.set_int(cfg.tag, r0, int(op.tag))
        asg.set_int(cfg.a_lo, r0, a & M128)
        asg.set_int(cfg.a_hi, r0, a >> 128)
        asg.set_int(cfg.b_lo, r0, b & M128)
        asg.set_int(cfg.b_hi, r0, b >> 128)
        asg.set_int(cfg.c_lo, r0, c & M128)
        asg.set_int(cfg.c_hi, r0, c >> 128)
        asg.set_int(cfg.d_lo, r0, d & M128)
        asg.set_int(cfg.d_hi, r0, d >> 128)
        asg.set_int(cfg.e_lo, r0, e & M128)
        asg.set_int(cfg.e_hi, r0, e >> 128)

        def put_bytes(cols, row, value, nbytes):
            for j in range(nbytes):
                asg.set_int(cols[j], row, (value >> (8 * j)) & 0xFF)

        for i in range(4):
            put_bytes(cfg.g1, r0 + i, (a >> (64 * i)) & M64, 8)
            put_bytes(cfg.g1, r0 + 4 + i, (b >> (64 * i)) & M64, 8)
            put_bytes(cfg.g1, r0 + 8 + i, (c >> (64 * i)) & M64, 8)

        al = [(a >> (64 * i)) & M64 for i in range(4)]
        bl = [(b >> (64 * i)) & M64 for i in range(4)]
        t0 = al[0] * bl[0]
        t1 = al[0] * bl[1] + al[1] * bl[0]
        t2 = al[0] * bl[2] + al[1] * bl[1] + al[2] * bl[0]
        t3 = al[0] * bl[3] + al[1] * bl[2] + al[2] * bl[1] + al[3] * bl[0]
        carry_lo = (t0 + (t1 << 64) + (c & M128) - (d & M128)) >> 128
        carry_hi = (t2 + (t3 << 64) + (c >> 128) + carry_lo - (d >> 128)) >> 128
        put_bytes(cfg.g1, r0 + 12, carry_lo & M64, 8)
        put_bytes(cfg.g1, r0 + 13, carry_lo >> 64, 2)
        put_bytes(cfg.g1, r0 + 14, carry_hi & M64, 8)
        put_bytes(cfg.g1, r0 + 15, carry_hi >> 64, 2)

        for i in range(4):  # d bytes rows 4..7 (all tags)
            put_bytes(cfg.g2, r0 + 4 + i, (d >> (64 * i)) & M64, 8)
        if op.tag in (WordOp.MUL512, WordOp.DIVMOD512):
            t4 = al[1] * bl[3] + al[2] * bl[2] + al[3] * bl[1]
            t5 = al[2] * bl[3] + al[3] * bl[2]
            carry2 = (t4 + (t5 << 64) + carry_hi - (e & M128)) >> 128
            for i in range(4):  # e bytes rows 0..3
                put_bytes(cfg.g2, r0 + i, (e >> (64 * i)) & M64, 8)
            put_bytes(cfg.g2, r0 + 14, carry2 & M64, 8)
            put_bytes(cfg.g2, r0 + 15, carry2 >> 64, 2)

        if op.tag in (WordOp.DIVMOD, WordOp.DIVMOD512):
            borrow_in = 1
            for i in range(4):
                cl_i = (c >> (64 * i)) & M64
                di = bl[i] - cl_i - borrow_in
                bo = 1 if di < 0 else 0
                di += bo << 64
                asg.set_int(cfg.borrows[i], r0, bo)
                put_bytes(cfg.g2, r0 + 8 + i, di, 8)
                borrow_in = bo
            assert borrow_in == 0
    return asg
