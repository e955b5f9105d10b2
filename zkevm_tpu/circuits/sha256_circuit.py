"""SHA-256 circuit exposing the SHA256Table (precompile hashing).

Reference counterpart: zkevm-circuits/src/sha256_circuit/ (table-based
SHA-256 for the `sha256` precompile, circuit.rs ~1.4k LoC) with
table.rs:1602 SHA256Table.

TPU-native design, sibling of the keccak table circuit
(circuits/keccak_table.py): bit-level vector columns + one row per round.
SHA-256 state words a..h are two 32-wide boolean column groups — A holds
the `a` lineage, E the `e` lineage — because each round only creates one
new word per lineage (b..d and f..h are the previous rows' values, i.e.
plain row rotations). The message schedule W is a third 32-bit group.
All Σ/σ/Ch/Maj terms are INTEGER-valued expressions over (rotated) bits,
so every round is ONE addition constraint per lineage with a small carry
cell — no spread tables, no per-bit chi-style gates.

Block layout (stride BLOCK = 76 rows):
    rows 0..3    init rows: A holds H[3],H[2],H[1],H[0] bits and E holds
                 H[7],H[6],H[5],H[4] — so at the first round row the
                 usual (a..h) are exactly the 4 previous rows of A/E.
                 Chained from the previous block's output rows (bitwise
                 rotation equality) or pinned to the IV when a new
                 message starts.
    rows 4..67   round rows t = 0..63. Row r carries the state AFTER
                 round r-4 (A/E), the schedule word W_t, the absorbed
                 message bytes + padding flags (rows 4..19), and the
                 running input RLC/length.
    rows 68..75  output rows: A holds H_out[0..7] bits (H_in + final
                 state, carry-checked); the digest RLC accumulates here
                 and the last row is the SHA256Table surface.

Padding follows FIPS 180-4 (0x80, zeros, 64-bit big-endian bit length in
the last two words of the final block), enforced in-circuit: monotone
padding flags, 0x80 exactly at the message end, zero fill, the length
words pinned to 8*len, and no message end inside the length area (the
assigner inserts the standard extra block instead).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from zkevm_tpu.circuits.tables import Challenges
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ColumnGroup, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()

BLOCK = 76
RATE = 64  # bytes absorbed per block
R_INIT, R_ROUND0, R_WLOAD_END, R_LEN0, R_OUT0 = 0, 4, 19, 18, 68
TBL_ROW = BLOCK - 1  # 75

IV = [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
      0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19]
K = [
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
]


@dataclass
class Sha256Table:
    """(enabled, input_rlc, input_len, output_rlc, output_lo, output_hi)
    — same shape and RLC conventions as the KeccakTable (table.rs:1602)."""

    enabled: Expr
    input_rlc: Expr
    input_len: Expr
    output_rlc: Expr
    output_lo: Expr
    output_hi: Expr

    def lookup_word(self, cs: ConstraintSystem, name: str, q: Expr,
                    input_rlc: Expr, input_len: Expr,
                    output_lo: Expr, output_hi: Expr) -> None:
        cs.lookup(name, [
            (q, self.enabled),
            (q * input_rlc, self.input_rlc),
            (q * input_len, self.input_len),
            (q * output_lo, self.output_lo),
            (q * output_hi, self.output_hi),
        ])


@dataclass
class Sha256Config:
    A: ColumnGroup
    E: ColumnGroup
    W: ColumnGroup
    pads: ColumnGroup  # 4 per-byte padding flags (W-load rows)
    rlc4: ColumnGroup  # 4 phase-1 running input RLC
    orlc: Column  # phase-1 digest RLC (output rows)
    snew: Column  # block starts a new message (smeared)
    fin: Column  # padding completes in this block (smeared)
    dlen: Column  # running message length
    ca: Column  # carry cells (round: a-add; output rows: digest add)
    ce: Column  # round e-add carry
    cw: Column  # schedule carry
    kcol: Column  # fixed: K_t on round rows
    q_blk: Column
    q_blk0: Column
    q_first: Column
    q_round: Column
    q_wload: Column  # rows 4..19
    q_wl_gt0: Column  # rows 5..19
    q_len: Column  # rows 18, 19
    q_ws: Column  # schedule rows 20..67
    q_out: Column  # rows 68..75
    q_out0: Column  # row 68
    q_tbl: Column  # row 75
    rt4: RangeTable
    table: Sha256Table
    challenges: Challenges


def _int(g: ColumnGroup, rot: int = 0) -> Expr:
    acc = Const(0)
    for z in range(32):
        acc = acc + Const(1 << z) * g.columns[z].rot(rot)
    return acc


def _byte(g: ColumnGroup, j: int, rot: int = 0) -> Expr:
    """Byte j (0 = most significant) of the 32-bit word."""
    lo = 24 - 8 * j
    acc = Const(0)
    for z in range(lo, lo + 8):
        acc = acc + Const(1 << (z - lo)) * g.columns[z].rot(rot)
    return acc


def _xor2(a: Expr, b: Expr) -> Expr:
    return a + b - Const(2) * a * b


def _xor3(a: Expr, b: Expr, c: Expr) -> Expr:
    return _xor2(_xor2(a, b), c)


def _rotr_bit(g: ColumnGroup, r: int, z: int, rot: int) -> Expr:
    return g.columns[(z + r) % 32].rot(rot)


def configure(cs: ConstraintSystem, challenges: Challenges,
              rt4: RangeTable | None = None) -> Sha256Config:
    A = cs.advice_group("sha_a", 32)
    E = cs.advice_group("sha_e", 32)
    W = cs.advice_group("sha_w", 32)
    pads = cs.advice_group("sha_pads", 4)
    rlc4 = cs.advice_group("sha_rlc4", 4, phase=1)
    orlc = cs.advice_column(phase=1)
    snew = cs.advice_column()
    fin = cs.advice_column()
    dlen = cs.advice_column()
    ca = cs.advice_column()
    ce = cs.advice_column()
    cw = cs.advice_column()
    kcol = cs.fixed_column()
    q_blk = cs.fixed_column()
    q_blk0 = cs.fixed_column()
    q_first = cs.fixed_column()
    q_round = cs.fixed_column()
    q_wload = cs.fixed_column()
    q_wl_gt0 = cs.fixed_column()
    q_len = cs.fixed_column()
    q_ws = cs.fixed_column()
    q_out = cs.fixed_column()
    q_out0 = cs.fixed_column()
    q_tbl = cs.fixed_column()
    rt4 = rt4 or RangeTable.configure(cs, 4)

    one = Const(1)
    TWO32 = Const(1 << 32)

    # -- booleanity (bits boolean on every block row) --------------------
    cs.create_vector_gate("sha_a_bool", q_blk.cur() * A.q() * (A.q() - one), 32)
    cs.create_vector_gate("sha_e_bool", q_blk.cur() * E.q() * (E.q() - one), 32)
    cs.create_vector_gate("sha_w_bool", q_blk.cur() * W.q() * (W.q() - one), 32)
    cs.create_vector_gate("sha_p_bool",
                          q_wload.cur() * pads.q() * (pads.q() - one), 4)

    # -- message-boundary flags (smeared over the block) ------------------
    qb, qb0, qf = q_blk.cur(), q_blk0.cur(), q_first.cur()
    cs.create_gate("sha_flags", [
        qb * snew.cur() * (one - snew.cur()),
        qb * fin.cur() * (one - fin.cur()),
        (qb - qb0) * (snew.cur() - snew.prev()),
        (qb - qb0) * (fin.cur() - fin.prev()),
        qf * (snew.cur() - one),
        (qb0 - qf) * (snew.cur() - fin.prev()),
    ])

    # -- init rows: IV or chained from the previous block's output -------
    sn = snew.cur()
    init_gates = []
    for i in range(4):
        # A init row i holds H[3-i]; prev block's H[3-i] sits at output
        # row 68+(3-i), i.e. rotation -(5+2i)... computed per-row below.
        rot_a = -((BLOCK + i) - (R_OUT0 + 3 - i))  # from row i
        rot_e = -((BLOCK + i) - (R_OUT0 + 7 - i))
        init_gates.append(
            qb0 * sn * (_int(A, i) - Const(IV[3 - i]))
        )
        init_gates.append(
            qb0 * sn * (_int(E, i) - Const(IV[7 - i]))
        )
        init_gates.append(qb0 * (one - sn) * (_int(A, i) - _int(A, rot_a + i)))
        init_gates.append(qb0 * (one - sn) * (_int(E, i) - _int(A, rot_e + i)))
    cs.create_gate("sha_init", init_gates)

    # -- round constraints ------------------------------------------------
    qr = q_round.cur()

    def sigma_big(g: ColumnGroup, rots, rot_row: int) -> Expr:
        acc = Const(0)
        for z in range(32):
            acc = acc + Const(1 << z) * _xor3(
                _rotr_bit(g, rots[0], z, rot_row),
                _rotr_bit(g, rots[1], z, rot_row),
                _rotr_bit(g, rots[2], z, rot_row),
            )
        return acc

    ch = Const(0)
    maj = Const(0)
    for z in range(32):
        e1, f1, g1 = (E.columns[z].rot(-1), E.columns[z].rot(-2),
                      E.columns[z].rot(-3))
        ch = ch + Const(1 << z) * (e1 * f1 + (one - e1) * g1)
        a1, b1, c1 = (A.columns[z].rot(-1), A.columns[z].rot(-2),
                      A.columns[z].rot(-3))
        maj = maj + Const(1 << z) * (
            a1 * b1 + a1 * c1 + b1 * c1 - Const(2) * a1 * b1 * c1
        )
    t1 = (_int(E, -4) + sigma_big(E, (6, 11, 25), -1) + ch
          + kcol.cur() + _int(W))
    t2 = sigma_big(A, (2, 13, 22), -1) + maj
    cs.create_gate("sha_round", [
        qr * (_int(E) + ce.cur() * TWO32 - _int(A, -4) - t1),
        qr * (_int(A) + ca.cur() * TWO32 - t1 - t2),
    ])
    rt4.lookup(cs, "sha_round_carry", [qr * ca.cur(), qr * ce.cur()])

    # -- message schedule -------------------------------------------------
    def sigma_small(r1, r2, shr, rot_row):
        acc = Const(0)
        for z in range(32):
            x = _rotr_bit(W, r1, z, rot_row)
            y = _rotr_bit(W, r2, z, rot_row)
            if z + shr < 32:
                acc = acc + Const(1 << z) * _xor3(
                    x, y, W.columns[z + shr].rot(rot_row))
            else:
                acc = acc + Const(1 << z) * _xor2(x, y)
        return acc

    qws = q_ws.cur()
    cs.create_gate("sha_sched", [
        qws * (_int(W) + cw.cur() * TWO32
               - sigma_small(17, 19, 10, -2)
               - _int(W, -7)
               - sigma_small(7, 18, 3, -15)
               - _int(W, -16)),
    ])
    rt4.lookup(cs, "sha_sched_carry", [qws * cw.cur()])

    # -- absorbed bytes: padding discipline -------------------------------
    qw, qwg, ql = q_wload.cur(), q_wl_gt0.cur(), q_len.cur()
    p = [pads.columns[j] for j in range(4)]
    fn_ = fin.cur()
    pad_gates = []
    for j in range(1, 4):
        d = p[j].cur() - p[j - 1].cur()
        pad_gates.append(qw * d * (one - d))  # monotone within row
    d0 = p[0].cur() - p[3].prev()
    pad_gates.append(qwg * d0 * (one - d0))
    # cross-block continuation: row 4 of this block vs row 19 of previous
    rot_cont = -(BLOCK + R_ROUND0 - R_WLOAD_END)  # -61
    d0b = p[0].cur() - (one - snew.cur()) * pads.columns[3].rot(rot_cont)
    qw0 = q_blk0.cur()  # anchored at row 0; shift to row 4 via rot
    # express at row 4 directly with a dedicated selector: reuse q_wload -
    # q_wl_gt0 (exactly row 4)
    qw4 = qw - qwg
    pad_gates.append(qw4 * d0b * (one - d0b))
    # flip byte is 0x80; other pad bytes zero — except the FINAL block's
    # length area (rows 18,19), whose bytes are pinned by sha_length and
    # which must contain no flip at all
    for j in range(4):
        bj = _byte(W, j)
        if j == 0:
            flip = p[0].cur() - p[3].prev()  # within-stream rows
            pad_gates.append(
                (qwg - ql * fn_) * (p[0].cur() * bj - flip * Const(0x80)))
            flip4 = p[0].cur() - (one - snew.cur()) * pads.columns[3].rot(rot_cont)
            pad_gates.append(qw4 * (p[0].cur() * bj - flip4 * Const(0x80)))
            pad_gates.append(ql * fn_ * flip)  # no message end in length area
        else:
            flip = p[j].cur() - p[j - 1].cur()
            pad_gates.append(
                (qw - ql * fn_) * (p[j].cur() * bj - flip * Const(0x80)))
            pad_gates.append(ql * fn_ * flip)
    # length area of the final block: all-pad
    for j in range(4):
        pad_gates.append(ql * fn_ * (p[j].cur() - one))
    cs.create_gate("sha_padding", pad_gates)

    # the 64-bit length: W[14]*2^32 + W[15] == 8 * total message length
    # (anchored on the block's table row: rows 18/19 are fixed rotations)
    cs.create_gate("sha_length", [
        q_tbl.cur() * fin.cur() * (
            _int(W, -(TBL_ROW - (R_LEN0))) * TWO32
            + _int(W, -(TBL_ROW - (R_LEN0 + 1)))
            - Const(8) * dlen.rot(-(TBL_ROW - (R_LEN0 + 1)))
        ),
    ])

    # -- running input RLC + length ---------------------------------------
    r = challenges.keccak_input.expr()
    v = [rlc4.columns[j] for j in range(4)]
    rlc_gates = []
    for j in range(1, 4):
        prev = v[j - 1].cur()
        bj = _byte(W, j)
        step = p[j].cur() * prev + (one - p[j].cur()) * (prev * r + bj)
        rlc_gates.append(qw * (v[j].cur() - step))
    b0 = _byte(W, 0)
    prev_row = v[3].prev()
    step = p[0].cur() * prev_row + (one - p[0].cur()) * (prev_row * r + b0)
    rlc_gates.append(qwg * (v[0].cur() - step))
    carry = (one - snew.cur()) * rlc4.columns[3].rot(rot_cont)
    step4 = p[0].cur() * carry + (one - p[0].cur()) * (carry * r + b0)
    rlc_gates.append(qw4 * (v[0].cur() - step4))
    cs.create_gate("sha_input_rlc", rlc_gates)

    npad = Const(0)
    for j in range(4):
        npad = npad + p[j].cur()
    got = Const(4) - npad
    cs.create_gate("sha_input_len", [
        qwg * (dlen.cur() - dlen.prev() - got),
        qw4 * (dlen.cur() - (one - snew.cur()) * dlen.rot(rot_cont) - got),
    ])

    # -- output rows (all eight adds anchored on q_out0 via rotations) ---
    qo, qo0 = q_out.cur(), q_out0.cur()
    out_gates = []
    for i in range(8):
        # everything measured from row 68 (q_out0):
        cur = _int(A, i)  # H_out[i] bits at row 68+i
        carry_i = ca.rot(i)
        if i < 4:
            hin = _int(A, (3 - i) - R_OUT0)
            st_ = _int(A, (67 - i) - R_OUT0)
        else:
            j = i - 4
            hin = _int(E, (3 - j) - R_OUT0)
            st_ = _int(E, (67 - j) - R_OUT0)
        out_gates.append(qo0 * (cur + carry_i * TWO32 - hin - st_))
    cs.create_gate("sha_out", out_gates)
    rt4.lookup(cs, "sha_out_carry", [qo * ca.cur()])

    # -- digest RLC (phase 1, evm_word) -----------------------------------
    rw = challenges.evm_word.expr()

    def fold(prev: Expr) -> Expr:
        acc = prev
        for j in range(4):
            acc = acc * rw + _byte(A, j)
        return acc

    cs.create_gate("sha_orlc", [
        qo0 * (orlc.cur() - fold(Const(0))),
        (qo - qo0) * (orlc.cur() - fold(orlc.prev())),
    ])

    # -- the SHA256Table surface (row 75) ---------------------------------
    def digest_half(i0):
        acc = Const(0)
        for i in range(i0, i0 + 4):
            rot = (R_OUT0 + i) - TBL_ROW
            acc = acc * Const(1 << 32) + _int(A, rot)
        return acc

    qt = q_tbl.cur()
    table = Sha256Table(
        enabled=qt * fin.cur(),
        input_rlc=qt * rlc4.columns[3].rot(-(TBL_ROW - R_WLOAD_END)),
        input_len=qt * dlen.rot(-(TBL_ROW - R_WLOAD_END)),
        output_rlc=qt * orlc.cur(),
        output_lo=qt * digest_half(4),
        output_hi=qt * digest_half(0),
    )

    return Sha256Config(
        A, E, W, pads, rlc4, orlc, snew, fin, dlen, ca, ce, cw, kcol,
        q_blk, q_blk0, q_first, q_round, q_wload, q_wl_gt0, q_len, q_ws,
        q_out, q_out0, q_tbl, rt4, table, challenges,
    )


def num_blocks(cs: ConstraintSystem, n: int) -> int:
    return cs.usable_rows(n) // BLOCK


def _pad_plan(messages: list[bytes]):
    """-> per-block (bytes64, padflags64, snew, fin)."""
    plan = []
    for msg in messages:
        bitlen = 8 * len(msg)
        padded = bytearray(msg)
        padded.append(0x80)
        while len(padded) % 64 != 56:
            padded.append(0)
        padded += bitlen.to_bytes(8, "big")
        nb = len(padded) // 64
        for bi in range(nb):
            blk = bytes(padded[64 * bi : 64 * bi + 64])
            flags = [0] * 64
            for pos in range(64):
                gpos = 64 * bi + pos
                flags[pos] = 1 if gpos >= len(msg) else 0
            plan.append((blk, flags, 1 if bi == 0 else 0,
                         1 if bi == nb - 1 else 0))
    return plan


@dataclass
class Sha256Witness:
    asg: Assignment
    cfg: Sha256Config
    n: int
    byte_rows: np.ndarray  # (blocks*16, 4)
    pad_rows: np.ndarray
    snew_blocks: list
    digests: list  # 32-byte digest per block (of the running hash)

    def fill_phase1(self, r_keccak: int, r_word: int) -> None:
        cfg, asg = self.cfg, self.asg
        acc = 0
        for bi in range(len(self.snew_blocks)):
            base = bi * BLOCK
            if self.snew_blocks[bi]:
                acc = 0
            for l in range(16):
                ri = bi * 16 + l
                for j in range(4):
                    if not self.pad_rows[ri, j]:
                        acc = (acc * r_keccak
                               + int(self.byte_rows[ri, j])) % FR_MOD
                    asg.set_int(cfg.rlc4.columns[j], base + R_ROUND0 + l, acc)
            oacc = 0
            dig = self.digests[bi]
            for i in range(8):
                for j in range(4):
                    oacc = (oacc * r_word + dig[4 * i + j]) % FR_MOD
                asg.set_int(cfg.orlc, base + R_OUT0 + i, oacc)

    def witness_phases(self):
        cfg = self.cfg

        def cb(phase: int, ch: dict) -> dict:
            if phase == 1:
                self.fill_phase1(ch[cfg.challenges.keccak_input],
                                 ch[cfg.challenges.evm_word])
            return {
                c: self.asg.cols[c]
                for c in self.asg.cs.advice_columns
                if c.phase == phase
            }

        return cb


def _compress(h: list, block: bytes):
    """One SHA-256 compression; returns (per-round (a,e) list, W list,
    new h)."""
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") for i in range(16)]
    for t in range(16, 64):
        s0 = (_rr(w[t - 15], 7) ^ _rr(w[t - 15], 18) ^ (w[t - 15] >> 3))
        s1 = (_rr(w[t - 2], 17) ^ _rr(w[t - 2], 19) ^ (w[t - 2] >> 10))
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & 0xFFFFFFFF)
    a, b, c, d, e, f, g, hh = h
    rounds = []
    carries = []
    for t in range(64):
        S1 = _rr(e, 6) ^ _rr(e, 11) ^ _rr(e, 25)
        chv = (e & f) ^ (~e & g)
        t1 = (hh + S1 + chv + K[t] + w[t])
        S0 = _rr(a, 2) ^ _rr(a, 13) ^ _rr(a, 22)
        majv = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + majv)
        e_new_full = d + t1
        a_new_full = t1 + t2
        e_new = e_new_full & 0xFFFFFFFF
        a_new = a_new_full & 0xFFFFFFFF
        carries.append((a_new_full >> 32, e_new_full >> 32))
        hh, g, f, e = g, f, e, e_new
        d, c, b, a = c, b, a, a_new
        rounds.append((a, e))
    out = [(x + y) & 0xFFFFFFFF for x, y in
           zip(h, [a, b, c, d, e, f, g, hh])]
    out_carries = [(x + y) >> 32 for x, y in
                   zip(h, [a, b, c, d, e, f, g, hh])]
    return rounds, carries, w, out, out_carries


def _rr(x: int, r: int) -> int:
    return ((x >> r) | (x << (32 - r))) & 0xFFFFFFFF


def assign(
    cs: ConstraintSystem,
    cfg: Sha256Config,
    n: int,
    messages: list[bytes],
    asg: Assignment | None = None,
) -> Sha256Witness:
    asg = asg if asg is not None else Assignment(cs, n)
    cfg.rt4.load(asg)
    nblk = num_blocks(cs, n)
    one = FR.encode(1)

    plan = _pad_plan(messages)
    assert len(plan) <= nblk, f"{len(plan)} blocks > {nblk} (raise k)"
    while len(plan) < nblk:
        prev_fin = plan[-1][3] if plan else 1
        # unused blocks: fresh all-zero "message" chunks, never final
        plan.append((bytes(64), [0] * 64, prev_fin, 0))

    # fixed structure
    for bi in range(nblk):
        base = bi * BLOCK
        asg.cols[cfg.q_blk][base : base + BLOCK] = one
        asg.set_int(cfg.q_blk0, base, 1)
        if bi == 0:
            asg.set_int(cfg.q_first, base, 1)
        asg.cols[cfg.q_round][base + R_ROUND0 : base + R_ROUND0 + 64] = one
        asg.cols[cfg.q_wload][base + R_ROUND0 : base + R_WLOAD_END + 1] = one
        asg.cols[cfg.q_wl_gt0][base + R_ROUND0 + 1 : base + R_WLOAD_END + 1] = one
        asg.cols[cfg.q_len][base + R_LEN0 : base + R_LEN0 + 2] = one
        asg.cols[cfg.q_ws][base + R_ROUND0 + 16 : base + R_ROUND0 + 64] = one
        asg.cols[cfg.q_out][base + R_OUT0 : base + R_OUT0 + 8] = one
        asg.set_int(cfg.q_out0, base + R_OUT0, 1)
        asg.set_int(cfg.q_tbl, base + TBL_ROW, 1)
        for t in range(64):
            asg.set_int(cfg.kcol, base + R_ROUND0 + t, K[t])

    byte_rows = np.zeros((nblk * 16, 4), dtype=np.uint16)
    pad_rows = np.zeros((nblk * 16, 4), dtype=np.uint8)
    snew_blocks = []
    digests = []

    a_bits = np.zeros((32, n), dtype=bool)
    e_bits = np.zeros((32, n), dtype=bool)
    w_bits = np.zeros((32, n), dtype=bool)

    def put_word(bits, row, v):
        for z in range(32):
            if (v >> z) & 1:
                bits[z, row] = True

    h = list(IV)
    dlen_acc = 0
    for bi, (blk, flags, sn, fn_) in enumerate(plan):
        base = bi * BLOCK
        if sn:
            h = list(IV)
            dlen_acc = 0
        snew_blocks.append(sn)
        for r_ in range(BLOCK):
            if sn:
                asg.set_int(cfg.snew, base + r_, 1)
            if fn_:
                asg.set_int(cfg.fin, base + r_, 1)
        # init rows
        for i in range(4):
            put_word(a_bits, base + i, h[3 - i])
            put_word(e_bits, base + i, h[7 - i])
        rounds, carries, w, h_out, ocar = _compress(h, blk)
        for t in range(64):
            row = base + R_ROUND0 + t
            put_word(a_bits, row, rounds[t][0])
            put_word(e_bits, row, rounds[t][1])
            put_word(w_bits, row, w[t])
            asg.set_int(cfg.ca, row, carries[t][0])
            asg.set_int(cfg.ce, row, carries[t][1])
            if t >= 16:
                full = (w[t - 16]
                        + (_rr(w[t - 15], 7) ^ _rr(w[t - 15], 18)
                           ^ (w[t - 15] >> 3))
                        + w[t - 7]
                        + (_rr(w[t - 2], 17) ^ _rr(w[t - 2], 19)
                           ^ (w[t - 2] >> 10)))
                asg.set_int(cfg.cw, row, full >> 32)
        # absorbed bytes + pads + dlen
        for l in range(16):
            ri = bi * 16 + l
            for j in range(4):
                pos = 4 * l + j
                byte_rows[ri, j] = blk[pos]
                pad_rows[ri, j] = flags[pos]
                if flags[pos]:
                    asg.set_int(cfg.pads.columns[j], base + R_ROUND0 + l, 1)
                else:
                    dlen_acc += 1
            asg.set_int(cfg.dlen, base + R_ROUND0 + l, dlen_acc)
        # output rows
        for i in range(8):
            row = base + R_OUT0 + i
            put_word(a_bits, row, h_out[i])
            asg.set_int(cfg.ca, row, ocar[i])
        h = h_out
        digests.append(b"".join(x.to_bytes(4, "big") for x in h_out))

    for z in range(32):
        col = np.zeros((n, 16), dtype=np.uint32)
        col[a_bits[z]] = one
        asg.cols[cfg.A.columns[z]] = col
        col = np.zeros((n, 16), dtype=np.uint32)
        col[e_bits[z]] = one
        asg.cols[cfg.E.columns[z]] = col
        col = np.zeros((n, 16), dtype=np.uint32)
        col[w_bits[z]] = one
        asg.cols[cfg.W.columns[z]] = col

    return Sha256Witness(asg, cfg, n, byte_rows, pad_rows, snew_blocks,
                         digests)


def sha256(msg: bytes) -> bytes:
    """Host golden."""
    return hashlib.sha256(msg).digest()
