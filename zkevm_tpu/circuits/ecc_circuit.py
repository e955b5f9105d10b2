"""ECC circuit: BN254 G1 ecAdd / ecMul for the 0x06/0x07 precompiles.

Reference counterpart: zkevm-circuits/src/ecc_circuit.rs (halo2-ecc over
non-native BN254 Fq; EccTable consumed by the precompile call gadgets).

TPU-native design: the sig circuit's row-machine idiom over ONE
ForeignMul instance (mod BN254 Fq). Two event kinds share the region
machinery:

  EcAdd region (12 rows): on-curve checks for P1 and P2 (y^2 = x^3 + 3,
  3 rows each), one incomplete affine add (lam*(x2-x1)=y2-y1, dx != 0
  guard, lam^2, lam*(x1-x3)) with X3/Y3 materialized, then two
  canonicalization muls (X3*1, Y3*1 mod q) bound to the result state.

  EcMul region (3 + 256*8 + 7 rows): on-curve check for P, then the
  sig-style double-and-add ladder over the 256 scalar bits (acc starts
  at the fixed offset K_B; skip blocks add the decoy K2_B and discard),
  per-limb scalar accumulators bound to the chained k limbs, a final
  add of C = -(2^256)*K_B, and result canonicalization.

Exceptional-case caveats (documented; the same class as halo2-ecc's
incomplete formulas): inputs at infinity, P1 = +-P2 for ecAdd, and
k*P = infinity for ecMul (k a multiple of the group order) have no
witness here — the precompile-call wiring pins those edge results
before the table lookup. BN254 G1 has odd prime order, so ladder
doublings never hit y = 0.

Tables: EcAddTable (enabled, x1,y1,x2,y2,x3,y3 limbs), EcMulTable
(enabled, px,py,k,rx,ry limbs) on region-start rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.ff.goldens import FQ_MOD, FR_MOD
from zkevm_tpu.gadgets.bigint import LB, NL, ForeignMul, from_limbs, to_limbs
from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

Q = FQ_MOD
B2 = 1 << LB
NBITS = 256
SEGS = (88, 88, 80)
BLK = 8

K_B = bn.scalar_mul((1, 2), 0xB0BA)  # (1,2) generates BN254 G1
K2_B = bn.scalar_mul((1, 2), 0xFACADE)


def _corr():
    kx, ky = bn.scalar_mul((1, 2), (0xB0BA << NBITS) % FR_MOD)
    return (kx, Q - ky)


ADD_ROWS = 12
MUL_PRE = 3
MUL_POST = 7


def mul_region_rows() -> int:
    return MUL_PRE + BLK * NBITS + MUL_POST


@dataclass
class EccTable:
    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class EccConfig:
    q_add: list  # ADD_ROWS fixed columns (per ecAdd-region row type)
    q_mul: list  # MUL_PRE + MUL_POST fixed columns (pre/post row types)
    q_b: list  # BLK ladder row-type columns
    q_first_blk: Column
    q_seg: list
    q_chain: Column
    q_fq: Column
    fq: ForeignMul
    st: dict
    bit: Column
    acc: Column
    sf: list
    sc: list
    add_table: EccTable
    mul_table: EccTable
    # word surfaces (128-bit halves) for the EVM precompile-call states
    add_word_table: EccTable = None
    mul_word_table: EccTable = None
    wsplit_bytes: dict = None  # nm -> (b_lo[5], b_hi[6]) split columns


def _slot(polys, sel, terms, out, m_limbs, f, cq, fmax):
    one = Const(1)
    fd = f.cur()
    dom = one
    for d in range(fmax + 1):
        dom = dom * (fd - Const(d))
    polys.append(sel * dom)
    for c in cq:
        cc = c.cur()
        polys.append(sel * cc * (cc - one) * (cc + one))
    carries = [cq[0].cur() + Const(3) * cq[1].cur(),
               cq[2].cur() + Const(3) * cq[3].cur()]
    prev = Const(0)
    for i in range(NL):
        t = Const(0)
        for coeff, limbs in terms:
            if limbs[i] is not None:
                t = t + Const(coeff % FR_MOD) * limbs[i]
        if out is not None and out[i] is not None:
            t = t - out[i]
        t = t - fd * Const(m_limbs[i]) + prev
        if i < NL - 1:
            polys.append(sel * (t - carries[i] * Const(B2)))
            prev = carries[i]
        else:
            polys.append(sel * t)


def _lim(cols, rot=0):
    return [c.rot(rot) if rot else c.cur() for c in cols]


def _const_limbs(v):
    return [Const(x) for x in to_limbs(v)]


ST_NAMES = ("p1x", "p1y", "p2x", "p2y", "kl", "r3x", "r3y",
            "X", "Y", "x3c", "y3c", "x3p", "y3p")
CHAINED = ("p1x", "p1y", "p2x", "p2y", "kl", "r3x", "r3y")


def _curve_check(polys, rows, fq, xl, yl, sf, sc, pl):
    """3 FP rows: x*x, x*(x^2), y*y with y^2 == x^3 + 3 (slot)."""
    one = Const(1)
    ra, rb, rc = rows
    for i in range(NL):
        polys.append(ra * (fq.a[i].cur() - xl[i].cur()))
        polys.append(ra * (fq.b[i].cur() - xl[i].cur()))
        polys.append(rb * (fq.a[i].cur() - xl[i].cur()))
        polys.append(rb * (fq.b[i].cur() - fq.r[i].rot(-1)))
        polys.append(rc * (fq.a[i].cur() - yl[i].cur()))
        polys.append(rc * (fq.b[i].cur() - yl[i].cur()))
    _slot(polys, rc, [(1, _lim(fq.r, -1)), (3, [one, None, None]),
                      (1, pl)], _lim(fq.r), to_limbs(Q), sf, sc, fmax=2)


def _add_block(polys, rows, fq, x1, y1, x2, y2, x3, y3, sf, sc, plc):
    """4 rows at `rows` = (r0..r3): incomplete add (x1,y1)+(x2,y2):
    lam*(x2-x1)=y2-y1 ; dx*inv=1 ; lam^2 ; lam*(2x1+x2-lam^2) with
    X3 = lam^2-x1-x2 and Y3 = r@3 - y1 materialized into x3/y3 cells
    (each a (limbs, rot) pair for the state columns)."""
    one = Const(1)
    pl = to_limbs(Q)
    r0, r1, r2, r3 = rows
    _slot(polys, r0, [(1, x2(0)), (-1, x1(0)), (1, plc)],
          _lim(fq.b), pl, sf[0], sc[0], fmax=1)
    _slot(polys, r0, [(1, y2(0)), (-1, y1(0)), (1, plc)],
          _lim(fq.r), pl, sf[1], sc[1], fmax=1)
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(r1 * (fq.a[i].cur() - fq.b[i].rot(-1)))
        polys.append(r1 * (fq.r[i].cur() - o1))
        polys.append(r2 * (fq.a[i].cur() - fq.a[i].rot(-2)))
        polys.append(r2 * (fq.b[i].cur() - fq.a[i].rot(-2)))
        polys.append(r3 * (fq.a[i].cur() - fq.a[i].rot(-3)))
    _slot(polys, r3, [(2, x1(3)), (1, x2(3)), (-1, _lim(fq.r, -1)),
                      (1, plc)], _lim(fq.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, r3, [(1, _lim(fq.r, -1)), (-1, x1(3)), (-1, x2(3)),
                      (2, plc)], x3, pl, sf[1], sc[1], fmax=2)
    _slot(polys, r3, [(1, _lim(fq.r)), (-1, y1(3)), (1, plc)],
          y3, pl, sf[2], sc[2], fmax=1)


def configure(cs: ConstraintSystem, rt8: RangeTable) -> EccConfig:
    q_add = [cs.fixed_column() for _ in range(ADD_ROWS)]
    q_mul = [cs.fixed_column() for _ in range(MUL_PRE + MUL_POST)]
    q_b = [cs.fixed_column() for _ in range(BLK)]
    q_first_blk = cs.fixed_column()
    q_seg = [cs.fixed_column() for _ in range(NL - 1)]
    q_chain = cs.fixed_column()
    q_fq = cs.fixed_column()
    fq = ForeignMul.configure(cs, q_fq.cur(), Q, rt8, name="ecc_fq")

    st = {nm: [cs.advice_column() for _ in range(NL)] for nm in ST_NAMES}
    bit, acc = cs.advice_column(), cs.advice_column()
    sf = [cs.advice_column() for _ in range(3)]
    sc = [[cs.advice_column() for _ in range(4)] for _ in range(3)]

    one = Const(1)
    pl = to_limbs(Q)
    plc = _const_limbs(Q)
    polys: list = []
    qc = q_chain.cur()
    for nm in CHAINED:
        for c in st[nm]:
            polys.append(qc * (c.rot(1) - c.cur()))

    # ---------------- EcAdd region ----------------
    A = [q_add[i].cur() for i in range(ADD_ROWS)]
    _curve_check(polys, (A[0], A[1], A[2]), fq, st["p1x"], st["p1y"],
                 sf[0], sc[0], plc)
    _curve_check(polys, (A[3], A[4], A[5]), fq, st["p2x"], st["p2y"],
                 sf[0], sc[0], plc)
    _add_block(
        polys, (A[6], A[7], A[8], A[9]), fq,
        x1=lambda k: _lim(st["p1x"]), y1=lambda k: _lim(st["p1y"]),
        x2=lambda k: _lim(st["p2x"]), y2=lambda k: _lim(st["p2y"]),
        x3=_lim(st["x3c"]), y3=_lim(st["y3c"]), sf=sf, sc=sc, plc=plc,
    )
    # canonicalize X3, Y3 and bind the result state
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(A[10] * (fq.a[i].cur() - st["x3c"][i].rot(-1)))
        polys.append(A[10] * (fq.b[i].cur() - o1))
        polys.append(A[10] * (fq.r[i].cur() - st["r3x"][i].cur()))
        polys.append(A[11] * (fq.a[i].cur() - st["y3c"][i].rot(-2)))
        polys.append(A[11] * (fq.b[i].cur() - o1))
        polys.append(A[11] * (fq.r[i].cur() - st["r3y"][i].cur()))

    # ---------------- EcMul region ----------------
    M = [q_mul[i].cur() for i in range(MUL_PRE + MUL_POST)]
    _curve_check(polys, (M[0], M[1], M[2]), fq, st["p1x"], st["p1y"],
                 sf[0], sc[0], plc)
    b0, b1_, b2_, b3_, b4_, b5_, b6_, b7_ = (q_b[i].cur() for i in range(8))
    X, Y = st["X"], st["Y"]
    x3c, y3c, x3p, y3p = st["x3c"], st["y3c"], st["x3p"], st["y3p"]
    kxl, kyl = _const_limbs(K_B[0]), _const_limbs(K_B[1])
    k2x, k2y = _const_limbs(K2_B[0]), _const_limbs(K2_B[1])
    bb = bit.cur()
    polys.append(b0 * bb * (one - bb))
    # addend: S = bit ? P : K2 (selected inline in the b4/b7 slots)
    sxf = lambda rot: [bb_r(rot) * st["p1x"][i].rot(rot)
                       + (one - bb_r(rot)) * k2x[i] for i in range(NL)]
    syf = lambda rot: [bb_r(rot) * st["p1y"][i].rot(rot)
                       + (one - bb_r(rot)) * k2y[i] for i in range(NL)]

    def bb_r(rot):
        return bit.rot(rot) if rot else bit.cur()

    qfb = q_first_blk.cur()
    for i in range(NL):
        polys.append(qfb * (X[i].cur() - kxl[i]))
        polys.append(qfb * (Y[i].cur() - kyl[i]))
    nfb = b0 - qfb
    selp = bit.rot(-BLK)
    for i in range(NL):
        polys.append(nfb * (X[i].cur() - selp * x3p[i].rot(-1)
                            - (one - selp) * x3c[i].rot(-5)))
        polys.append(nfb * (Y[i].cur() - selp * y3p[i].rot(-1)
                            - (one - selp) * y3c[i].rot(-5)))
    seg_starts = qfb
    for q in q_seg:
        seg_starts = seg_starts + q.cur()
    within = b0 - seg_starts
    polys.append(seg_starts * (acc.cur() - bb))
    polys.append(within * (acc.cur() - Const(2) * acc.rot(-BLK) - bb))
    for j, q in enumerate(q_seg):
        polys.append(q.cur() * (acc.rot(-BLK) - st["kl"][NL - 1 - j].cur()))
    qpost0 = M[MUL_PRE]
    polys.append(qpost0 * (acc.rot(-BLK) - st["kl"][0].cur()))

    # b0: X*X ; b1: lam_d*(2Y)=3x2 ; b2: lam^2 ; b3: double results
    for i in range(NL):
        polys.append(b0 * (fq.a[i].cur() - X[i].cur()))
        polys.append(b0 * (fq.b[i].cur() - X[i].cur()))
    _slot(polys, b1_, [(2, _lim(Y, -1))], _lim(fq.b), pl, sf[0], sc[0],
          fmax=1)
    _slot(polys, b1_, [(3, _lim(fq.r, -1))], _lim(fq.r), pl, sf[1], sc[1],
          fmax=2)
    for i in range(NL):
        polys.append(b2_ * (fq.a[i].cur() - fq.a[i].rot(-1)))
        polys.append(b2_ * (fq.b[i].cur() - fq.a[i].rot(-1)))
        polys.append(b3_ * (fq.a[i].cur() - fq.a[i].rot(-2)))
    _slot(polys, b3_, [(3, _lim(X, -3)), (-1, _lim(fq.r, -1)), (1, plc)],
          _lim(fq.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, b3_, [(1, _lim(fq.r, -1)), (-2, _lim(X, -3)), (2, plc)],
          _lim(x3c), pl, sf[1], sc[1], fmax=2)
    _slot(polys, b3_, [(1, _lim(fq.r)), (-1, _lim(Y, -3)), (1, plc)],
          _lim(y3c), pl, sf[2], sc[2], fmax=1)
    # b4..b7: add S (select P/K2 by the bit at rot to b0)
    _slot(polys, b4_, [(1, sxf(-4)), (-1, _lim(x3c, -1)), (1, plc)],
          _lim(fq.b), pl, sf[0], sc[0], fmax=1)
    _slot(polys, b4_, [(1, syf(-4)), (-1, _lim(y3c, -1)), (1, plc)],
          _lim(fq.r), pl, sf[1], sc[1], fmax=1)
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(b5_ * (fq.a[i].cur() - fq.b[i].rot(-1)))
        polys.append(b5_ * (fq.r[i].cur() - o1))
        polys.append(b6_ * (fq.a[i].cur() - fq.a[i].rot(-2)))
        polys.append(b6_ * (fq.b[i].cur() - fq.a[i].rot(-2)))
        polys.append(b7_ * (fq.a[i].cur() - fq.a[i].rot(-3)))
    _slot(polys, b7_, [(2, _lim(x3c, -4)), (1, sxf(-7)),
                       (-1, _lim(fq.r, -1)), (1, plc)],
          _lim(fq.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, b7_, [(1, _lim(fq.r, -1)), (-1, _lim(x3c, -4)),
                      (-1, sxf(-7)), (2, plc)],
          _lim(x3p), pl, sf[1], sc[1], fmax=2)
    _slot(polys, b7_, [(1, _lim(fq.r)), (-1, _lim(y3c, -4)), (1, plc)],
          _lim(y3p), pl, sf[2], sc[2], fmax=1)

    # post rows: select final, add C, canonicalize into r3x/r3y
    cxv, cyv = _corr()
    cxc, cyc = _const_limbs(cxv), _const_limbs(cyv)
    f0, f1, f2, f3, f4, f5, f6 = (M[MUL_PRE + i] for i in range(7))
    for i in range(NL):
        polys.append(f0 * (X[i].cur() - selp * x3p[i].rot(-1)
                           - (one - selp) * x3c[i].rot(-5)))
        polys.append(f0 * (Y[i].cur() - selp * y3p[i].rot(-1)
                           - (one - selp) * y3c[i].rot(-5)))
    _add_block(
        polys, (f0, f1, f2, f3), fq,
        x1=lambda k: _lim(X, -k), y1=lambda k: _lim(Y, -k),
        x2=lambda k: cxc, y2=lambda k: cyc,
        x3=_lim(x3c), y3=_lim(y3c), sf=sf, sc=sc, plc=plc,
    )
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(f4 * (fq.a[i].cur() - x3c[i].rot(-1)))
        polys.append(f4 * (fq.b[i].cur() - o1))
        polys.append(f4 * (fq.r[i].cur() - st["r3x"][i].cur()))
        polys.append(f5 * (fq.a[i].cur() - y3c[i].rot(-2)))
        polys.append(f5 * (fq.b[i].cur() - o1))
        polys.append(f5 * (fq.r[i].cur() - st["r3y"][i].cur()))
    # f6 row: spare (keeps MUL_POST aligned; no constraints)

    # --- word surfaces: each value as 128-bit halves on the region-start
    # rows (the EVM precompile-call states PRE_ECA/PRE_ECM bind RwTable
    # words, which are hi/lo; same ranged middle-limb split as the sig
    # circuit's addr_word_table — an unranged split cell would let a
    # forging witness pick arbitrary halves):
    #   l1 = l1a + 2^40*l1b (both byte-decomposed + range-checked),
    #   lo = l0 + 2^88*l1a,  hi = l1b + 2^48*l2.
    qa0, qm0 = q_add[0].cur(), q_mul[0].cur()
    sel_w = qa0 + qm0
    wsplit, wsplit_bytes = {}, {}
    for nm in ("p1x", "p1y", "p2x", "p2y", "kl", "r3x", "r3y"):
        b_lo = [cs.advice_column() for _ in range(5)]   # l1a bytes
        b_hi = [cs.advice_column() for _ in range(6)]   # l1b bytes
        wsplit_bytes[nm] = (b_lo, b_hi)
        rt8.lookup(cs, f"ecc_w40_{nm}", [sel_w * c.cur() for c in b_lo])
        rt8.lookup(cs, f"ecc_w48_{nm}", [sel_w * c.cur() for c in b_hi])
        l1a = Const(0)
        for jj, c in enumerate(b_lo):
            l1a = l1a + Const(1 << (8 * jj)) * c.cur()
        l1b = Const(0)
        for jj, c in enumerate(b_hi):
            l1b = l1b + Const(1 << (8 * jj)) * c.cur()
        polys.append(sel_w * (st[nm][1].cur() - l1a
                              - Const(1 << 40) * l1b))
        wsplit[nm] = (
            st[nm][0].cur() + Const(1 << 88) * l1a,
            l1b + Const(1 << 48) * st[nm][2].cur(),
        )

    cs.create_gate("ecc_region", polys)

    add_table = EccTable(
        [q_add[0].cur()]
        + [q_add[0].cur() * c.cur()
           for nm in ("p1x", "p1y", "p2x", "p2y", "r3x", "r3y")
           for c in st[nm]]
    )
    mul_table = EccTable(
        [q_mul[0].cur()]
        + [q_mul[0].cur() * c.cur()
           for nm in ("p1x", "p1y", "kl", "r3x", "r3y")
           for c in st[nm]]
    )
    add_word_table = EccTable(
        [qa0] + [qa0 * h
                 for nm in ("p1x", "p1y", "p2x", "p2y", "r3x", "r3y")
                 for h in wsplit[nm]]
    )
    mul_word_table = EccTable(
        [qm0] + [qm0 * h for nm in ("p1x", "p1y", "kl", "r3x", "r3y")
                 for h in wsplit[nm]]
    )
    return EccConfig(q_add, q_mul, q_b, q_first_blk, q_seg, q_chain, q_fq,
                     fq, st, bit, acc, sf, sc, add_table, mul_table,
                     add_word_table, mul_word_table, wsplit_bytes)


@dataclass
class EcAddEvent:
    p1: tuple
    p2: tuple

    @property
    def result(self) -> tuple:
        return bn.add(self.p1, self.p2)


@dataclass
class EcMulEvent:
    p: tuple
    k: int  # < 2^256, k*P != infinity

    @property
    def result(self) -> tuple:
        return bn.scalar_mul(self.p, self.k)


def _slot_assign(asg, cfg, si, row, terms, out_limbs, m):
    m_l = to_limbs(m)
    outv = from_limbs(out_limbs)
    val = sum(c * from_limbs(l) for c, l in terms)
    f, rem = divmod(val - outv, m)
    assert rem == 0 and f >= 0, ("ecc slot mismatch", f, rem)
    asg.set_int(cfg.sf[si], row, f)
    prev = 0
    for i in range(NL):
        t = (sum(c * l[i] for c, l in terms) - out_limbs[i]
             - f * m_l[i] + prev)
        if i == NL - 1:
            assert t == 0, t
            break
        ci, r2 = divmod(t, 1 << LB)
        assert r2 == 0
        ca = ((ci + 4) % 3) - 1
        cb = (ci - ca) // 3
        asg.set_int(cfg.sc[si][2 * i], row, ca % FR_MOD)
        asg.set_int(cfg.sc[si][2 * i + 1], row, cb % FR_MOD)
        prev = ci


def _setl(asg, cols, row, limbs):
    for c, v in zip(cols, limbs):
        asg.set_int(c, row, v)


def _qinv(v):
    return pow(v, Q - 2, Q)


def _assign_curve_check(asg, cfg, base, xv, yv):
    t1 = cfg.fq.assign_row(asg, base, xv, xv)
    t2 = cfg.fq.assign_row(asg, base + 1, xv, t1)
    t3 = cfg.fq.assign_row(asg, base + 2, yv, yv)
    one_l = [1, 0, 0]
    _slot_assign(asg, cfg, 0, base + 2,
                 [(1, to_limbs(t2)), (3, one_l), (1, to_limbs(Q))],
                 to_limbs(t3), Q)


def _assign_add_block(asg, cfg, base, x1, y1, x2, y2):
    """Rows base..base+3; returns (x3, y3)."""
    plc = to_limbs(Q)
    dx, dy = (x2 - x1) % Q, (y2 - y1) % Q
    lam = dy * _qinv(dx) % Q
    cfg.fq.assign_row(asg, base, lam, dx)
    _slot_assign(asg, cfg, 0, base,
                 [(1, to_limbs(x2)), (-1, to_limbs(x1)), (1, plc)],
                 to_limbs(dx), Q)
    _slot_assign(asg, cfg, 1, base,
                 [(1, to_limbs(y2)), (-1, to_limbs(y1)), (1, plc)],
                 to_limbs(dy), Q)
    cfg.fq.assign_row(asg, base + 1, dx, _qinv(dx))
    lam2 = cfg.fq.assign_row(asg, base + 2, lam, lam)
    bv = (2 * x1 + x2 - lam2) % Q
    u = cfg.fq.assign_row(asg, base + 3, lam, bv)
    x3 = (lam2 - x1 - x2) % Q
    y3 = (u - y1) % Q
    _slot_assign(asg, cfg, 0, base + 3,
                 [(2, to_limbs(x1)), (1, to_limbs(x2)),
                  (-1, to_limbs(lam2)), (1, plc)], to_limbs(bv), Q)
    _slot_assign(asg, cfg, 1, base + 3,
                 [(1, to_limbs(lam2)), (-1, to_limbs(x1)),
                  (-1, to_limbs(x2)), (2, plc)], to_limbs(x3), Q)
    _slot_assign(asg, cfg, 2, base + 3,
                 [(1, to_limbs(u)), (-1, to_limbs(y1)), (1, plc)],
                 to_limbs(y3), Q)
    _setl(asg, cfg.st["x3c"], base + 3, to_limbs(x3))
    _setl(asg, cfg.st["y3c"], base + 3, to_limbs(y3))
    return x3, y3


def _assign_wsplit(asg: Assignment, cfg: EccConfig, row: int,
                   chain: dict) -> None:
    """Middle-limb split bytes for the word surface on a start row."""
    if cfg.wsplit_bytes is None:
        return
    for nm, (b_lo, b_hi) in cfg.wsplit_bytes.items():
        l = to_limbs(chain[nm])
        l1a, l1b = l[1] & ((1 << 40) - 1), l[1] >> 40
        for jj, c in enumerate(b_lo):
            asg.set_int(c, row, (l1a >> (8 * jj)) & 0xFF)
        for jj, c in enumerate(b_hi):
            asg.set_int(c, row, (l1b >> (8 * jj)) & 0xFF)


def assign(
    cs: ConstraintSystem,
    cfg: EccConfig,
    n: int,
    add_events: list,
    mul_events: list,
    asg: Assignment | None = None,
    start: int = 0,
) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    base = start
    for ev in add_events:
        (x1, y1), (x2, y2) = ev.p1, ev.p2
        x3v, y3v = ev.result
        chain = {"p1x": x1, "p1y": y1, "p2x": x2, "p2y": y2,
                 "r3x": x3v, "r3y": y3v, "kl": 0}
        for rr in range(ADD_ROWS):
            row = base + rr
            if rr < ADD_ROWS - 1:
                asg.set_int(cfg.q_chain, row, 1)
            for nm in CHAINED:
                _setl(asg, cfg.st[nm], row, to_limbs(chain[nm]))
            asg.set_int(cfg.q_add[rr], row, 1)
            if rr < ADD_ROWS:
                asg.set_int(cfg.q_fq, row, 1)
        _assign_wsplit(asg, cfg, base, chain)
        _assign_curve_check(asg, cfg, base, x1, y1)
        _assign_curve_check(asg, cfg, base + 3, x2, y2)
        rx3, ry3 = _assign_add_block(asg, cfg, base + 6, x1, y1, x2, y2)
        assert (rx3, ry3) == (x3v, y3v)
        cfg.fq.assign_row(asg, base + 10, rx3, 1)
        cfg.fq.assign_row(asg, base + 11, ry3, 1)
        base += ADD_ROWS

    R = mul_region_rows()
    for ev in mul_events:
        (px, py), kv = ev.p, ev.k
        rxv, ryv = ev.result
        chain = {"p1x": px, "p1y": py, "p2x": 0, "p2y": 0,
                 "r3x": rxv, "r3y": ryv, "kl": kv}
        for rr in range(R):
            row = base + rr
            if rr < R - 1:
                asg.set_int(cfg.q_chain, row, 1)
            for nm in CHAINED:
                _setl(asg, cfg.st[nm], row, to_limbs(chain[nm]))
            if rr < R - 1:  # every row but the spare f6 runs a mul
                asg.set_int(cfg.q_fq, row, 1)
        for i in range(MUL_PRE + MUL_POST):
            off = i if i < MUL_PRE else BLK * NBITS + i
            asg.set_int(cfg.q_mul[i], base + off, 1)
        _assign_wsplit(asg, cfg, base, chain)
        _assign_curve_check(asg, cfg, base, px, py)
        Xv, Yv = K_PTQ = K_B
        a1 = 0
        for j in range(NBITS):
            r0 = base + MUL_PRE + BLK * j
            for k_ in range(BLK):
                asg.set_int(cfg.q_b[k_], r0 + k_, 1)
            bi = NBITS - 1 - j
            bv = (kv >> bi) & 1
            a1 = bv if j in (0, SEGS[2], SEGS[2] + SEGS[1]) else 2 * a1 + bv
            asg.set_int(cfg.bit, r0, bv)
            asg.set_int(cfg.acc, r0, a1)
            if j == 0:
                asg.set_int(cfg.q_first_blk, r0, 1)
            if j == SEGS[2]:
                asg.set_int(cfg.q_seg[0], r0, 1)
            if j == SEGS[2] + SEGS[1]:
                asg.set_int(cfg.q_seg[1], r0, 1)
            _setl(asg, cfg.st["X"], r0, to_limbs(Xv))
            _setl(asg, cfg.st["Y"], r0, to_limbs(Yv))
            SXv, SYv = (px, py) if bv else K2_B
            plc = to_limbs(Q)
            # doubling
            x2q = cfg.fq.assign_row(asg, r0, Xv, Xv)
            y2v = 2 * Yv
            lam_d = 3 * x2q * _qinv(y2v % Q) % Q
            r1v = cfg.fq.assign_row(asg, r0 + 1, lam_d, y2v)
            _slot_assign(asg, cfg, 0, r0 + 1, [(2, to_limbs(Yv))],
                         to_limbs(y2v), Q)
            _slot_assign(asg, cfg, 1, r0 + 1, [(3, to_limbs(x2q))],
                         to_limbs(r1v), Q)
            lam2d = cfg.fq.assign_row(asg, r0 + 2, lam_d, lam_d)
            bvx = (3 * Xv - lam2d) % Q
            ud = cfg.fq.assign_row(asg, r0 + 3, lam_d, bvx)
            X3v = (lam2d - 2 * Xv) % Q
            Y3v = (ud - Yv) % Q
            _slot_assign(asg, cfg, 0, r0 + 3,
                         [(3, to_limbs(Xv)), (-1, to_limbs(lam2d)),
                          (1, plc)], to_limbs(bvx), Q)
            _slot_assign(asg, cfg, 1, r0 + 3,
                         [(1, to_limbs(lam2d)), (-2, to_limbs(Xv)),
                          (2, plc)], to_limbs(X3v), Q)
            _slot_assign(asg, cfg, 2, r0 + 3,
                         [(1, to_limbs(ud)), (-1, to_limbs(Yv)), (1, plc)],
                         to_limbs(Y3v), Q)
            _setl(asg, cfg.st["x3c"], r0 + 3, to_limbs(X3v))
            _setl(asg, cfg.st["y3c"], r0 + 3, to_limbs(Y3v))
            # addition
            dxs = (SXv - X3v) % Q
            dys = (SYv - Y3v) % Q
            lam_a = dys * _qinv(dxs) % Q
            cfg.fq.assign_row(asg, r0 + 4, lam_a, dxs)
            _slot_assign(asg, cfg, 0, r0 + 4,
                         [(1, to_limbs(SXv)), (-1, to_limbs(X3v)),
                          (1, plc)], to_limbs(dxs), Q)
            _slot_assign(asg, cfg, 1, r0 + 4,
                         [(1, to_limbs(SYv)), (-1, to_limbs(Y3v)),
                          (1, plc)], to_limbs(dys), Q)
            cfg.fq.assign_row(asg, r0 + 5, dxs, _qinv(dxs))
            lam2a = cfg.fq.assign_row(asg, r0 + 6, lam_a, lam_a)
            bv2 = (2 * X3v + SXv - lam2a) % Q
            ua = cfg.fq.assign_row(asg, r0 + 7, lam_a, bv2)
            X3pv = (lam2a - X3v - SXv) % Q
            Y3pv = (ua - Y3v) % Q
            _slot_assign(asg, cfg, 0, r0 + 7,
                         [(2, to_limbs(X3v)), (1, to_limbs(SXv)),
                          (-1, to_limbs(lam2a)), (1, plc)],
                         to_limbs(bv2), Q)
            _slot_assign(asg, cfg, 1, r0 + 7,
                         [(1, to_limbs(lam2a)), (-1, to_limbs(X3v)),
                          (-1, to_limbs(SXv)), (2, plc)],
                         to_limbs(X3pv), Q)
            _slot_assign(asg, cfg, 2, r0 + 7,
                         [(1, to_limbs(ua)), (-1, to_limbs(Y3v)), (1, plc)],
                         to_limbs(Y3pv), Q)
            _setl(asg, cfg.st["x3p"], r0 + 7, to_limbs(X3pv))
            _setl(asg, cfg.st["y3p"], r0 + 7, to_limbs(Y3pv))
            Xv, Yv = (X3pv, Y3pv) if bv else (X3v, Y3v)
        # post: final add of C, canonicalize
        f0 = base + MUL_PRE + BLK * NBITS
        _setl(asg, cfg.st["X"], f0, to_limbs(Xv))
        _setl(asg, cfg.st["Y"], f0, to_limbs(Yv))
        cxv, cyv = _corr()
        rx3, ry3 = _assign_add_block(asg, cfg, f0, Xv, Yv, cxv, cyv)
        assert (rx3, ry3) == (rxv, ryv), "ladder result mismatch"
        cfg.fq.assign_row(asg, f0 + 4, rx3, 1)
        cfg.fq.assign_row(asg, f0 + 5, ry3, 1)
        base += R
    assert base - start <= cs.usable_rows(n) - 1
    return asg
