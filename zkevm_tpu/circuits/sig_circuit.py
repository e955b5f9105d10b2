"""Sig circuit: in-circuit secp256k1 ECDSA verification.

Reference counterpart: zkevm-circuits/src/sig_circuit.rs (halo2-ecc's
ECDSA chip over non-native secp256k1 arithmetic; SigTable at
table.rs:2037, consumed by the tx circuit for signature binding).

TPU-native redesign: a TALL row machine over TWO ForeignMul gadget
instances (gadgets/bigint.py; one per foreign modulus):

    FP: a*b = q*p + r   (secp256k1 base field p)
    FN: a*b = q*n + r   (secp256k1 scalar field n)

Every row carries the full gadget column set; each region row performs at
most one foreign MUL. The additive glue (mod-p sums/differences/constant
folds) is expressed as "add slots": per-limb identities

    sum(terms_i) - OUT_i - f*m_i + c_{i-1} - c_i*2^88 = 0

with a small wrap witness f in {0..fmax} (callers add +k*p constant
terms so the sum stays nonnegative) and carries c = ca + 3*cb with
ca, cb in {-1, 0, 1} (covers -4..4 at gate degree <= 6). Slot inputs
reference neighbouring rows' cells by ROTATION — the wide-row idiom, no
permutation copies.

Signature region layout (offsets within a region):

    row 0          q_start: the SigTable surface row; z/r/s/Q state loads
    rows 0..2      FN: s*w = 1 (w = s^-1), z*w = u1, r*w = u2
    rows 3..5      FP: Q on-curve check  Qy^2 = Qx^3 + 7
    rows 6..9      FP: T = G + Q (incomplete add + dx != 0 guard)
    then NBITS blocks of 8 rows — the Shamir double-and-add ladder over
    the bits of (u1, u2), MSB first, acc starting at the fixed offset
    point K:
      b0: x2 = X*X                   (state row: X/Y/SX/SY/bits/accs)
      b1: lam_d * (2Y) = 3*x2
      b2: lam_d^2
      b3: lam_d * (3X - lam_d^2) ; X3 = lam_d^2 - 2X ; Y3 = r@b3 - Y
      b4: lam_a * (SX - X3) = SY - Y3
      b5: (SX - X3) * inv = 1        (incomplete-add dx != 0 guard)
      b6: lam_a^2
      b7: lam_a * (2*X3 + SX - lam_a^2) ; X3' , Y3' materialized
      (the NEXT block's b0 selects (X3', Y3') if a bit was set, else
      (X3, Y3), and folds the bits into per-limb scalar accumulators
      bound to u1/u2's limbs at segment boundaries)
    then 4 rows    FP: final add of C = -(2^NBITS)*K  -> R
    then 1 row     FP: R.x * 1 (canonicalize R.x mod p)
    then 1 row     FN: R.x mod n == r  (the ECDSA equation)

The per-block addend S is selected from {K2, G, Q, T} by the bit pair
(K2 is a second fixed point so the dx != 0 guard stays armed on skip
blocks; its add result is discarded by the select). Incomplete-formula
caveats (documented, soundness unaffected): Q = +-G pubkeys and
adversarially-steered exceptional intermediate points make an honest
witness impossible — the same caveat class as halo2-ecc's incomplete
affine path.

v1 scope: valid signatures only (invalid ones are unsatisfiable); the
keccak(pubkey) -> address link into the tx circuit is the next wiring
step.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ec import secp256k1 as secp
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.bigint import LB, NL, ForeignMul, from_limbs, to_limbs
from zkevm_tpu.gadgets.ranges import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

P, N = secp.P, secp.N
B2 = 1 << LB

# fixed ladder offset points: small known multiples of G (an adversary
# cannot steer the ladder onto them without discrete logs)
K_PT = secp.mul(secp.G, 0xDEADBEEF)
K2_PT = secp.mul(secp.G, 0x5EED5EED)

PRE = 10  # region rows before the ladder
POST = 9  # rows after it (incl. the qx/qy/Ry canonicalization rows)
EXT = 65  # address-extension rows: 64 pubkey-byte RLC rows + 1 addr row
BLK = 8
SEGS = (88, 88, 80)  # ladder bits per limb segment, limbs 0,1,2 (LSB..)


def _corr(nbits: int):
    """C = -(2^nbits) * K (the ladder's start-offset correction)."""
    kx, ky = secp.mul(secp.G, (0xDEADBEEF << nbits) % N)
    return (kx, P - ky)


def region_rows(nbits: int, addr: bool = False) -> int:
    return PRE + BLK * nbits + POST + (EXT if addr else 0)


@dataclass
class SigTable:
    """(enabled, z limbs, Qx limbs, Qy limbs, r limbs, s limbs) on each
    region's start row (table.rs SigTable analog; 88-bit-limb surface)."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class SigConfig:
    nbits: int
    q_start: Column
    q_pos: list  # PRE+POST fixed columns, one per non-ladder row type
    q_b: list  # BLK fixed columns, one per ladder block offset
    q_first_blk: Column  # the first ladder block's b0 row
    q_seg: list  # NL-1 fixed columns: non-first segment-start b0 rows
    q_chain: Column  # region rows whose successor is in-region
    q_fp: Column
    q_fn: Column
    fp: ForeignMul
    fn: ForeignMul
    st: dict  # chained/ladder state columns by name
    bit1: Column
    bit2: Column
    acc1: Column
    acc2: Column
    sf: list  # 3 slot wrap columns
    sc: list  # 3 x (ca0, cb0, ca1, cb1) carry columns
    table: SigTable
    # ecrecover address extension (present iff keccak_table was given)
    q_rlc: Column = None  # the 64 pubkey-byte rows
    q_rlc_first: Column = None
    q_addr: Column = None  # the address/keccak-lookup row
    pkb: Column = None  # pubkey byte stream (big-endian Qx || Qy)
    acc: Column = None  # phase-1 keccak_input RLC accumulator
    vbit: Column = None  # recovery parity (R.y mod 2), on the Ry row
    hb: Column = None  # parity split witness (byte0 = 2*hb + v)
    db: list = None  # 16 digest-hi byte cells + [16] = the digest-lo cell
    addr_table: "SigTable" = None  # (en, z, r, s limbs, v, alo, ahi32)
    # word surface: z/r/s as 128-bit halves (the EVM ecrecover state's
    # binding) + the middle-limb split byte cells per value name
    addr_word_table: "SigTable" = None
    wsplit_bytes: dict = None  # nm -> (b_lo[5], b_hi[6]) columns


def _slot(polys, sel: Expr, terms, out, m_limbs, f: Column, cq: list,
          fmax: int) -> None:
    """sum(terms) - OUT - f*m + carry chain = 0, carries = ca + 3*cb."""
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
            polys.append(sel * t)  # the top limb closes exactly


def _lim(cols, rot=0):
    return [c.rot(rot) if rot else c.cur() for c in cols]


def _const_limbs(v: int):
    return [Const(x) for x in to_limbs(v)]


ST_NAMES = ("zl", "rsl", "ssl", "qx", "qy", "tx2", "ty2", "u1l", "u2l",
            "X", "Y", "SX", "SY", "x3c", "y3c", "x3p", "y3p")
CHAINED = ("zl", "rsl", "ssl", "qx", "qy", "tx2", "ty2", "u1l", "u2l")


def configure(cs: ConstraintSystem, rt8: RangeTable, nbits: int = 256,
              challenges=None, keccak_table=None) -> SigConfig:
    assert nbits == sum(SEGS), "ladder segmentation assumes 256-bit scalars"
    q_start = cs.fixed_column()
    q_pos = [cs.fixed_column() for _ in range(PRE + POST)]
    q_b = [cs.fixed_column() for _ in range(BLK)]
    q_first_blk = cs.fixed_column()
    q_seg = [cs.fixed_column() for _ in range(NL - 1)]
    q_chain = cs.fixed_column()
    q_fp = cs.fixed_column()
    q_fn = cs.fixed_column()
    fp = ForeignMul.configure(cs, q_fp.cur(), P, rt8, name="sig_fp")
    fn = ForeignMul.configure(cs, q_fn.cur(), N, rt8, name="sig_fn")

    st = {nm: [cs.advice_column() for _ in range(NL)] for nm in ST_NAMES}
    bit1, bit2 = cs.advice_column(), cs.advice_column()
    acc1, acc2 = cs.advice_column(), cs.advice_column()
    sf = [cs.advice_column() for _ in range(3)]
    sc = [[cs.advice_column() for _ in range(4)] for _ in range(3)]

    one = Const(1)
    pl = to_limbs(P)
    plc = _const_limbs(P)
    polys: list = []

    # -- chained region state --------------------------------------------
    qc = q_chain.cur()
    for nm in CHAINED:
        for c in st[nm]:
            polys.append(qc * (c.rot(1) - c.cur()))

    # -- scalar rows (FN), region rows 0..2 -------------------------------
    r0, r1, r2 = (q_pos[i].cur() for i in range(3))
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(r0 * (fn.a[i].cur() - st["ssl"][i].cur()))
        polys.append(r0 * (fn.r[i].cur() - o1))  # s * s^-1 = 1
        polys.append(r1 * (fn.a[i].cur() - st["zl"][i].cur()))
        polys.append(r1 * (fn.b[i].cur() - fn.b[i].rot(-1)))
        polys.append(r1 * (fn.r[i].cur() - st["u1l"][i].cur()))
        polys.append(r2 * (fn.a[i].cur() - st["rsl"][i].cur()))
        polys.append(r2 * (fn.b[i].cur() - fn.b[i].rot(-2)))
        polys.append(r2 * (fn.r[i].cur() - st["u2l"][i].cur()))

    # -- curve check (FP), rows 3..5: Qy^2 == Qx^3 + 7 --------------------
    r3, r4, r5 = (q_pos[i].cur() for i in (3, 4, 5))
    for i in range(NL):
        polys.append(r3 * (fp.a[i].cur() - st["qx"][i].cur()))
        polys.append(r3 * (fp.b[i].cur() - st["qx"][i].cur()))
        polys.append(r4 * (fp.a[i].cur() - st["qx"][i].cur()))
        polys.append(r4 * (fp.b[i].cur() - fp.r[i].rot(-1)))
        polys.append(r5 * (fp.a[i].cur() - st["qy"][i].cur()))
        polys.append(r5 * (fp.b[i].cur() - st["qy"][i].cur()))
    # Qy^2 == Qx^3 + 7: r@5 - r@4 - 7 = 0 (mod p): + p for nonnegativity
    _slot(polys, r5, [(1, _lim(fp.r, -1)), (7, [one, None, None]), (1, plc)],
          _lim(fp.r), pl, sf[0], sc[0], fmax=2)

    # -- T = G + Q (rows 6..9) -------------------------------------------
    gx, gy = _const_limbs(secp.GX), _const_limbs(secp.GY)
    r6, r7, r8, r9 = (q_pos[i].cur() for i in (6, 7, 8, 9))
    # row6: lam_t * dx = dy with dx = Qx - Gx, dy = Qy - Gy
    _slot(polys, r6, [(1, _lim(st["qx"])), (-1, gx), (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=1)
    _slot(polys, r6, [(1, _lim(st["qy"])), (-1, gy), (1, plc)],
          _lim(fp.r), pl, sf[1], sc[1], fmax=1)
    # row7: dx * inv = 1
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(r7 * (fp.a[i].cur() - fp.b[i].rot(-1)))
        polys.append(r7 * (fp.r[i].cur() - o1))
    # row8: lam_t^2
    for i in range(NL):
        polys.append(r8 * (fp.a[i].cur() - fp.a[i].rot(-2)))
        polys.append(r8 * (fp.b[i].cur() - fp.a[i].rot(-2)))
    # row9: lam_t * (Gx - Tx); Tx = lam^2 - Gx - Qx; Ty = r@9 - Gy
    for i in range(NL):
        polys.append(r9 * (fp.a[i].cur() - fp.a[i].rot(-3)))
    _slot(polys, r9, [(2, gx), (1, _lim(st["qx"])), (-1, _lim(fp.r, -1)),
                      (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, r9, [(1, _lim(fp.r, -1)), (-1, gx), (-1, _lim(st["qx"])),
                      (2, plc)],
          _lim(st["tx2"]), pl, sf[1], sc[1], fmax=2)
    _slot(polys, r9, [(1, _lim(fp.r)), (-1, gy), (1, plc)],
          _lim(st["ty2"]), pl, sf[2], sc[2], fmax=1)

    # -- ladder blocks ----------------------------------------------------
    b0, b1_, b2_, b3_, b4_, b5_, b6_, b7_ = (q_b[i].cur() for i in range(8))
    X, Y, SX, SY = st["X"], st["Y"], st["SX"], st["SY"]
    x3c, y3c, x3p, y3p = st["x3c"], st["y3c"], st["x3p"], st["y3p"]
    k2x, k2y = _const_limbs(K2_PT[0]), _const_limbs(K2_PT[1])
    kx, ky = _const_limbs(K_PT[0]), _const_limbs(K_PT[1])
    bb1, bb2 = bit1.cur(), bit2.cur()
    polys.append(b0 * bb1 * (one - bb1))
    polys.append(b0 * bb2 * (one - bb2))
    # addend select: (b1,b2) -> {11: T, 10: G, 01: Q, 00: K2}
    for i in range(NL):
        sxi = (bb1 * bb2 * st["tx2"][i].cur()
               + bb1 * (one - bb2) * gx[i]
               + (one - bb1) * bb2 * st["qx"][i].cur()
               + (one - bb1) * (one - bb2) * k2x[i])
        syi = (bb1 * bb2 * st["ty2"][i].cur()
               + bb1 * (one - bb2) * gy[i]
               + (one - bb1) * bb2 * st["qy"][i].cur()
               + (one - bb1) * (one - bb2) * k2y[i])
        polys.append(b0 * (SX[i].cur() - sxi))
        polys.append(b0 * (SY[i].cur() - syi))
    # first block: acc point = K, bit accumulators restart
    qfb = q_first_blk.cur()
    for i in range(NL):
        polys.append(qfb * (X[i].cur() - kx[i]))
        polys.append(qfb * (Y[i].cur() - ky[i]))
    # later blocks: select the previous block's result
    nfb = b0 - qfb
    selp = (bit1.rot(-BLK) + bit2.rot(-BLK)
            - bit1.rot(-BLK) * bit2.rot(-BLK))
    for i in range(NL):
        polys.append(nfb * (X[i].cur() - selp * x3p[i].rot(-1)
                            - (one - selp) * x3c[i].rot(-5)))
        polys.append(nfb * (Y[i].cur() - selp * y3p[i].rot(-1)
                            - (one - selp) * y3c[i].rot(-5)))
    # scalar-bit accumulation with per-limb segments (MSB-first):
    # segment-start rows restart acc from the bit; other rows double in;
    # the row AFTER a segment's last block binds the closed limb
    seg_starts = qfb
    for q in q_seg:
        seg_starts = seg_starts + q.cur()
    within = b0 - seg_starts
    polys.append(seg_starts * (acc1.cur() - bb1))
    polys.append(seg_starts * (acc2.cur() - bb2))
    polys.append(within * (acc1.cur() - Const(2) * acc1.rot(-BLK) - bb1))
    polys.append(within * (acc2.cur() - Const(2) * acc2.rot(-BLK) - bb2))
    # q_seg[j] starts limb NL-2-j's segment, closing limb NL-1-j
    for j, q in enumerate(q_seg):
        li = NL - 1 - j
        polys.append(q.cur() * (acc1.rot(-BLK) - st["u1l"][li].cur()))
        polys.append(q.cur() * (acc2.rot(-BLK) - st["u2l"][li].cur()))
    qpost0 = q_pos[PRE].cur()  # closes limb 0
    polys.append(qpost0 * (acc1.rot(-BLK) - st["u1l"][0].cur()))
    polys.append(qpost0 * (acc2.rot(-BLK) - st["u2l"][0].cur()))

    # b0: x2 = X * X
    for i in range(NL):
        polys.append(b0 * (fp.a[i].cur() - X[i].cur()))
        polys.append(b0 * (fp.b[i].cur() - X[i].cur()))
    # b1: lam_d * (2Y) = 3*x2
    _slot(polys, b1_, [(2, _lim(Y, -1))], _lim(fp.b), pl, sf[0], sc[0],
          fmax=1)
    _slot(polys, b1_, [(3, _lim(fp.r, -1))], _lim(fp.r), pl, sf[1], sc[1],
          fmax=2)
    # b2: lam_d^2
    for i in range(NL):
        polys.append(b2_ * (fp.a[i].cur() - fp.a[i].rot(-1)))
        polys.append(b2_ * (fp.b[i].cur() - fp.a[i].rot(-1)))
    # b3: lam_d * (3X - lam^2) = Y3 + Y ; X3 = lam^2 - 2X ; Y3 = r - Y
    for i in range(NL):
        polys.append(b3_ * (fp.a[i].cur() - fp.a[i].rot(-2)))
    _slot(polys, b3_, [(3, _lim(X, -3)), (-1, _lim(fp.r, -1)), (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, b3_, [(1, _lim(fp.r, -1)), (-2, _lim(X, -3)), (2, plc)],
          _lim(x3c), pl, sf[1], sc[1], fmax=2)
    _slot(polys, b3_, [(1, _lim(fp.r)), (-1, _lim(Y, -3)), (1, plc)],
          _lim(y3c), pl, sf[2], sc[2], fmax=1)
    # b4: lam_a * (SX - X3) = SY - Y3
    _slot(polys, b4_, [(1, _lim(SX, -4)), (-1, _lim(x3c, -1)), (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=1)
    _slot(polys, b4_, [(1, _lim(SY, -4)), (-1, _lim(y3c, -1)), (1, plc)],
          _lim(fp.r), pl, sf[1], sc[1], fmax=1)
    # b5: dx * inv = 1
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(b5_ * (fp.a[i].cur() - fp.b[i].rot(-1)))
        polys.append(b5_ * (fp.r[i].cur() - o1))
    # b6: lam_a^2
    for i in range(NL):
        polys.append(b6_ * (fp.a[i].cur() - fp.a[i].rot(-2)))
        polys.append(b6_ * (fp.b[i].cur() - fp.a[i].rot(-2)))
    # b7: lam_a * (2*X3 + SX - lam^2) ; X3' = lam^2 - X3 - SX ; Y3' = r - Y3
    for i in range(NL):
        polys.append(b7_ * (fp.a[i].cur() - fp.a[i].rot(-3)))
    _slot(polys, b7_, [(2, _lim(x3c, -4)), (1, _lim(SX, -7)),
                       (-1, _lim(fp.r, -1)), (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, b7_, [(1, _lim(fp.r, -1)), (-1, _lim(x3c, -4)),
                       (-1, _lim(SX, -7)), (2, plc)],
          _lim(x3p), pl, sf[1], sc[1], fmax=2)
    _slot(polys, b7_, [(1, _lim(fp.r)), (-1, _lim(y3c, -4)), (1, plc)],
          _lim(y3p), pl, sf[2], sc[2], fmax=1)

    # -- final: R = acc + C ; R.x mod n == r_sig --------------------------
    cxv, cyv = _corr(nbits)
    cx, cy = _const_limbs(cxv), _const_limbs(cyv)
    f0, f1, f2, f3 = (q_pos[PRE + i].cur() for i in range(4))
    for i in range(NL):
        polys.append(f0 * (X[i].cur() - selp * x3p[i].rot(-1)
                           - (one - selp) * x3c[i].rot(-5)))
        polys.append(f0 * (Y[i].cur() - selp * y3p[i].rot(-1)
                           - (one - selp) * y3c[i].rot(-5)))
    # f0: lam_f * (Cx - X) = Cy - Y
    _slot(polys, f0, [(1, cx), (-1, _lim(X)), (1, plc)], _lim(fp.b), pl,
          sf[0], sc[0], fmax=1)
    _slot(polys, f0, [(1, cy), (-1, _lim(Y)), (1, plc)], _lim(fp.r), pl,
          sf[1], sc[1], fmax=1)
    # f1: dx * inv = 1
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(f1 * (fp.a[i].cur() - fp.b[i].rot(-1)))
        polys.append(f1 * (fp.r[i].cur() - o1))
    # f2: lam_f^2
    for i in range(NL):
        polys.append(f2 * (fp.a[i].cur() - fp.a[i].rot(-2)))
        polys.append(f2 * (fp.b[i].cur() - fp.a[i].rot(-2)))
    # f3: lam_f * (X - Rx) = Ry + Y (only Rx matters); Rx = lam^2 - X - Cx
    for i in range(NL):
        polys.append(f3 * (fp.a[i].cur() - fp.a[i].rot(-3)))
    _slot(polys, f3, [(2, _lim(X, -3)), (1, cx), (-1, _lim(fp.r, -1)),
                      (1, plc)],
          _lim(fp.b), pl, sf[0], sc[0], fmax=3)
    _slot(polys, f3, [(1, _lim(fp.r, -1)), (-1, _lim(X, -3)), (-1, cx),
                      (2, plc)],
          _lim(x3c), pl, sf[1], sc[1], fmax=2)
    # R.y = lam_f*(X - Rx) - Y, materialized for the parity row
    _slot(polys, f3, [(1, _lim(fp.r)), (-1, _lim(Y, -3)), (1, plc)],
          _lim(st["y3c"]), pl, sf[2], sc[2], fmax=1)
    # f4 (FP row): Rx * 1 = q*p + r — canonicalizes R.x below p
    # (the x3c value may carry a +p offset; a mod-n comparison on the
    # offset representative would be wrong)
    f4 = q_pos[PRE + 4].cur()
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(f4 * (fp.a[i].cur() - x3c[i].rot(-1)))
        polys.append(f4 * (fp.b[i].cur() - o1))
    # f5 (FN row): canonical Rx mod n == r_sig
    f5 = q_pos[PRE + 5].cur()
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(f5 * (fn.a[i].cur() - fp.r[i].rot(-1)))
        polys.append(f5 * (fn.b[i].cur() - o1))
        polys.append(f5 * (fn.r[i].cur() - st["rsl"][i].cur()))

    # -- ecrecover address extension --------------------------------------
    # canon rows f6/f7/f8: qx*1, qy*1, Ry*1 with r bound back (pins the
    # pubkey coordinates and R.y canonical below p); 64 pubkey-byte RLC
    # rows; the addr row carries the keccak lookup + digest split
    f6, f7, f8 = (q_pos[PRE + i].cur() for i in (6, 7, 8))
    for i in range(NL):
        o1 = one if i == 0 else Const(0)
        polys.append(f6 * (fp.a[i].cur() - st["qx"][i].cur()))
        polys.append(f6 * (fp.b[i].cur() - o1))
        polys.append(f6 * (fp.r[i].cur() - st["qx"][i].cur()))
        polys.append(f7 * (fp.a[i].cur() - st["qy"][i].cur()))
        polys.append(f7 * (fp.b[i].cur() - o1))
        polys.append(f7 * (fp.r[i].cur() - st["qy"][i].cur()))
        polys.append(f8 * (fp.a[i].cur() - st["y3c"][i].rot(-5)))
        polys.append(f8 * (fp.b[i].cur() - o1))
    q_rlc = cs.fixed_column()
    q_rlc_first = cs.fixed_column()
    q_addr = cs.fixed_column()
    pkb = cs.advice_column()
    acc_c = cs.advice_column(phase=1)
    vbit = cs.advice_column()
    hb = cs.advice_column()
    db = [cs.advice_column() for _ in range(16)]
    addr_table = None
    # R.y parity: canonical Ry's low byte = 2*hb + v
    ry_b0 = fp.chunks[fp.r[0]][0]
    polys.append(f8 * vbit.cur() * (one - vbit.cur()))
    polys.append(f8 * (ry_b0.cur() - Const(2) * hb.cur() - vbit.cur()))
    rt8.lookup(cs, "sig_parity_rng", [f8 * Const(2) * hb.cur()])
    if keccak_table is not None:
        assert challenges is not None
        rk = challenges.keccak_input.expr()
        qr, qrf, qad = q_rlc.cur(), q_rlc_first.cur(), q_addr.cur()
        polys.append(qrf * (acc_c.cur() - pkb.cur()))
        polys.append((qr - qrf) * (acc_c.cur() - acc_c.rot(-1) * rk
                                   - pkb.cur()))
        rt8.lookup(cs, "sig_pkb_rng", [qr * pkb.cur()])
        rt8.lookup(cs, "sig_db_rng", [qad * c.cur() for c in db])
        # byte strip == the canonical pubkey coordinates (big-endian);
        # single field equation per coordinate is exact: both sides are
        # integers < 2^256 (bytes ranged, qx/qy canonicalized at f6/f7)
        qx_sum = Const(0)
        qy_sum = Const(0)
        for j in range(32):
            qx_sum = qx_sum + Const(1 << (8 * (31 - j))) * pkb.rot(j - 64)
            qy_sum = qy_sum + Const(1 << (8 * (31 - j))) * pkb.rot(j - 32)
        qx_full = Const(0)
        qy_full = Const(0)
        for i in range(NL):
            qx_full = qx_full + Const(1 << (88 * i)) * st["qx"][i].cur()
            qy_full = qy_full + Const(1 << (88 * i)) * st["qy"][i].cur()
        polys.append(qad * (qx_sum - qx_full))
        polys.append(qad * (qy_sum - qy_full))
        # digest-hi split + the keccak lookup
        dhi = Const(0)
        for j, c in enumerate(db):
            dhi = dhi + Const(1 << (8 * j)) * c.cur()
        ahi32 = Const(0)
        for j in range(4):
            ahi32 = ahi32 + Const(1 << (8 * j)) * db[j].cur()
        dlo = cs.advice_column()
        db = db + [dlo]
        keccak_table.lookup_word(
            cs, "sig_pk_keccak", qad,
            acc_c.rot(-1), Const(64), dlo.cur(), dhi,
        )
        addr_table = SigTable(
            [qad]
            + [qad * c.cur() for nm in ("zl", "rsl", "ssl")
               for c in st[nm]]
            + [qad * vbit.rot(-65), qad * dlo.cur(), qad * ahi32]
        )
        # --- word surface: z/r/s as 128-bit halves on the q_addr row ---
        # (the EVM circuit's ecrecover precompile state binds RwTable
        # words, which are hi/lo; converting limbs->halves once here is
        # shared by every call site). Each value's middle 88-bit limb
        # splits as l1 = l1a + 2^40*l1b with BOTH parts byte-decomposed
        # and range-looked-up (an unranged split cell would let a forging
        # witness pick arbitrary field elements for the halves):
        #   lo = l0 + 2^88*l1a,  hi = l1b + 2^48*l2.
        wsplit = {}
        wsplit_bytes = {}
        for nm in ("zl", "rsl", "ssl"):
            b_lo = [cs.advice_column() for _ in range(5)]   # l1a bytes
            b_hi = [cs.advice_column() for _ in range(6)]   # l1b bytes
            wsplit_bytes[nm] = (b_lo, b_hi)
            rt8.lookup(cs, f"sig_w40_{nm}",
                       [qad * c.cur() for c in b_lo])
            rt8.lookup(cs, f"sig_w48_{nm}",
                       [qad * c.cur() for c in b_hi])
            l1a = Const(0)
            for jj, c in enumerate(b_lo):
                l1a = l1a + Const(1 << (8 * jj)) * c.cur()
            l1b = Const(0)
            for jj, c in enumerate(b_hi):
                l1b = l1b + Const(1 << (8 * jj)) * c.cur()
            polys.append(
                qad * (st[nm][1].cur() - l1a - Const(1 << 40) * l1b))
            wsplit[nm] = (
                st[nm][0].cur() + Const(1 << 88) * l1a,
                l1b + Const(1 << 48) * st[nm][2].cur(),
            )
        addr_word_table = SigTable(
            [qad]
            + [qad * h for nm in ("zl", "rsl", "ssl")
               for h in wsplit[nm]]
            + [qad * vbit.rot(-65), qad * dlo.cur(), qad * ahi32]
        )
    cs.create_gate("sig_region", polys)

    table = SigTable(
        [q_start.cur()]
        + [q_start.cur() * c.cur()
           for nm in ("zl", "qx", "qy", "rsl", "ssl") for c in st[nm]]
    )
    return SigConfig(
        nbits, q_start, q_pos, q_b, q_first_blk, q_seg, q_chain, q_fp,
        q_fn, fp, fn, st, bit1, bit2, acc1, acc2, sf, sc, table,
        q_rlc, q_rlc_first, q_addr, pkb, acc_c, vbit, hb, db, addr_table,
        addr_word_table if keccak_table is not None else None,
        wsplit_bytes if keccak_table is not None else None,
    )


def _slot_assign(asg: Assignment, cfg: SigConfig, si: int, row: int,
                 terms, out_limbs, m: int) -> None:
    """Witness one add slot: terms = [(coeff, limbs:list[int])]."""
    m_l = to_limbs(m)
    inv_ = from_limbs(out_limbs)
    val = sum(c * from_limbs(l) for c, l in terms)
    f, rem = divmod(val - inv_, m)
    assert rem == 0 and f >= 0, ("slot value mismatch", f, rem)
    asg.set_int(cfg.sf[si], row, f)
    prev = 0
    for i in range(NL):
        t = (sum(c * l[i] for c, l in terms) - out_limbs[i]
             - f * m_l[i] + prev)
        if i == NL - 1:
            assert t == 0, ("slot top", t)
            break
        ci, r2 = divmod(t, 1 << LB)
        assert r2 == 0, ("slot carry", t)
        ca = ((ci + 4) % 3) - 1
        cb = (ci - ca) // 3
        assert -1 <= ca <= 1 and -1 <= cb <= 1, ci
        asg.set_int(cfg.sc[si][2 * i], row, ca % FR_MOD)
        asg.set_int(cfg.sc[si][2 * i + 1], row, cb % FR_MOD)
        prev = ci


def _setl(asg, cols, row, limbs) -> None:
    for c, v in zip(cols, limbs):
        asg.set_int(c, row, v)


def assign(
    cs: ConstraintSystem,
    cfg: SigConfig,
    n: int,
    sigs: list,
    asg: Assignment | None = None,
    start: int = 0,
) -> "SigWitness":
    """sigs: list of (z, (qx, qy), r, s) VALID ECDSA tuples. Returns a
    SigWitness whose fill_phase1 computes the pubkey-byte RLC cells when
    the ecrecover address extension is configured."""
    asg = asg if asg is not None else Assignment(cs, n)
    nbits = cfg.nbits
    with_addr = cfg.addr_table is not None
    R = region_rows(nbits, with_addr)
    regions = []
    pinv = lambda v: pow(v, P - 2, P)
    pl7 = [7, 0, 0]
    plc = to_limbs(P)
    one_l = [1, 0, 0]
    gxl, gyl = to_limbs(secp.GX), to_limbs(secp.GY)
    base = start
    for (z, (qxv, qyv), rv, sv) in sigs:
        assert secp.ecdsa_verify(z, (qxv, qyv), rv, sv), "invalid signature"
        w = pow(sv, N - 2, N)
        u1, u2 = z * w % N, rv * w % N
        # fixed selectors + chained state on every region row
        chain_vals = {
            "zl": to_limbs(z % N), "rsl": to_limbs(rv), "ssl": to_limbs(sv),
            "qx": to_limbs(qxv), "qy": to_limbs(qyv),
            "u1l": to_limbs(u1), "u2l": to_limbs(u2),
        }
        tx_, ty_ = secp.add(secp.G, (qxv, qyv))
        chain_vals["tx2"] = to_limbs(tx_)
        chain_vals["ty2"] = to_limbs(ty_)
        for rr in range(R):
            row = base + rr
            if rr < R - 1:
                asg.set_int(cfg.q_chain, row, 1)
            for nm in CHAINED:
                _setl(asg, cfg.st[nm], row, chain_vals[nm])
        asg.set_int(cfg.q_start, base, 1)
        for i in range(PRE):
            asg.set_int(cfg.q_pos[i], base + i, 1)
        for i in range(POST if with_addr else 6):
            asg.set_int(cfg.q_pos[PRE + i], base + PRE + BLK * nbits + i, 1)
        for j in range(nbits):
            for k_ in range(BLK):
                asg.set_int(cfg.q_b[k_], base + PRE + BLK * j + k_, 1)
        asg.set_int(cfg.q_first_blk, base + PRE, 1)
        # segment starts (MSB-first): blocks SEGS[2], SEGS[2]+SEGS[1]
        asg.set_int(cfg.q_seg[0], base + PRE + BLK * SEGS[2], 1)
        asg.set_int(cfg.q_seg[1], base + PRE + BLK * (SEGS[2] + SEGS[1]), 1)
        # q_fp / q_fn coverage
        for i in range(3):
            asg.set_int(cfg.q_fn, base + i, 1)
        post0 = base + PRE + BLK * nbits
        for i in range(3, PRE):
            asg.set_int(cfg.q_fp, base + i, 1)
        for rr in range(base + PRE, post0 + 5):
            asg.set_int(cfg.q_fp, rr, 1)
        asg.set_int(cfg.q_fn, post0 + 5, 1)
        if with_addr:
            for i in (6, 7, 8):
                asg.set_int(cfg.q_fp, post0 + i, 1)
            for j in range(64):
                asg.set_int(cfg.q_rlc, post0 + 9 + j, 1)
            asg.set_int(cfg.q_rlc_first, post0 + 9, 1)
            asg.set_int(cfg.q_addr, post0 + 73, 1)
            # word-surface middle-limb split bytes (z/r/s halves)
            arow = post0 + 73
            for nm, val in (("zl", z % N), ("rsl", rv), ("ssl", sv)):
                l1 = (val >> 88) & ((1 << 88) - 1)
                l1a, l1b = l1 & ((1 << 40) - 1), l1 >> 40
                b_lo, b_hi = cfg.wsplit_bytes[nm]
                for jj, c in enumerate(b_lo):
                    asg.set_int(c, arow, (l1a >> (8 * jj)) & 0xFF)
                for jj, c in enumerate(b_hi):
                    asg.set_int(c, arow, (l1b >> (8 * jj)) & 0xFF)

        # -- scalar rows --------------------------------------------------
        cfg.fn.assign_row(asg, base + 0, sv, w)
        cfg.fn.assign_row(asg, base + 1, z % N, w)
        cfg.fn.assign_row(asg, base + 2, rv, w)
        # -- curve check --------------------------------------------------
        t1 = cfg.fp.assign_row(asg, base + 3, qxv, qxv)
        t2 = cfg.fp.assign_row(asg, base + 4, qxv, t1)
        t3 = cfg.fp.assign_row(asg, base + 5, qyv, qyv)
        _slot_assign(asg, cfg, 0, base + 5,
                     [(1, to_limbs(t2)), (7, one_l), (1, plc)],
                     to_limbs(t3), P)
        # -- T = G + Q ----------------------------------------------------
        dx = (qxv - secp.GX) % P
        dy = (qyv - secp.GY) % P
        lam_t = dy * pinv(dx) % P
        cfg.fp.assign_row(asg, base + 6, lam_t, dx)
        _slot_assign(asg, cfg, 0, base + 6,
                     [(1, to_limbs(qxv)), (-1, gxl), (1, plc)],
                     to_limbs(dx), P)
        _slot_assign(asg, cfg, 1, base + 6,
                     [(1, to_limbs(qyv)), (-1, gyl), (1, plc)],
                     to_limbs(dy), P)
        cfg.fp.assign_row(asg, base + 7, dx, pinv(dx))
        lam2 = cfg.fp.assign_row(asg, base + 8, lam_t, lam_t)
        bdx = (2 * secp.GX + qxv - lam2) % P
        cfg.fp.assign_row(asg, base + 9, lam_t, bdx)
        _slot_assign(asg, cfg, 0, base + 9,
                     [(2, gxl), (1, to_limbs(qxv)), (-1, to_limbs(lam2)),
                      (1, plc)], to_limbs(bdx), P)
        _slot_assign(asg, cfg, 1, base + 9,
                     [(1, to_limbs(lam2)), (-1, gxl), (-1, to_limbs(qxv)),
                      (2, plc)], to_limbs(tx_), P)
        uy = lam_t * bdx % P
        _slot_assign(asg, cfg, 2, base + 9,
                     [(1, to_limbs(uy)), (-1, gyl), (1, plc)],
                     to_limbs(ty_), P)
        assert (uy - secp.GY) % P == ty_

        # -- ladder -------------------------------------------------------
        Xv, Yv = K_PT
        a1 = a2 = 0
        seg_pos = 0
        for j in range(nbits):
            r0 = base + PRE + BLK * j
            bi = nbits - 1 - j
            b1v, b2v = (u1 >> bi) & 1, (u2 >> bi) & 1
            if j in (0, SEGS[2], SEGS[2] + SEGS[1]):
                a1, a2 = b1v, b2v
            else:
                a1, a2 = 2 * a1 + b1v, 2 * a2 + b2v
            asg.set_int(cfg.bit1, r0, b1v)
            asg.set_int(cfg.bit2, r0, b2v)
            asg.set_int(cfg.acc1, r0, a1)
            asg.set_int(cfg.acc2, r0, a2)
            if b1v and b2v:
                SXv, SYv = tx_, ty_
            elif b1v:
                SXv, SYv = secp.G
            elif b2v:
                SXv, SYv = qxv, qyv
            else:
                SXv, SYv = K2_PT
            _setl(asg, cfg.st["X"], r0, to_limbs(Xv))
            _setl(asg, cfg.st["Y"], r0, to_limbs(Yv))
            _setl(asg, cfg.st["SX"], r0, to_limbs(SXv))
            _setl(asg, cfg.st["SY"], r0, to_limbs(SYv))
            # doubling
            x2 = cfg.fp.assign_row(asg, r0, Xv, Xv)
            y2v = 2 * Yv
            lam_d = 3 * x2 * pinv(y2v % P) % P
            r1v = cfg.fp.assign_row(asg, r0 + 1, lam_d, y2v)
            _slot_assign(asg, cfg, 0, r0 + 1, [(2, to_limbs(Yv))],
                         to_limbs(y2v), P)
            _slot_assign(asg, cfg, 1, r0 + 1, [(3, to_limbs(x2))],
                         to_limbs(r1v), P)
            lam2d = cfg.fp.assign_row(asg, r0 + 2, lam_d, lam_d)
            bv = (3 * Xv - lam2d) % P
            ud = cfg.fp.assign_row(asg, r0 + 3, lam_d, bv)
            X3v = (lam2d - 2 * Xv) % P
            Y3v = (ud - Yv) % P
            _slot_assign(asg, cfg, 0, r0 + 3,
                         [(3, to_limbs(Xv)), (-1, to_limbs(lam2d)),
                          (1, plc)], to_limbs(bv), P)
            _slot_assign(asg, cfg, 1, r0 + 3,
                         [(1, to_limbs(lam2d)), (-2, to_limbs(Xv)),
                          (2, plc)], to_limbs(X3v), P)
            _slot_assign(asg, cfg, 2, r0 + 3,
                         [(1, to_limbs(ud)), (-1, to_limbs(Yv)), (1, plc)],
                         to_limbs(Y3v), P)
            _setl(asg, cfg.st["x3c"], r0 + 3, to_limbs(X3v))
            _setl(asg, cfg.st["y3c"], r0 + 3, to_limbs(Y3v))
            # addition (always computed; discarded when both bits are 0)
            dxs = (SXv - X3v) % P
            dys = (SYv - Y3v) % P
            lam_a = dys * pinv(dxs) % P
            cfg.fp.assign_row(asg, r0 + 4, lam_a, dxs)
            _slot_assign(asg, cfg, 0, r0 + 4,
                         [(1, to_limbs(SXv)), (-1, to_limbs(X3v)),
                          (1, plc)], to_limbs(dxs), P)
            _slot_assign(asg, cfg, 1, r0 + 4,
                         [(1, to_limbs(SYv)), (-1, to_limbs(Y3v)),
                          (1, plc)], to_limbs(dys), P)
            cfg.fp.assign_row(asg, r0 + 5, dxs, pinv(dxs))
            lam2a = cfg.fp.assign_row(asg, r0 + 6, lam_a, lam_a)
            bv2 = (2 * X3v + SXv - lam2a) % P
            ua = cfg.fp.assign_row(asg, r0 + 7, lam_a, bv2)
            X3pv = (lam2a - X3v - SXv) % P
            Y3pv = (ua - Y3v) % P
            _slot_assign(asg, cfg, 0, r0 + 7,
                         [(2, to_limbs(X3v)), (1, to_limbs(SXv)),
                          (-1, to_limbs(lam2a)), (1, plc)],
                         to_limbs(bv2), P)
            _slot_assign(asg, cfg, 1, r0 + 7,
                         [(1, to_limbs(lam2a)), (-1, to_limbs(X3v)),
                          (-1, to_limbs(SXv)), (2, plc)],
                         to_limbs(X3pv), P)
            _slot_assign(asg, cfg, 2, r0 + 7,
                         [(1, to_limbs(ua)), (-1, to_limbs(Y3v)), (1, plc)],
                         to_limbs(Y3pv), P)
            _setl(asg, cfg.st["x3p"], r0 + 7, to_limbs(X3pv))
            _setl(asg, cfg.st["y3p"], r0 + 7, to_limbs(Y3pv))
            Xv, Yv = (X3pv, Y3pv) if (b1v or b2v) else (X3v, Y3v)

        # -- final add + the ECDSA equation -------------------------------
        f0 = base + PRE + BLK * nbits
        cxv, cyv = _corr(nbits)
        _setl(asg, cfg.st["X"], f0, to_limbs(Xv))
        _setl(asg, cfg.st["Y"], f0, to_limbs(Yv))
        dxf = (cxv - Xv) % P
        dyf = (cyv - Yv) % P
        lam_f = dyf * pinv(dxf) % P
        cfg.fp.assign_row(asg, f0, lam_f, dxf)
        _slot_assign(asg, cfg, 0, f0,
                     [(1, to_limbs(cxv)), (-1, to_limbs(Xv)), (1, plc)],
                     to_limbs(dxf), P)
        _slot_assign(asg, cfg, 1, f0,
                     [(1, to_limbs(cyv)), (-1, to_limbs(Yv)), (1, plc)],
                     to_limbs(dyf), P)
        cfg.fp.assign_row(asg, f0 + 1, dxf, pinv(dxf))
        lam2f = cfg.fp.assign_row(asg, f0 + 2, lam_f, lam_f)
        bvf = (2 * Xv + cxv - lam2f) % P
        uf = cfg.fp.assign_row(asg, f0 + 3, lam_f, bvf)
        Rx = (lam2f - Xv - cxv) % P
        Ry = (uf - Yv) % P
        _slot_assign(asg, cfg, 0, f0 + 3,
                     [(2, to_limbs(Xv)), (1, to_limbs(cxv)),
                      (-1, to_limbs(lam2f)), (1, plc)], to_limbs(bvf), P)
        _slot_assign(asg, cfg, 1, f0 + 3,
                     [(1, to_limbs(lam2f)), (-1, to_limbs(Xv)),
                      (-1, to_limbs(cxv)), (2, plc)], to_limbs(Rx), P)
        _slot_assign(asg, cfg, 2, f0 + 3,
                     [(1, to_limbs(uf)), (-1, to_limbs(Yv)), (1, plc)],
                     to_limbs(Ry), P)
        _setl(asg, cfg.st["x3c"], f0 + 3, to_limbs(Rx))
        _setl(asg, cfg.st["y3c"], f0 + 3, to_limbs(Ry))
        rxc = cfg.fp.assign_row(asg, f0 + 4, Rx, 1)
        rr_ = cfg.fn.assign_row(asg, f0 + 5, rxc, 1)
        assert rr_ == rv, "R.x mod n != r (signature should be valid)"
        if with_addr:
            from zkevm_tpu.hash import keccak256

            cfg.fp.assign_row(asg, f0 + 6, qxv, 1)
            cfg.fp.assign_row(asg, f0 + 7, qyv, 1)
            cfg.fp.assign_row(asg, f0 + 8, Ry, 1)
            b0_ = Ry & 0xFF
            asg.set_int(cfg.vbit, f0 + 8, b0_ & 1)
            asg.set_int(cfg.hb, f0 + 8, b0_ >> 1)
            pk = qxv.to_bytes(32, "big") + qyv.to_bytes(32, "big")
            for j, bch in enumerate(pk):
                asg.set_int(cfg.pkb, f0 + 9 + j, bch)
            digest = int.from_bytes(keccak256(pk), "big")
            arow = f0 + 73
            dhi = digest >> 128
            for j in range(16):
                asg.set_int(cfg.db[j], arow, (dhi >> (8 * j)) & 0xFF)
            asg.set_int(cfg.db[16], arow, digest & ((1 << 128) - 1))
            regions.append((base, pk))
        base += R
    assert base - start <= cs.usable_rows(n) - 1
    return SigWitness(asg, cfg, regions)


@dataclass
class SigWitness:
    """Phase split: the pubkey-byte RLC cells depend on the
    keccak_input challenge (same convention as BytecodeWitness)."""

    asg: Assignment
    cfg: SigConfig
    regions: list  # (region base row, 64 pubkey bytes)

    def fill_phase1(self, r_keccak: int) -> None:
        cfg = self.cfg
        nb = cfg.nbits
        for base, pk in self.regions:
            row = base + PRE + BLK * nb + 9
            acc = 0
            for j, bch in enumerate(pk):
                acc = (acc * r_keccak + bch) % FR_MOD
                self.asg.set_int(cfg.acc, row + j, acc)
