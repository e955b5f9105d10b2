"""Lazy 13-bit-limb prime-field core with MXU-offloaded modular reduction.

The MSM hot path's field multiply, redesigned around what the TPU is
actually good at (reference role: halo2curves' field backend — same role
as ff/limbs.py — but rebuilt for the VPU/MXU split; the 16-bit CIOS in
ff/limbs.py measures ALU-bound at ~93M muls/s on a v5e and spends ~5 VPU
ops per limb product on hi/lo splitting):

- Element = ``(21, ...)`` uint32, little-endian 13-bit limbs, batch on
  trailing axes (limbs-first layout, like ff/limbs.py's *_t kernels).
- LAZY VALUES, NO MONTGOMERY: an element is only guaranteed congruent to
  the intended value mod p with integer value < 2^263 ("value invariant")
  and limbs < 2^13 + 2^6 ("quasi-canonical"). 21 products of two
  quasi-canonical limbs sum to < 2^30.5, so a schoolbook product column
  accumulates in a single u32 lane with NO per-product splitting:
  441 muls + 441 adds total.
- The double-width product T (41 columns < 2^31) is byte-split into 164
  u8 rows and reduced mod p by ONE CONSTANT MATMUL on the MXU:
  value(T) = sum_r T8_r * 2^w(r), so R = T8 @ C with
  C[r] = limbs13(2^w(r) mod p) split into lo/hi bytes — (164, 42).
  The output VALUE is bounded by sum(T8_r) * p < 164*255*p < 2^269,
  which is what makes the carry bookkeeping terminate: two vectorized
  carry rounds (no 21-step ripple) plus one top-limb fold restore the
  invariants.
- add/sub are limb-wise with one carry round + top fold; sub uses a
  borrow-absorbed multiple of p (KP~, limbs >= 2^14 - 2) so no per-limb
  borrow chain is needed.

Zero/equality tests on lazy values require canonicalization (canon13) —
only the MSM's cannot-happen doubling/opposite detection needs them, so
that cost is per point-add, not per mul.

Matmul dtype: uint8 x uint8 -> int32 if the backend supports it on the
MXU, else bf16 x bf16 -> f32 (exact for byte values: products < 2^16 and
sums < 2^24 are exactly representable in f32).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff.limbs import FieldSpec

L13 = 21            # limbs per element (21*13 = 273-bit capacity)
B13 = 13            # bits per limb
M13 = np.uint32((1 << B13) - 1)
NPROD = 2 * L13 - 1       # 41 product columns
NBYTES = 4                # bytes per product column (columns < 2^31)
NROWS = NPROD * NBYTES    # 164 matmul rows
U32 = jnp.uint32

# matmul path: "u8" (int8-pipeline u8 dot) or "bf16" (exact f32-accum)
MATMUL_DTYPE = os.environ.get("ZKEVM_TPU_L13_MM", "u8")


def _limbs13(x: int) -> np.ndarray:
    return np.array([(x >> (B13 * l)) & int(M13) for l in range(L13)],
                    dtype=np.uint32)


class Lazy13:
    """Per-field constants for the lazy-13 kernels."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        p = spec.modulus
        self.p = p
        assert p < (1 << 254)
        # --- reduction matrix, BYTE-PLANE-MAJOR row order (row = k*41+j
        # for byte k of product column j) so the rows align with a cheap
        # axis-0 concat of shift-extracted byte planes — no transposes
        # anywhere in the reduction. Stored TRANSPOSED (42, 164): the
        # matmul is C @ t8 with t8 (164, batch) already in the natural
        # (K, N) layout (batch minor).
        C = np.zeros((NROWS, 2 * L13), dtype=np.uint8)
        for j in range(NPROD):
            for k in range(NBYTES):
                w = pow(2, B13 * j + 8 * k, p)
                for l in range(L13):
                    limb = (w >> (B13 * l)) & int(M13)
                    C[k * NPROD + j, 2 * l] = limb & 0xFF
                    C[k * NPROD + j, 2 * l + 1] = limb >> 8
        self.C = np.ascontiguousarray(C.T)  # (42, 164)
        # top-limb fold: w262 = 2^262 mod p (values are folded so that
        # limb 20 keeps only its low 2 bits -> value < 2^262 + eps)
        self.w262 = _limbs13(pow(2, 262, p))
        # borrow-absorbed KP~ for sub13: KP = m_kp*p in [2^265, 2^265 + p);
        # KP~_l = kpl_l - 2 + 2^14 (middle), +2^14 (l=0), -2 (l=20).
        # Subtrahends are always op outputs, whose limb 20 is <= ~20 (a
        # 4-term combine_reduce output has value < 2^263.6 and fold
        # carry-ins < 2^17 into limb 20), so KP~_20 = 30 suffices; middle
        # limbs >= 2^14 - 2 dominate any quasi-canonical limb.
        self.m_kp = (1 << 265) // p + 1
        kp = self.m_kp * p
        kpl = [(kp >> (B13 * l)) & int(M13) for l in range(L13)]
        kpt = list(kpl)
        kpt[0] += 1 << 14
        for l in range(1, L13 - 1):
            kpt[l] += (1 << 14) - 2
        kpt[L13 - 1] -= 2
        assert kpt[L13 - 1] >= 28, (kp, kpt[L13 - 1])
        assert all(v >= (1 << 14) - 2 for v in kpt[:-1])
        assert sum(v << (B13 * l) for l, v in enumerate(kpt)) == kp
        self.kp_t = np.array(kpt, dtype=np.uint32)
        self.kp_limbs = np.array(
            [np.uint32(v) for v in kpl], dtype=np.uint32)  # strict limbs of KP
        self.p_limbs13 = _limbs13(p)
        # Barrett constant for canon13: values < 2^263.2, quotient < 2^10;
        # k=20 keeps the quotient underestimate <= 3 (v_hi*mu < 2^30).
        self.mu_k = 20
        self.mu = (1 << (247 + self.mu_k)) // p
        assert self.mu < (1 << 16)

    # --- host conversions --------------------------------------------------

    def from_int(self, x: int) -> np.ndarray:
        return _limbs13(x % self.p)

    def to_int(self, a) -> int:
        a = np.asarray(a, dtype=np.uint64)
        assert a.shape == (L13,)
        return sum(int(a[l]) << (B13 * l) for l in range(L13)) % self.p

    def from_ints(self, xs) -> np.ndarray:
        """ints -> (21, N)."""
        return np.stack([self.from_int(x) for x in xs], axis=1)

    def to_ints(self, a) -> list[int]:
        a = np.asarray(a, dtype=np.uint64).reshape(L13, -1)
        return [
            sum(int(a[l, i]) << (B13 * l) for l in range(L13)) % self.p
            for i in range(a.shape[1])
        ]


@lru_cache(maxsize=None)
def _ctx(spec: FieldSpec) -> Lazy13:
    return Lazy13(spec)


def ctx_fq() -> Lazy13:
    from zkevm_tpu.ff.limbs import fq_spec
    return _ctx(fq_spec())


def ctx_fr() -> Lazy13:
    from zkevm_tpu.ff.limbs import fr_spec
    return _ctx(fr_spec())


def _bcast_const(vec: np.ndarray, ndim: int):
    return jnp.reshape(jnp.asarray(vec), (L13,) + (1,) * (ndim - 1))


def _round_r(rows):
    """One vectorized carry round on row lists; drops the top carry
    (callers guarantee it is structurally zero via value bounds)."""
    lo = [r & M13 for r in rows]
    hi = [r >> B13 for r in rows]
    return [lo[0]] + [lo[l] + hi[l - 1] for l in range(1, L13)]


def _carry_fold_r(lz: Lazy13, rows):
    """21 u32 rows with entries < 2^31, representing a VALUE < 2^271.5
    -> quasi-canonical rows, value < 2^263.

    Two carry rounds (top carry provably zero: value < capacity 2^273),
    then limb 20 keeps its low 2 bits and the excess folds back via the
    2^262 mod p constant rows."""
    rows = _round_r(rows)
    rows = _round_r(rows)
    e = rows[20] >> 2
    rows[20] = rows[20] & 3
    w = lz.w262  # numpy scalars: fold constants multiply rows directly
    rows = [rows[l] + e * np.uint32(w[l]) if w[l] else rows[l]
            for l in range(L13)]
    rows = _round_r(rows)
    return _round_r(rows)


def _bytes_of_r(t_rows):
    """41 u32 product-column rows -> 164 u8 byte-plane rows (cast before
    the stack so the stacked matmul input is 1 byte/entry)."""
    u8 = jnp.uint8
    return ([(r & 0xFF).astype(u8) for r in t_rows]
            + [((r >> 8) & 0xFF).astype(u8) for r in t_rows]
            + [((r >> 16) & 0xFF).astype(u8) for r in t_rows]
            + [(r >> 24).astype(u8) for r in t_rows])


def _matmul_reduce_r(lz: Lazy13, rows8, C_u8):
    """(42, R) constant @ stacked (R, ...) byte rows -> quasi-canonical
    row list; the dot contracts the leading axis (batch minor = the
    natural MXU rhs layout)."""
    t8 = jnp.stack(rows8, axis=0)
    shp = t8.shape
    t8 = t8.reshape(shp[0], -1)
    if MATMUL_DTYPE == "bf16":
        r = jax.lax.dot_general(
            jnp.asarray(C_u8, jnp.bfloat16), t8.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(U32)
    else:
        r = jax.lax.dot_general(
            jnp.asarray(C_u8), t8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(U32)
    r = r.reshape((2 * L13,) + shp[1:])  # entries < R*255*255
    rows = [r[2 * l] + (r[2 * l + 1] << 8) for l in range(L13)]  # < 2^30.5
    return _carry_fold_r(lz, rows)


def _reduce_rows(lz: Lazy13, t_rows):
    """Product-column rows -> reduced quasi-canonical rows."""
    return _matmul_reduce_r(lz, _bytes_of_r(t_rows), lz.C)


@lru_cache(maxsize=None)
def _scaled_C(lz: Lazy13, scales: tuple):
    """Reduction matrix for a COMBINED signed-scaled reduction: the s-th
    164-row block has weights (scales[s] * 2^w mod p) — formula constants
    (x4, -8, ...) cost nothing because they fold into the MXU matrix.
    Same byte-plane-major row order and (42, R) transpose as Lazy13.C.
    Output value bound: sum_r T8_r * p < len(scales)*164*255*p."""
    p = lz.p
    C = np.zeros((NROWS * len(scales), 2 * L13), dtype=np.uint8)
    for s, k in enumerate(scales):
        for j in range(NPROD):
            for kk in range(NBYTES):
                w = (k * pow(2, B13 * j + 8 * kk, p)) % p
                for l in range(L13):
                    limb = (w >> (B13 * l)) & int(M13)
                    C[s * NROWS + kk * NPROD + j, 2 * l] = limb & 0xFF
                    C[s * NROWS + kk * NPROD + j, 2 * l + 1] = limb >> 8
    return np.ascontiguousarray(C.T)


# ---------------------------------------------------------------------------
# Row-space core: every kernel works on Python LISTS of per-limb rows
# (pure elementwise ops, no dynamic-update-slices — XLA fuses each op
# chain into single kernels; the stacked .at[] formulation measured
# ~2.5x slower from accumulator materialization). The stacked (21, ...)
# API below wraps these for circuits/tests; the MSM point kernels call
# the row forms directly and stack only at the matmul boundary.
# ---------------------------------------------------------------------------

def to_rows(a):
    """(21, ...) stacked -> list of 21 rows."""
    return [a[l] for l in range(L13)]


def from_rows(rows):
    return jnp.stack(rows, axis=0)


def prod_T_r(ar, br):
    """Schoolbook double-width product columns (41 rows) of two
    quasi-canonical row lists — the VPU half of a field mul (441 muls,
    single-fusion friendly)."""
    t: list = [None] * NPROD
    for i in range(L13):
        for j in range(L13):
            pr = ar[i] * br[j]
            k = i + j
            t[k] = pr if t[k] is None else t[k] + pr
    return t


def sqr_T_r(ar):
    """Double-width square columns (shared off-diagonals: ~55% muls)."""
    t: list = [None] * NPROD

    def acc(k, pr):
        t[k] = pr if t[k] is None else t[k] + pr

    for i in range(L13):
        acc(2 * i, ar[i] * ar[i])
        if i + 1 < L13:
            ad = ar[i] + ar[i]
            for j in range(i + 1, L13):
                acc(i + j, ad * ar[j])
    return t


def combine_reduce_r(lz: Lazy13, terms):
    """One MXU matmul evaluating sum_k scales[k] * value(T_k) mod p.

    terms: list of (T_rows, int_scale); T_rows are 41-row product
    columns, reusable across terms (z3 = (z1+h)^2 - z1^2 - h^2 reuses
    the squares' columns). Scales may be negative; they embed in the
    constant matrix. len(terms) <= 4 keeps the output value < 2^271.5
    (the carry-fold's provably-zero-top-carry bound)."""
    assert 1 <= len(terms) <= 4
    scales = tuple(int(k) for _, k in terms)
    rows8: list = []
    for t_rows, _ in terms:
        rows8.extend(_bytes_of_r(t_rows))
    return _matmul_reduce_r(lz, rows8, _scaled_C(lz, scales))


def mul13_r(lz: Lazy13, ar, br):
    return _reduce_rows(lz, prod_T_r(ar, br))


def sqr13_r(lz: Lazy13, ar):
    return _reduce_rows(lz, sqr_T_r(ar))


def add13_r(lz: Lazy13, ar, br):
    """Lazy modular add on rows: values < 2^263 each."""
    t = [x + y for x, y in zip(ar, br)]   # limbs < 2^14 + 2^7
    t = _round_r(t)
    e = t[20] >> 2                        # < 2^3
    t[20] = t[20] & 3
    w = lz.w262
    t = [t[l] + e * np.uint32(w[l]) if w[l] else t[l] for l in range(L13)]
    return _round_r(t)


def sub13_r(lz: Lazy13, ar, br):
    """Lazy modular subtract on rows: a + (KP~ - b), borrow-free per
    limb for any op-output b (value < 2^263.6 => b[20] <= ~20)."""
    kp = lz.kp_t
    t = [x + np.uint32(kp[l]) - y for l, (x, y) in enumerate(zip(ar, br))]
    t = _round_r(t)
    e = t[20] >> 2
    t[20] = t[20] & 3
    w = lz.w262
    t = [t[l] + e * np.uint32(w[l]) if w[l] else t[l] for l in range(L13)]
    return _round_r(t)


def _ripple_r(rows):
    """Full sequential carry to strictly-canonical (< 2^13) limbs."""
    out = []
    carry = None
    for l in range(L13):
        v = rows[l] if carry is None else rows[l] + carry
        out.append(v & M13)
        carry = v >> B13
    return out


def _cond_sub_p_r(lz: Lazy13, rows):
    """Subtract p once if value >= p; rows must be strictly canonical."""
    pl = [np.uint32(v) for v in _limbs13(lz.p)]
    d = []
    borrow = None
    for l in range(L13):
        v = rows[l] + np.uint32(1 << B13) - pl[l]
        if borrow is not None:
            v = v - borrow
        d.append(v & M13)
        borrow = np.uint32(1) - (v >> B13)
    keep = borrow != 0
    return [jnp.where(keep, rows[l], d[l]) for l in range(L13)]


def _barrett_sub_r(lz: Lazy13, ar):
    """rows -> strict-limb rows of (V - m*p + KP), V the exact value;
    result value in [KP, KP + 7p)."""
    v_hi = ar[19] + (ar[20] << B13)
    m = (v_hi * np.uint32(lz.mu)) >> lz.mu_k  # <= floor(V/p), -4 max
    pl = lz.p_limbs13
    mp = [m * np.uint32(pl[l]) for l in range(L13)]
    mp = _round_r(_round_r(mp))               # quasi-canonical; mp_20 <= 8
    kp = lz.kp_t
    t = [x + np.uint32(kp[l]) - y for l, (x, y) in enumerate(zip(ar, mp))]
    return _ripple_r(t)


def canon13_r(lz: Lazy13, ar):
    """Canonicalize lazy rows (op output, value < 2^263.6) to [0, p)."""
    t = _barrett_sub_r(lz, ar)
    # subtract the constant KP (t >= KP always): plain borrow ripple
    kl = [np.uint32(v) for v in lz.kp_limbs]
    out = []
    borrow = None
    for l in range(L13):
        v = t[l] + np.uint32(1 << B13) - kl[l]
        if borrow is not None:
            v = v - borrow
        out.append(v & M13)
        borrow = np.uint32(1) - (v >> B13)
    t = out                                    # in [0, 7p)
    for _ in range(7):
        t = _cond_sub_p_r(lz, t)
    return t


def is_zero13_r(lz: Lazy13, ar):
    """Exact zero-test mod p on lazy rows -> bool over the batch shape.

    After the Barrett subtraction and ripple the exact value lies in
    [KP, KP + 7p): zero mod p iff the strict limb pattern equals one of
    the 8 constants KP + i*p."""
    t = _barrett_sub_r(lz, ar)
    hit = None
    for i in range(8):
        c = _limbs13((lz.m_kp + i) * lz.p)   # KP + 7p < 2^266: fits
        eq = None
        for l in range(L13):
            e = t[l] == np.uint32(c[l])
            eq = e if eq is None else (eq & e)
        hit = eq if hit is None else (hit | eq)
    return hit


# --- stacked (21, ...) wrappers -------------------------------------------

def prod_T(a, b):
    """Stacked API: (21, ...) x (21, ...) -> (41, ...) product columns."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    ar = [jnp.broadcast_to(a[i], batch).astype(U32) for i in range(L13)]
    br = [jnp.broadcast_to(b[j], batch).astype(U32) for j in range(L13)]
    return from_rows(prod_T_r(ar, br) + [None] * 0)[: NPROD]


def sqr_T(a):
    return jnp.stack(sqr_T_r(to_rows(a.astype(U32))), axis=0)


def combine_reduce(lz: Lazy13, terms):
    """Stacked API over combine_reduce_r (terms carry (41, ...) arrays)."""
    rterms = [([t[k] for k in range(NPROD)], s) for t, s in terms]
    return from_rows(combine_reduce_r(lz, rterms))


def mul13(lz: Lazy13, a, b):
    """Lazy modular product (21, ...) x (21, ...) -> (21, ...).

    VPU: 441 u32 muls + adds (no per-product splits). MXU: one
    (42, 164) @ (164, N) constant matmul. Output value < 2^263."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    ar = [jnp.broadcast_to(a[i], batch).astype(U32) for i in range(L13)]
    br = [jnp.broadcast_to(b[j], batch).astype(U32) for j in range(L13)]
    return from_rows(mul13_r(lz, ar, br))


def sqr13(lz: Lazy13, a):
    """Lazy modular square: off-diagonal products shared."""
    return from_rows(sqr13_r(lz, to_rows(a.astype(U32))))


def add13(lz: Lazy13, a, b):
    return from_rows(add13_r(lz, to_rows(a), to_rows(b)))


def sub13(lz: Lazy13, a, b):
    return from_rows(sub13_r(lz, to_rows(a), to_rows(b)))


def dbl13(lz: Lazy13, a):
    return add13(lz, a, a)


def canon13(lz: Lazy13, a):
    return from_rows(canon13_r(lz, to_rows(a)))


def is_zero13(lz: Lazy13, a):
    return is_zero13_r(lz, to_rows(a))


def eq13(lz: Lazy13, a, b):
    return is_zero13(lz, sub13(lz, a, b))


def select13(cond, a, b):
    """Elementwise select; cond has batch shape (no limb dim)."""
    return jnp.where(cond[None], a, b)


def zeros13(batch, like=None):
    return jnp.zeros((L13,) + tuple(batch), dtype=U32)


# --- layout conversions: u16-limb (ff/limbs.py) <-> 13-bit ----------------

def from_u16_t(a16):
    """(16, ...) u16-limb STANDARD-form (not Montgomery) -> (21, ...)
    13-bit limbs. Pure bit regrouping, device-side."""
    out = []
    for l in range(L13):
        start = B13 * l
        j, off = divmod(start, 16)
        if j >= 16:  # bits beyond 2^256: structurally zero
            out.append(jnp.zeros_like(a16[0]))
            continue
        v = a16[j] >> off
        got = 16 - off
        if got < B13 and j + 1 < 16:
            v = v | (a16[j + 1] << got)
        out.append(v & M13)
    return jnp.stack(out, axis=0)


def to_u16_t(a13):
    """(21, ...) STRICTLY-canonical 13-bit limbs -> (16, ...) u16 limbs.
    Canonicalize lazy values with canon13 first."""
    out = []
    for j in range(16):
        start = 16 * j
        l, off = divmod(start, B13)
        v = a13[l] >> off
        got = B13 - off
        ll = l
        while got < 16 and ll + 1 < L13:
            ll += 1
            v = v | (a13[ll] << got)
            got += B13
        out.append(v & np.uint32(0xFFFF))
    return jnp.stack(out, axis=0)
