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
        # --- reduction matrix: row (j, k) has weight 2^(13j + 8k) mod p,
        # output as 21 limbs of 13 bits, each split lo8 / hi5.
        C = np.zeros((NROWS, 2 * L13), dtype=np.uint8)
        for j in range(NPROD):
            for k in range(NBYTES):
                w = pow(2, B13 * j + 8 * k, p)
                for l in range(L13):
                    limb = (w >> (B13 * l)) & int(M13)
                    C[j * NBYTES + k, 2 * l] = limb & 0xFF
                    C[j * NBYTES + k, 2 * l + 1] = limb >> 8
        self.C = C
        self.C_bf16 = C.astype(np.float32)  # cast to bf16 at use site
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


def _carry_fold(lz: Lazy13, t):
    """(21, ...) u32 rows with entries < 2^31, representing a VALUE
    < 2^269 -> quasi-canonical limbs, value < 2^262.2.

    Two vectorized carry rounds (top carry provably zero: value < 2^269
    < 2^273 capacity), then limb 20 keeps its low 2 bits and the excess
    (< 2^9 * 2^13) folds back via 2^262 mod p."""
    lo = t & M13
    hi = t >> B13                    # < 2^18
    t = lo.at[1:].add(hi[:-1])       # limbs < 2^13 + 2^18; hi[-1]=0 (value<2^269 => t[20]<2^9... )
    lo = t & M13
    hi = t >> B13                    # < 2^6
    t = lo.at[1:].add(hi[:-1])       # quasi-canonical
    # top fold: t[20] < 2^9 + 2^6 (value < 2^269); keep low 2 bits
    e = t[20] >> 2                   # < 2^8
    t = t.at[20].set(t[20] & 3)
    w = _bcast_const(lz.w262, t.ndim)
    t = t + e[None] * w              # limbs < 2^13 + 2^6 + 2^21
    lo = t & M13
    hi = t >> B13                    # < 2^9
    t = lo.at[1:].add(hi[:-1])
    lo = t & M13
    hi = t >> B13                    # <= 1
    t = lo.at[1:].add(hi[:-1])       # quasi-canonical; value < 2^262 + 2^8*2^254 < 2^262.2
    return t


def _bytes_of(t):
    """(41, ...) u32 product columns -> (..., 164) bytes via bitcast
    (little-endian u32 = the exact 4 bytes we need; zero ALU cost)."""
    tb = jnp.moveaxis(t, 0, -1)                      # (..., 41)
    t8 = jax.lax.bitcast_convert_type(tb, jnp.uint8)  # (..., 41, 4)
    return t8.reshape(t8.shape[:-2] + (NROWS,))


def _matmul_reduce(lz: Lazy13, t8, C_u8):
    """(..., R) bytes @ (R, 42) constant -> quasi-canonical (21, ...)."""
    if MATMUL_DTYPE == "bf16":
        r = jax.lax.dot_general(
            t8.astype(jnp.bfloat16), jnp.asarray(C_u8, jnp.bfloat16),
            (((t8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(U32)
    else:
        r = jax.lax.dot_general(
            t8, jnp.asarray(C_u8),
            (((t8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(U32)
    r = jnp.moveaxis(r, -1, 0)       # (42, ...), entries < R*255*255
    t = r[0::2] + (r[1::2] << 8)     # (21, ...), < 2^24*257 < 2^32 exact
    return _carry_fold(lz, t)


def _reduce_t(lz: Lazy13, t, batch):
    """Byte-split the (41, ...) product columns and reduce mod p via the
    constant MXU matmul; returns quasi-canonical (21, ...) limbs."""
    del batch
    return _matmul_reduce(lz, _bytes_of(t), lz.C)


@lru_cache(maxsize=None)
def _scaled_C(lz: Lazy13, scales: tuple):
    """Reduction matrix for a COMBINED signed-scaled reduction: the k-th
    164-row block has weights (scales[k] * 2^w mod p) — formula constants
    (x4, -8, ...) cost nothing because they fold into the MXU matrix.
    Output value bound: sum_r T8_r * p < len(scales)*164*255*p."""
    p = lz.p
    C = np.zeros((NROWS * len(scales), 2 * L13), dtype=np.uint8)
    for s, k in enumerate(scales):
        for j in range(NPROD):
            for kk in range(NBYTES):
                w = (k * pow(2, B13 * j + 8 * kk, p)) % p
                for l in range(L13):
                    limb = (w >> (B13 * l)) & int(M13)
                    C[s * NROWS + j * NBYTES + kk, 2 * l] = limb & 0xFF
                    C[s * NROWS + j * NBYTES + kk, 2 * l + 1] = limb >> 8
    return C


def prod_T(a, b):
    """Schoolbook double-width product columns (41, ...) u32 of two
    quasi-canonical operands — the VPU half of a field mul (441 muls)."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (L13,) + batch).astype(U32)
    b = jnp.broadcast_to(b, (L13,) + batch).astype(U32)
    t = jnp.zeros((NPROD,) + batch, dtype=U32)
    for i in range(L13):
        t = t.at[i:i + L13].add(a[i][None] * b)
    return t


def sqr_T(a):
    """Double-width square columns (shared off-diagonals: ~55% muls)."""
    batch = a.shape[1:]
    a = a.astype(U32)
    t = jnp.zeros((NPROD,) + batch, dtype=U32)
    for i in range(L13):
        t = t.at[2 * i].add(a[i] * a[i])
        if i + 1 < L13:
            ad = a[i] + a[i]
            t = t.at[2 * i + 1:i + L13].add(ad[None] * a[i + 1:])
    return t


def combine_reduce(lz: Lazy13, terms):
    """One MXU matmul evaluating sum_k scales[k] * value(T_k) mod p.

    terms: list of (T, int_scale) with T a (41, ...) product-column array
    (reusable across terms — e.g. z3 = (z1+h)^2 - z1^2 - h^2 reuses the
    squares' columns). Scales may be negative; they embed in the constant
    matrix. Keep len(terms) <= 4 so the output value stays < 2^271 (the
    carry-fold's provably-zero-top-carry bound)."""
    assert 1 <= len(terms) <= 4
    scales = tuple(int(k) for _, k in terms)
    t8 = jnp.concatenate([_bytes_of(t) for t, _ in terms], axis=-1)
    return _matmul_reduce(lz, t8, _scaled_C(lz, scales))


def mul13(lz: Lazy13, a, b):
    """Lazy modular product (21, ...) x (21, ...) -> (21, ...).

    VPU: 441 u32 muls + adds (no per-product splits). MXU: one
    (N, 164) @ (164, 42) constant matmul. Output value < 2^262.2."""
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    return _reduce_t(lz, prod_T(a, b), batch)


def sqr13(lz: Lazy13, a):
    """Lazy modular square: off-diagonal products shared (~55% of mul's
    multiplies). Column bound: <= 10 doubled (2^27.05) + 1 diagonal
    product < 2^30.5 < 2^31."""
    return _reduce_t(lz, sqr_T(a), a.shape[1:])


def add13(lz: Lazy13, a, b):
    """Lazy modular add: values < 2^263 each -> out value < 2^262.2."""
    t = a + b                        # limbs < 2^14 + 2^7
    lo = t & M13
    hi = t >> B13                    # <= 2
    t = lo.at[1:].add(hi[:-1])
    e = t[20] >> 2                   # < 2^3 (value < 2^264 => t[20] < 2^4+)
    t = t.at[20].set(t[20] & 3)
    w = _bcast_const(lz.w262, t.ndim)
    t = t + e[None] * w
    lo = t & M13
    hi = t >> B13
    return lo.at[1:].add(hi[:-1])    # value < 2^262 + 2^3*2^254: quasi-ok
    # (second carry round unnecessary: hi < 2^4 -> limbs < 2^13 + 2^4)


def sub13(lz: Lazy13, a, b):
    """Lazy modular subtract: a + (KP~ - b), borrow-free per limb for
    quasi-canonical b with value < 2^263 (=> b[20] < 2^4); KP ~ 2^264."""
    kp = _bcast_const(lz.kp_t, a.ndim)
    t = a + kp - b                   # limbs < 2^13+2^6 + 2^14: < 2^14.7
    lo = t & M13
    hi = t >> B13                    # <= 3
    t = lo.at[1:].add(hi[:-1])
    e = t[20] >> 2                   # value < 2^265 => t[20] < 2^5+q
    t = t.at[20].set(t[20] & 3)
    w = _bcast_const(lz.w262, t.ndim)
    t = t + e[None] * w
    lo = t & M13
    hi = t >> B13
    return lo.at[1:].add(hi[:-1])


def dbl13(lz: Lazy13, a):
    return add13(lz, a, a)


def canon13(lz: Lazy13, a):
    """Canonicalize a lazy value (op output, value < 2^263.2) to [0, p).

    Barrett: m ~= floor(V/p) (underestimate by <= 4) from the top limbs,
    then t = a + KP~ - m*p is borrow-free per limb with EXACT value
    V - m*p + KP in [KP, KP + 5p). Ripple to strict limbs, subtract the
    constant KP, and finish with conditional subtracts of p."""
    v_hi = a[19] + (a[20] << B13)             # floor(V/2^247) or 1 less
    m = (v_hi * np.uint32(lz.mu)) >> lz.mu_k  # <= floor(V/p) <= m + 4
    pl = _bcast_const(lz.p_limbs13, a.ndim)
    mp = m[None] * pl                         # m < 2^10: products < 2^23
    lo = mp & M13
    hi = mp >> B13
    mp = lo.at[1:].add(hi[:-1])
    lo = mp & M13
    hi = mp >> B13
    mp = lo.at[1:].add(hi[:-1])               # quasi-canonical; mp_20 <= 8
    kp = _bcast_const(lz.kp_t, a.ndim)
    t = a + kp - mp                           # borrow-free; exact value
    t = _ripple(t)                            # strict limbs; V < 2^264.4
    # subtract the constant KP (t >= KP always): plain borrow ripple
    kl = [np.uint32(v) for v in lz.kp_limbs]
    out = []
    borrow = jnp.zeros_like(t[0])
    for l in range(L13):
        v = t[l] + np.uint32(1 << B13) - kl[l] - borrow
        out.append(v & M13)
        borrow = np.uint32(1) - (v >> B13)
    t = jnp.stack(out, axis=0)                # in [0, 7p)
    for _ in range(7):
        t = _cond_sub_p(lz, t)
    return t


def _ripple(t):
    """Full sequential carry to strictly-canonical (< 2^13) limbs."""
    out = []
    carry = jnp.zeros_like(t[0])
    for l in range(L13):
        v = t[l] + carry
        out.append(v & M13)
        carry = v >> B13
    return jnp.stack(out, axis=0)


def _cond_sub_p(lz: Lazy13, t):
    """Subtract p once if t >= p; t must have strictly canonical limbs."""
    pl = [np.uint32(v) for v in _limbs13(lz.p)]
    d = []
    borrow = jnp.zeros_like(t[0])
    for l in range(L13):
        v = t[l] + np.uint32(1 << B13) - pl[l] - borrow
        d.append(v & M13)
        borrow = np.uint32(1) - (v >> B13)
    keep = borrow != 0
    return jnp.stack(
        [jnp.where(keep, t[l], d[l]) for l in range(L13)], axis=0)


def is_zero13(lz: Lazy13, a):
    """Exact zero-test mod p of a lazy value -> bool over batch dims.

    Cheaper than canon13: after the Barrett subtraction and ripple, the
    exact value lies in [KP, KP + 7p), so a == 0 mod p iff the strict
    limb pattern equals one of the 8 precomputed constants KP + i*p."""
    v_hi = a[19] + (a[20] << B13)
    m = (v_hi * np.uint32(lz.mu)) >> lz.mu_k
    pl = _bcast_const(lz.p_limbs13, a.ndim)
    mp = m[None] * pl
    lo = mp & M13
    hi = mp >> B13
    mp = lo.at[1:].add(hi[:-1])
    lo = mp & M13
    hi = mp >> B13
    mp = lo.at[1:].add(hi[:-1])
    kp = _bcast_const(lz.kp_t, a.ndim)
    t = _ripple(a + kp - mp)
    hit = None
    for i in range(8):
        c = _limbs13((lz.m_kp + i) * lz.p)  # fits: KP + 7p < 2^266
        eq = jnp.all(t == _bcast_const(c, a.ndim), axis=0)
        hit = eq if hit is None else (hit | eq)
    return hit


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
