"""Vectorized multi-limb prime-field arithmetic for TPU.

A field element is an array of shape ``(..., 16)`` with dtype ``uint32``;
each limb holds 16 bits (little-endian), so a full element spans 256 bits.
Elements are kept in Montgomery form (R = 2^256) and always canonical
(< modulus). 16-bit limbs are chosen so that a limb product fits exactly in a
uint32 lane and anti-diagonal accumulations of split hi/lo halves stay far
below 2^32 — the TPU VPU has no 64-bit integer path, so this is the widest
representation with exact single-lane products.

This layer replaces halo2curves' field backend in the reference stack
(reference: /root/reference/Cargo.toml:41, used by every crate).

All functions broadcast over leading batch dimensions and are jit/vmap-safe
(static Python loops over the 16 limbs compile to straight-line vector code).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

L = 16  # limbs per element
LIMB_BITS = 16
MASK = np.uint32(0xFFFF)
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# Host-side conversions (numpy / python int)
# ---------------------------------------------------------------------------

def limbs_from_int(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 limb array (little-endian, 16-bit limbs)."""
    assert 0 <= x < (1 << 256)
    return np.array([(x >> (LIMB_BITS * i)) & 0xFFFF for i in range(L)], dtype=np.uint32)


def limbs_from_ints(xs) -> np.ndarray:
    """Iterable of ints -> (N, 16) uint32."""
    xs = list(xs)
    out = np.empty((len(xs), L), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[i] = limbs_from_int(x)
    return out


def int_from_limbs(a) -> int:
    """(16,) limb array -> python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(L))


def ints_from_limbs(a) -> list[int]:
    """(N, 16) limb array -> list of python ints."""
    a = np.asarray(a, dtype=np.uint64)
    out = []
    for row in a.reshape(-1, L):
        out.append(sum(int(row[i]) << (LIMB_BITS * i) for i in range(L)))
    return out


# ---------------------------------------------------------------------------
# Field specification
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Everything the limb kernels need to know about a prime field."""

    name: str
    modulus: int

    def __post_init__(self):
        assert self.modulus % 2 == 1 and self.modulus < (1 << 255)

    # --- derived constants (numpy; captured as XLA constants when traced) ---

    @property
    def r(self) -> int:  # Montgomery radix mod p
        return (1 << 256) % self.modulus

    @property
    def r2(self) -> int:
        return self.r * self.r % self.modulus

    @property
    def ninv16(self) -> np.uint32:
        """-p^{-1} mod 2^16 (per-limb Montgomery factor)."""
        return np.uint32((-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS))

    @property
    def p_limbs(self) -> np.ndarray:
        return limbs_from_int(self.modulus)

    @property
    def r2_limbs(self) -> np.ndarray:
        return limbs_from_int(self.r2)

    @property
    def one_raw(self) -> np.ndarray:
        """The integer 1 as limbs (NOT Montgomery form)."""
        return limbs_from_int(1)

    @property
    def mont_one(self) -> np.ndarray:
        """1 in Montgomery form (= R mod p)."""
        return limbs_from_int(self.r)

    @property
    def zero(self) -> np.ndarray:
        return np.zeros(L, dtype=np.uint32)

    # --- host Montgomery encode/decode for constants ---

    def encode(self, x: int) -> np.ndarray:
        """int -> Montgomery limbs (host-side)."""
        return limbs_from_int((x % self.modulus) * self.r % self.modulus)

    def encode_many(self, xs) -> np.ndarray:
        rinv = pow(self.r, -1, self.modulus)  # unused; kept for symmetry
        del rinv
        return limbs_from_ints([(x % self.modulus) * self.r % self.modulus for x in xs])

    def decode(self, a) -> int:
        """Montgomery limbs -> int (host-side)."""
        rinv = pow(self.r, -1, self.modulus)
        return int_from_limbs(np.asarray(a)) * rinv % self.modulus

    def decode_many(self, a) -> list[int]:
        rinv = pow(self.r, -1, self.modulus)
        return [v * rinv % self.modulus for v in ints_from_limbs(a)]


# ---------------------------------------------------------------------------
# Low-level limb kernels (all uint32, jit-safe)
#
# Internally every operation unstacks the trailing limb axis into a Python
# list of per-limb arrays and computes with plain elementwise add/mul/shift.
# This is deliberate: scatter/dynamic-update-slice chains (a previous
# formulation) compile orders of magnitude slower in XLA and serialize on
# TPU, whereas unstacked limb lists trace to pure fusible vector ops over
# the batch dimensions (each limb row occupies full 8x128 VPU lanes).
# ---------------------------------------------------------------------------

def _unstack(a):
    return [a[..., i] for i in range(a.shape[-1])]


def _restack(rows):
    return jnp.stack(rows, axis=-1)


def _sub_rows(ar, br):
    """Limb-row a - b with ripple borrow -> (diff rows, borrow row)."""
    out = []
    borrow = np.uint32(0)
    for k in range(L):
        v = ar[k] + np.uint32(1 << LIMB_BITS) - br[k] - borrow
        out.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    return out, borrow


def _add_rows(ar, br):
    """Limb-row a + b mod 2^256 (drops final carry)."""
    out = []
    carry = np.uint32(0)
    for k in range(L):
        v = ar[k] + br[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out


def _cond_sub_p_rows(spec: FieldSpec, rows):
    """Subtract p once if value >= p (value must be < 2p). Row form."""
    p = spec.p_limbs
    d, borrow = _sub_rows(rows, [np.uint32(x) for x in p])
    keep = borrow != 0
    return [jnp.where(keep, a_k, d_k) for a_k, d_k in zip(rows, d)]


# ---------------------------------------------------------------------------
# Public field ops (Montgomery form in, Montgomery form out)
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a, b):
    a, b = jnp.asarray(a, U32), jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))
    s = _add_rows(_unstack(a), _unstack(b))  # a+b < 2p < 2^256: no final carry
    return _restack(_cond_sub_p_rows(spec, s))


def sub(spec: FieldSpec, a, b):
    a, b = jnp.asarray(a, U32), jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))
    d, borrow = _sub_rows(_unstack(a), _unstack(b))
    dp = _add_rows(d, [np.uint32(x) for x in spec.p_limbs])
    under = borrow != 0
    return _restack([jnp.where(under, x, y) for x, y in zip(dp, d)])


def neg(spec: FieldSpec, a):
    z = jnp.zeros_like(a)
    return sub(spec, z, a)


import os

# 1 = fully unrolled CIOS iterations (max fusion / runtime throughput on
# TPU); 0 = lax.scan over the 16 iterations (graph ~16x smaller — compile
# time dominates XLA:CPU development loops and large composite circuits).
UNROLL_MUL = os.environ.get("ZKEVM_TPU_UNROLL_FF", "0") == "1"


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: (a * b * R^{-1}) mod p.

    Interleaved CIOS with lazy carries: per scalar-limb iteration the
    (..., 17)-row accumulator gains a_i*b and m_i*p at FIXED offsets 0/1 and
    is then shifted down one limb — small fusible vector ops, no scatters,
    no dynamic offsets. Row magnitudes stay < ~2^23 (4 products of < 2^16
    per row per iteration over 16 iterations, plus the pushed t[0] carry),
    far below the u32 ceiling. One final ripple-carry + conditional
    subtract canonicalizes. The 16 iterations run unrolled or as a
    ``lax.scan`` (see UNROLL_MUL).
    """
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))
    ninv = spec.ninv16
    p_vec = jnp.asarray(spec.p_limbs)  # (16,)
    pad_cfg_lo = [(0, 0)] * (len(batch)) + [(0, 1)]  # rows 0..15 of 17
    pad_cfg_hi = [(0, 0)] * (len(batch)) + [(1, 0)]  # rows 1..16 of 17
    # derive zeros from the inputs so they inherit any shard_map varying
    # axes (a fresh jnp.zeros is 'unvarying' and breaks scan carries there)
    zeros1 = (a[..., :1] ^ a[..., :1]) & (b[..., :1] ^ b[..., :1])

    def iteration(t, ai):
        prod = ai[..., None] * b  # (..., 16) exact 16x16 products
        t = (
            t
            + jnp.pad(prod & MASK, pad_cfg_lo)
            + jnp.pad(prod >> LIMB_BITS, pad_cfg_hi)
        )
        m = (t[..., 0:1] * ninv) & MASK
        mprod = m * p_vec
        t = (
            t
            + jnp.pad(mprod & MASK, pad_cfg_lo)
            + jnp.pad(mprod >> LIMB_BITS, pad_cfg_hi)
        )
        # row 0 is now divisible by 2^16: push its carry into row 1 and
        # shift the accumulator down one limb in a single concat.
        carry0 = t[..., 0:1] >> LIMB_BITS
        return jnp.concatenate([t[..., 1:2] + carry0, t[..., 2:], zeros1], axis=-1)

    t = jnp.broadcast_to(zeros1, batch + (L + 1,))
    if UNROLL_MUL:
        for i in range(L):
            t = iteration(t, a[..., i])
    else:
        a_scan = jnp.moveaxis(a, -1, 0)  # (16, ...batch)
        t, _ = jax.lax.scan(lambda tt, ai: (iteration(tt, ai), None), t, a_scan)

    # ripple-carry the 16 result rows; final carry is 0 since value < 2p.
    rows = _unstack(t[..., :L])
    out = []
    carry = np.uint32(0)
    for k in range(L):
        v = rows[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return _restack(_cond_sub_p_rows(spec, out))


def sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.r2_limbs))


def from_mont(spec: FieldSpec, a):
    return mont_mul(spec, a, jnp.asarray(spec.one_raw))


def pow_const(spec: FieldSpec, a, e: int):
    """a^e for a host-known integer exponent.

    MSB-first square-and-multiply via ``lax.scan`` so the traced graph stays
    constant-size (2 Montgomery muls) regardless of the exponent width —
    critical for compile time, since ``inv`` uses a 254-bit exponent.
    """
    one = jnp.broadcast_to(jnp.asarray(spec.mont_one), jnp.shape(a))
    if e == 0:
        return one
    if e == 1:
        return a
    nbits = e.bit_length()
    bits = jnp.asarray([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], U32)

    def body(res, bit):
        res = sqr(spec, res)
        res_m = mont_mul(spec, res, a)
        return jnp.where((bit != 0)[..., None], res_m, res), None

    # first bit is always 1: start from a, scan the rest
    res, _ = jax.lax.scan(body, a, bits[1:])
    return res


def inv(spec: FieldSpec, a):
    """Batched inversion via Fermat (vectorizes perfectly; inv(0) = 0)."""
    return pow_const(spec, a, spec.modulus - 2)


def is_zero(a):
    """Canonical-form zero test -> bool array over batch dims."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    """Canonical-form equality -> bool array over batch dims."""
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """Elementwise field select; cond has batch shape (no limb dim)."""
    return jnp.where(cond[..., None], a, b)


def mul_pow2(spec: FieldSpec, a, k: int):
    """a * 2^k mod p via k doublings (host-known k, used for small shifts)."""
    out = a
    for _ in range(k):
        out = add(spec, out, out)
    return out


# ---------------------------------------------------------------------------
# Bit/window extraction on standard-form (non-Montgomery) scalars
# ---------------------------------------------------------------------------

def scalar_bits(scalars, nbits: int = 256):
    """(..., 16) standard-form limbs -> (..., nbits) bits (LSB first), uint32."""
    bits = []
    for b in range(nbits):
        limb, off = divmod(b, LIMB_BITS)
        bits.append((scalars[..., limb] >> off) & np.uint32(1))
    return jnp.stack(bits, axis=-1)


def scalar_window(scalars, window_idx: int, c: int):
    """Extract the c-bit window starting at bit window_idx*c. c must divide 16
    or be <= 16 with windows not crossing... handles the general case."""
    start = window_idx * c
    limb, off = divmod(start, LIMB_BITS)
    lo = scalars[..., limb] >> off
    got = LIMB_BITS - off
    if got < c and limb + 1 < L:
        lo = lo | (scalars[..., limb + 1] << got)
    return lo & np.uint32((1 << c) - 1)


# ---------------------------------------------------------------------------
# jit wrappers: callers outside an enclosing jit (the prover does most field
# math "eagerly") hit jax.jit's shape-keyed cache instead of re-lowering the
# scan bodies on every call — this is the difference between milliseconds
# and minutes per MSM. Inside an enclosing jit these inline as usual.
# ---------------------------------------------------------------------------

add = jax.jit(add, static_argnums=0)
sub = jax.jit(sub, static_argnums=0)
neg = jax.jit(neg, static_argnums=0)
mont_mul = jax.jit(mont_mul, static_argnums=0)
sqr = jax.jit(sqr, static_argnums=0)
to_mont = jax.jit(to_mont, static_argnums=0)
from_mont = jax.jit(from_mont, static_argnums=0)
pow_const = jax.jit(pow_const, static_argnums=(0, 2))
inv = jax.jit(inv, static_argnums=0)


@lru_cache(maxsize=None)
def _specs():
    from zkevm_tpu.ff import goldens

    return (
        FieldSpec("Fr", goldens.FR_MOD),
        FieldSpec("Fq", goldens.FQ_MOD),
    )


def fr_spec() -> FieldSpec:
    return _specs()[0]


def fq_spec() -> FieldSpec:
    return _specs()[1]


# ---------------------------------------------------------------------------
# Transposed (limbs-first) kernels: element = (16, ...) with the batch on the
# TRAILING axes. On TPU the batch then fills the 8x128 vector lanes (the
# (..., 16) layout leaves 7/8 of each lane tile empty). Used by the NTT/MSM
# hot paths; the (..., 16) API remains the general-purpose interface.
# ---------------------------------------------------------------------------

def mont_mul_t(spec: FieldSpec, a, b, *, unroll: bool = True):
    """CIOS Montgomery product in limbs-first layout: a, b (16, ...).

    unroll=True: fully fused straight-line graph (max throughput);
    unroll=False: lax.scan over the 16 iterations (16x smaller graph, for
    composites whose compiled module would otherwise explode)."""
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    p = [np.uint32(x) for x in spec.p_limbs]
    ninv = spec.ninv16
    zero = (a[0] ^ a[0]) & (b[0] ^ b[0])  # varying-axis-inheriting zero
    zero = jnp.broadcast_to(zero, batch)

    if unroll:
        ar = [jnp.broadcast_to(a[i], batch) for i in range(L)]
        br = [jnp.broadcast_to(b[i], batch) for i in range(L)]
        t = [zero] * (L + 1)
        for i in range(L):
            prod = [ar[i] * bj for bj in br]
            for j in range(L):
                t[j] = t[j] + (prod[j] & MASK)
                t[j + 1] = t[j + 1] + (prod[j] >> LIMB_BITS)
            m = (t[0] * ninv) & MASK
            for j in range(L):
                mp = m * p[j]
                t[j] = t[j] + (mp & MASK)
                t[j + 1] = t[j + 1] + (mp >> LIMB_BITS)
            t[1] = t[1] + (t[0] >> LIMB_BITS)
            t = t[1:] + [zero]
        rows = t[:L]
    else:
        bb = jnp.broadcast_to(b, (L,) + batch)
        p_vec = jnp.asarray(spec.p_limbs).reshape((L,) + (1,) * len(batch))

        def iteration(t, ai):
            prod = ai[None] * bb  # (L, ...)
            lo, hi = prod & MASK, prod >> LIMB_BITS
            t = t.at[:L].add(lo).at[1:].add(hi)
            m = (t[0] * ninv) & MASK
            mp = m[None] * p_vec
            t = t.at[:L].add(mp & MASK).at[1:].add(mp >> LIMB_BITS)
            t = t.at[1].add(t[0] >> LIMB_BITS)
            return jnp.concatenate([t[1:], t[:1] * 0], axis=0)

        t0 = jnp.broadcast_to(zero[None], (L + 1,) + batch)
        tt, _ = jax.lax.scan(
            lambda c, ai: (iteration(c, ai), None),
            t0,
            jnp.broadcast_to(a, (L,) + batch),
        )
        rows = [tt[k] for k in range(L)]

    out = []
    carry = np.uint32(0)
    for k in range(L):
        v = rows[k] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(_cond_sub_p_rows(spec, out), axis=0)


def add_t(spec: FieldSpec, a, b):
    """Modular add in limbs-first layout."""
    a, b = jnp.asarray(a, U32), jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    ar = [jnp.broadcast_to(a[i], batch) for i in range(L)]
    br = [jnp.broadcast_to(b[i], batch) for i in range(L)]
    s = _add_rows(ar, br)
    return jnp.stack(_cond_sub_p_rows(spec, s), axis=0)


def sub_t(spec: FieldSpec, a, b):
    a, b = jnp.asarray(a, U32), jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    ar = [jnp.broadcast_to(a[i], batch) for i in range(L)]
    br = [jnp.broadcast_to(b[i], batch) for i in range(L)]
    d, borrow = _sub_rows(ar, br)
    dp = _add_rows(d, [np.uint32(x) for x in spec.p_limbs])
    under = borrow != 0
    return jnp.stack([jnp.where(under, x, y) for x, y in zip(dp, d)], axis=0)
