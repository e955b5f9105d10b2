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
# ---------------------------------------------------------------------------

def _ripple_carry(cols, ncols_out: int):
    """Propagate carries over accumulation columns; returns (limbs, carry)."""
    limbs = []
    carry = jnp.zeros(cols.shape[:-1], U32)
    for k in range(ncols_out):
        v = cols[..., k] + carry
        limbs.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(limbs, axis=-1), carry


def _raw_sub(a, b):
    """Limbwise a - b with ripple borrow. Returns (diff mod 2^256, borrow)."""
    limbs = []
    borrow = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), U32)
    for k in range(L):
        v = a[..., k] + np.uint32(1 << LIMB_BITS) - b[..., k] - borrow
        limbs.append(v & MASK)
        borrow = np.uint32(1) - (v >> LIMB_BITS)
    return jnp.stack(limbs, axis=-1), borrow


def _raw_add(a, b):
    """Limbwise a + b mod 2^256 (drops final carry)."""
    s = a + b
    limbs, _ = _ripple_carry(s, L)
    return limbs


def _cond_sub_p(spec: FieldSpec, a):
    """Subtract p once if a >= p (a must be < 2p)."""
    p = jnp.asarray(spec.p_limbs)
    d, borrow = _raw_sub(a, p)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, a, d)


# ---------------------------------------------------------------------------
# Public field ops (Montgomery form in, Montgomery form out)
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a, b):
    s = a + b  # limb sums < 2^17
    limbs, _ = _ripple_carry(s, L)  # a+b < 2p < 2^256 => no final carry
    return _cond_sub_p(spec, limbs)


def sub(spec: FieldSpec, a, b):
    d, borrow = _raw_sub(a, b)
    dp = _raw_add(d, jnp.asarray(spec.p_limbs))
    return jnp.where((borrow != 0)[..., None], dp, d)


def neg(spec: FieldSpec, a):
    z = jnp.zeros_like(a)
    return sub(spec, z, a)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: (a * b * R^{-1}) mod p.

    Separated operand-scanning: schoolbook product into 33 accumulation
    columns (lo/hi split keeps every column < 2^22), then 16 rounds of
    Montgomery reduction, then one carry propagation + conditional subtract.
    """
    a = jnp.asarray(a, U32)
    b = jnp.asarray(b, U32)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))

    t = jnp.zeros(batch + (2 * L + 1,), U32)
    for i in range(L):
        prod = a[..., i : i + 1] * b  # exact 16x16 -> 32-bit products
        t = t.at[..., i : i + L].add(prod & MASK)
        t = t.at[..., i + 1 : i + L + 1].add(prod >> LIMB_BITS)

    p = jnp.asarray(spec.p_limbs)
    ninv = spec.ninv16
    for i in range(L):
        m = (t[..., i] * ninv) & MASK
        prod = m[..., None] * p
        t = t.at[..., i : i + L].add(prod & MASK)
        t = t.at[..., i + 1 : i + L + 1].add(prod >> LIMB_BITS)
        # column i is now divisible by 2^16; push its carry up
        t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)

    # result = t / 2^256 lives in columns 16..32; value < 2p so column 32
    # carries out to zero after propagation.
    limbs, _ = _ripple_carry(t[..., L : 2 * L + 1], L)
    return _cond_sub_p(spec, limbs)


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
