"""Batched BN254 G1 group arithmetic on limb arrays (device-side).

Points are structure-of-NamedTuple Jacobian coordinates; each coordinate is a
``(..., 16)`` uint32 Montgomery-form Fq limb array (see ``zkevm_tpu.ff.limbs``).
The point at infinity is encoded as ``Z == 0``. All operations are branchless
(compute-and-select) so they vmap/jit cleanly over arbitrary batch shapes —
this replaces halo2curves' bn256 G1 arithmetic in the reference stack
(reference: halo2curves 0.1 at /root/reference/Cargo.toml:41; consumed by
scroll-tech/halo2's MSM backend).

Formulas: a = 0 short Weierstrass (y^2 = x^3 + 3), dbl-2009-l and
add-2007-bl from the EFD, with complete-case selection on top.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import fq_spec, fr_spec


class G1(NamedTuple):
    """Jacobian point batch: x/y/z are (..., 16) uint32 Montgomery Fq limbs."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


FQ = fq_spec()
FR = fr_spec()


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def identity(batch_shape=()) -> G1:
    one = jnp.broadcast_to(jnp.asarray(FQ.mont_one), batch_shape + (ff.L,))
    zero = jnp.zeros(batch_shape + (ff.L,), jnp.uint32)
    return G1(one, one, zero)


def from_affine_ints(pts) -> G1:
    """List of (x, y) int tuples (None = infinity) -> batched Jacobian G1."""
    xs, ys, zs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append(FQ.mont_one)
            ys.append(FQ.mont_one)
            zs.append(FQ.zero)
        else:
            xs.append(FQ.encode(pt[0]))
            ys.append(FQ.encode(pt[1]))
            zs.append(FQ.mont_one)
    return G1(jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)), jnp.asarray(np.stack(zs)))


def to_affine_ints(p: G1) -> list:
    """Batched Jacobian G1 -> list of (x, y) int tuples (None = infinity)."""
    x = np.asarray(p.x).reshape(-1, ff.L)
    y = np.asarray(p.y).reshape(-1, ff.L)
    z = np.asarray(p.z).reshape(-1, ff.L)
    out = []
    for i in range(x.shape[0]):
        zi = FQ.decode(z[i])
        if zi == 0:
            out.append(None)
            continue
        zinv = pow(zi, -1, FQ.modulus)
        xi = FQ.decode(x[i]) * zinv * zinv % FQ.modulus
        yi = FQ.decode(y[i]) * zinv * zinv * zinv % FQ.modulus
        out.append((xi, yi))
    return out


def is_identity(p: G1):
    return ff.is_zero(p.z)


# ---------------------------------------------------------------------------
# Group law (branchless, batched)
# ---------------------------------------------------------------------------

def double(p: G1) -> G1:
    """dbl-2009-l (a = 0). Identity doubles to identity for free (Z3 = 2YZ)."""
    s = FQ
    a = ff.sqr(s, p.x)
    b = ff.sqr(s, p.y)
    c = ff.sqr(s, b)
    d = ff.sqr(s, ff.add(s, p.x, b))
    d = ff.sub(s, ff.sub(s, d, a), c)
    d = ff.add(s, d, d)
    e = ff.add(s, ff.add(s, a, a), a)
    f = ff.sqr(s, e)
    x3 = ff.sub(s, f, ff.add(s, d, d))
    c8 = ff.mul_pow2(s, c, 3)
    y3 = ff.sub(s, ff.mont_mul(s, e, ff.sub(s, d, x3)), c8)
    yz = ff.mont_mul(s, p.y, p.z)
    z3 = ff.add(s, yz, yz)
    return G1(x3, y3, z3)


def add(p: G1, q: G1) -> G1:
    """Complete batched addition: generic add-2007-bl + doubling + identity
    cases fused with selects. ~16 field muls (incl. squarings) per lane."""
    s = FQ
    z1z1 = ff.sqr(s, p.z)
    z2z2 = ff.sqr(s, q.z)
    u1 = ff.mont_mul(s, p.x, z2z2)
    u2 = ff.mont_mul(s, q.x, z1z1)
    s1 = ff.mont_mul(s, ff.mont_mul(s, p.y, q.z), z2z2)
    s2 = ff.mont_mul(s, ff.mont_mul(s, q.y, p.z), z1z1)
    h = ff.sub(s, u2, u1)
    r = ff.sub(s, s2, s1)
    r = ff.add(s, r, r)

    i = ff.sqr(s, ff.add(s, h, h))
    j = ff.mont_mul(s, h, i)
    v = ff.mont_mul(s, u1, i)
    r2 = ff.sqr(s, r)
    x3 = ff.sub(s, ff.sub(s, r2, j), ff.add(s, v, v))
    s1j = ff.mont_mul(s, s1, j)
    y3 = ff.sub(s, ff.mont_mul(s, r, ff.sub(s, v, x3)), ff.add(s, s1j, s1j))
    zz = ff.sqr(s, ff.add(s, p.z, q.z))
    z3 = ff.mont_mul(s, ff.sub(s, ff.sub(s, zz, z1z1), z2z2), h)
    generic = G1(x3, y3, z3)

    # Case selection (all boolean arrays over the batch shape).
    p_inf = is_identity(p)
    q_inf = is_identity(q)
    h_zero = ff.is_zero(h)
    r_zero = ff.is_zero(r)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    dbl = double(p)
    inf = identity(p.batch_shape)

    def pick(ga, da, pa, qa, ia):
        out = ga
        out = ff.select(same, da, out)
        out = ff.select(opposite, ia, out)
        out = ff.select(p_inf, qa, out)
        out = ff.select(q_inf & ~p_inf, pa, out)
        return out

    return G1(
        pick(generic.x, dbl.x, p.x, q.x, inf.x),
        pick(generic.y, dbl.y, p.y, q.y, inf.y),
        pick(generic.z, dbl.z, p.z, q.z, inf.z),
    )


def neg(p: G1) -> G1:
    return G1(p.x, ff.neg(FQ, p.y), p.z)


def select(cond, p: G1, q: G1) -> G1:
    """Where cond (batch-shaped bool), take p, else q."""
    return G1(
        ff.select(cond, p.x, q.x),
        ff.select(cond, p.y, q.y),
        ff.select(cond, p.z, q.z),
    )


def scalar_mul_scan(p: G1, scalar_limbs) -> G1:
    """Double-and-add via ``lax.scan`` — for use INSIDE an enclosing jit
    (sharded steps, TPU bench loops). Do not call eagerly in a loop: an
    eager lax.scan re-lowers its body every call."""
    bits = ff.scalar_bits(jnp.asarray(scalar_limbs, jnp.uint32))
    batch = jnp.broadcast_shapes(p.batch_shape, bits.shape[:-1])
    acc = identity(batch)
    base = G1(
        jnp.broadcast_to(p.x, batch + (ff.L,)),
        jnp.broadcast_to(p.y, batch + (ff.L,)),
        jnp.broadcast_to(p.z, batch + (ff.L,)),
    )
    # xor-with-derived-zero keeps values but inherits shard_map varying
    # axes from the inputs (fresh constants break scan carry typing there)
    zd = jnp.broadcast_to(p.x[..., :1] ^ p.x[..., :1], batch + (ff.L,))
    acc = G1(acc.x ^ zd, acc.y ^ zd, acc.z ^ zd)
    bits_t = jnp.moveaxis(bits, -1, 0)  # (256, ...batch)

    def body(carry, bit):
        acc, base = carry
        acc = select(bit != 0, add(acc, base), acc)
        return (acc, double(base)), None

    (acc, _), _ = jax.lax.scan(body, (acc, base), bits_t)
    return acc


def scalar_mul(p: G1, scalar_limbs) -> G1:
    """Double-and-add over 256 scalar bits (scalars in standard-form limbs).

    Eager composition: 256 iterations dispatching the CACHED jitted
    add/double executables. This is deliberate — compiling the whole loop
    as one graph puts ~100k HLO ops in one XLA module and compile time
    explodes; eager dispatch of small cached units costs only ~ms each.
    """
    bits = np.asarray(ff.scalar_bits(jnp.asarray(scalar_limbs, jnp.uint32)))
    batch = jnp.broadcast_shapes(p.batch_shape, bits.shape[:-1])
    acc = identity(batch)
    base = G1(
        jnp.broadcast_to(p.x, batch + (ff.L,)),
        jnp.broadcast_to(p.y, batch + (ff.L,)),
        jnp.broadcast_to(p.z, batch + (ff.L,)),
    )
    bits = jnp.asarray(bits)
    for b in range(256):
        acc = select(bits[..., b] != 0, add(acc, base), acc)
        if b != 255:
            base = double(base)
    return acc


_TREE_BASE = 32  # lanes reduced by the in-jit unrolled tree


def _pad_pow2(p: G1, n: int) -> tuple:
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = identity((m - n,) + p.batch_shape[1:])
        p = G1(
            jnp.concatenate([p.x, pad.x], axis=0),
            jnp.concatenate([p.y, pad.y], axis=0),
            jnp.concatenate([p.z, pad.z], axis=0),
        )
    return p, m


def sum_reduce(p: G1) -> G1:
    """Reduce a (N, ...) point batch along axis 0 to a (1, ...) batch.

    Eager halving tree: log2(N) dispatches of the cached jitted `add`
    (never one giant compiled graph — see scalar_mul's rationale).
    """
    p, m = _pad_pow2(p, p.x.shape[0])
    while m > 1:
        m //= 2
        p = add(
            G1(p.x[:m], p.y[:m], p.z[:m]),
            G1(p.x[m:], p.y[m:], p.z[m:]),
        )
    return p


def sum_reduce_scan(p: G1) -> G1:
    """sum_reduce for use INSIDE an enclosing jit: lax.scan over
    _TREE_BASE-lane blocks + a small unrolled tree."""
    n = p.x.shape[0]
    b = _TREE_BASE
    if n > b:
        pad_n = (-n) % b
        if pad_n:
            pad = identity((pad_n,) + p.batch_shape[1:])
            p = G1(
                jnp.concatenate([p.x, pad.x], axis=0),
                jnp.concatenate([p.y, pad.y], axis=0),
                jnp.concatenate([p.z, pad.z], axis=0),
            )
        blocks = G1(
            p.x.reshape((-1, b) + p.x.shape[1:]),
            p.y.reshape((-1, b) + p.y.shape[1:]),
            p.z.reshape((-1, b) + p.z.shape[1:]),
        )
        init = identity((b,) + p.batch_shape[1:])
        zd = jnp.broadcast_to(
            p.x[:1, ..., :1] ^ p.x[:1, ..., :1], init.x.shape
        )  # shard_map varying-axis inheritance (see scalar_mul_scan)
        init = G1(init.x ^ zd, init.y ^ zd, init.z ^ zd)

        def body(acc, blk):
            return add(acc, G1(*blk)), None

        acc, _ = jax.lax.scan(body, init, (blocks.x, blocks.y, blocks.z))
        p = acc
        n = b
    p, m = _pad_pow2(p, n)
    while m > 1:
        m //= 2
        p = add(
            G1(p.x[:m], p.y[:m], p.z[:m]),
            G1(p.x[m:], p.y[m:], p.z[m:]),
        )
    return p


# jit wrappers (see zkevm_tpu/ff/limbs.py rationale): ONLY the small
# primitive units are jitted — composites (scalar_mul, sum_reduce, MSM)
# compose them eagerly so no single XLA module exceeds a few thousand ops.
add = jax.jit(add)
double = jax.jit(double)
neg = jax.jit(neg)
