"""Limbs-first (transposed) G1 arithmetic + single-jit windowed MSM.

TPU hot path for commitments: the (N, 16) eager-composed MSM in ec/msm.py
is dispatch-bound on TPU (hundreds of small kernel launches); this module
keeps coordinates as (16, ...) arrays (batch in the vector lanes) and runs
the whole windowed MSM as ONE jitted program — gather, blocked scan
reduction and Horner — with the scan-CIOS multiplier keeping the compiled
module small. Same math as ec/group.py (add-2007-bl / dbl-2009-l with
complete-case selects); reference role: halo2 best_multiexp.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import add_t, fq_spec, mont_mul_t, sub_t

FQ = fq_spec()
# scan-CIOS keeps the single-jit MSM module compilable on XLA:CPU;
# ZKEVM_TPU_UNROLL_EC=1 switches to the straight-line CIOS (TPU bench)
UNROLL = os.environ.get("ZKEVM_TPU_UNROLL_EC", "0") == "1"


def _mul(a, b):
    return mont_mul_t(FQ, a, b, unroll=UNROLL)


def _sqr(a):
    return _mul(a, a)


class G1T(NamedTuple):
    x: jnp.ndarray  # (16, ...)
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity_t(batch_shape, like=None) -> G1T:
    one = jnp.asarray(FQ.mont_one).reshape((ff.L,) + (1,) * len(batch_shape))
    one = jnp.broadcast_to(one, (ff.L,) + tuple(batch_shape))
    zero = jnp.zeros((ff.L,) + tuple(batch_shape), jnp.uint32)
    if like is not None:  # inherit shard_map varying axes via a derived 0
        # [:1].sum() instead of [0]: stays valid on zero-length batches
        # (associative_scan calls combines on empty odd-split slices)
        zd = (like ^ like).ravel()[:1].sum(dtype=jnp.uint32)
        one, zero = one ^ zd, zero ^ zd
    return G1T(one, one, zero)


def from_g1(p) -> G1T:
    return G1T(
        jnp.moveaxis(p.x, -1, 0), jnp.moveaxis(p.y, -1, 0), jnp.moveaxis(p.z, -1, 0)
    )


def to_g1(p: G1T):
    from zkevm_tpu.ec.group import G1

    return G1(
        jnp.moveaxis(p.x, 0, -1), jnp.moveaxis(p.y, 0, -1), jnp.moveaxis(p.z, 0, -1)
    )


def is_identity_t(p: G1T):
    return jnp.all(p.z == 0, axis=0)


def _select(cond, a, b):
    return jnp.where(cond[None], a, b)


def select_t(cond, p: G1T, q: G1T) -> G1T:
    return G1T(_select(cond, p.x, q.x), _select(cond, p.y, q.y), _select(cond, p.z, q.z))


def double_t(p: G1T) -> G1T:
    a = _sqr(p.x)
    b = _sqr(p.y)
    c = _sqr(b)
    d = _sqr(add_t(FQ, p.x, b))
    d = sub_t(FQ, sub_t(FQ, d, a), c)
    d = add_t(FQ, d, d)
    e = add_t(FQ, add_t(FQ, a, a), a)
    f = _sqr(e)
    x3 = sub_t(FQ, f, add_t(FQ, d, d))
    c2 = add_t(FQ, c, c)
    c4 = add_t(FQ, c2, c2)
    c8 = add_t(FQ, c4, c4)
    y3 = sub_t(FQ, _mul(e, sub_t(FQ, d, x3)), c8)
    yz = _mul(p.y, p.z)
    z3 = add_t(FQ, yz, yz)
    return G1T(x3, y3, z3)


def add_pt(p: G1T, q: G1T) -> G1T:
    z1z1 = _sqr(p.z)
    z2z2 = _sqr(q.z)
    u1 = _mul(p.x, z2z2)
    u2 = _mul(q.x, z1z1)
    s1 = _mul(_mul(p.y, q.z), z2z2)
    s2 = _mul(_mul(q.y, p.z), z1z1)
    h = sub_t(FQ, u2, u1)
    r = sub_t(FQ, s2, s1)
    r = add_t(FQ, r, r)

    i = _sqr(add_t(FQ, h, h))
    j = _mul(h, i)
    v = _mul(u1, i)
    r2 = _sqr(r)
    x3 = sub_t(FQ, sub_t(FQ, r2, j), add_t(FQ, v, v))
    s1j = _mul(s1, j)
    y3 = sub_t(FQ, _mul(r, sub_t(FQ, v, x3)), add_t(FQ, s1j, s1j))
    zz = _sqr(add_t(FQ, p.z, q.z))
    z3 = _mul(sub_t(FQ, sub_t(FQ, zz, z1z1), z2z2), h)

    p_inf = is_identity_t(p)
    q_inf = is_identity_t(q)
    h_zero = jnp.all(h == 0, axis=0)
    r_zero = jnp.all(r == 0, axis=0)
    same = h_zero & r_zero & ~p_inf & ~q_inf
    opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

    dbl = double_t(p)
    inf = identity_t(p.batch_shape, like=p.x)

    out = G1T(x3, y3, z3)
    out = select_t(same, dbl, out)
    out = select_t(opposite, inf, out)
    out = select_t(p_inf, q, out)
    out = select_t(q_inf & ~p_inf, p, out)
    return out


class FixedBaseMSMT:
    """Windowed fixed-base MSM, limbs-first, one jitted program per call
    shape. Table: d*P_i for d < 2^c, coords (16, N, 2^c)."""

    def __init__(self, points_t: G1T, c: int = 4, block: int = 256):
        assert 256 % c == 0
        self.c = c
        self.num_windows = 256 // c
        self.n = points_t.x.shape[1]
        self.block = min(block, self.n)
        assert self.n % self.block == 0
        entries = [identity_t((self.n,)), points_t]
        for _ in range(2, 1 << c):
            entries.append(add_pt(entries[-1], points_t))
        self.table = G1T(
            jnp.stack([e.x for e in entries], axis=2),
            jnp.stack([e.y for e in entries], axis=2),
            jnp.stack([e.z for e in entries], axis=2),
        )
        self._call = jax.jit(self._impl)

    def _impl(self, digits):
        """digits: (num_windows, N) uint32 -> G1T scalar."""
        tx, ty, tz = self.table
        nb = self.n // self.block
        b = self.block

        def window(carry, dw):
            idx = dw[None, :, None]  # (1, N, 1)
            g = G1T(
                jnp.take_along_axis(tx, idx, axis=2)[:, :, 0],
                jnp.take_along_axis(ty, idx, axis=2)[:, :, 0],
                jnp.take_along_axis(tz, idx, axis=2)[:, :, 0],
            )  # (16, N)
            # blocked reduction over N: scan blocks, then small tree
            blocks = G1T(
                g.x.reshape(ff.L, nb, b).swapaxes(0, 1),
                g.y.reshape(ff.L, nb, b).swapaxes(0, 1),
                g.z.reshape(ff.L, nb, b).swapaxes(0, 1),
            )  # (nb, 16, b)
            init = identity_t((b,), like=g.x)

            def bstep(acc, blk):
                return add_pt(acc, G1T(*blk)), None

            acc, _ = jax.lax.scan(bstep, init, (blocks.x, blocks.y, blocks.z))
            m = b
            while m > 1:
                m //= 2
                acc = add_pt(
                    G1T(acc.x[:, :m], acc.y[:, :m], acc.z[:, :m]),
                    G1T(acc.x[:, m:], acc.y[:, m:], acc.z[:, m:]),
                )
            return carry, (acc.x[:, 0], acc.y[:, 0], acc.z[:, 0])

        _, sums = jax.lax.scan(window, None, digits)
        # Horner over windows (high -> low): acc = 2^c acc + S_w
        sx, sy, sz = sums[0][::-1], sums[1][::-1], sums[2][::-1]

        def horner(acc, sw):
            for _ in range(self.c):
                acc = double_t(acc)
            return add_pt(acc, G1T(sw[0][:, None], sw[1][:, None], sw[2][:, None])), None

        acc0 = identity_t((1,), like=sx)
        acc, _ = jax.lax.scan(horner, acc0, (sx, sy, sz))
        return acc

    def __call__(self, scalars) -> G1T:
        """scalars: (N, 16) standard-form limbs -> G1T with batch (1,)."""
        scalars = jnp.asarray(scalars, jnp.uint32)
        digits = jnp.stack(
            [ff.scalar_window(scalars, w, self.c) for w in range(self.num_windows)]
        )
        return self._call(digits)
