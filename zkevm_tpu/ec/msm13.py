"""Sort + prefix-sum MSM over the lazy 13-bit field core (ff/lazy13.py).

Reference role: halo2 `best_multiexp` (the per-column commitment inside
create_proof). Same outer algorithm as ec/psmsm.py (sort per c-bit
window, group prefix-scan of mixed adds, bucket sums recovered from
prefix values at the B-1 digit boundaries), but the field layer is the
MXU-hybrid lazy-13 design:

- every field mul = 441 VPU u32 muls (schoolbook columns) + ONE constant
  uint8 matmul on the MXU (the entire modular reduction);
- the madd's formula constants (j = 4h^3, x3 = 4rh^2 - j - 2v, ...) fold
  into the reduction matrices as signed scales, so several adds/subs and
  whole reduction passes disappear (combine_reduce);
- identity is an explicit per-lane bool (no z==0 sentinel tests);
- the cannot-happen doubling/opposite cases (a DL relation between SRS
  points) are detected EXACTLY via lazy zero-tests and surfaced as a
  flag for the caller to fall back on, as in psmsm.

Layout: coordinates (21, ...) uint32 13-bit limbs in STANDARD (non-
Montgomery) form — lazy13 reduction needs no Montgomery factor. The
class wrapper converts from/to the u16-limb Montgomery world once per
SRS / result.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import lazy13 as lz
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.lazy13 import (L13, add13, canon13, combine_reduce,
                                 is_zero13, mul13, prod_T, select13, sqr13,
                                 sqr_T, sub13)

LZ = lz.ctx_fq()


class G1L(NamedTuple):
    """Jacobian point batch in lazy-13 coords + explicit identity flag."""
    x: jnp.ndarray  # (21, ...)
    y: jnp.ndarray
    z: jnp.ndarray
    inf: jnp.ndarray  # bool (...)

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def identity_l(batch_shape) -> G1L:
    one = jnp.zeros((L13,) + tuple(batch_shape), jnp.uint32).at[0].set(1)
    zero = jnp.zeros((L13,) + tuple(batch_shape), jnp.uint32)
    return G1L(one, one, zero, jnp.ones(tuple(batch_shape), bool))


def select_l(cond, p: G1L, q: G1L) -> G1L:
    return G1L(select13(cond, p.x, q.x), select13(cond, p.y, q.y),
               select13(cond, p.z, q.z), jnp.where(cond, p.inf, q.inf))


def madd_l(p: G1L, qx, qy):
    """Mixed add p += affine (qx, qy) (leaf never identity).

    madd-2007-bl in ROW SPACE (per-limb row lists, single-fusion
    elementwise chains) with fused signed-scaled reductions; returns
    (result, dbl_flag). dbl_flag fires iff p == (qx, qy) on some lane
    (caller falls back)."""
    x1, y1, z1 = lz.to_rows(p.x), lz.to_rows(p.y), lz.to_rows(p.z)
    qxr, qyr = lz.to_rows(qx), lz.to_rows(qy)
    z1z1_T = lz.sqr_T_r(z1)
    z1z1 = lz.combine_reduce_r(LZ, [(z1z1_T, 1)])
    u2 = lz.mul13_r(LZ, qxr, z1z1)
    t = lz.mul13_r(LZ, qyr, z1)
    s2 = lz.mul13_r(LZ, t, z1z1)
    h = lz.sub13_r(LZ, u2, x1)
    hh_T = lz.sqr_T_r(h)
    hh = lz.combine_reduce_r(LZ, [(hh_T, 1)])
    hhh_T = lz.prod_T_r(h, hh)
    j = lz.combine_reduce_r(LZ, [(hhh_T, 4)])          # j = 4 h^3
    v_T = lz.prod_T_r(x1, hh)
    v = lz.combine_reduce_r(LZ, [(v_T, 4)])            # v = 4 x1 h^2
    rh = lz.sub13_r(LZ, s2, y1)                        # r = 2 rh
    x3 = lz.combine_reduce_r(
        LZ, [(lz.sqr_T_r(rh), 4), (hhh_T, -4), (v_T, -8)])
    vmx = lz.sub13_r(LZ, v, x3)
    # y3 = r(v - x3) - 2*y1*j with r = 2*rh
    y3 = lz.combine_reduce_r(
        LZ, [(lz.prod_T_r(rh, vmx), 2), (lz.prod_T_r(y1, j), -2)])
    zh = lz.add13_r(LZ, z1, h)
    z3 = lz.combine_reduce_r(
        LZ, [(lz.sqr_T_r(zh), 1), (z1z1_T, -1), (hh_T, -1)])

    h_zero = lz.is_zero13_r(LZ, h)
    r_zero = lz.is_zero13_r(LZ, rh)
    same = h_zero & r_zero & ~p.inf
    opposite = h_zero & ~r_zero & ~p.inf

    def sel(cond, leaf_r, out_r, one0=False):
        rows = []
        for l in range(lz.L13):
            lv = leaf_r[l] if not one0 else (
                jnp.ones_like(out_r[l]) if l == 0 else
                jnp.zeros_like(out_r[l]))
            rows.append(jnp.where(cond, lv, out_r[l]))
        return jnp.stack(rows, axis=0)

    x_out = sel(p.inf, qxr, x3)
    y_out = sel(p.inf, qyr, y3)
    z_out = sel(p.inf, None, z3, one0=True)
    return (G1L(x_out, y_out, z_out, opposite),
            same.any().astype(jnp.uint32))


def add_l(p: G1L, q: G1L):
    """Full Jacobian add (merge/boundary stages; lower volume).

    add-2007-bl in row space with fused reductions, complete via flag
    selects; returns (result, dbl_flag)."""
    x1, y1, z1 = lz.to_rows(p.x), lz.to_rows(p.y), lz.to_rows(p.z)
    x2, y2, z2 = lz.to_rows(q.x), lz.to_rows(q.y), lz.to_rows(q.z)
    z1z1_T = lz.sqr_T_r(z1)
    z2z2_T = lz.sqr_T_r(z2)
    z1z1 = lz.combine_reduce_r(LZ, [(z1z1_T, 1)])
    z2z2 = lz.combine_reduce_r(LZ, [(z2z2_T, 1)])
    u1 = lz.mul13_r(LZ, x1, z2z2)
    u2 = lz.mul13_r(LZ, x2, z1z1)
    s1 = lz.mul13_r(LZ, lz.mul13_r(LZ, y1, z2), z2z2)
    s2 = lz.mul13_r(LZ, lz.mul13_r(LZ, y2, z1), z1z1)
    h = lz.sub13_r(LZ, u2, u1)
    rh = lz.sub13_r(LZ, s2, s1)                        # r = 2 rh
    hh_T = lz.sqr_T_r(h)
    hh = lz.combine_reduce_r(LZ, [(hh_T, 1)])
    hhh_T = lz.prod_T_r(h, hh)
    j = lz.combine_reduce_r(LZ, [(hhh_T, 4)])          # j = 4 h^3
    v_T = lz.prod_T_r(u1, hh)
    v = lz.combine_reduce_r(LZ, [(v_T, 4)])            # v = u1 * i
    x3 = lz.combine_reduce_r(
        LZ, [(lz.sqr_T_r(rh), 4), (hhh_T, -4), (v_T, -8)])
    vmx = lz.sub13_r(LZ, v, x3)
    # y3 = r(v - x3) - 2*s1*j with r = 2*rh
    y3 = lz.combine_reduce_r(
        LZ, [(lz.prod_T_r(rh, vmx), 2), (lz.prod_T_r(s1, j), -2)])
    zh = lz.add13_r(LZ, z1, z2)
    zzt = lz.combine_reduce_r(
        LZ, [(lz.sqr_T_r(zh), 1), (z1z1_T, -1), (z2z2_T, -1)])
    z3 = lz.mul13_r(LZ, zzt, h)

    h_zero = lz.is_zero13_r(LZ, h)
    r_zero = lz.is_zero13_r(LZ, rh)
    both = ~p.inf & ~q.inf
    same = h_zero & r_zero & both
    opposite = h_zero & ~r_zero & both

    out = G1L(lz.from_rows(x3), lz.from_rows(y3), lz.from_rows(z3),
              opposite)
    out = select_l(p.inf, q, out)
    out = select_l(q.inf & ~p.inf, p, out)
    return out, same.any().astype(jnp.uint32)


def add_l_e(p: G1L, q: G1L):
    """Full Jacobian add returning the ELEMENTWISE doubling flag (bool,
    batch-shaped) — the associative-scan combine needs per-lane flags."""
    out, _ = add_l(p, q)
    # re-derive `same` elementwise: h = u2-u1, rh = s2-s1 recomputed is
    # as costly as the add; instead detect the add's degenerate output:
    # add-2007-bl yields z3 = ((z1+z2)^2-z1z1-z2z2)*h = 2*z1*z2*h, which
    # is 0 iff h == 0 (inputs non-identity); same = z3==0 & !opposite
    # (opposite sets the out.inf flag), masked to both-real lanes
    both = ~p.inf & ~q.inf
    z3_zero = is_zero13(LZ, out.z)
    return out, (z3_zero & ~out.inf & both)


def double_l(p: G1L) -> G1L:
    """Jacobian doubling (dbl-2009-l) in row space, fused reductions."""
    x, y, z = lz.to_rows(p.x), lz.to_rows(p.y), lz.to_rows(p.z)
    a_T = lz.sqr_T_r(x)
    a = lz.combine_reduce_r(LZ, [(a_T, 1)])
    b_T = lz.sqr_T_r(y)
    b = lz.combine_reduce_r(LZ, [(b_T, 1)])
    c_T = lz.sqr_T_r(b)
    # d = 2((x+b)^2 - a - c)
    xb = lz.add13_r(LZ, x, b)
    d = lz.combine_reduce_r(
        LZ, [(lz.sqr_T_r(xb), 2), (a_T, -2), (c_T, -2)])
    e = lz.combine_reduce_r(LZ, [(a_T, 3)])            # e = 3a
    x3 = lz.combine_reduce_r(LZ, [(lz.sqr_T_r(e), 1)])
    x3 = lz.sub13_r(LZ, x3, lz.add13_r(LZ, d, d))
    dmx = lz.sub13_r(LZ, d, x3)
    y3 = lz.combine_reduce_r(
        LZ, [(lz.prod_T_r(e, dmx), 1), (c_T, -8)])
    z3 = lz.combine_reduce_r(LZ, [(lz.prod_T_r(y, z), 2)])
    return G1L(lz.from_rows(x3), lz.from_rows(y3), lz.from_rows(z3), p.inf)


def _searchsorted_rows(sd, B):
    """(G, N) sorted digits -> (G, B-1) position of last element < t."""
    t = jnp.arange(1, B, dtype=sd.dtype)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, t, side="left"))(sd)
    return pos.astype(jnp.int32) - 1


@partial(jax.jit, static_argnums=(3,))
def _window_sums(px, py, sd, c):
    """px, py: (21, G, Lw, S) sorted affine leaves; sd: (G, N) sorted
    digits -> window sums as (x, y, z, inf) over (G,) + dbl flag."""
    L, G, Lw, S = px.shape
    B = 1 << c

    def step(carry, leaf):
        acc, flag = carry
        new, f = madd_l(acc, leaf[0], leaf[1])
        return (new, flag | f), (new.x, new.y, new.z)

    init = (identity_l((G, Lw)), jnp.uint32(0))
    leaves = (jnp.moveaxis(px, 3, 0), jnp.moveaxis(py, 3, 0))
    (totals, flag), outs = jax.lax.scan(step, init, leaves)
    wx = jnp.moveaxis(outs[0], 0, 3).reshape(L, G, Lw * S)
    wy = jnp.moveaxis(outs[1], 0, 3).reshape(L, G, Lw * S)
    wz = jnp.moveaxis(outs[2], 0, 3).reshape(L, G, Lw * S)
    # prefix values after >= 1 real leaf: never identity for honest input

    # --- exclusive lane offsets + grand totals ---------------------------
    # Two-level blocked scan over the Lw lane axis: within-block
    # exclusive scans (batch G*A) then a scan of block totals (batch
    # G*1), then one full-batch combine — ~2*sqrt(Lw) sequential bodies
    # instead of Lw (the old per-lane loop was the MSM's dominant
    # wall-clock term at k=20: 4096 tiny dispatches/pass). Both levels
    # are lax.scan, so the compiled graph stays COMPACT (an unrolled
    # log-depth associative scan blew XLA's compile memory).
    A = 1
    while A * A < Lw:
        A *= 2
    Bz = Lw // A  # Lw = A blocks of Bz lanes

    def exscan(x, y, z, nblk, blen):
        """Exclusive prefix scan of (L, G, nblk, blen) over blen.
        Returns (offsets (L,G,nblk,blen), totals (L,G,nblk), flag)."""
        def step(carry, lane):
            acc, fl = carry
            prev = acc
            lx, ly, lzz = lane
            new, f = add_l(acc, G1L(lx, ly, lzz,
                                    jnp.zeros(lx.shape[1:], bool)))
            return (new, fl | f), (prev.x, prev.y, prev.z, prev.inf)

        init = (identity_l((G, nblk)), jnp.uint32(0))
        lanes_in = (jnp.moveaxis(x, 3, 0), jnp.moveaxis(y, 3, 0),
                    jnp.moveaxis(z, 3, 0))
        (tot, f), offs = jax.lax.scan(step, init, lanes_in)
        return (G1L(jnp.moveaxis(offs[0], 0, 3),
                    jnp.moveaxis(offs[1], 0, 3),
                    jnp.moveaxis(offs[2], 0, 3),
                    jnp.moveaxis(offs[3], 0, 2)), tot, f)

    tx_ = totals.x.reshape(L, G, A, Bz)
    ty_ = totals.y.reshape(L, G, A, Bz)
    tz_ = totals.z.reshape(L, G, A, Bz)
    within_o, blk_tot, f1 = exscan(tx_, ty_, tz_, A, Bz)
    blk_o, grand1, f2 = exscan(
        blk_tot.x[:, :, None], blk_tot.y[:, :, None],
        blk_tot.z[:, :, None], 1, A)
    grand = G1L(grand1.x[:, :, 0], grand1.y[:, :, 0], grand1.z[:, :, 0],
                grand1.inf[:, 0])
    # off[lane a*Bz+b] = blk_off[a] + within_off[a, b] (one batched add)
    bo_b = G1L(
        jnp.broadcast_to(blk_o.x[:, :, 0, :, None], (L, G, A, Bz)),
        jnp.broadcast_to(blk_o.y[:, :, 0, :, None], (L, G, A, Bz)),
        jnp.broadcast_to(blk_o.z[:, :, 0, :, None], (L, G, A, Bz)),
        jnp.broadcast_to(blk_o.inf[:, 0, :, None], (G, A, Bz)))
    off_full, f3 = add_l(bo_b, within_o)
    flag = flag | f1 | f2 | f3
    ox = off_full.x.reshape(L, G, Lw)
    oy = off_full.y.reshape(L, G, Lw)
    oz = off_full.z.reshape(L, G, Lw)
    oinf = off_full.inf.reshape(G, Lw)

    # --- PS at the B-1 boundary positions --------------------------------
    pos = _searchsorted_rows(sd, B)     # (G, B-1); -1 => identity prefix
    is_neg = pos < 0
    posc = jnp.maximum(pos, 0)
    lane_idx = (posc // S).astype(jnp.int32)

    def gat(a, idx):
        return jax.vmap(lambda ag, ig: jnp.take(ag, ig, axis=1),
                        in_axes=(1, 0), out_axes=1)(a, idx)

    within = G1L(gat(wx, posc), gat(wy, posc), gat(wz, posc),
                 jnp.zeros(posc.shape, bool))
    offp = G1L(gat(ox, lane_idx), gat(oy, lane_idx), gat(oz, lane_idx),
               jnp.take_along_axis(oinf, lane_idx, axis=1))
    ps, f = add_l(offp, within)
    flag = flag | f
    ps = select_l(is_neg, identity_l(ps.batch_shape), ps)

    # --- sum over boundaries: pure log-depth tree ------------------------
    K = B - 1
    m_ = 1
    while m_ < K:
        m_ *= 2
    pad = m_ - K

    def padded(a, fill=0):
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
        return jnp.pad(a, cfg, constant_values=fill)

    bacc = G1L(padded(ps.x), padded(ps.y), padded(ps.z),
               padded(ps.inf, True))
    while m_ > 1:
        m_ //= 2
        bacc, f = add_l(
            G1L(bacc.x[:, :, :m_], bacc.y[:, :, :m_], bacc.z[:, :, :m_],
                bacc.inf[:, :m_]),
            G1L(bacc.x[:, :, m_:], bacc.y[:, :, m_:], bacc.z[:, :, m_:],
                bacc.inf[:, m_:]))
        flag = flag | f
    s_sum = G1L(bacc.x[:, :, 0], bacc.y[:, :, 0], bacc.z[:, :, 0],
                bacc.inf[:, 0])

    # --- G_w = (B-1) * Total - s_sum --------------------------------------
    def dstep(carry, _):
        (acc, cur), fl = carry
        acc, f = add_l(acc, cur)
        return ((acc, double_l(cur)), fl | f), None

    ((bt, _), flag), _ = jax.lax.scan(
        dstep, ((identity_l((G,)), grand), flag), None, length=c)
    neg_y = sub13(LZ, jnp.zeros_like(s_sum.y), s_sum.y)
    gw, f = add_l(bt, G1L(s_sum.x, neg_y, s_sum.z, s_sum.inf))
    flag = flag | f
    return gw.x, gw.y, gw.z, gw.inf, flag


def msm13(ax13, ay13, scalars, c: int = 16, num_bits: int = 254,
          lanes: int = 4096, wgroup: int = 8):
    """Variable-base MSM over AFFINE lazy-13 points.

    ax13, ay13: (21, N) standard-form 13-bit limbs (no infinities);
    scalars: (N, 16) standard-form u16 limbs. Returns ((x, y, z, inf)
    lazy-13 Jacobian with batch (1,), dbl_flag)."""
    scalars = jnp.asarray(scalars, jnp.uint32)
    n = ax13.shape[1]
    W = (num_bits + c - 1) // c
    Lw = min(lanes, n)
    while n % Lw:
        Lw //= 2
    S = n // Lw

    digits = jnp.stack([ff.scalar_window(scalars, w, c) for w in range(W)])
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], (W, n))
    sd, perm = jax.lax.sort((digits, iota), dimension=1, num_keys=1)

    gx_all, gy_all, gz_all, gi_all = [], [], [], []
    flag = jnp.uint32(0)
    for g0 in range(0, W, wgroup):
        g1 = min(g0 + wgroup, W)
        pg = perm[g0:g1].reshape(-1)
        px = jnp.take(ax13, pg, axis=1).reshape(L13, g1 - g0, Lw, S)
        py = jnp.take(ay13, pg, axis=1).reshape(L13, g1 - g0, Lw, S)
        gx, gy, gz, gi, f = _window_sums(px, py, sd[g0:g1], c)
        gx_all.append(gx)
        gy_all.append(gy)
        gz_all.append(gz)
        gi_all.append(gi)
        flag = flag | f

    gx = jnp.concatenate(gx_all, axis=1)
    gy = jnp.concatenate(gy_all, axis=1)
    gz = jnp.concatenate(gz_all, axis=1)
    gi = jnp.concatenate(gi_all, axis=0)
    acc, f = _horner_full(gx, gy, gz, gi, c)
    return acc, flag | f


@partial(jax.jit, static_argnums=(4,))
def _horner_full(gx, gy, gz, gi, c):
    def hstep(carry, sw):
        acc, fl = carry
        for _ in range(c):
            acc = double_l(acc)
        new, f = add_l(acc, G1L(sw[0][:, None], sw[1][:, None],
                                sw[2][:, None], sw[3][None]))
        return (new, fl | f), None

    init = (identity_l((1,)), jnp.uint32(0))
    (acc, flag), _ = jax.lax.scan(
        hstep, init,
        (jnp.moveaxis(gx[:, ::-1], 1, 0), jnp.moveaxis(gy[:, ::-1], 1, 0),
         jnp.moveaxis(gz[:, ::-1], 1, 0), gi[::-1]))
    return acc, flag


class Msm13:
    """Fixed-bases wrapper over u16-Montgomery G1T points: converts the
    SRS to lazy-13 affine once; exposes scalars -> G1T commitment with
    pippenger fallback on the (never-in-practice) doubling flag."""

    def __init__(self, points_t, c: int = 16, lanes: int = 4096,
                 wgroup: int = 8):
        from zkevm_tpu.ec.psmsm import to_affine_t

        ax, ay = to_affine_t(points_t)  # u16 Montgomery affine
        one_raw = jnp.asarray(ff.fq_spec().one_raw)[:, None]
        ax_std = ff.mont_mul_t(ff.fq_spec(), ax, one_raw, unroll=False)
        ay_std = ff.mont_mul_t(ff.fq_spec(), ay, one_raw, unroll=False)
        self.ax13 = lz.from_u16_t(ax_std)
        self.ay13 = lz.from_u16_t(ay_std)
        self.points = points_t
        self.c = c
        self.lanes = lanes
        self.wgroup = wgroup
        self.n = points_t.x.shape[1]

    def __call__(self, scalars):
        from zkevm_tpu.ec.group_t import G1T

        acc, flag = msm13(self.ax13, self.ay13, scalars, c=self.c,
                          lanes=self.lanes, wgroup=self.wgroup)
        if int(np.asarray(flag)):  # pragma: no cover — DL-relation event
            from zkevm_tpu.ec.pippenger import msm_t

            return msm_t(self.points, scalars)
        return to_g1t(acc)


def to_g1t(p: G1L):
    """Lazy-13 Jacobian -> u16-limb Montgomery G1T (identity -> z=0)."""
    from zkevm_tpu.ec.group_t import G1T

    FQ = ff.fq_spec()
    r2 = jnp.asarray(FQ.r2_limbs)[:, None]

    def conv(a):
        a16 = lz.to_u16_t(canon13(LZ, a))
        return ff.mont_mul_t(FQ, a16, r2, unroll=False)

    x, y, z = conv(p.x), conv(p.y), conv(p.z)
    z = jnp.where(p.inf[None], jnp.zeros_like(z), z)
    one = jnp.asarray(FQ.mont_one)[:, None]
    x = jnp.where(p.inf[None], jnp.broadcast_to(one, x.shape), x)
    y = jnp.where(p.inf[None], jnp.broadcast_to(one, y.shape), y)
    return G1T(x, y, z)
