"""Sort + prefix-sum MSM (the round-2 commitment hot path).

Reference role: halo2 `best_multiexp` (the per-column commitment inside
create_proof). Replaces ec/pippenger.py's one-hot bucket scan, whose
per-step cost is dominated by reading/writing the (W, Lw, B) bucket state
through one-hot selects — measured slower at c=8 than c=4 because the
state IO grows with 2^c.

Algorithm (per c-bit window, all windows batched on a lane axis):

1. sort the N (digit, index) pairs by digit (jax.lax.sort, batched).
2. gather the affine points into sorted order.
3. group prefix-sum PS over the sorted points, WITHOUT any bucket state:
   - lane-major split: element e -> (lane e//S, step e%S); a scan over S
     steps mixed-adds (Jacobian += affine, 11 muls) each step's leaf into
     per-lane carries, emitting the running value — N*W mixed adds total,
     the only O(N) work;
   - per-lane totals get an exclusive lane-offset scan (Lw small);
   - PS[p] = lane_offset[p//S] + within[p], assembled only at the B-1
     positions that matter.
4. bucket sums never materialize: with pos_t = searchsorted(digits, t)-1,
     G_w = sum_{b>=1} b*S_b = sum_{t=1..B-1} (Total - PS[pos_t])
         = (B-1)*Total - sum_t PS[pos_t]
   so one gather + one tree reduction replaces the weighted bucket fold.
5. Horner over windows (shared with pippenger.py).

Completeness: the mixed add handles carry=infinity exactly; the
carry==leaf (doubling) case cannot occur for honest inputs (it would
exhibit a discrete-log relation between SRS powers), but is DETECTED
in-kernel and surfaced via a flag so the caller can fall back to the
complete-add pippenger kernel — detect-and-retry instead of paying the
doubling path's 7 extra muls per add on the hot path.

Cost model at N=2^20, c=16: 16 windows x 2^20 mixed adds x 11 muls
~ 185M field muls, vs the old kernel's 64 windows x 2^20 complete adds
x ~23 muls + bucket IO.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec.group_t import G1T, add_pt, double_t, identity_t
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import add_t, fq_spec, mont_mul_t, sub_t

FQ = fq_spec()
# scan-CIOS keeps compiles sane on XLA:CPU; the unrolled straight-line
# CIOS is worth trying on the real chip (ZKEVM_TPU_UNROLL_EC=1)
UNROLL = os.environ.get("ZKEVM_TPU_UNROLL_EC", "0") == "1"


def _mul(a, b):
    return mont_mul_t(FQ, a, b, unroll=UNROLL)


def _sqr(a):
    return _mul(a, a)


def to_affine_t(p: G1T):
    """Jacobian (16, N) -> affine (x, y) (16, N) via batched Fermat
    inversion (one-time setup cost; identity points are rejected)."""
    zinv = ff.inv(FQ, jnp.moveaxis(p.z, 0, -1))
    zinv = jnp.moveaxis(zinv, -1, 0)
    zi2 = _sqr(zinv)
    return _mul(p.x, zi2), _mul(p.y, _mul(zi2, zinv))


def madd_t(p: G1T, qx, qy):
    """Complete-by-detection mixed add: Jacobian p += affine (qx, qy).

    Returns (result, dbl_flag). dbl_flag is 1 on any lane where p and q
    are the same point (the only case the madd formulas miss); callers
    must fall back when it fires. p = infinity handled exactly.
    madd-2007-bl: 11 muls."""
    z1z1 = _sqr(p.z)
    u2 = _mul(qx, z1z1)
    s2 = _mul(_mul(qy, p.z), z1z1)
    h = sub_t(FQ, u2, p.x)
    hh = _sqr(h)
    i = add_t(FQ, hh, hh)
    i = add_t(FQ, i, i)
    j = _mul(h, i)
    r = sub_t(FQ, s2, p.y)
    r = add_t(FQ, r, r)
    v = _mul(p.x, i)
    r2 = _sqr(r)
    x3 = sub_t(FQ, sub_t(FQ, r2, j), add_t(FQ, v, v))
    yj = _mul(p.y, j)
    y3 = sub_t(FQ, _mul(r, sub_t(FQ, v, x3)), add_t(FQ, yj, yj))
    zh = _sqr(add_t(FQ, p.z, h))
    z3 = sub_t(FQ, sub_t(FQ, zh, z1z1), hh)

    p_inf = jnp.all(p.z == 0, axis=0)
    h_zero = jnp.all(h == 0, axis=0)
    r_zero = jnp.all(r == 0, axis=0)
    same = h_zero & r_zero & ~p_inf
    opposite = h_zero & ~r_zero & ~p_inf

    one = jnp.broadcast_to(
        jnp.asarray(FQ.mont_one).reshape((ff.L,) + (1,) * (p.x.ndim - 1)),
        p.x.shape,
    )
    zero = jnp.zeros_like(p.x)

    def sel(cond, a, b):
        return jnp.where(cond[None], a, b)

    x_out = sel(p_inf, qx, sel(opposite, one, x3))
    y_out = sel(p_inf, qy, sel(opposite, one, y3))
    z_out = sel(p_inf, one, sel(opposite, zero, z3))
    return G1T(x_out, y_out, z_out), same.any().astype(jnp.uint32)


def _searchsorted_rows(sd, B):
    """sd: (G, N) sorted digits -> pos (G, B-1): for t in 1..B-1 the index
    of the last element with digit < t (-1 if none)."""
    t = jnp.arange(1, B, dtype=sd.dtype)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, t, side="left"))(sd)
    return pos.astype(jnp.int32) - 1  # (G, B-1)


@partial(jax.jit, static_argnums=(3,))
def _window_sums(px, py, sd, c):
    """px, py: (16, G, Lw, S) sorted affine leaves; sd: (G, N) sorted
    digits. -> (gx, gy, gz) (16, G) window sums + doubling flag."""
    L, G, Lw, S = px.shape
    B = 1 << c

    # --- prefix scan over steps: carry (16, G, Lw) Jacobian ------------
    def step(carry, leaf):
        acc, flag = carry
        new, f = madd_t(acc, leaf[0], leaf[1])
        return (new, flag | f), (new.x, new.y, new.z)

    init = (identity_t((G, Lw), like=px), jnp.uint32(0))
    leaves = (jnp.moveaxis(px, 3, 0), jnp.moveaxis(py, 3, 0))  # (S, 16, G, Lw)
    (totals, flag), outs = jax.lax.scan(step, init, leaves)
    # outs: (S, 16, G, Lw) x3 -> flatten to sorted order (16, G, N)
    wx = jnp.moveaxis(outs[0], 0, 3).reshape(L, G, Lw * S)
    wy = jnp.moveaxis(outs[1], 0, 3).reshape(L, G, Lw * S)
    wz = jnp.moveaxis(outs[2], 0, 3).reshape(L, G, Lw * S)

    # --- exclusive lane offsets + grand total ---------------------------
    def lstep(acc, lane):
        prev = acc
        return add_pt(acc, G1T(*lane)), (prev.x, prev.y, prev.z)

    linit = identity_t((G,), like=px)
    lanes = (
        jnp.moveaxis(totals.x, 2, 0),
        jnp.moveaxis(totals.y, 2, 0),
        jnp.moveaxis(totals.z, 2, 0),
    )
    grand, offs = jax.lax.scan(lstep, linit, lanes)
    ox = jnp.moveaxis(offs[0], 0, 2)  # (16, G, Lw) exclusive offsets
    oy = jnp.moveaxis(offs[1], 0, 2)
    oz = jnp.moveaxis(offs[2], 0, 2)

    # --- PS at the B-1 boundary positions -------------------------------
    pos = _searchsorted_rows(sd, B)  # (G, B-1), -1 => identity
    is_neg = pos < 0
    posc = jnp.maximum(pos, 0)
    lane_idx = (posc // S).astype(jnp.int32)  # (G, B-1)

    def gat(a, idx):  # a (16, G, M) gathered at idx (G, K) -> (16, G, K)
        return jax.vmap(
            lambda ag, ig: jnp.take(ag, ig, axis=1), in_axes=(1, 0), out_axes=1
        )(a, idx)

    within = G1T(gat(wx, posc), gat(wy, posc), gat(wz, posc))
    offp = G1T(gat(ox, lane_idx), gat(oy, lane_idx), gat(oz, lane_idx))
    ps = add_pt(offp, within)  # (16, G, B-1)
    # pos = -1 -> identity contribution
    ident = identity_t(ps.batch_shape, like=px)
    ps = G1T(
        jnp.where(is_neg[None], ident.x, ps.x),
        jnp.where(is_neg[None], ident.y, ps.y),
        jnp.where(is_neg[None], ident.z, ps.z),
    )

    # --- sum_t PS[pos_t]: blocked scan + tree ---------------------------
    K = B - 1
    blk_sz = 1
    while blk_sz < min(K, 1024):
        blk_sz *= 2
    pad = (-K) % blk_sz
    def padded(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
    sx, sy, sz = padded(ps.x), padded(ps.y), padded(ps.z)
    nb = (K + pad) // blk_sz
    sx = sx.reshape(L, G, nb, blk_sz)
    sy = sy.reshape(L, G, nb, blk_sz)
    sz = sz.reshape(L, G, nb, blk_sz)

    def bstep(acc, blk):
        return add_pt(acc, G1T(*blk)), None

    binit = identity_t((G, blk_sz), like=px)
    bacc, _ = jax.lax.scan(
        bstep, binit,
        (jnp.moveaxis(sx, 2, 0), jnp.moveaxis(sy, 2, 0),
         jnp.moveaxis(sz, 2, 0)),
    )
    m = blk_sz
    while m > 1:
        m //= 2
        bacc = add_pt(
            G1T(bacc.x[:, :, :m], bacc.y[:, :, :m], bacc.z[:, :, :m]),
            G1T(bacc.x[:, :, m:], bacc.y[:, :, m:], bacc.z[:, :, m:]),
        )
    s_sum = G1T(bacc.x[:, :, 0], bacc.y[:, :, 0], bacc.z[:, :, 0])

    # --- G_w = (B-1)*Total - s_sum --------------------------------------
    def dstep(carry, _):
        acc, cur = carry
        acc = add_pt(acc, cur)
        return (acc, double_t(cur)), None

    (bt, _), _ = jax.lax.scan(
        dstep, (identity_t((G,), like=px), grand), None, length=c
    )  # (2^c - 1) * Total
    neg_y = sub_t(FQ, jnp.zeros_like(s_sum.y), s_sum.y)
    gw = add_pt(bt, G1T(s_sum.x, neg_y, s_sum.z))
    return gw.x, gw.y, gw.z, flag


def msm_ps(
    ax,
    ay,
    scalars,
    c: int = 16,
    num_bits: int = 256,
    lanes: int = 1024,
    wgroup: int = 4,
) -> tuple:
    """Variable-base MSM over AFFINE points: sum_i scalars[i] * points[i].

    ax, ay: (16, N) Montgomery affine coordinates (no infinities);
    scalars: (N, 16) standard-form limbs. Returns (G1T batch (1,),
    dbl_flag) — the flag is nonzero only if a same-point mixed add was
    detected (fall back to ec.pippenger.msm_t; cannot occur for honest
    SRS inputs)."""
    from zkevm_tpu.ec.pippenger import _horner

    scalars = jnp.asarray(scalars, jnp.uint32)
    n = ax.shape[1]
    W = (num_bits + c - 1) // c
    Lw = min(lanes, n)
    while n % Lw:
        Lw //= 2
    S = n // Lw

    digits = jnp.stack(
        [ff.scalar_window(scalars, w, c) for w in range(W)]
    )  # (W, N)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], (W, n))
    sd, perm = jax.lax.sort((digits, iota), dimension=1, num_keys=1)

    gx_all, gy_all, gz_all = [], [], []
    flag = jnp.uint32(0)
    for g0 in range(0, W, wgroup):
        g1 = min(g0 + wgroup, W)
        pg = perm[g0:g1].reshape(-1)  # (G*N,)
        px = jnp.take(ax, pg, axis=1).reshape(ff.L, g1 - g0, Lw, S)
        py = jnp.take(ay, pg, axis=1).reshape(ff.L, g1 - g0, Lw, S)
        gx, gy, gz, f = _window_sums(px, py, sd[g0:g1], c)
        gx_all.append(gx)
        gy_all.append(gy)
        gz_all.append(gz)
        flag = flag | f

    gx = jnp.concatenate(gx_all, axis=1)
    gy = jnp.concatenate(gy_all, axis=1)
    gz = jnp.concatenate(gz_all, axis=1)
    x, y, z = _horner(c, gx, gy, gz)
    return G1T(x, y, z), flag


class PsMSM:
    """Fixed-bases wrapper: normalizes the SRS to affine once, then
    exposes scalars -> commitment with pippenger fallback on the
    (never-in-practice) doubling flag."""

    def __init__(self, points_t: G1T, c: int = 16, lanes: int = 1024,
                 wgroup: int = 4):
        self.ax, self.ay = to_affine_t(points_t)
        self.points = points_t
        self.c = c
        self.lanes = lanes
        self.wgroup = wgroup
        self.n = points_t.x.shape[1]

    def __call__(self, scalars) -> G1T:
        out, flag = msm_ps(self.ax, self.ay, scalars, c=self.c,
                           lanes=self.lanes, wgroup=self.wgroup)
        if int(np.asarray(flag)):  # pragma: no cover — DL-relation event
            from zkevm_tpu.ec.pippenger import msm_t

            return msm_t(self.points, scalars)
        return out
