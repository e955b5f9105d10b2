"""Stage-level MSM profile on the real chip: where do the 5.2 s go?

Times each Pippenger stage independently (accumulate / lane_merge /
weighted_fold / horner) plus two synthetic probes that bound the design
space:

- add-only: the accumulate scan with the one-hot bucket select replaced
  by a plain running add (isolates complete-add compute from bucket IO)
- onehot-only: the bucket select/update with the point add replaced by a
  copy (isolates bucket-state HBM traffic)

Honest timing via host fetch (bench.py `_drain`).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from functools import partial

from zkevm_tpu.ec import pippenger as pip
from zkevm_tpu.ec.group_t import G1T, add_pt, identity_t
from zkevm_tpu.ff import limbs as ff


def drain(x):
    x = jnp.ravel(x)
    return np.asarray(x[:: max(1, x.shape[0] // 8)])


def timeit(name, fn, iters=3):
    t0 = time.time()
    out = fn()
    for leaf in jax.tree_util.tree_leaves(out):
        drain(leaf)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        for leaf in jax.tree_util.tree_leaves(out):
            drain(leaf)
    dt = (time.time() - t0) / iters
    print(f"[profile] {name:18s} compile={compile_s:6.1f}s run={dt*1e3:9.1f}ms",
          flush=True)
    return dt


@partial(jax.jit, static_argnums=(0,))
def _add_only(B, px, py, pz, digits):
    """accumulate with the bucket one-hot removed: one running add per
    (window, lane); same add count/shape, no bucket-state traffic."""
    S, W, Lw = digits.shape
    acc0 = identity_t((W, Lw), like=px)

    def step(acc, inp):
        ds, xs, ys, zs = inp
        p = G1T(
            jnp.broadcast_to(xs[:, None], (ff.L, W, Lw)),
            jnp.broadcast_to(ys[:, None], (ff.L, W, Lw)),
            jnp.broadcast_to(zs[:, None], (ff.L, W, Lw)),
        )
        return add_pt(acc, p), None

    xs = (digits, jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0),
          jnp.moveaxis(pz, 1, 0))
    acc, _ = jax.lax.scan(step, acc0, xs)
    return acc.x, acc.y, acc.z


@partial(jax.jit, static_argnums=(0,))
def _onehot_only(B, px, py, pz, digits):
    """accumulate with add_pt replaced by xor: isolates the bucket
    one-hot read + where-write HBM traffic."""
    S, W, Lw = digits.shape
    bidx = jnp.arange(B, dtype=jnp.uint32)
    acc0 = identity_t((W, Lw, B), like=px)

    def step(acc, inp):
        ds, xs, ys, zs = inp
        onehot = ds[:, :, None] == bidx[None, None, :]
        oh_u = onehot.astype(jnp.uint32)[None]
        cur = G1T(
            (acc.x * oh_u).sum(axis=3, dtype=jnp.uint32),
            (acc.y * oh_u).sum(axis=3, dtype=jnp.uint32),
            (acc.z * oh_u).sum(axis=3, dtype=jnp.uint32),
        )
        new = G1T(cur.x ^ xs[:, None, :, None][:, :, :, 0],
                  cur.y ^ ys[:, None, :, None][:, :, :, 0],
                  cur.z ^ zs[:, None, :, None][:, :, :, 0])
        oh = onehot[None]
        return (
            G1T(jnp.where(oh, new.x[..., None], acc.x),
                jnp.where(oh, new.y[..., None], acc.y),
                jnp.where(oh, new.z[..., None], acc.z)),
            None,
        )

    xs = (digits, jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0),
          jnp.moveaxis(pz, 1, 0))
    acc, _ = jax.lax.scan(step, acc0, xs)
    return acc.x, acc.y, acc.z


def main():
    k = int(os.environ.get("PROFILE_K", "20"))
    c = int(os.environ.get("PROFILE_C", "4"))
    sublanes = int(os.environ.get("PROFILE_SUBLANES", "1024"))
    n = 1 << k
    B = 1 << c
    W = (256 + c - 1) // c
    Lw = min(sublanes, n)
    S = n // Lw
    print(f"[profile] platform={jax.devices()[0].platform} k={k} c={c} "
          f"Lw={Lw} S={S} W={W} B={B}", flush=True)

    rng = np.random.default_rng(0)
    # synthetic points in Montgomery form (throughput only; values
    # need not be on-curve for timing)
    px = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    pz = jnp.asarray(np.broadcast_to(
        np.asarray(ff.fq_spec().mont_one, np.uint32)[:, None], (16, n)).copy())
    scalars = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars[:, 15] &= 0x3FFF
    s = jnp.asarray(scalars)

    digits = jnp.stack([ff.scalar_window(s, w, c) for w in range(W)])
    digits = jnp.moveaxis(digits.reshape(W, S, Lw), 1, 0)
    pxs = px.reshape(ff.L, S, Lw)
    pys = py.reshape(ff.L, S, Lw)
    pzs = pz.reshape(ff.L, S, Lw)

    t_acc = timeit("accumulate", lambda: pip._accumulate(B, pxs, pys, pzs, digits))
    ax, ay, az = pip._accumulate(B, pxs, pys, pzs, digits)
    drain(ax)
    t_mrg = timeit("lane_merge", lambda: pip._lane_merge(ax, ay, az))
    wx, wy, wz = pip._lane_merge(ax, ay, az)
    drain(wx)
    t_fld = timeit("weighted_fold", lambda: pip._weighted_fold(wx, wy, wz))
    gx, gy, gz = pip._weighted_fold(wx, wy, wz)
    drain(gx)
    t_hor = timeit("horner", lambda: pip._horner(c, gx, gy, gz))

    t_add = timeit("add_only", lambda: _add_only(B, pxs, pys, pzs, digits))
    t_oh = timeit("onehot_only", lambda: _onehot_only(B, pxs, pys, pzs, digits))

    total = t_acc + t_mrg + t_fld + t_hor
    print(f"[profile] total={total*1e3:.0f}ms -> {n/total:.3e} pts/s "
          f"(accumulate {100*t_acc/total:.0f}%)", flush=True)
    print(f"[profile] inside accumulate: add-only {t_add*1e3:.0f}ms, "
          f"onehot-only {t_oh*1e3:.0f}ms", flush=True)

    if os.environ.get("PROFILE_PSMSM", "1") == "1":
        from zkevm_tpu.ec import psmsm

        pc = int(os.environ.get("PROFILE_PS_C", "16"))
        lanes = int(os.environ.get("PROFILE_PS_LANES", "1024"))
        wg = int(os.environ.get("PROFILE_PS_WGROUP", "4"))
        # affine-shaped synthetic coords (throughput only)
        t_ps = timeit(
            f"psmsm c={pc} wg={wg}",
            lambda: psmsm.msm_ps(px, py, s, c=pc, lanes=lanes, wgroup=wg)[0].x,
        )
        print(f"[profile] psmsm c={pc}: {n/t_ps:.3e} pts/s", flush=True)


if __name__ == "__main__":
    main()
