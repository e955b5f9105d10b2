"""Stage-level wall-clock profile of the lazy-13 MSM at k=20 on the chip.

Times each pipeline stage under its own jit with honest forced-fetch
draining (see bench.py `_drain`): digit extraction + sort, the per-group
window scan (leaf madds), the two-level lane exscan + boundary-position
bucket recovery + tree sum (everything after the scan inside
`_window_sums`), and the final Horner fold. Output feeds the MSM
optimization plan (VERDICT r4 next-round item #1b).
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

from zkevm_tpu.ec import msm13 as m13
from zkevm_tpu.ec.msm13 import G1L, identity_l, madd_l
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.lazy13 import L13


def drain(x):
    np.asarray(jnp.ravel(x)[:8])


def timeit(name, fn, iters=2):
    t0 = time.time()
    drain(fn())
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        drain(fn())
    dt = (time.time() - t0) / iters
    print(f"[prof13] {name:32s} compile={tc:6.1f}s run={dt*1e3:8.1f}ms",
          flush=True)
    return dt


@partial(jax.jit, static_argnums=(1,))
def stage_sort(scalars, W):
    n = scalars.shape[0]
    digits = jnp.stack([ff.scalar_window(scalars, w, 16) for w in range(W)])
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.uint32)[None], (W, n))
    sd, perm = jax.lax.sort((digits, iota), dimension=1, num_keys=1)
    return sd, perm


@partial(jax.jit, static_argnums=(3, 4))
def stage_gather(ax13, ay13, perm, Lw, S):
    W = perm.shape[0]
    pg = perm.reshape(-1)
    px = jnp.take(ax13, pg, axis=1).reshape(L13, W, Lw, S)
    py = jnp.take(ay13, pg, axis=1).reshape(L13, W, Lw, S)
    return px, py


@jax.jit
def stage_scan(px, py):
    """The leaf madd scan only (dominant arithmetic)."""
    L, G, Lw, S = px.shape

    def step(carry, leaf):
        acc, flag = carry
        new, f = madd_l(acc, leaf[0], leaf[1])
        return (new, flag | f), None

    init = (identity_l((G, Lw)), jnp.uint32(0))
    leaves = (jnp.moveaxis(px, 3, 0), jnp.moveaxis(py, 3, 0))
    (totals, flag), _ = jax.lax.scan(step, init, leaves)
    return totals.x


def main():
    k = int(os.environ.get("PROF_K", "20"))
    n = 1 << k
    W = 16
    lanes = int(os.environ.get("PROF_LANES", "4096"))
    wg = int(os.environ.get("PROF_WGROUP", "8"))
    Lw = min(lanes, n)
    S = n // Lw
    rng = np.random.default_rng(0)
    ax = jnp.asarray(rng.integers(0, 1 << 13, size=(21, n), dtype=np.uint32))
    ay = jnp.asarray(rng.integers(0, 1 << 13, size=(21, n), dtype=np.uint32))
    scalars = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars[:, 15] &= 0x3FFF
    s = jnp.asarray(scalars)
    print(f"[prof13] k={k} lanes={Lw} S={S} wgroup={wg} "
          f"platform={jax.devices()[0].platform}", flush=True)

    timeit("digits+sort (16 windows)", lambda: stage_sort(s, W)[0])
    sd, perm = stage_sort(s, W)
    g = wg
    timeit(f"gather ({g} windows)",
           lambda: stage_gather(ax, ay, perm[:g], Lw, S)[0])
    px, py = stage_gather(ax, ay, perm[:g], Lw, S)
    t_scan = timeit(f"leaf madd scan ({g} win, S={S})",
                    lambda: stage_scan(px, py))
    t_full = timeit(f"_window_sums full ({g} win)",
                    lambda: m13._window_sums(px, py, sd[:g], 16)[0])
    print(f"[prof13]   -> post-scan share = {(t_full-t_scan)*1e3:.1f}ms "
          f"({100*(t_full-t_scan)/t_full:.0f}% of window_sums)", flush=True)
    # full msm for reference
    t0 = time.time()
    out, _ = m13.msm13(ax, ay, s, c=16, lanes=lanes, wgroup=wg)
    drain(out.x)
    tc = time.time() - t0
    t0 = time.time()
    out, _ = m13.msm13(ax, ay, s, c=16, lanes=lanes, wgroup=wg)
    drain(out.x)
    dt = time.time() - t0
    print(f"[prof13] full msm13                        compile={tc:6.1f}s "
          f"run={dt*1e3:8.1f}ms -> {n/dt:.3e} pts/s", flush=True)


if __name__ == "__main__":
    main()
