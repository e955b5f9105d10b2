"""Sweep the lazy-13 MSM on the real chip at k=20 (synthetic coords).

Throughput-only: coordinates need not be on-curve; the kernels' cost is
data-independent (branchless). Honest forced-fetch timing.
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

from zkevm_tpu.ec import msm13
from zkevm_tpu.ff import limbs as ff


def drain(x):
    np.asarray(jnp.ravel(x)[:8])


def main():
    k = int(os.environ.get("SWEEP_K", "20"))
    n = 1 << k
    rng = np.random.default_rng(0)
    ax = jnp.asarray(rng.integers(0, 1 << 13, size=(21, n), dtype=np.uint32))
    ay = jnp.asarray(rng.integers(0, 1 << 13, size=(21, n), dtype=np.uint32))
    scalars = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars[:, 15] &= 0x3FFF
    s = jnp.asarray(scalars)
    print(f"[sweep13] platform={jax.devices()[0].platform} k={k} "
          f"mm={os.environ.get('ZKEVM_TPU_L13_MM', 'u8')}", flush=True)

    configs = [tuple(int(v) for v in c.split(":")) for c in
               os.environ.get("SWEEP_CFGS", "4096:8,4096:16,8192:8").split(",")]
    for lanes, wg in configs:
        try:
            t0 = time.time()
            out, flag = msm13.msm13(ax, ay, s, c=16, lanes=lanes, wgroup=wg)
            drain(out.x)
            tc = time.time() - t0
            iters = 2
            t0 = time.time()
            for _ in range(iters):
                out, flag = msm13.msm13(ax, ay, s, c=16, lanes=lanes,
                                        wgroup=wg)
                drain(out.x)
            dt = (time.time() - t0) / iters
            print(f"[sweep13] lanes={lanes} wgroup={wg}: compile={tc:.1f}s "
                  f"run={dt*1e3:.0f}ms -> {n/dt:.3e} pts/s", flush=True)
        except Exception as e:
            print(f"[sweep13] lanes={lanes} wgroup={wg}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
