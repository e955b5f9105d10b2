"""Sweep psmsm (lanes, wgroup, unroll) on the real chip at k=20.

Honest forced-fetch timing. Dispatch-overhead hypothesis: per-scan-step
cost has a fixed component, so fewer/larger steps (lanes up, all windows
in one group) should win big.
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

from zkevm_tpu.ec import psmsm
from zkevm_tpu.ff import limbs as ff


def drain(x):
    np.asarray(jnp.ravel(x)[:8])


def main():
    k = int(os.environ.get("SWEEP_K", "20"))
    n = 1 << k
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    py = jnp.asarray(rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32))
    scalars = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars[:, 15] &= 0x3FFF
    s = jnp.asarray(scalars)
    print(f"[sweep] platform={jax.devices()[0].platform} k={k} "
          f"unroll={psmsm.UNROLL}", flush=True)

    configs = [(int(a), int(b)) for a, b in
               (c.split(":") for c in
                os.environ.get("SWEEP_CFGS", "4096:16,8192:16,2048:16").split(","))]
    for lanes, wg in configs:
        try:
            t0 = time.time()
            out, _ = psmsm.msm_ps(px, py, s, c=16, lanes=lanes, wgroup=wg)
            drain(out.x)
            tc = time.time() - t0
            t0 = time.time()
            iters = 2
            for _ in range(iters):
                out, _ = psmsm.msm_ps(px, py, s, c=16, lanes=lanes, wgroup=wg)
                drain(out.x)
            dt = (time.time() - t0) / iters
            print(f"[sweep] lanes={lanes} wgroup={wg}: compile={tc:.1f}s "
                  f"run={dt*1e3:.0f}ms -> {n/dt:.3e} pts/s", flush=True)
        except Exception as e:  # OOM etc.
            print(f"[sweep] lanes={lanes} wgroup={wg}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
