"""Benchmark: NTT + MSM throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
detail lines on stderr. The north-star metrics are MSM points/s and NTT
elems/s per chip (BASELINE.md); the reference publishes no absolute
numbers in-tree (its benches are DEGREE-parameterized timers), so
vs_baseline is reported against an estimated reference-CPU NTT throughput
derived from its "~10 minutes per k=20 chunk proof" figure
(prover/src/zkevm/prover.rs:54): a k=20 proof performs ~1e9 NTT
butterfly-equivalents in its FFT phase; treating ~20% of 600 s as FFT
gives ~2.6e7 elems/s as the reference single-machine ballpark.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_NTT_ELEMS_PER_S = 2.6e7  # see module docstring


def main():
    from zkevm_tpu.ff import FR
    from zkevm_tpu.poly import ntt as nttmod

    platform = jax.devices()[0].platform
    # TPU: full-size transform (limbs-first four-step path); CPU: small
    k = 18 if platform == "tpu" else 10
    n = 1 << k

    rng = np.random.default_rng(0)
    data32 = rng.integers(0, 1 << 16, size=(16, n), dtype=np.uint32)
    a = jnp.asarray(data32)

    run = jax.jit(nttmod.ntt_t, static_argnums=1)
    t0 = time.time()
    jax.block_until_ready(run(a, k))
    compile_s = time.time() - t0

    iters = 10 if platform == "tpu" else 2
    t0 = time.time()
    for _ in range(iters):
        out = run(a, k)
        jax.block_until_ready(out)  # block every iteration: honest timing
    dt = (time.time() - t0) / iters
    batch = 1
    elems_per_s = n / dt

    print(
        f"[bench] platform={platform} k={k} batch={batch} "
        f"compile={compile_s:.1f}s run={dt*1e3:.1f}ms",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"ntt_k{k}_elems_per_s",
                "value": round(elems_per_s, 1),
                "unit": "elems/s",
                "vs_baseline": round(elems_per_s / REFERENCE_NTT_ELEMS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
