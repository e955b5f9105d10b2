"""Microbenchmark: mont_mul_t / madd_t throughput ceiling on the chip.

Measures muls/s for the unrolled straight-line CIOS at several batch
sizes, and a fused chain (depth D) to separate launch overhead from
steady-state ALU throughput. This bounds what any MSM design can reach:
MSM pts/s <= mul_ceiling / (11 * windows).
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

from zkevm_tpu.ff import limbs as ff

FQ = ff.fq_spec()


def drain(x):
    x = jnp.ravel(x)
    return np.asarray(x[:: max(1, x.shape[0] // 8)])


@partial(jax.jit, static_argnums=(2, 3))
def mul_chain(a, b, depth: int, unroll: bool):
    """b <- a*b, repeated `depth` times (data-dependent: no DCE/fusion-away)."""
    def step(bb, _):
        return ff.mont_mul_t(FQ, a, bb, unroll=unroll), None
    b, _ = jax.lax.scan(step, b, None, length=depth)
    return b


@partial(jax.jit, static_argnums=(2, 3))
def mul_chain_unrolled_outer(a, b, depth: int, unroll: bool):
    for _ in range(depth):
        b = ff.mont_mul_t(FQ, a, b, unroll=unroll)
    return b


def bench(name, fn, n_muls, iters=5):
    t0 = time.time()
    drain(fn())
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        drain(fn())
    dt = (time.time() - t0) / iters
    print(f"[ubench] {name:42s} compile={tc:6.1f}s run={dt*1e3:9.2f}ms "
          f"-> {n_muls/dt:.3e} muls/s", flush=True)
    return n_muls / dt


def main():
    rng = np.random.default_rng(0)
    print(f"[ubench] platform={jax.devices()[0].platform}", flush=True)

    for logb in (13, 16, 18, 20):
        B = 1 << logb
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
        # depth chosen so each config does ~64M muls
        depth = max(1, (1 << 26) // B)
        for unroll in (True, False):
            tag = "unroll" if unroll else "scan  "
            bench(f"mul_chain[B=2^{logb} D={depth}] {tag}",
                  lambda a=a, b=b, d=depth, u=unroll: mul_chain(a, b, d, u),
                  B * depth)
        if logb <= 16:
            # outer-unrolled variant: XLA sees the whole chain (max fusion)
            depth2 = min(depth, 64)
            bench(f"mul_chain_outerunroll[B=2^{logb} D={depth2}] unroll",
                  lambda a=a, b=b, d=depth2: mul_chain_unrolled_outer(a, b, d, True),
                  B * depth2)


if __name__ == "__main__":
    main()
