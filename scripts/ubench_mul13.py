"""Microbenchmark mul13 / madd_l vs the u16 CIOS on the chip.

Separates: product-only (VPU), full mul13 (VPU+MXU matmul), carry/fold
glue, and madd_l — to find where the lazy-13 time actually goes.
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

from zkevm_tpu.ec import msm13
from zkevm_tpu.ff import lazy13 as lz
from zkevm_tpu.ff import limbs as ff

LZ = lz.ctx_fq()


def drain(x):
    np.asarray(jnp.ravel(x)[:8])


@partial(jax.jit, static_argnums=(2, 3))
def chain13(a, b, depth, kind):
    def step(bb, _):
        if kind == "mul":
            r = lz.mul13(LZ, a, bb)
        elif kind == "sqr":
            r = lz.sqr13(LZ, bb)
        elif kind == "prod_only":
            t = lz.prod_T(a, bb)
            # fold the product columns back to 21 limbs WITHOUT reduction
            # (wrong math, right cost shape for the VPU product part)
            r = (t[:21] + t[20:]) & lz.M13
        elif kind == "addsub":
            r = lz.add13(LZ, a, lz.sub13(LZ, a, bb))
        return r, None
    out, _ = jax.lax.scan(step, b, None, length=depth)
    return out


@partial(jax.jit, static_argnums=(1,))
def chain_madd(state, depth):
    (x, y, z, inf, qx, qy) = state

    def step(carry, _):
        p, f = carry
        p2, f2 = msm13.madd_l(p, qx, qy)
        return (p2, f | f2), None

    (p, f), _ = jax.lax.scan(
        step, (msm13.G1L(x, y, z, inf), jnp.uint32(0)), None, length=depth)
    return p.x, f


def bench(name, fn, n_ops, iters=3):
    t0 = time.time()
    drain(fn())
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        drain(fn())
    dt = (time.time() - t0) / iters
    print(f"[u13] {name:28s} compile={tc:6.1f}s run={dt*1e3:8.1f}ms "
          f"-> {n_ops/dt:.3e} /s", flush=True)


def main():
    rng = np.random.default_rng(0)
    B = int(os.environ.get("UB_B", str(1 << 17)))
    D = int(os.environ.get("UB_D", "32"))
    a = jnp.asarray(rng.integers(0, 1 << 13, size=(21, B), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 13, size=(21, B), dtype=np.uint32))
    print(f"[u13] platform={jax.devices()[0].platform} B={B} D={D} "
          f"mm={lz.MATMUL_DTYPE}", flush=True)
    for kind in ("prod_only", "mul", "sqr", "addsub"):
        bench(f"{kind}", lambda k=kind: chain13(a, b, D, k), B * D)

    # u16 CIOS comparison at same batch
    a16 = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))
    b16 = jnp.asarray(rng.integers(0, 1 << 16, size=(16, B), dtype=np.uint32))

    @partial(jax.jit, static_argnums=(2, 3))
    def chain16(a, bb, depth, unroll):
        def step(c, _):
            return ff.mont_mul_t(ff.fq_spec(), a, c, unroll=unroll), None
        out, _ = jax.lax.scan(step, bb, None, length=depth)
        return out

    bench("u16 scan-CIOS", lambda: chain16(a16, b16, D, False), B * D)

    # madd chain
    x = jnp.asarray(rng.integers(0, 1 << 13, size=(21, B), dtype=np.uint32))
    yy = jnp.asarray(rng.integers(0, 1 << 13, size=(21, B), dtype=np.uint32))
    z = jnp.asarray(rng.integers(0, 1 << 13, size=(21, B), dtype=np.uint32))
    inf = jnp.zeros((B,), bool)
    bench("madd_l", lambda: chain_madd((x, yy, z, inf, a, b), D), B * D)


if __name__ == "__main__":
    main()
