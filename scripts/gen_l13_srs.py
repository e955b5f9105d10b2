"""Precompute the lazy-13 affine SRS on XLA:CPU and cache it as npz.

The Msm13 constructor (ec/msm13.py) converts the u16-Montgomery Jacobian
SRS to lazy-13 affine: a batched Fermat inversion over 2^k points + limb
regrouping. Compiling that graph on the tunneled chip's remote compile
helper gets SIGKILLed (OOM) at k=20 — and it is pure one-time setup, so
there is no reason to ever run it on the chip: this script does the
conversion on CPU (chunked, cached compiles) and writes the same
`zkevm_srs_k{k}_777_l13.npz` bench.py's l13 engine loads, after which the
chip only ever compiles the MSM kernel itself.

Usage: python scripts/gen_l13_srs.py [k]   (default 20; needs the
`zkevm_srs_k{k}_777.npz` u16 SRS cache, written by bench.py's setup).
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_zkevm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec import group_t
from zkevm_tpu.ec.group import G1
from zkevm_tpu.ec.psmsm import to_affine_t
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff import lazy13 as lz


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    src = f"/root/.cache/zkevm_srs_k{k}_777.npz"
    dst = f"/root/.cache/zkevm_srs_k{k}_777_l13.npz"
    if os.path.exists(dst):
        print(f"[gen_l13_srs] {dst} exists", flush=True)
        return
    assert os.path.exists(src), f"run bench.py setup first ({src} missing)"
    d = np.load(src)
    n = d["x"].shape[0]
    FQ = ff.fq_spec()
    one_raw = jnp.asarray(FQ.one_raw)[:, None]

    # chunked: one moderate compile executed n/W times
    W = 1 << 16
    ax_parts, ay_parts = [], []
    t0 = time.time()

    @jax.jit
    def conv(x, y, z):
        pt = group_t.from_g1(G1(x, y, z))
        ax, ay = to_affine_t(pt)
        ax_std = ff.mont_mul_t(FQ, ax, one_raw, unroll=False)
        ay_std = ff.mont_mul_t(FQ, ay, one_raw, unroll=False)
        return lz.from_u16_t(ax_std), lz.from_u16_t(ay_std)

    for c0 in range(0, n, W):
        m = min(W, n - c0)
        x13, y13 = conv(jnp.asarray(d["x"][c0:c0 + m]),
                        jnp.asarray(d["y"][c0:c0 + m]),
                        jnp.asarray(d["z"][c0:c0 + m]))
        ax_parts.append(np.asarray(x13))
        ay_parts.append(np.asarray(y13))
        print(f"[gen_l13_srs] {c0 + m}/{n} ({time.time() - t0:.0f}s)",
              flush=True)
    ax13 = np.concatenate(ax_parts, axis=1)
    ay13 = np.concatenate(ay_parts, axis=1)
    np.savez(dst, ax13=ax13, ay13=ay13)
    print(f"[gen_l13_srs] wrote {dst} in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
