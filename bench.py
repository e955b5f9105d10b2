"""Benchmark: MSM + NTT throughput on the available device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (plus
secondary numbers under "extra") with detail lines on stderr.

Headline metric: MSM points/s at 2^20 — the BASELINE.md north star and the
proof bottleneck (one k=20 column commitment per advice/lookup/quotient
poly, dozens per proof). vs_baseline compares against ~5e6 points/s, the
ballpark of halo2's multithreaded CPU `best_multiexp` at 2^20 on the
reference's prover-class machines (derived from the "~10 min / k=20 chunk
proof" figure, prover/src/zkevm/prover.rs:54, with commitments taking a
few of those minutes across ~100 MSMs).

Secondary: NTT elems/s at 2^22 with batch=4 (the coeff<->eval transform;
reference-CPU ballpark 2.6e7 elems/s as estimated in round 1).
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

REFERENCE_MSM_PTS_PER_S = 5e6  # see module docstring
REFERENCE_NTT_ELEMS_PER_S = 2.6e7

# Wall-clock budget for the whole bench (driver timeout protection).
# Phases check remaining budget before starting a compile-heavy path and
# fall back to a cheaper engine / skip secondary metrics rather than let
# the driver's timeout kill the run with no JSON line at all (round 4's
# failure mode: rc=124, no number captured).
BENCH_T0 = time.time()
BENCH_BUDGET_S = float(os.environ.get("ZKEVM_TPU_BENCH_BUDGET", "2400"))


def _remaining() -> float:
    return BENCH_BUDGET_S - (time.time() - BENCH_T0)


def _drain(x):
    """Force completion HONESTLY: fetch a small dependent slice to host.

    On the axon TPU backend `jax.block_until_ready` returns before the
    computation actually finishes (measured: a k=22 NTT "completed" in
    0.13 ms by that method, a physically impossible 20 TB/s). A
    device->host copy of an array that depends on the result cannot lie.
    """
    x = jnp.ravel(x)
    return np.asarray(x[:: max(1, x.shape[0] // 8)])


def bench_ntt(platform, rng):
    from zkevm_tpu.poly import ntt as nttmod

    k = 22 if platform == "tpu" else 10
    batch = 4 if platform == "tpu" else 2
    n = 1 << k
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(batch, 16, n), dtype=np.uint32))

    run = jax.jit(jax.vmap(lambda x: nttmod.ntt_t(x, k)))
    t0 = time.time()
    _drain(run(a))
    compile_s = time.time() - t0

    iters = 5 if platform == "tpu" else 2
    t0 = time.time()
    for _ in range(iters):
        _drain(run(a))
    dt = (time.time() - t0) / iters
    elems_per_s = batch * n / dt
    print(
        f"[bench] ntt platform={platform} k={k} batch={batch} "
        f"compile={compile_s:.1f}s run={dt*1e3:.1f}ms "
        f"elems/s={elems_per_s:.3e}",
        file=sys.stderr,
    )
    return k, batch, elems_per_s


def _setup_cached(k: int):
    """unsafe_setup with the G1 powers cached on disk — SRS generation
    is a one-time cost; reruns (and the driver's bench) skip it."""
    from zkevm_tpu.ec.group import G1
    from zkevm_tpu.kzg.params import ParamsKZG

    path = f"/root/.cache/zkevm_srs_k{k}_777.npz"
    if os.path.exists(path):
        d = np.load(path)
        import zkevm_tpu.ec.pairing as pr
        from zkevm_tpu.ec import group_t
        from zkevm_tpu.ec.pippenger import PippengerMSMT

        g1 = G1(jnp.asarray(d["x"]), jnp.asarray(d["y"]), jnp.asarray(d["z"]))
        params = ParamsKZG(k=k, g1_powers=g1, g2=pr.G2_GEN,
                           s_g2=pr.g2_scalar_mul(pr.G2_GEN, 777))
        return params
    params = ParamsKZG.unsafe_setup(k, tau=777, windowed=False)
    np.savez(path, x=np.asarray(params.g1_powers.x),
             y=np.asarray(params.g1_powers.y),
             z=np.asarray(params.g1_powers.z))
    return params


def bench_msm(platform, rng):
    from zkevm_tpu.ec import group_t
    from zkevm_tpu.ff import limbs as ff
    from zkevm_tpu.ff.goldens import FR_MOD
    from zkevm_tpu.kzg.params import ParamsKZG

    k = 20 if platform == "tpu" else 8
    n = 1 << k

    t0 = time.time()
    params = _setup_cached(k)
    if params.pippenger is None:
        # Default engine: the best MEASURED one (psmsm wgroup=16).
        # The l13 MXU-hybrid becomes the default only once a successful
        # timed l13 run has stamped the sentinel (its SRS-conversion npz
        # + persistent compile cache are then warm, so the driver's
        # budget is safe) — round 4 timed out by defaulting to a cold
        # l13 without this guard.
        l13_warm = os.path.exists(f"/root/.cache/zkevm_l13_ok_k{k}")
        engine = os.environ.get("ZKEVM_TPU_MSM",
                                "l13" if l13_warm else "ps")
        if engine == "l13" and not l13_warm and _remaining() < 700:
            # l13's cold compile measured ~310 s on the chip; with less
            # than ~700 s left prefer the cheap-compile engine so the
            # run still produces a number (see BENCH_BUDGET_S).
            print("[bench] budget low -> falling back to ps engine",
                  file=sys.stderr)
            engine = "ps"
        if engine == "l13":
            # lazy-13 MXU-hybrid MSM (ec/msm13.py) — the round-4 design:
            # row-space schoolbook products on the VPU, the entire
            # modular reduction as one constant uint8 matmul on the MXU
            from zkevm_tpu.ec.msm13 import Msm13

            lanes = int(os.environ.get("ZKEVM_TPU_MSM_LANES", "4096"))
            wg = int(os.environ.get("ZKEVM_TPU_MSM_WGROUP", "8"))
            # cache the one-time u16-Montgomery -> lazy-13 affine SRS
            # conversion (batch inversion over 2^k points) on disk
            l13_path = f"/root/.cache/zkevm_srs_k{k}_777_l13.npz"
            if os.path.exists(l13_path):
                d13 = np.load(l13_path)
                m = Msm13.__new__(Msm13)
                m.ax13 = jnp.asarray(d13["ax13"])
                m.ay13 = jnp.asarray(d13["ay13"])
                m.points = group_t.from_g1(params.g1_powers)
                m.c, m.lanes, m.wgroup = 16, lanes, wg
                m.n = m.points.x.shape[1]
                params.pippenger = m
            else:
                params.pippenger = Msm13(group_t.from_g1(params.g1_powers),
                                         c=16, lanes=lanes, wgroup=wg)
                np.savez(l13_path,
                         ax13=np.asarray(params.pippenger.ax13),
                         ay13=np.asarray(params.pippenger.ay13))
        elif engine == "ps":
            # sort+prefix-sum MSM over the u16 CIOS core (round 2/3;
            # wgroup=16 was the best measured config, 3.3e5 pts/s)
            from zkevm_tpu.ec.psmsm import PsMSM

            params.pippenger = PsMSM(group_t.from_g1(params.g1_powers),
                                     c=16, lanes=4096, wgroup=16)
        else:
            from zkevm_tpu.ec.pippenger import PippengerMSMT

            params.pippenger = PippengerMSMT(group_t.from_g1(params.g1_powers))
    setup_s = time.time() - t0

    scalars = np.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    )  # uniform 256-bit (< 2^256), fine for throughput
    scalars[:, 15] &= 0x3FFF  # keep < 2^254 ~ Fr-sized
    s = jnp.asarray(scalars)

    t0 = time.time()
    out = params.pippenger(s)
    _drain(out.x)
    compile_s = time.time() - t0

    iters = 3 if platform == "tpu" else 1
    t0 = time.time()
    for _ in range(iters):
        _drain(params.pippenger(s).x)
    dt = (time.time() - t0) / iters
    pts_per_s = n / dt
    print(
        f"[bench] msm platform={platform} k={k} setup={setup_s:.1f}s "
        f"compile={compile_s:.1f}s run={dt*1e3:.1f}ms pts/s={pts_per_s:.3e}",
        file=sys.stderr,
    )
    if type(params.pippenger).__name__ == "Msm13":
        # successful timed l13 run: its caches are warm — future bench
        # runs (the driver's) may default to it safely
        open(f"/root/.cache/zkevm_l13_ok_k{k}", "w").write("ok\n")
    return k, pts_per_s


def main():
    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)

    msm_k, msm_rate = bench_msm(platform, rng)
    extra = {}
    # NTT is secondary: never let its (cold ~900 s) compile cost the
    # headline JSON line
    if _remaining() > 300:
        try:
            ntt_k, ntt_batch, ntt_rate = bench_ntt(platform, rng)
            extra = {
                f"ntt_k{ntt_k}_batch{ntt_batch}_elems_per_s":
                    round(ntt_rate, 1),
                "ntt_vs_baseline":
                    round(ntt_rate / REFERENCE_NTT_ELEMS_PER_S, 4),
            }
        except Exception as e:  # pragma: no cover
            extra = {"ntt_error": f"{type(e).__name__}: {str(e)[:120]}"}
    else:
        extra = {"ntt_skipped": "bench budget low"}

    print(
        json.dumps(
            {
                "metric": f"msm_k{msm_k}_points_per_s",
                "value": round(msm_rate, 1),
                "unit": "points/s",
                "vs_baseline": round(msm_rate / REFERENCE_MSM_PTS_PER_S, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
