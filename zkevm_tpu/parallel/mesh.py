"""Device-mesh sharding for the proving hot paths.

Replaces the reference's rayon chunking inside scroll-tech/halo2's
`best_multiexp` / `best_fft` (SURVEY.md §2.5 parallelism inventory) with
jax.sharding + shard_map over a 1-D "chips" mesh:

- **MSM**: points and scalars sharded over the point axis; every chip runs
  the batched double-and-add + local tree reduction on its shard; the
  per-chip partial sums (one Jacobian point each) are combined with an
  all_gather over ICI followed by a log-width on-device reduction. The
  collective payload is 3*16 u32 per chip — communication is negligible,
  scaling is compute-bound.

- **Batched NTT**: a stack of polynomials sharded over the polynomial
  axis (the dominant NTT workload in the prover: committing hundreds of
  columns, quotient pieces, coset extensions). Zero communication.
  In-transform butterfly sharding (all_to_all over stages) is tracked for
  the single-giant-NTT case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkevm_tpu.ec import group
from zkevm_tpu.ec.group import G1
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.poly import ntt as nttmod


def default_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("chips",))


def sharded_msm(mesh: Mesh, points: G1, scalars) -> G1:
    """MSM with the point axis sharded over the mesh.

    points: G1 batch (N,) with N divisible by mesh size; scalars (N, 16)
    standard-form limbs. Returns an unsharded G1 scalar.
    """
    from jax.experimental.shard_map import shard_map

    nchips = mesh.shape["chips"]

    def local(px, py, pz, s):
        part = group.scalar_mul_scan(G1(px, py, pz), s)
        acc = group.sum_reduce_scan(part)  # (1,) local partial
        # gather all partials and reduce on every chip (tiny payload)
        gx = jax.lax.all_gather(acc.x, "chips", tiled=True)
        gy = jax.lax.all_gather(acc.y, "chips", tiled=True)
        gz = jax.lax.all_gather(acc.z, "chips", tiled=True)
        tot = group.sum_reduce_scan(G1(gx, gy, gz))
        return tot.x, tot.y, tot.z

    spec = P("chips", None)
    out_spec = P(None, None)
    try:
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(out_spec, out_spec, out_spec),
            check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(out_spec, out_spec, out_spec),
            check_rep=False,
        )
    x, y, z = fn(points.x, points.y, points.z, jnp.asarray(scalars, jnp.uint32))
    return G1(x[0], y[0], z[0])


def sharded_ntt_batch(mesh: Mesh, polys: jnp.ndarray, k: int) -> jnp.ndarray:
    """NTT a (B, n, 16) stack with B sharded over chips (B % nchips == 0)."""
    sharding = NamedSharding(mesh, P("chips", None, None))
    polys = jax.device_put(polys, sharding)

    @partial(jax.jit, static_argnums=1, out_shardings=sharding)
    def run(a, k):
        return nttmod.ntt(a, k)

    return run(polys, k)
