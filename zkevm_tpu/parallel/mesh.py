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
    fn = jax.jit(_shard_map(  # jit: eager shard_map dispatches per-primitive
        local,
        mesh,
        (spec, spec, spec, spec),
        (out_spec, out_spec, out_spec),
    ))
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


from functools import lru_cache


@lru_cache(maxsize=None)
def _twiddle_host(k: int, k1: int, inverse: bool):
    """(16, n1, n2) four-step twiddle table built on HOST (python pow +
    encode) — the device log-doubling builder (_fourstep_twiddle) costs
    ~10 eager kernel compiles, which the forced-host-device dryrun mode
    pays at minutes each; here it is pure numpy."""
    from zkevm_tpu.ff import FR
    from zkevm_tpu.ff.goldens import FR_MOD, fr_root_of_unity

    n = 1 << k
    n1, n2 = 1 << k1, n >> k1
    omega = fr_root_of_unity(k)
    if inverse:
        omega = pow(omega, FR_MOD - 2, FR_MOD)
    out = np.empty((ff.L, n1, n2), dtype=np.uint32)
    wr = 1
    for r in range(n1):
        v = 1
        for c in range(n2):
            out[:, r, c] = FR.encode(v)
            v = v * wr % FR_MOD
        wr = wr * omega % FR_MOD
    return out


def _shard_map(fn, mesh, in_specs, out_specs):
    from jax.experimental.shard_map import shard_map

    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def sharded_ntt_t(mesh: Mesh, a_t: jnp.ndarray, k: int,
                  inverse: bool = False, unroll: bool = True) -> jnp.ndarray:
    """Single GIANT four-step NTT with the transpose as an ICI all_to_all
    — the in-transform butterfly-exchange item of SURVEY §2.5 (reference:
    rayon recursive best_fft).

    a_t: (16, n) limbs-first. The (n1, n2) view is column-sharded over
    chips; each chip runs full-height size-n1 sub-NTTs on its n2/C
    columns, twiddles locally, then the global transpose is ONE
    all_to_all (split rows / concat columns) after which each chip holds
    n1/C full rows for the size-n2 sub-NTTs. Returns (16, n), natural
    order, replicated.

    Deliberately THREE separate shard_map programs (sub-NTT; twiddle +
    transpose; sub-NTT) rather than one fused module: under the
    forced-host-device XLA:CPU mode the driver validates with, the fused
    module's compile goes super-linear (>75 min and counting at k=10)
    while the staged modules compile in minutes and cache independently —
    and when k1 == k2 the two sub-NTT stages share one executable.
    """
    from zkevm_tpu.ff.limbs import mont_mul_t
    from zkevm_tpu.ff.goldens import FR_MOD
    from zkevm_tpu.poly.ntt import _ntt_axis2

    C = mesh.shape["chips"]
    n = 1 << k
    assert a_t.shape == (ff.L, n)
    k1 = k // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    assert n1 % C == 0 and n2 % C == 0, (n1, n2, C)
    A = jnp.reshape(a_t, (ff.L, n1, n2))
    tw = jnp.asarray(_twiddle_host(k, k1, inverse))

    spec_c = P(None, None, "chips")

    def sub1(a):  # (16, n1, n2/C)
        return _ntt_axis2(a, k1, inverse, unroll=unroll)

    def sub2(a):  # (16, n2, n1/C)
        return _ntt_axis2(a, k2, inverse, unroll=unroll)

    def xpose(b, twl):  # (16, n1, n2/C) -> (16, n2, n1/C)
        b = mont_mul_t(nttmod.FR, b, twl, unroll=unroll)
        b = jax.lax.all_to_all(b, "chips", split_axis=1, concat_axis=2,
                               tiled=True)  # (16, n1/C, n2)
        return jnp.swapaxes(b, 1, 2)

    # jit each staged module: an UNJITTED shard_map runs op-by-op (one XLA
    # compile per primitive dispatch — minutes of compile under the
    # forced-host-device mode the driver validates with)
    B = jax.jit(_shard_map(sub1, mesh, (spec_c,), spec_c))(A)
    Bt = jax.jit(_shard_map(xpose, mesh, (spec_c, spec_c), spec_c))(B, tw)
    out = jax.jit(
        _shard_map(sub2 if k2 != k1 else sub1, mesh, (spec_c,), spec_c)
    )(Bt)
    # C[k2, k1] holds X[k1 + n1*k2]: flattening (n2, n1) IS natural order
    out = jnp.reshape(out, (ff.L, n))
    if inverse:
        n_inv = jnp.asarray(nttmod.FR.encode(pow(n, FR_MOD - 2, FR_MOD)))[:, None]
        out = mont_mul_t(nttmod.FR, out, n_inv, unroll=unroll)
    return out


def sharded_msm_t_scan(mesh: Mesh, points_t, scalars, *,
                       num_bits: int = 256):
    """Point-sharded double-and-add MSM in the TRANSPOSED limb layout —
    the compile-lean shard_map validation path. Same sharded structure as
    sharded_msm (point axis over chips, all_gather partial reduce) but
    every field mul is the scan-CIOS mont_mul_t (~20x cheaper to compile
    under the forced-host XLA:CPU mode the driver dryrun runs in than
    the limbs-last group.py ops). points_t: G1T (16, N); scalars (N, 16)
    standard-form limbs < 2^num_bits. Returns G1T (16, 1) replicated."""
    from zkevm_tpu.ec.group_t import (G1T, add_pt, double_t, identity_t,
                                      select_t)

    scalars = jnp.asarray(scalars, jnp.uint32)

    def fold(acc, blk):
        return add_pt(acc, G1T(blk[0][:, None], blk[1][:, None],
                               blk[2][:, None])), None

    def local(px, py, pz, s):
        bits_t = jnp.moveaxis(ff.scalar_bits(s, num_bits), -1, 0)
        base = G1T(px, py, pz)
        acc = identity_t(base.batch_shape, like=px)

        def body(carry, bit):
            a, b = carry
            a = select_t(bit != 0, add_pt(a, b), a)
            return (a, double_t(b)), None

        (acc, _), _ = jax.lax.scan(body, (acc, base), bits_t)
        xs = tuple(jnp.moveaxis(v, 1, 0) for v in (acc.x, acc.y, acc.z))
        part, _ = jax.lax.scan(fold, identity_t((1,), like=px), xs)
        gx = jax.lax.all_gather(part.x, "chips", axis=1, tiled=True)
        gy = jax.lax.all_gather(part.y, "chips", axis=1, tiled=True)
        gz = jax.lax.all_gather(part.z, "chips", axis=1, tiled=True)
        xs = tuple(jnp.moveaxis(v, 1, 0) for v in (gx, gy, gz))
        tot, _ = jax.lax.scan(fold, identity_t((1,), like=px), xs)
        return tot.x, tot.y, tot.z

    pspec = P(None, "chips")
    sspec = P("chips", None)
    rep = P(None, None)
    x, y, z = jax.jit(_shard_map(
        local, mesh, (pspec, pspec, pspec, sspec), (rep, rep, rep)
    ))(points_t.x, points_t.y, points_t.z, scalars)
    from zkevm_tpu.ec.group_t import G1T as _G1T

    return _G1T(x, y, z)


class MeshMSM:
    """Mesh-sharded MSM engine with the ParamsKZG.pippenger interface:
    `__call__(scalars standard-form (N,16)) -> G1T (16,1)`.

    This is how the PRODUCTION prover shards over chips: plonk/prover.py's
    `_commit` -> `ParamsKZG.commit` -> this engine -> `sharded_msm_t[_scan]`
    (point axis over the `chips` mesh, all_gather partial reduce). The
    reference parallelizes the same stage with rayon inside halo2's
    `best_multiexp` (SURVEY §2.5); here the parallelism is ICI collectives
    over a jax.sharding.Mesh.

    scan=True routes through the scan-CIOS double-and-add kernel — the
    compile-lean path the driver's forced-host-device dryrun can afford;
    scan=False uses the bucketed Pippenger (the real-chip hot path).
    """

    def __init__(self, mesh: Mesh, points_t, *, scan: bool = False,
                 c: int = 16, num_bits: int = 256):
        self.mesh = mesh
        self.points = points_t
        self.scan = scan
        self.c = c
        self.num_bits = num_bits
        self.n = points_t.x.shape[1]

    def __call__(self, scalars):
        scalars = jnp.asarray(scalars, jnp.uint32)
        if scalars.ndim == 1:
            scalars = scalars[None]
        assert scalars.shape[0] == self.n, (scalars.shape, self.n)
        if self.scan:
            return sharded_msm_t_scan(self.mesh, self.points, scalars,
                                      num_bits=self.num_bits)
        return sharded_msm_t(self.mesh, self.points, scalars, c=self.c,
                             num_bits=self.num_bits)


def sharded_msm_t(mesh: Mesh, points_t, scalars, *, c: int = 4,
                  num_bits: int = 256, sublanes: int = 128):
    """Point-sharded bucketed Pippenger MSM (the commit hot path,
    ec/pippenger.py) over the chips mesh: each chip folds its point shard
    through the full bucket pipeline; the C per-chip partials (one point
    each) ride an all_gather and a tiny on-device fold. Returns G1T (1,)
    replicated."""
    from zkevm_tpu.ec.group_t import G1T, add_pt, identity_t
    from zkevm_tpu.ec.pippenger import msm_t

    scalars = jnp.asarray(scalars, jnp.uint32)

    def local(px, py, pz, s):
        part = msm_t(G1T(px, py, pz), s, c=c, num_bits=num_bits,
                     sublanes=sublanes)  # (16, 1)
        gx = jax.lax.all_gather(part.x, "chips", axis=1, tiled=True)
        gy = jax.lax.all_gather(part.y, "chips", axis=1, tiled=True)
        gz = jax.lax.all_gather(part.z, "chips", axis=1, tiled=True)

        def fold(acc, blk):
            return add_pt(acc, G1T(blk[0][:, None], blk[1][:, None],
                                   blk[2][:, None])), None

        xs = tuple(jnp.moveaxis(v, 1, 0) for v in (gx, gy, gz))
        tot, _ = jax.lax.scan(fold, identity_t((1,), like=gx), xs)
        return tot.x, tot.y, tot.z

    pspec = P(None, "chips")
    sspec = P("chips", None)
    rep = P(None, None)
    x, y, z = jax.jit(_shard_map(
        local, mesh, (pspec, pspec, pspec, sspec), (rep, rep, rep)
    ))(points_t.x, points_t.y, points_t.z, scalars)
    from zkevm_tpu.ec.group_t import G1T as _G1T

    return _G1T(x, y, z)
