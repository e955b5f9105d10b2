"""KZG commitment parameters (SRS) + commit/open on device.

TPU-native analog of halo2_proofs' `ParamsKZG<Bn256>` (reference:
scroll-tech/halo2 via /root/reference/Cargo.toml:40; SRS loading and s_g2
fingerprinting at prover/src/utils.rs:36-84). Differences by design:

- the SRS lives as a device G1 batch (N, limbs) with an optional
  FixedBaseMSM window table (the commit hot path);
- commit_lagrange = device iNTT + monomial commit (no Lagrange SRS copy);
- single-point opens compute the quotient in *evaluation* form with a
  batched Fermat inversion — fully lane-parallel, no sequential synthetic
  division;
- verification is host-side via the golden pairing (production proofs are
  verified on-chain / by the recursion circuit, as in the reference).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec import goldens as g1g, group, group_t, pairing as pr
from zkevm_tpu.ec.group import G1
from zkevm_tpu.ec.msm import FixedBaseMSM, msm
from zkevm_tpu.ec.pippenger import PippengerMSMT
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.poly import ntt as nttmod

FR = fr_spec()


@jax.jit
def _srs_chunk(px, py, pz, powers):
    """One fixed-shape chunk of [tau^i] G1 (jitted once, dispatched per
    chunk)."""
    pt = group.scalar_mul_scan(G1(px, py, pz), powers)
    return pt.x, pt.y, pt.z


@partial(jax.jit, static_argnums=(0,))
def _srs_gen(n: int, tau_mont, gen: G1) -> G1:
    """[tau^i] G1 for i < n as ONE jitted program: Montgomery prefix
    product for the powers, then an in-jit 256-bit double-and-add scan."""
    taus = jnp.broadcast_to(tau_mont, (n, ff.L))
    pows = jax.lax.associative_scan(
        lambda a, b: ff.mont_mul(FR, a, b), taus, axis=0
    )
    one = jnp.asarray(FR.encode(1))[None]
    pows = jnp.concatenate([one, pows[:-1]], axis=0)  # [1, tau, tau^2, ...]
    pows_std = ff.from_mont(FR, pows)
    base = G1(
        jnp.broadcast_to(gen.x, (n, ff.L)),
        jnp.broadcast_to(gen.y, (n, ff.L)),
        jnp.broadcast_to(gen.z, (n, ff.L)),
    )
    return group.scalar_mul_scan(base, pows_std)


@dataclass
class ParamsKZG:
    k: int
    g1_powers: G1  # (n,) device batch: [tau^i] G1
    g2: tuple  # host affine Fq2 pair
    s_g2: tuple  # [tau] G2
    committer: FixedBaseMSM | None = None
    pippenger: PippengerMSMT | None = None  # bucketed path, big SRS

    @property
    def n(self) -> int:
        return 1 << self.k

    # ------------------------------------------------------------------
    @classmethod
    def unsafe_setup(cls, k: int, tau: int = 0xDEAD_BEEF_CAFE, *, windowed: bool = True):
        """Test-only SRS from a known tau (the reference loads production
        SRS files; perpetuating tau here is deliberate for golden checks)."""
        n = 1 << k
        tau %= FR_MOD
        gen = group.from_affine_ints([g1g.G1_GEN])
        if k > 10:
            # big SRS: tau powers on host (cheap python modmuls), then the
            # jitted double-and-add scan over FIXED-SIZE chunks — one
            # moderate compile executed n/W times, instead of a single
            # 2^k-lane program whose remote (tunnel) compile can take an
            # hour at k=20
            W = 1 << 16
            chunks = []
            t = 1
            for c0 in range(0, n, W):
                m = min(W, n - c0)
                powers = np.empty((m, ff.L), dtype=np.uint32)
                for i in range(m):
                    powers[i] = ff.limbs_from_int(t)
                    t = t * tau % FR_MOD
                x, y, z = _srs_chunk(
                    jnp.broadcast_to(gen.x, (m, ff.L)),
                    jnp.broadcast_to(gen.y, (m, ff.L)),
                    jnp.broadcast_to(gen.z, (m, ff.L)),
                    jnp.asarray(powers),
                )
                chunks.append(G1(x, y, z))
            g1_powers = G1(
                jnp.concatenate([c.x for c in chunks]),
                jnp.concatenate([c.y for c in chunks]),
                jnp.concatenate([c.z for c in chunks]),
            )
        else:
            powers = np.empty((n, ff.L), dtype=np.uint32)
            t = 1
            for i in range(n):
                powers[i] = ff.limbs_from_int(t)
                t = t * tau % FR_MOD
            base = G1(
                jnp.broadcast_to(gen.x, (n, ff.L)),
                jnp.broadcast_to(gen.y, (n, ff.L)),
                jnp.broadcast_to(gen.z, (n, ff.L)),
            )
            g1_powers = group.scalar_mul(base, jnp.asarray(powers))
        s_g2 = pr.g2_scalar_mul(pr.G2_GEN, tau)
        # commit engine: per-base window tables are O(n * 2^c) memory — fine
        # at test scale; production sizes use the sorted-prefix-sum MSM
        # on the lazy-13 MXU-hybrid field core (ec/msm13.py, the halo2
        # best_multiexp analog; ZKEVM_TPU_MSM selects legacy engines)
        committer = None
        pippenger = None
        if k > 10:
            # default engine by platform: the lazy-13 MXU-hybrid on TPU;
            # the u16 prefix-sum on CPU (the c=16 boundary structures are
            # compile-heavy for XLA:CPU test runs)
            default = ("l13" if jax.devices()[0].platform == "tpu"
                       else "ps")
            engine = os.environ.get("ZKEVM_TPU_MSM", default)
            if engine == "l13":
                from zkevm_tpu.ec.msm13 import Msm13

                pippenger = Msm13(
                    group_t.from_g1(g1_powers), c=16,
                    lanes=int(os.environ.get("ZKEVM_TPU_MSM_LANES", "4096")),
                    wgroup=int(os.environ.get("ZKEVM_TPU_MSM_WGROUP", "8")))
            elif engine == "ps":
                from zkevm_tpu.ec.psmsm import PsMSM

                pippenger = PsMSM(group_t.from_g1(g1_powers), c=16,
                                  lanes=4096, wgroup=16)
            else:
                pippenger = PippengerMSMT(group_t.from_g1(g1_powers))
        elif windowed:
            committer = FixedBaseMSM(g1_powers)
        return cls(
            k=k, g1_powers=g1_powers, g2=pr.G2_GEN, s_g2=s_g2,
            committer=committer, pippenger=pippenger,
        )

    # ------------------------------------------------------------------
    def use_mesh(self, mesh=None, *, scan: bool = False) -> "ParamsKZG":
        """Shard the commit hot path over a device mesh (in place).

        Replaces the single-device MSM engine with parallel.mesh.MeshMSM:
        every `commit` (and therefore every column/lookup/quotient
        commitment inside plonk.prover.create_proof) runs point-sharded
        over the mesh with an all_gather partial reduce. With mesh=None a
        1-D mesh over all visible devices is built — call this when
        jax.device_count() > 1 to scale the production prover over chips.
        """
        from zkevm_tpu.ec import group_t
        from zkevm_tpu.parallel import mesh as meshmod

        if mesh is None:
            mesh = meshmod.default_mesh()
        nchips = mesh.shape["chips"]
        assert self.n % nchips == 0, (self.n, nchips)
        self.pippenger = meshmod.MeshMSM(
            mesh, group_t.from_g1(self.g1_powers), scan=scan
        )
        self.committer = None
        return self

    def commit(self, coeffs_mont) -> G1:
        """Commit to a coefficient-form polynomial ((n, 16) Montgomery)."""
        scalars = ff.from_mont(FR, jnp.asarray(coeffs_mont))
        if self.pippenger is not None:
            return group_t.to_g1(self.pippenger(scalars))
        if self.committer is not None:
            return self.committer(scalars)
        return msm(self.g1_powers, scalars)

    def commit_lagrange(self, evals_mont) -> G1:
        return self.commit(nttmod.intt(jnp.asarray(evals_mont), self.k))


def open_single(params: ParamsKZG, evals_mont, z: int):
    """KZG open of a polynomial (given in evaluation form over the 2^k
    domain) at an arbitrary point z NOT in the domain.

    Returns (value_int, proof_point). Quotient is computed pointwise:
    q(w^i) = (f(w^i) - f(z)) / (w^i - z), with f(z) via barycentric
    interpolation — all batched device math.
    """
    n, k = params.n, params.k
    evals = jnp.asarray(evals_mont)

    from zkevm_tpu.poly.goldens import domain_omega

    omega = domain_omega(k)
    # domain points and barycentric pieces (host scalars, device vectors)
    xs = nttmod._power_table(omega, n)  # Montgomery limbs of w^i
    z_m = jnp.asarray(FR.encode(z))
    diff = ff.sub(FR, jnp.asarray(xs), z_m)  # (n,16) w^i - z
    diff_inv = ff.inv(FR, diff)
    # barycentric: f(z) = (z^n - 1)/n * sum_i f_i * w^i / (z - w^i)
    zn1 = (pow(z, n, FR_MOD) - 1) % FR_MOD
    factor = zn1 * pow(n, FR_MOD - 2, FR_MOD) % FR_MOD
    neg_inv = ff.neg(FR, diff_inv)  # 1/(z - w^i)
    terms = ff.mont_mul(FR, ff.mont_mul(FR, evals, jnp.asarray(xs)), neg_inv)
    total = terms
    m = n
    while m > 1:
        m //= 2
        total = ff.add(FR, total[:m], total[m:])
    fz_m = ff.mont_mul(FR, total[0], jnp.asarray(FR.encode(factor)))
    # quotient evals and commitment
    q_evals = ff.mont_mul(FR, ff.sub(FR, evals, fz_m), diff_inv)
    proof = params.commit_lagrange(q_evals)
    return FR.decode(np.asarray(fz_m)), proof


def verify_single(params: ParamsKZG, commitment: G1, z: int, value: int, proof: G1) -> bool:
    """e(W, [tau - z]_2) == e(C - [v]_1, H) check via the golden pairing."""
    c_aff = group.to_affine_ints(commitment)[0]
    w_aff = group.to_affine_ints(proof)[0]
    # C - v*G1
    v_g1 = g1g.scalar_mul(g1g.G1_GEN, value)
    lhs = g1g.add(c_aff, g1g.neg(v_g1))
    # e(W, s_g2 - z*g2) * e(-(C - vG), g2) == 1
    z_g2 = pr.g2_scalar_mul(pr.G2_GEN, z)
    s_minus_z = pr.g2_add(params.s_g2, pr.g2_neg(z_g2))
    return pr.pairing_check([(w_aff, s_minus_z), (g1g.neg(lhs), pr.G2_GEN)])
