"""Multi-scalar multiplication on TPU.

Replaces the Pippenger MSM inside scroll-tech/halo2's proving backend
(reference: halo2_proofs `best_multiexp`, imported at
/root/reference/Cargo.toml:40 — rayon-chunked buckets on CPU). A classic
bucket scatter does not vectorize on a SIMD/VPU machine, so the TPU design
uses two different shapes:

- :func:`msm` (variable base): batched double-and-add — one (add, double)
  pair per scalar bit over all N lanes (a 2-op ``lax.scan`` body), then a
  log2(N) tree reduction. ~512·N point ops, fully lane-parallel, O(N) memory.

- :class:`FixedBaseMSM` (for KZG commitments, where the SRS bases never
  change): per-point window tables T[i][d] = d·P_i (d < 2^c) built once on
  device; per window w the partial sum S_w = Σ_i T[i][digit_iw] is a gather
  + masked tree reduction (vectorized over a chunk of windows at a time);
  the result is a Horner scan Σ_w 2^{cw}·S_w. ~(2^c + 64/c)·N point ops per
  MSM at c-bit windows — ~8× fewer than the variable-base path at c = 4.

Multi-chip sharding (points partitioned across devices, partial sums reduced
with psum over ICI — SURVEY.md §2.5) lives in ``zkevm_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec import group
from zkevm_tpu.ec.group import G1
from zkevm_tpu.ff import limbs as ff


def msm(points: G1, scalars) -> G1:
    """Variable-base MSM: sum_i scalars[i] * points[i].

    points: G1 with batch shape (N,); scalars: (N, 16) standard-form limbs.
    Returns a G1 with batch shape ().
    """
    partial = group.scalar_mul(points, jnp.asarray(scalars, jnp.uint32))
    out = group.sum_reduce(partial)
    return G1(out.x[0], out.y[0], out.z[0])


class FixedBaseMSM:
    """Windowed fixed-base MSM over a static point set (e.g. the KZG SRS).

    Precomputes d * P_i for every digit value d < 2^c once; each commit is
    then gather + tree-reduce + Horner.
    """

    def __init__(self, points: G1, c: int = 4, window_chunk: int = 16):
        assert 256 % c == 0
        self.c = c
        self.num_windows = 256 // c
        self.window_chunk = window_chunk  # windows reduced together
        self.n = points.x.shape[0]
        # eager table build: 2^c - 2 dispatches of the cached jitted add
        entries = [group.identity((self.n,)), points]
        for _ in range(2, 1 << self.c):
            entries.append(group.add(entries[-1], points))
        self.table = G1(
            jnp.stack([e.x for e in entries], axis=1),
            jnp.stack([e.y for e in entries], axis=1),
            jnp.stack([e.z for e in entries], axis=1),
        )  # (N, 2^c, 16) per coord

    def __call__(self, scalars) -> G1:
        """scalars: (N, 16) standard-form limbs -> G1 scalar batch ().

        Eager composition: windows processed window_chunk at a time; each
        chunk is one gather + log2(N) halving-tree dispatches over a
        (chunk, N) batch. Memory per chunk: chunk * N * 192 B."""
        scalars = jnp.asarray(scalars, jnp.uint32)
        c, W = self.c, self.window_chunk
        sums_parts = []
        for start in range(0, self.num_windows, W):
            wn = min(W, self.num_windows - start)
            digits = jnp.stack(
                [ff.scalar_window(scalars, w, c) for w in range(start, start + wn)]
            )  # (wn, N)
            gathered = G1(
                jnp.take_along_axis(self.table.x[None], digits[..., None, None], axis=2)[:, :, 0],
                jnp.take_along_axis(self.table.y[None], digits[..., None, None], axis=2)[:, :, 0],
                jnp.take_along_axis(self.table.z[None], digits[..., None, None], axis=2)[:, :, 0],
            )  # batch (wn, N)
            # halving tree over axis 1 (log2 N dispatches)
            m = 1
            while m < self.n:
                m *= 2
            p = gathered
            if m != self.n:
                pad = group.identity((wn, m - self.n))
                p = G1(
                    jnp.concatenate([p.x, pad.x], axis=1),
                    jnp.concatenate([p.y, pad.y], axis=1),
                    jnp.concatenate([p.z, pad.z], axis=1),
                )
            while m > 1:
                m //= 2
                p = group.add(
                    G1(p.x[:, :m], p.y[:, :m], p.z[:, :m]),
                    G1(p.x[:, m:], p.y[:, m:], p.z[:, m:]),
                )
            sums_parts.append(G1(p.x[:, 0], p.y[:, 0], p.z[:, 0]))
        sums = G1(
            jnp.concatenate([s.x for s in sums_parts]),
            jnp.concatenate([s.y for s in sums_parts]),
            jnp.concatenate([s.z for s in sums_parts]),
        )  # (num_windows,)

        # Horner over windows, highest first: acc = 2^c * acc + S_w
        acc = group.identity(())
        for w in range(self.num_windows - 1, -1, -1):
            for _ in range(c):
                acc = group.double(acc)
            acc = group.add(acc, G1(sums.x[w], sums.y[w], sums.z[w]))
        return acc


def msm_ints(points_affine: list, scalar_ints: list) -> G1:
    """Convenience: host ints -> device MSM (tests / small inputs)."""
    pts = group.from_affine_ints(points_affine)
    scal = ff.limbs_from_ints([s % group.FR.modulus for s in scalar_ints])
    return msm(pts, scal)
