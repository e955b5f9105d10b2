"""Multi-chip layer: mesh construction + sharded MSM/NTT.

The reference is a single-process rayon prover (SURVEY.md §2.5); its
parallelism maps to TPU as: data-parallel row batching -> vmap/sharding,
multi-core MSM/NTT -> kernels sharded over a `jax.sharding.Mesh` with XLA
collectives over ICI. This package is that communication layer.
"""

from zkevm_tpu.parallel.mesh import default_mesh, sharded_msm, sharded_ntt_batch

__all__ = ["default_mesh", "sharded_msm", "sharded_ntt_batch"]
