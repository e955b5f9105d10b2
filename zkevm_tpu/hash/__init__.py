"""Hash layer: Keccak-f[1600] + Poseidon, host goldens + batched device
kernels (replaces tiny-keccak and scroll-tech/poseidon-circuit's base)."""

from zkevm_tpu.hash import keccak, poseidon
from zkevm_tpu.hash.keccak import keccak256, keccak256_batch, keccak_f
from zkevm_tpu.hash.poseidon import P128_POW5_T3, PoseidonSpec, permute

__all__ = [
    "keccak",
    "poseidon",
    "keccak256",
    "keccak256_batch",
    "keccak_f",
    "P128_POW5_T3",
    "PoseidonSpec",
    "permute",
]
