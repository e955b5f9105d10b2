"""Prover orchestration layer (reference crate `prover`, SURVEY L6):
artifact (de)serialization, load-or-generate caching, SRS management."""

from zkevm_tpu.prover.artifacts import (
    dump_proof,
    load_or_gen_proof,
    load_proof,
    proof_from_bytes,
    proof_to_bytes,
    vk_fingerprint,
)

__all__ = [
    "dump_proof",
    "load_or_gen_proof",
    "load_proof",
    "proof_from_bytes",
    "proof_to_bytes",
    "vk_fingerprint",
]
