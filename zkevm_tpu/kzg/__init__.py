"""KZG layer: SRS params, device commitments, opens, host verification
(replaces halo2_proofs' ParamsKZG / KZGCommitmentScheme)."""

from zkevm_tpu.kzg.params import ParamsKZG, open_single, verify_single

__all__ = ["ParamsKZG", "open_single", "verify_single"]
