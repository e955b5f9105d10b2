"""Aggregation stack: in-circuit snark verification, compression, batch
aggregation with EIP-4844 blob consistency, and bundle recursion.

Reference counterpart: the `aggregator` crate
(/root/reference/aggregator/src/, SURVEY.md §2.3) + scroll-tech's
snark-verifier / snark-verifier-sdk (the in-circuit PLONK verifier the
reference imports, SURVEY.md §1 L0). Here the verifier is arithmetized
natively against THIS framework's PLONKish runtime (zkevm_tpu.plonk):
scalar work on the FlexGate chip, Poseidon-transcript challenges via
PoseidonPermTable lookups, EC work via the ECC circuit's region machinery,
and the final pairing deferred through a KZG accumulator exposed in the
instance (snark-verifier's KzgAccumulator idiom).
"""
