"""zkevm_tpu — a TPU-native Halo2-KZG zkEVM proving stack.

Built from scratch in JAX/XLA/Pallas with the capabilities of
scroll-tech/zkevm-circuits (the reference implementation, studied at
/root/reference). Layer map mirrors the reference's boundaries
(SURVEY.md §1) with TPU-first implementations:

- ``ff``         BN254 Fr/Fq arithmetic as 16x16-bit limb arrays (vectorized,
                 Montgomery form), replacing halo2curves.
- ``ec``         BN254 G1/G2 group ops + Pippenger MSM (replaces the MSM in
                 scroll-tech/halo2's backend).
- ``poly``       radix-2 NTT/iNTT, evaluation domains, coset extension.
- ``hash``       Poseidon + Keccak-f[1600], host golden + device-batched.
- ``transcript`` Fiat-Shamir transcripts (Poseidon for recursion, Keccak for
                 the EVM-facing proof), matching halo2's transcript roles.
- ``kzg``        KZG commitments + SHPLONK multi-open (ParamsKZG equivalent).
- ``plonk``      PLONKish arithmetization runtime: ConstraintSystem,
                 lookups, permutation argument, quotient, MockProver analog,
                 real prover/verifier (replaces halo2_proofs).
- ``circuits``   the zkEVM subcircuits (SURVEY.md §2.2 inventory).
- ``witness``    trace -> witness pipeline (bus-mapping equivalent).
- ``parallel``   mesh/collective layer: sharded MSM/NTT over ICI/DCN.
"""

__version__ = "0.1.0"
