"""PLONKish arithmetization runtime (replaces halo2_proofs).

ConstraintSystem + expressions + array-based assignment + MockProver +
keygen + KZG/SHPLONK prover and verifier. See SURVEY.md §7 stage 3.
"""

from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, DomainX, Expr, Query
from zkevm_tpu.plonk.keygen import ProvingKey, VerifyingKey, keygen
from zkevm_tpu.plonk.mock import MockProver
from zkevm_tpu.plonk.prover import Proof, create_proof
from zkevm_tpu.plonk.verifier import verify_proof

__all__ = [
    "Assignment",
    "Column",
    "ConstraintSystem",
    "Const",
    "DomainX",
    "Expr",
    "Query",
    "ProvingKey",
    "VerifyingKey",
    "keygen",
    "MockProver",
    "Proof",
    "create_proof",
    "verify_proof",
]
