"""Finite-field layer: BN254 Fr/Fq as vectorized 16x16-bit limb arrays."""

from zkevm_tpu.ff import goldens, limbs
from zkevm_tpu.ff.limbs import (
    FieldSpec,
    fq_spec,
    fr_spec,
    int_from_limbs,
    ints_from_limbs,
    limbs_from_int,
    limbs_from_ints,
)

FR = fr_spec()
FQ = fq_spec()

__all__ = [
    "FR",
    "FQ",
    "FieldSpec",
    "goldens",
    "limbs",
    "fq_spec",
    "fr_spec",
    "int_from_limbs",
    "ints_from_limbs",
    "limbs_from_int",
    "limbs_from_ints",
]
