"""Reusable constraint gadgets (reference: /root/reference/gadgets/src —
is_zero.rs, less_than.rs, binary_number.rs, mul_add.rs — plus the u8/u16
range tables of zkevm-circuits/src/table.rs:3210).

Every gadget follows the same shape: `configure(cs, ...)` allocates
columns and registers gates/lookups returning a config dataclass, and a
vectorized `assign(asg, ...)` fills whole row ranges at once (numpy
arrays, no cell-by-cell Python) — the array-column idiom of this
framework."""

from zkevm_tpu.gadgets.binary import BinaryNumber
from zkevm_tpu.gadgets.is_zero import IsEqual, IsZero
from zkevm_tpu.gadgets.lt import Comparator, LtGadget
from zkevm_tpu.gadgets.mul_add import MulAddWord
from zkevm_tpu.gadgets.ranges import RangeTable

__all__ = [
    "BinaryNumber",
    "Comparator",
    "IsEqual",
    "IsZero",
    "LtGadget",
    "MulAddWord",
    "RangeTable",
]
