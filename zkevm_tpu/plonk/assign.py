"""Witness assignment: fixed-capacity column arrays.

Replaces halo2's `Layouter`/`Region` cell-by-cell assignment (reference:
halo2_proofs assignment API; the reference parallelizes it with
`parallel_syn` regions, zkevm-circuits/src/evm_circuit/execution.rs:1236).
TPU-first idiom: a circuit *computes whole columns* as arrays — the witness
generators are vectorized array programs (SURVEY.md §7 architecture
stance), so "synthesis" is just filling (n, 16) Montgomery buffers.
"""

from __future__ import annotations

import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.cs import Column, ConstraintSystem

FR = fr_spec()


class Assignment:
    """Mutable numpy buffers for every column of a ConstraintSystem."""

    def __init__(self, cs: ConstraintSystem, n: int):
        self.cs = cs
        self.n = n
        self.cols: dict[Column, np.ndarray] = {}
        for col in cs.fixed_columns + cs.advice_columns + cs.instance_columns:
            self.cols[col] = np.zeros((n, ff.L), dtype=np.uint32)

    # -- setters ---------------------------------------------------------
    def set_int(self, col: Column, row: int, value: int) -> None:
        self.cols[col][row] = FR.encode(value)

    def set_ints(self, col: Column, start: int, values) -> None:
        vals = list(values)
        enc = np.stack([FR.encode(int(v)) for v in vals]) if vals else None
        if enc is not None:
            self.cols[col][start : start + len(vals)] = enc

    def set_mont(self, col: Column, start: int, mont_rows: np.ndarray) -> None:
        """mont_rows: (k, 16) already-encoded Montgomery limbs."""
        self.cols[col][start : start + mont_rows.shape[0]] = mont_rows

    def set_u64s(self, col: Column, start: int, values: np.ndarray) -> None:
        """Vectorized small-int assignment: values (k,) uint64 ndarray ->
        Montgomery rows via one batched device to_mont (no per-row Python
        encode loop — the hot path for range tables / byte columns)."""
        values = np.asarray(values, dtype=np.uint64)
        k = values.shape[0]
        if k == 0:
            return
        std = np.zeros((k, ff.L), dtype=np.uint32)
        for limb in range(4):
            std[:, limb] = (values >> np.uint64(16 * limb)).astype(np.uint32) & 0xFFFF
        mont = np.asarray(ff.to_mont(FR, std))
        self.cols[col][start : start + k] = mont

    def fill_int(self, col: Column, value: int, start: int = 0, end: int | None = None) -> None:
        end = self.n if end is None else end
        self.cols[col][start:end] = FR.encode(value)

    # -- getters ---------------------------------------------------------
    def get_int(self, col: Column, row: int) -> int:
        return FR.decode(self.cols[col][row])

    def column_ints(self, col: Column) -> list[int]:
        return FR.decode_many(self.cols[col])

    def split(self):
        """-> (fixed, advice, instance) dicts of Column -> (n, 16) arrays."""
        fixed = {c: self.cols[c] for c in self.cs.fixed_columns}
        advice = {c: self.cols[c] for c in self.cs.advice_columns}
        inst = {c: self.cols[c] for c in self.cs.instance_columns}
        return fixed, advice, inst
