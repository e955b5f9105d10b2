"""zkEVM subcircuits (SURVEY.md §2.2 inventory).

Each circuit follows the reference's SubCircuit shape
(zkevm-circuits/src/util.rs:251-287): configure(cs) -> config,
assign(witness) -> column arrays, instance() -> public values — but
witness assignment is vectorized array programs, and bit-parallel circuits
use ColumnGroup vector columns (a TPU-native idiom with no halo2
counterpart; see zkevm_tpu.plonk.cs.ColumnGroup).
"""
