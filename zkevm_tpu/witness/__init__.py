"""Witness generation layer ("bus mapping").

Reference counterpart: bus-mapping/ (~24.5k LoC): geth trace -> structured
witness (RW operations, call contexts, copy/exp events) consumed by the
circuits. See rw.py (operation.rs analog) and builder.py
(circuit_input_builder.rs analog).
"""

from zkevm_tpu.witness.builder import CircuitInputBuilder
from zkevm_tpu.witness.rw import RW, RwMap, Target

__all__ = ["CircuitInputBuilder", "RW", "RwMap", "Target"]
