"""Circuit capacity checker — sequencer admission control.

Reference counterpart: prover/src/zkevm/capacity_checker.rs:19-75
(`CircuitCapacityChecker`: estimate per-tx row usage, normalize against
per-subcircuit limits x a confidence factor, so the sequencer never
seals a chunk that cannot be proven) with the row budgets of
super_circuit/params.rs:9-23 and the strict-ccc hard error
(circuit_input_builder.rs:515-521).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.circuits import keccak_table as kt


@dataclass
class RowUsage:
    """Per-subcircuit absolute row demand."""

    rows: dict = field(default_factory=dict)

    def add(self, other: dict) -> None:
        for name, v in other.items():
            self.rows[name] = self.rows.get(name, 0) + v

    def normalized(self, limits: dict) -> dict:
        """Fraction of each subcircuit's budget consumed (the reference's
        RowUsageDetails normalization)."""
        return {
            name: self.rows.get(name, 0) / limits[name]
            for name in limits
        }


# Default per-subcircuit row budgets for a k=20 super circuit — the shape
# of super_circuit/params.rs:9-23 scaled to the currently implemented
# subcircuit set (1M-row budgets for the big tables).
DEFAULT_LIMITS = {
    "evm": (1 << 20) - 256,
    "state": (1 << 20) - 256,
    "bytecode": (1 << 20) - 256,
    "keccak": ((1 << 20) // kt.PERM) * kt.PERM,
}
CONFIDENCE = 0.99  # acceptance threshold (capacity_checker.rs tx_slots)


class CircuitCapacityChecker:
    """Accumulates row usage tx by tx; `estimate` answers "does this tx
    still fit?" BEFORE it is added (admission control), `add` commits it.

    usage dicts use super_circuit.row_usage keys.
    """

    def __init__(self, limits: dict | None = None, *, strict: bool = False):
        self.limits = dict(limits or DEFAULT_LIMITS)
        self.strict = strict
        self.acc = RowUsage()

    def reset(self) -> None:
        self.acc = RowUsage()

    def estimate(self, tx_usage: dict) -> dict:
        """Normalized usage if tx were added; max value > CONFIDENCE
        means the chunk would overflow."""
        trial = RowUsage(dict(self.acc.rows))
        trial.add(tx_usage)
        return trial.normalized(self.limits)

    def fits(self, tx_usage: dict) -> bool:
        norm = self.estimate(tx_usage)
        return max(norm.values(), default=0.0) <= CONFIDENCE

    def add(self, tx_usage: dict) -> dict:
        """Commit a tx's usage. Under strict mode an overflow raises (the
        reference's strict-ccc feature)."""
        if self.strict and not self.fits(tx_usage):
            raise OverflowError(
                f"chunk row overflow: {self.estimate(tx_usage)}"
            )
        self.acc.add(tx_usage)
        return self.acc.normalized(self.limits)
