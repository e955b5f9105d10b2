"""MockProver analog: evaluate every constraint on device, report failures.

Reference role: halo2's `MockProver::run` / `assert_satisfied_par` — the
workhorse of the reference's whole test strategy (SURVEY.md §4 tier 1;
e.g. testool executor at testool/src/statetest/executor.rs:497). Gates are
evaluated as batched field ops over all rows at once; failures come back as
(gate name, poly index, row) for debuggability.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.expr import EvalContext

FR = fr_spec()


@dataclass
class Failure:
    kind: str  # "gate" | "lookup" | "copy"
    name: str
    index: int
    rows: list

    def __repr__(self):
        rows = self.rows[:8]
        more = "..." if len(self.rows) > 8 else ""
        return f"[{self.kind}] {self.name}#{self.index} rows={rows}{more}"


class MockProver:
    def __init__(self, cs: ConstraintSystem, assignment: Assignment, challenges: list[int] | None = None):
        self.cs = cs
        self.assignment = assignment
        self.n = assignment.n
        if challenges is None:
            # deterministic pseudo-challenges, like halo2's mock challenge
            # values — fine because the mock prover checks identities that
            # must hold for every challenge
            challenges = [0x100 + 7 * i for i in range(len(cs.challenges))]
        self.challenge_values = challenges

    def verify(self) -> list[Failure]:
        cs, n = self.cs, self.n
        # Real-prover semantics: gates are enforced on EVERY row (circuits
        # must selector-gate them); lookups/permutations only on the active
        # region rows 0..usable-2 (the grand-product transition rows).
        active = cs.usable_rows(n) - 1
        cols = {c: jnp.asarray(a) for c, a in self.assignment.cols.items()}
        ch = [jnp.asarray(FR.encode(v)) for v in self.challenge_values]
        ctx = EvalContext(cols, ch)
        failures: list[Failure] = []

        for gi, gate in enumerate(cs.gates):
            for pi, poly in enumerate(gate.polys):
                vals = poly.evaluate(ctx)
                nz = ~ff.is_zero(vals)
                if gate.vector_width:
                    bad_rows = np.nonzero(np.asarray(nz).any(axis=1))[0]
                    if bad_rows.size:
                        lanes = np.nonzero(np.asarray(nz)[bad_rows[0]])[0]
                        failures.append(
                            Failure(
                                "gate",
                                f"{gate.name}[lanes {lanes.tolist()[:8]}]",
                                pi,
                                bad_rows.tolist(),
                            )
                        )
                else:
                    bad = np.nonzero(np.asarray(nz))[0]
                    if bad.size:
                        failures.append(Failure("gate", gate.name, pi, bad.tolist()))

        for li, lk in enumerate(cs.lookups):
            inputs = [np.asarray(e.evaluate(ctx)) for e in lk.inputs]
            tables = [np.asarray(e.evaluate(ctx)) for e in lk.tables]
            table_set = set()
            for r in range(active):
                table_set.add(tuple(bytes(t[r]) for t in tables))
            bad_rows = []
            for r in range(active):
                if tuple(bytes(i[r]) for i in inputs) not in table_set:
                    bad_rows.append(r)
            if bad_rows:
                failures.append(Failure("lookup", lk.name, li, bad_rows))

        for ci, (ca, ra, cb, rb) in enumerate(cs.copies):
            a = self.assignment.cols[ca][ra]
            b = self.assignment.cols[cb][rb]
            if not np.array_equal(a, b):
                failures.append(Failure("copy", f"{ca}@{ra}=={cb}@{rb}", ci, [ra, rb]))

        return failures

    def assert_satisfied(self) -> None:
        failures = self.verify()
        if failures:
            msgs = "\n".join(map(repr, failures[:20]))
            raise AssertionError(f"{len(failures)} constraint failures:\n{msgs}")
