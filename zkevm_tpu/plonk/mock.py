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
from zkevm_tpu.plonk.expr import Const, EvalContext, Prod, Query

FR = fr_spec()


def _peel_selectors(poly):
    """Split `q1 * q2 * ... * rest` into ([fixed-column selector queries],
    rest): the leading left-spine factors that are plain fixed-column
    queries. Sound row restriction: wherever any selector evaluates to 0
    the whole product is 0, so `rest` only needs checking on rows where
    every selector is nonzero."""
    spine = []
    node = poly
    while isinstance(node, Prod):
        spine.append(node.b)
        node = node.a
    spine.append(node)
    spine.reverse()
    sels = []
    i = 0
    while (
        i < len(spine)
        and isinstance(spine[i], Query)
        and spine[i].column.kind == "fixed"
    ):
        sels.append(spine[i])
        i += 1
    if not sels or i == len(spine):
        return [], poly
    rest = spine[i]
    for f in spine[i + 1 :]:
        rest = Prod(rest, f)
    return sels, rest


def _row_key_ids(tables: list, inputs: list, active: int):
    """Dense ids for (active,)-row tuples of limb arrays, shared between
    table and input sides (vectorized multiset membership)."""
    tab = np.concatenate([np.asarray(t)[:active] for t in tables], axis=1)
    inp = np.concatenate([np.asarray(i)[:active] for i in inputs], axis=1)
    cat = np.concatenate([tab, inp])
    _, inv = np.unique(cat, axis=0, return_inverse=True)
    return inv[:active], inv[active:]


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
    @staticmethod
    def default_challenges(cs: ConstraintSystem) -> list[int]:
        """The deterministic pseudo-challenges (halo2 mock convention) —
        exported so circuits can pre-fill challenge-dependent phase-1
        columns before assert_satisfied."""
        return [0x100 + 7 * i for i in range(len(cs.challenges))]

    def __init__(self, cs: ConstraintSystem, assignment: Assignment, challenges: list[int] | None = None):
        self.cs = cs
        self.assignment = assignment
        self.n = assignment.n
        if challenges is None:
            # deterministic pseudo-challenges, like halo2's mock challenge
            # values — fine because the mock prover checks identities that
            # must hold for every challenge
            challenges = self.default_challenges(cs)
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

        # host views of fixed columns for the selector-peeled fast path
        fixed_nonzero: dict = {}

        def sel_rows(sels) -> np.ndarray | None:
            mask = None
            for sq in sels:
                col = sq.column
                if col not in fixed_nonzero:
                    fixed_nonzero[col] = np.any(
                        self.assignment.cols[col] != 0, axis=1
                    )
                m = fixed_nonzero[col]
                if sq.rotation:
                    m = np.roll(m, -sq.rotation)
                mask = m if mask is None else (mask & m)
            return np.nonzero(mask)[0]

        for gi, gate in enumerate(cs.gates):
            for pi, poly in enumerate(gate.polys):
                sels, rest = _peel_selectors(poly)
                rows_map = None
                if sels:
                    rows = sel_rows(sels)
                    if rows.size == 0:
                        continue  # every row zeroed by a selector
                    # pad to a power of two so jit shapes bucket together
                    m = 1
                    while m < rows.size:
                        m *= 2
                    rows_map = np.concatenate(
                        [rows, np.full(m - rows.size, rows[0], np.int64)]
                    )
                    ctx.set_rows(rows_map)
                    vals = rest.evaluate(ctx)
                    ctx.rows = None
                else:
                    vals = poly.evaluate(ctx)
                nz = ~ff.is_zero(vals)
                if gate.vector_width:
                    bad_rows = np.nonzero(np.asarray(nz).any(axis=1))[0]
                    if bad_rows.size:
                        lanes = np.nonzero(np.asarray(nz)[bad_rows[0]])[0]
                        if rows_map is not None:
                            bad_rows = np.unique(rows_map[bad_rows])
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
                        if rows_map is not None:
                            bad = np.unique(rows_map[bad])
                        failures.append(Failure("gate", gate.name, pi, bad.tolist()))

        def eval_rows(e):
            # constants evaluate to a single (L,) limb vector — broadcast to
            # per-row shape like the real prover's compress_vals does
            return np.broadcast_to(np.asarray(e.evaluate(ctx)), (n, ff.L))

        for li, lk in enumerate(cs.lookups):
            inputs = [eval_rows(e) for e in lk.inputs]
            tables = [eval_rows(e) for e in lk.tables]
            tab_ids, inp_ids = _row_key_ids(tables, inputs, active)
            ok = np.isin(inp_ids, tab_ids)
            bad_rows = np.nonzero(~ok)[0]
            if bad_rows.size:
                failures.append(Failure("lookup", lk.name, li, bad_rows.tolist()))

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
