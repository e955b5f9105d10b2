"""Circuit statistics + stage timers — the observability layer.

Reference counterparts: zkevm-circuits/src/stats.rs and
evm_circuit/util/instrumentation.rs (per-state cell/row utilization,
Makefile stats_* targets), ark-std start_timer!/end_timer! spans around
keygen/prove (circuit-benchmarks/src/super_circuit.rs:103-118), and the
row-usage logs of super_circuit.rs:536-605. The same observable
quantities, as structured dicts you can json-dump.
"""

from __future__ import annotations

import sys
import time
from collections import Counter
from contextlib import contextmanager

import numpy as np

from zkevm_tpu.plonk.cs import ConstraintSystem


def circuit_stats(cs: ConstraintSystem, n: int | None = None) -> dict:
    """Shape statistics of a constraint system: what the prover will have
    to commit to and evaluate (stats.rs's circuit view)."""
    phase_counts = Counter(c.phase for c in cs.advice_columns)
    gate_polys = sum(
        len(g.polys) * (g.vector_width or 1) for g in cs.gates
    )
    degrees = [max((p.degree() for p in g.polys), default=0) for g in cs.gates]
    out = {
        "advice_columns": len(cs.advice_columns),
        "advice_by_phase": dict(sorted(phase_counts.items())),
        "fixed_columns": len(cs.fixed_columns),
        "gates": len(cs.gates),
        "gate_polys": gate_polys,
        "max_gate_degree": max(degrees, default=0),
        "lookups": len(cs.lookups),
        "permutation_columns": len(cs.permutation_columns),
        "copies": len(cs.copies),
        # commitments per proof: advice + 2/lookup (permuted) + z/lookup
        # + z perm chunks (=1 here) + random + h pieces (deg)
        "commitments_per_proof": (
            len(cs.advice_columns)
            + 3 * len(cs.lookups)
            + 1  # permutation z (single chunk)
            + 1  # random poly
            + cs.gate_degree()  # h pieces
        ),
    }
    if n is not None:
        out["n"] = n
        out["usable_rows"] = cs.usable_rows(n)
    return out


def assignment_stats(cs: ConstraintSystem, asg) -> dict:
    """Row occupancy per column family: how much of the layout is live
    (instrumentation.rs's utilization view, per column here)."""
    used = {}
    for fam, cols in (
        ("advice", cs.advice_columns),
        ("fixed", cs.fixed_columns),
    ):
        live_rows = 0
        live_cols = 0
        for c in cols:
            arr = asg.cols[c]
            nz = int(np.count_nonzero(arr.any(axis=-1)))
            if nz:
                live_cols += 1
                live_rows = max(live_rows, nz)
        used[fam] = {"live_columns": live_cols, "max_live_rows": live_rows}
    return used


@contextmanager
def span(name: str, sink: dict | None = None):
    """start_timer!/end_timer! analog; logs to stderr and optionally
    records wall-clock seconds in `sink[name]`."""
    t0 = time.perf_counter()
    print(f"[span] {name}...", file=sys.stderr, flush=True)
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        print(f"[span] {name}: {dt:.3f}s", file=sys.stderr, flush=True)
        if sink is not None:
            sink[name] = dt
