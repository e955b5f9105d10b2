"""Multi-permutation Poseidon circuit exposing the PoseidonTable.

Reference counterpart: table.rs:943 PoseidonTable + the external
poseidon-circuit chip (zkevm-circuits/src/poseidon_circuit.rs) whose
sponge rows the MPT circuit looks up.

Same round gates as circuits/poseidon_circuit.py (one row per round,
deg-6 full/partial gates), but instead of instance binding the LAST row
of every permutation slot is a lookup surface:

    (in0, in1, cap, out) = (state_i at row -64 ..., state_0 here)

Every slot always carries a REAL permutation trace (unused slots run the
zero state), so each table row is a genuine Poseidon evaluation — the
capacity/domain element distinguishes leaf (2^64*1), branch (2^64*2) and
sponge (2^64*len) uses, exactly the zktrie hash layout
(state/zktrie.py:40).
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.hash import poseidon as pos
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()
SPEC = pos.P128_POW5_T3
T = SPEC.t
ROUNDS = SPEC.r_f + SPEC.r_p  # 64
PERM = ROUNDS + 1  # 65 rows per slot


@dataclass
class PoseidonTable:
    """(in0, in1, cap, out) rows — one per permutation slot."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               in0: Expr, in1: Expr, cap: Expr, out: Expr) -> None:
        """`poseidon([in0, in1, cap])[0] == out`, gated by boolean q."""
        ins = [q * in0, q * in1, q * cap, q * out]
        # enabled column: q itself against the fixed table selector
        cs.lookup(name, [(q, self.exprs[0])] + list(zip(ins, self.exprs[1:])))


@dataclass
class PoseidonPermTable:
    """Full-state permutation surface: (s0,s1,s2) -> (s0',s1',s2').

    The chained-sponge interface the in-circuit Poseidon TRANSCRIPT needs
    (snark-verifier's PoseidonTranscript role): a multi-block absorb must
    thread ALL t=3 output elements into the next permutation's input, not
    just out[0] — so this second surface over the same permutation slots
    exposes both full states."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               s_in: list, s_out: list) -> None:
        """`permute([s_in]) == s_out` (element-wise), gated by boolean q."""
        ins = [q * e for e in list(s_in) + list(s_out)]
        cs.lookup(name, [(q, self.exprs[0])] + list(zip(ins, self.exprs[1:])))


@dataclass
class PoseidonTableConfig:
    state: list
    rc: list
    q_full: Column
    q_partial: Column
    q_tbl: Column
    table: PoseidonTable
    perm_table: "PoseidonPermTable" = None


def configure(cs: ConstraintSystem) -> PoseidonTableConfig:
    state = [cs.advice_column() for _ in range(T)]
    rc = [cs.fixed_column() for _ in range(T)]
    q_full = cs.fixed_column()
    q_partial = cs.fixed_column()
    q_tbl = cs.fixed_column()
    _, mds = pos.generate_constants(SPEC)

    def mixed(sboxed):
        return [
            sum((Const(mds[j][i]) * sboxed[i] for i in range(T)), Const(0))
            for j in range(T)
        ]

    def pow5(e):
        e2 = e * e
        return e2 * e2 * e

    full_in = [pow5(state[i].cur() + rc[i].cur()) for i in range(T)]
    full_out = mixed(full_in)
    cs.create_gate(
        "pt_full",
        [q_full.cur() * (full_out[j] - state[j].next()) for j in range(T)],
    )
    part_in = [pow5(state[0].cur() + rc[0].cur())] + [
        state[i].cur() + rc[i].cur() for i in range(1, T)
    ]
    part_out = mixed(part_in)
    cs.create_gate(
        "pt_partial",
        [q_partial.cur() * (part_out[j] - state[j].next()) for j in range(T)],
    )

    qt = q_tbl.cur()
    table = PoseidonTable([
        qt,
        qt * state[0].rot(-ROUNDS),
        qt * state[1].rot(-ROUNDS),
        qt * state[2].rot(-ROUNDS),
        qt * state[0].cur(),
    ])
    perm_table = PoseidonPermTable([
        qt,
        qt * state[0].rot(-ROUNDS),
        qt * state[1].rot(-ROUNDS),
        qt * state[2].rot(-ROUNDS),
        qt * state[0].cur(),
        qt * state[1].cur(),
        qt * state[2].cur(),
    ])
    return PoseidonTableConfig(state, rc, q_full, q_partial, q_tbl, table,
                               perm_table)


def capacity(cs: ConstraintSystem, n: int) -> int:
    return (cs.usable_rows(n) - 1) // PERM


def h2(tag: int, a: int, b: int) -> int:
    """Host golden (zktrie._h2)."""
    return pos.permute_golden(
        SPEC, [a % FR_MOD, b % FR_MOD, ((1 << 64) * tag) % FR_MOD]
    )[0]


def assign(
    cs: ConstraintSystem,
    cfg: PoseidonTableConfig,
    n: int,
    states: list,
    asg: Assignment | None = None,
) -> Assignment:
    """states: list of [in0, in1, cap] initial states; unused slots run
    the zero permutation."""
    asg = asg if asg is not None else Assignment(cs, n)
    cap_slots = capacity(cs, n)
    assert len(states) <= cap_slots, f"{len(states)} perms > {cap_slots}"
    states = list(states) + [[0, 0, 0]] * (cap_slots - len(states))
    rc, mds = pos.generate_constants(SPEC)
    half = SPEC.r_f // 2
    one = FR.encode(1)
    for p, init in enumerate(states):
        base = p * PERM
        asg.cols[cfg.q_tbl][base + ROUNDS] = one
        s = [v % FR_MOD for v in init]
        for i in range(T):
            asg.set_int(cfg.state[i], base, s[i])
        for r in range(ROUNDS):
            row = base + r
            is_full = r < half or r >= half + SPEC.r_p
            asg.cols[cfg.q_full if is_full else cfg.q_partial][row] = one
            for i in range(T):
                asg.cols[cfg.rc[i]][row] = FR.encode(rc[r][i])
            if is_full:
                sb = [pow((s[i] + rc[r][i]) % FR_MOD, 5, FR_MOD)
                      for i in range(T)]
            else:
                sb = [pow((s[0] + rc[r][0]) % FR_MOD, 5, FR_MOD)] + [
                    (s[i] + rc[r][i]) % FR_MOD for i in range(1, T)
                ]
            s = [sum(mds[j][i] * sb[i] for i in range(T)) % FR_MOD
                 for j in range(T)]
            for i in range(T):
                asg.set_int(cfg.state[i], row + 1, s[i])
    return asg
