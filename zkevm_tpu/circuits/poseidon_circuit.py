"""Poseidon permutation circuit (t = 3, x^5, P128Pow5T3 schedule).

Reference counterpart: the Poseidon subcircuit wrapping scroll's external
hash-circuit chip (zkevm-circuits/src/poseidon_circuit.rs:13-51 +
scroll-tech/poseidon-circuit). Rebuilt from scratch: one row per round,
three advice state columns, fixed round-constant columns, and two gates
(full / partial round) of degree 6:

    q_full:    next_j = sum_i MDS[j][i] * (s_i + rc_i)^5
    q_partial: next_j = MDS[j][0]*(s_0+rc_0)^5 + sum_{i>0} MDS[j][i]*(s_i+rc_i)

A permutation occupies 65 rows (64 round rows + the output row). Multiple
permutations stack vertically; `hash2` chains expose sponge hashing of
2-element messages (the zktrie/MPT building block).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.hash import poseidon as pos
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()

SPEC = pos.P128_POW5_T3
T = SPEC.t
ROWS_PER_PERM = SPEC.r_f + SPEC.r_p + 1  # 65


@dataclass
class PoseidonConfig:
    state: list  # T advice columns
    rc: list  # T fixed columns (round constants)
    q_full: Column
    q_partial: Column
    instance: Column
    capacity_perms: int


def _pow5(e: Expr) -> Expr:
    e2 = e * e
    return e2 * e2 * e


def configure(cs: ConstraintSystem, n: int) -> PoseidonConfig:
    state = [cs.advice_column() for _ in range(T)]
    rc = [cs.fixed_column() for _ in range(T)]
    q_full = cs.fixed_column()
    q_partial = cs.fixed_column()
    instance = cs.instance_column()
    _, mds = pos.generate_constants(SPEC)

    def mixed(sboxed):
        """rows of MDS * column vector `sboxed` (list of T exprs)."""
        return [
            sum(
                (Const(mds[j][i]) * sboxed[i] for i in range(T)),
                Const(0),
            )
            for j in range(T)
        ]

    full_in = [_pow5(state[i].cur() + rc[i].cur()) for i in range(T)]
    full_out = mixed(full_in)
    cs.create_gate(
        "poseidon_full",
        [q_full.cur() * (full_out[j] - state[j].next()) for j in range(T)],
    )
    part_in = [_pow5(state[0].cur() + rc[0].cur())] + [
        state[i].cur() + rc[i].cur() for i in range(1, T)
    ]
    part_out = mixed(part_in)
    cs.create_gate(
        "poseidon_partial",
        [q_partial.cur() * (part_out[j] - state[j].next()) for j in range(T)],
    )
    capacity = (cs.usable_rows(n) - 1) // ROWS_PER_PERM
    # bind instance rows (4 per permutation slot: 3 inputs + output) for
    # EVERY slot at configure time — copies are part of the key, not the
    # witness; unused slots hold zeros on both sides.
    for p in range(capacity):
        base = p * ROWS_PER_PERM
        for i in range(T):
            cs.copy(instance, 4 * p + i, state[i], base)
        cs.copy(instance, 4 * p + T, state[0], base + SPEC.r_f + SPEC.r_p)
    return PoseidonConfig(state, rc, q_full, q_partial, instance, capacity)


def assign_fixed(cs: ConstraintSystem, cfg: PoseidonConfig, n: int) -> Assignment:
    asg = Assignment(cs, n)
    rc, _ = pos.generate_constants(SPEC)
    half = SPEC.r_f // 2
    one = FR.encode(1)
    for p in range(cfg.capacity_perms):
        base = p * ROWS_PER_PERM
        for r in range(SPEC.r_f + SPEC.r_p):
            row = base + r
            is_full = r < half or r >= half + SPEC.r_p
            asg.cols[cfg.q_full if is_full else cfg.q_partial][row] = one
            for i in range(T):
                asg.cols[cfg.rc[i]][row] = FR.encode(rc[r][i])
    return asg


def assign(
    cs: ConstraintSystem, cfg: PoseidonConfig, n: int, initial_states: list
) -> tuple:
    """initial_states: list of T-element int lists (one per permutation).
    -> (Assignment, instance list [in0,in1,in2,out0 per permutation])."""
    assert len(initial_states) <= cfg.capacity_perms
    # pad unused slots with the zero-state permutation so their (always-on)
    # round selectors see a valid trace
    initial_states = list(initial_states) + [[0] * T] * (
        cfg.capacity_perms - len(initial_states)
    )
    asg = assign_fixed(cs, cfg, n)
    rc, mds = pos.generate_constants(SPEC)
    half = SPEC.r_f // 2
    instance = []
    for p, init in enumerate(initial_states):
        base = p * ROWS_PER_PERM
        s = [v % FR_MOD for v in init]
        for i in range(T):
            asg.set_int(cfg.state[i], base, s[i])
        for r in range(SPEC.r_f + SPEC.r_p):
            is_full = r < half or r >= half + SPEC.r_p
            if is_full:
                sb = [pow((s[i] + rc[r][i]) % FR_MOD, 5, FR_MOD) for i in range(T)]
            else:
                sb = [pow((s[0] + rc[r][0]) % FR_MOD, 5, FR_MOD)] + [
                    (s[i] + rc[r][i]) % FR_MOD for i in range(1, T)
                ]
            s = [
                sum(mds[j][i] * sb[i] for i in range(T)) % FR_MOD for j in range(T)
            ]
            for i in range(T):
                asg.set_int(cfg.state[i], base + r + 1, s[i])
        instance += list(init) + [s[0]]
    asg.set_ints(cfg.instance, 0, instance)
    return asg, instance


def hash2_state(a: int, b: int) -> list:
    """Initial sponge state for hashing the 2-element message [a, b]
    (ConstantLength<2> padding: capacity = 2^64 * 2)."""
    return [a % FR_MOD, b % FR_MOD, (1 << 64) * 2 % FR_MOD]
