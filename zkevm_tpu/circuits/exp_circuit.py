"""Exp circuit: EXP-opcode exponentiation-by-squaring witness.

Reference counterpart: zkevm-circuits/src/exp_circuit.rs:34 (598 LoC,
ExpTable + MulAdd gadget; 7 rows/step per circuit_input_builder.rs:89).
TPU-native redesign over the native field (the reference works over
256-bit words with limb MulAdd — full word semantics land with the
word-decomposition gadget family in round 2; the recursion structure and
table interface match):

Each EXP event (base, exponent) unrolls the square-and-multiply recursion
bottom-up, one row per step:

    row: (is_step, is_last, base, exponent, exponentiation, q, r)
    r = parity witness (exponent = 2q + r, r in {0,1} boolean)
    r = 1 (odd):  exponentiation = base * prev_exponentiation,
                  next exponent = exponent - 1
    r = 0 (even): exponentiation = prev_exponentiation^2,
                  next exponent  = exponent / 2   (= q)
    last step: exponent = 2, exponentiation = base^2

Steps are laid out top-down (first row = the full exponent); the "prev"
value sits on the NEXT row (rotation +1), mirroring the reference's
ExpTable ordering.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const

FR = fr_spec()


@dataclass
class ExpConfig:
    q_step: Column  # 1 on every non-last step row
    q_last: Column  # 1 on the last step row of an event
    base: Column
    exponent: Column
    exponentiation: Column
    quotient: Column  # q in exponent = 2q + r
    parity: Column  # r


def configure(cs: ConstraintSystem) -> ExpConfig:
    q_step = cs.fixed_column()
    q_last = cs.fixed_column()
    base = cs.advice_column()
    exponent = cs.advice_column()
    exponentiation = cs.advice_column()
    quotient = cs.advice_column()
    parity = cs.advice_column()

    one, two = Const(1), Const(2)
    r = parity.cur()
    cs.create_gate(
        "exp_step",
        [
            # parity is boolean and decomposes the exponent
            (q_step.cur() + q_last.cur()) * r * (r - one),
            (q_step.cur() + q_last.cur())
            * (exponent.cur() - two * quotient.cur() - r),
            # odd: d = base * d_next ; exponent_next = exponent - 1
            q_step.cur()
            * r
            * (exponentiation.cur() - base.cur() * exponentiation.next()),
            q_step.cur() * r * (exponent.next() - exponent.cur() + one),
            # even: d = d_next^2 ; exponent_next = exponent / 2
            q_step.cur()
            * (one - r)
            * (exponentiation.cur() - exponentiation.next() * exponentiation.next()),
            q_step.cur() * (one - r) * (exponent.next() - quotient.cur()),
            # base is shared down the chain
            q_step.cur() * (base.next() - base.cur()),
            # last step: exponent = 2 and d = base^2
            q_last.cur() * (exponent.cur() - two),
            q_last.cur() * (exponentiation.cur() - base.cur() * base.cur()),
        ],
    )
    return ExpConfig(q_step, q_last, base, exponent, exponentiation, quotient, parity)


def unroll_event(base: int, exponent: int):
    """-> rows (top-down) of the square-and-multiply recursion.
    exponent must be >= 2 (the EVM EXP special cases 0/1 are handled by
    the EVM circuit directly, as in the reference)."""
    assert exponent >= 2
    rows = []
    e = exponent
    while e > 2:
        d = pow(base, e, FR_MOD)
        r = e & 1
        rows.append(
            dict(base=base, exponent=e, exponentiation=d, quotient=e // 2, parity=r)
        )
        e = e - 1 if r else e // 2
    rows.append(
        dict(
            base=base, exponent=2, exponentiation=base * base % FR_MOD,
            quotient=1, parity=0,
        )
    )
    return rows


def assign(cs: ConstraintSystem, cfg: ExpConfig, n: int, events: list) -> Assignment:
    """events: list of (base, exponent) pairs."""
    asg = Assignment(cs, n)
    one = FR.encode(1)
    r = 0
    for base, exponent in events:
        rows = unroll_event(base, exponent)
        for j, row in enumerate(rows):
            col = cfg.q_last if j == len(rows) - 1 else cfg.q_step
            asg.cols[col][r] = one
            asg.set_int(cfg.base, r, row["base"])
            asg.set_int(cfg.exponent, r, row["exponent"])
            asg.set_int(cfg.exponentiation, r, row["exponentiation"])
            asg.set_int(cfg.quotient, r, row["quotient"])
            asg.set_int(cfg.parity, r, row["parity"])
            r += 1
    assert r <= cs.usable_rows(n) - 1
    return asg
