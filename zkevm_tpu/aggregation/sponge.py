"""In-circuit Poseidon transcript: the Fiat-Shamir challenge chip.

Reference counterpart: snark-verifier's `PoseidonTranscript<Loaded>` (the
halo2-loader transcript all reference aggregation layers verify against,
prover/src/common/prover/utils.rs:31 `gen_snark_shplonk`). Mirrors
zkevm_tpu.transcript.PoseidonTranscript exactly: each challenge() is a
ConstantLength Poseidon hash of [chain_state, *pending], computed as a
rate-2 sponge whose permutations are PoseidonPermTable lookups (one row
per permutation) and whose absorb-adds are FlexGate rows.

The sponge chip owns three advice columns (sin0..2 -> sout0..2 via the
perm lookup); mid-states are wired to the FlexGate graph with copy
constraints. The initial states it records must be replayed into the
Poseidon table circuit's slots (poseidon_table.assign) so every lookup
row exists.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.circuits.poseidon_table import PoseidonPermTable, SPEC
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.flex import Cell, FlexCtx
from zkevm_tpu.hash import poseidon as pos
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem

RATE = SPEC.rate  # 2


@dataclass
class SpongeConfig:
    q: Column
    sin: list  # t=3 advice
    sout: list  # t=3 advice

    @classmethod
    def configure(cls, cs: ConstraintSystem, perm_table: PoseidonPermTable,
                  name: str = "sponge") -> "SpongeConfig":
        q = cs.fixed_column()
        sin = [cs.advice_column() for _ in range(3)]
        sout = [cs.advice_column() for _ in range(3)]
        for c in sin + sout:
            cs.enable_equality(c)
        perm_table.lookup(
            cs, name, q.cur(), [c.cur() for c in sin], [c.cur() for c in sout]
        )
        return cls(q, sin, sout)


class TranscriptChip:
    """Drives SpongeConfig rows; the in-circuit mirror of
    transcript.PoseidonTranscript."""

    def __init__(self, cs: ConstraintSystem, cfg: SpongeConfig,
                 flex: FlexCtx, asg: Assignment, start: int):
        self.cs = cs
        self.cfg = cfg
        self.flex = flex
        self.asg = asg
        self.row = start
        self.chain: Cell | None = None  # None = initial state 0
        self.pending: list[Cell] = []
        self.perm_states: list[list[int]] = []  # for poseidon_table.assign

    # -- absorb -----------------------------------------------------------
    def absorb(self, cell: Cell) -> None:
        self.pending.append(cell)

    def absorb_point_limbs(self, x_limbs: list, y_limbs: list) -> None:
        """Absorb an affine point given as two NL=3 lists of 88-bit limb
        cells — the encoding of PoseidonTranscript.common_point."""
        for c in list(x_limbs) + list(y_limbs):
            self.pending.append(c)

    # -- permutation row ----------------------------------------------------
    def _permute(self, state: list) -> list:
        """state: 3 Cells. Emits one lookup row, returns 3 output Cells."""
        sv = [s.val for s in state]
        self.perm_states.append(sv)
        out = pos.permute_golden(SPEC, sv)
        row = self.row
        self.asg.set_int(self.cfg.q, row, 1)
        outs = []
        for i in range(3):
            self.asg.set_int(self.cfg.sin[i], row, sv[i])
            self.cs.copy(self.cfg.sin[i], row, state[i].col, state[i].row)
            self.asg.set_int(self.cfg.sout[i], row, out[i])
            outs.append(Cell(self.cfg.sout[i], row, out[i]))
        self.row += 1
        return outs

    # -- squeeze ------------------------------------------------------------
    def challenge(self) -> Cell:
        fx = self.flex
        msg = [self.chain if self.chain is not None else fx.constant(0)]
        msg += self.pending
        self.pending = []
        cap = (1 << 64) * len(msg) % FR_MOD
        npad = (-len(msg)) % RATE
        padded = msg + [fx.constant(0)] * npad
        state = [fx.constant(0), fx.constant(0), fx.constant(cap)]
        for i in range(0, len(padded), RATE):
            for j in range(RATE):
                state[j] = fx.add(state[j], padded[i + j])
            state = self._permute(state)
        self.chain = state[0]
        return self.chain

    def challenge_n(self, n: int) -> list:
        return [self.challenge() for _ in range(n)]
