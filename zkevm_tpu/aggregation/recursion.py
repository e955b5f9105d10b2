"""RecursionCircuit: unbounded aggregation of batch proofs.

Reference counterpart: aggregator/src/recursion/circuit.rs (layer5
RecursionCircuit — IVC-style self-recursion, 2 snarks per round) +
recursion.rs StateTransition. TPU-first deviation (documented): instead
of the reference's sequential IVC chain, aggregation is a BINARY TREE —
each node verifies two child snarks of the SAME vk, folds all four
accumulators (2 in-circuit + 2 embedded), and outputs
state = poseidon(left_state, right_state). A tree gives the same
unbounded fan-in with log depth, and sibling nodes prove in parallel
across chips — an IVC chain serializes the whole bundle on one device.
The self-verification fixed point (a node verifying its own vk) is the
same-shape-vk construction the reference bootstraps with a dummy snark;
here every tree level above the first verifies the recursion vk itself.

Instance layout (same convention as batch/compression):
rows 0..11 accumulator limbs, row 12 the chained state digest.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.aggregation.compression import ACC_ROWS
from zkevm_tpu.aggregation.sponge import TranscriptChip
from zkevm_tpu.aggregation.verifier_circuit import (
    Accumulator, PointCells, VerifierChip, VerifierConfig, configure,
)
from zkevm_tpu.circuits import ecc_circuit as ecc
from zkevm_tpu.circuits import poseidon_table as pt
from zkevm_tpu.gadgets.bigint import NL, from_limbs
from zkevm_tpu.gadgets.flex import FlexCtx
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.keygen import VerifyingKey
from zkevm_tpu.plonk.prover import Proof

STATE_LEN = 1  # digest cells beyond the accumulator


@dataclass
class RecursionCircuit:
    cs: ConstraintSystem
    cfg: VerifierConfig
    chip: VerifierChip
    k: int

    @classmethod
    def build(cls, child_vk: VerifyingKey, k: int,
              ec_mode: str = "table") -> "RecursionCircuit":
        """child_vk: the vk of the two snarks verified by this node — the
        batch vk at the leaves, the recursion vk itself above."""
        cs = ConstraintSystem()
        cfg = configure(cs)
        chip = VerifierChip(cs, cfg, child_vk, [ACC_ROWS + STATE_LEN],
                            ec_mode=ec_mode)
        return cls(cs, cfg, chip, k)

    def _acc_points(self, cells: list) -> tuple:
        def point(limbs):
            x = from_limbs([c.val for c in limbs[:NL]])
            y = from_limbs([c.val for c in limbs[NL:]])
            return PointCells(list(limbs[:NL]), list(limbs[NL:]), x, y)

        return point(cells[:2 * NL]), point(cells[2 * NL:4 * NL])

    def assign(self, child_instances: list, proofs: list[Proof],
               n: int | None = None):
        """child_instances: two instance-column lists (each leading with
        12 accumulator limbs, then the child state digest)."""
        assert len(proofs) == 2
        n = n if n is not None else (1 << self.k)
        cs, cfg, chip = self.cs, self.cfg, self.chip
        asg = Assignment(cs, n)
        cfg.rt8.load(asg)
        fx = FlexCtx(cs, cfg.flex, asg, 0)
        state = {"mc_row": 0, "ac_row": 0, "mul_events": [],
                 "add_events": []}
        sponge_row = 0
        perm_states: list = []
        accums, child_states = [], []
        for ci in range(2):
            tchip = TranscriptChip(cs, cfg.sponge, fx, asg, sponge_row)
            res = chip.assign(fx, tchip, child_instances[ci], proofs[ci],
                              state)
            sponge_row = tchip.row
            perm_states += tchip.perm_states
            accums.append((res["lhs"], res["rhs"]))
            flat = [c for col in res["instance_cells"] for c in col]
            accums.append(self._acc_points(flat[:ACC_ROWS]))
            child_states.append(flat[ACC_ROWS])

        tchip = TranscriptChip(cs, cfg.sponge, fx, asg, sponge_row)
        for lhs, rhs in accums:
            tchip.absorb_point_limbs(lhs.xl, lhs.yl)
            tchip.absorb_point_limbs(rhs.xl, rhs.yl)
        r = tchip.challenge()

        def fold(points):
            total, rp = None, None
            for j, pc in enumerate(points):
                if j == 0:
                    total = pc
                    continue
                rp = r if rp is None else fx.mul(rp, r)
                term = chip.ec_mul(fx, state, rp, pc)
                total = chip.ec_add(fx, state, total, term)
            return total

        lhs_total = fold([a[0] for a in accums])
        rhs_total = fold([a[1] for a in accums])

        # state transition: parent digest = H(left_state, right_state)
        tchip.absorb(child_states[0])
        tchip.absorb(child_states[1])
        out_state = tchip.challenge()
        perm_states += tchip.perm_states

        pt.assign(cs, cfg.pt, n, perm_states, asg)
        ecc.assign(cs, cfg.ecc, n, state["add_events"], state["mul_events"],
                   asg)

        acc = Accumulator(lhs_total.affine, rhs_total.affine)
        inst_vals, row = [], 0
        for cell in (lhs_total.xl + lhs_total.yl
                     + rhs_total.xl + rhs_total.yl):
            asg.set_int(cfg.inst, row, cell.val)
            cs.copy(cfg.inst, row, cell.col, cell.row)
            inst_vals.append(cell.val)
            row += 1
        asg.set_int(cfg.inst, row, out_state.val)
        cs.copy(cfg.inst, row, out_state.col, out_state.row)
        inst_vals.append(out_state.val)
        return asg, inst_vals, acc
