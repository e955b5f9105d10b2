"""CompressionCircuit: verify ONE inner snark in-circuit, re-exposing its
instance and the deferred-pairing accumulator.

Reference counterpart: aggregator/src/compression/circuit.rs:39-51
(CompressionCircuit wraps snark-verifier's `Plonk::<..>::read_proof` +
`verify` over one snark and exposes [accumulator limbs ++ inner
instance]). The reference runs this twice per chunk (layer1 wide, layer2
thin, prover/src/common/prover/chunk.rs:19-27); here one config serves
both roles — the wide/thin distinction is a column-count tuning knob the
TPU runtime does not need (columns are arrays, not plonkish real estate).

Instance layout: rows 0..11 = accumulator (lhs.x, lhs.y, rhs.x, rhs.y as
3x88-bit limbs each), rows 12.. = the inner snark's instance values,
flattened column-major — matching snark-verifier-sdk's aggregation
convention of accumulator-first.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.aggregation.sponge import TranscriptChip
from zkevm_tpu.aggregation.verifier_circuit import (
    Accumulator, VerifierChip, VerifierConfig, configure,
)
from zkevm_tpu.circuits import ecc_circuit as ecc
from zkevm_tpu.circuits import poseidon_table as pt
from zkevm_tpu.gadgets.bigint import NL
from zkevm_tpu.gadgets.flex import FlexCtx
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.keygen import VerifyingKey
from zkevm_tpu.plonk.prover import Proof

ACC_ROWS = 4 * NL  # 12 accumulator instance rows


@dataclass
class CompressionCircuit:
    cs: ConstraintSystem
    cfg: VerifierConfig
    chip: VerifierChip
    k: int

    @classmethod
    def build(cls, inner_vk: VerifyingKey, inner_instance_lens: list[int],
              k: int, ec_mode: str = "table") -> "CompressionCircuit":
        cs = ConstraintSystem()
        cfg = configure(cs)
        chip = VerifierChip(cs, cfg, inner_vk, inner_instance_lens,
                            ec_mode=ec_mode)
        return cls(cs, cfg, chip, k)

    def min_rows(self) -> int:
        """ECC region row demand (the dominant term): one 256-bit ladder
        per MSM term + one add per chain link."""
        terms = self.num_msm_terms()
        return terms * ecc.mul_region_rows() + (terms - 1) * ecc.ADD_ROWS

    def num_msm_terms(self) -> int:
        vk, ch = self.chip.vk, self.chip
        nlk = len(vk.cs.lookups)
        chunk = vk.cs.permutation_chunk_len()
        nperm = len(vk.cs.permutation_columns)
        nchunks = (nperm + chunk - 1) // chunk if nperm else 0
        nonid_fixed = sum(1 for c in vk.fixed_commitments if c is not None)
        return (
            len(vk.cs.advice_columns) + nonid_fixed
            + len(vk.sigma_commitments) + 3 * nlk + nchunks
            + 1  # random
            + ch.num_h + 3  # G1, shplonk h, w
        )

    def assign(self, instances: list, proof: Proof,
               n: int | None = None) -> tuple[Assignment, list, Accumulator]:
        """-> (assignment, instance column values, accumulator)."""
        n = n if n is not None else (1 << self.k)
        cs, cfg, chip = self.cs, self.cfg, self.chip
        asg = Assignment(cs, n)
        cfg.rt8.load(asg)
        fx = FlexCtx(cs, cfg.flex, asg, 0)
        tchip = TranscriptChip(cs, cfg.sponge, fx, asg, 0)
        state = {"mc_row": 0, "ac_row": 0, "mul_events": [],
                 "add_events": []}
        res = chip.assign(fx, tchip, instances, proof, state)
        assert fx.row <= cs.usable_rows(n), (fx.row, cs.usable_rows(n))
        assert tchip.row <= cs.usable_rows(n)

        # back the lookups with real table regions
        pt.assign(cs, cfg.pt, n, tchip.perm_states, asg)
        ecc.assign(cs, cfg.ecc, n, state["add_events"], state["mul_events"],
                   asg)

        # instance: accumulator limbs then flattened inner instances
        acc: Accumulator = res["accumulator"]
        inst_vals = []
        row = 0
        lhs, rhs = res["lhs"], res["rhs"]
        for cell in lhs.xl + lhs.yl + rhs.xl + rhs.yl:
            asg.set_int(cfg.inst, row, cell.val)
            cs.copy(cfg.inst, row, cell.col, cell.row)
            inst_vals.append(cell.val)
            row += 1
        for col_cells in res["instance_cells"]:
            for cell in col_cells:
                asg.set_int(cfg.inst, row, cell.val)
                cs.copy(cfg.inst, row, cell.col, cell.row)
                inst_vals.append(cell.val)
                row += 1
        return asg, inst_vals, acc
