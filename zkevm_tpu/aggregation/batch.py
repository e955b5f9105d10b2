"""BatchCircuit: aggregate N chunk snarks into one accumulator + batch PI.

Reference counterpart: aggregator/src/aggregation/circuit.rs:40-132
(BatchCircuit / layer3) + core.rs:48-111 (`extract_accumulators_and_proof`
and the random-linear-combination KZG accumulation snark-verifier
performs). Per chunk snark the circuit:

1. verifies the snark in-circuit (VerifierChip) -> accumulator A_i;
2. extracts the EMBEDDED accumulator E_i from the chunk's instance
   (rows 0..11 — every compression-layer instance leads with its own
   deferred-pairing operands, compression.py ACC_ROWS);
3. folds all 2N accumulators with a transcript challenge r:
       lhs = sum_j r^j lhs_j,   rhs = sum_j r^j rhs_j
   (pairing bilinearity: the fold passes the final check iff every
   component does, up to negligible r-collision probability);
4. hashes the chunk public inputs into one batch digest.

The batch digest surfaces:
- a Poseidon hash chain over the chunk PIs (the snark-side digest);
- with `keccak_header=True`, the L1-facing KECCAK batch hash
  (aggregator/src/batch.rs:104-131 BatchHash) proven IN-CIRCUIT: the
  193-byte header preimage lives in a byte column whose running
  keccak_input RLC feeds one KeccakTable lookup (the same bit-level
  multi-permutation sponge table the SuperCircuit uses), the digest
  (hi, lo) halves ride the instance, and — when the blob section is on —
  the preimage's (z, y) byte spans are constrained equal to the
  barycentric region's 88-bit limbs, binding the EVM-visible header to
  the in-circuit blob evaluation. Remaining host-side: the per-chunk
  public_input_hash keccaks and the batch data hash over chunk data
  hashes (chunk PIs here carry the inner pi-hash digest, not the raw
  roots — aggregator/src/batch.rs:64-79 scope).

The chunk-chaining checks (prev/post state-root continuity, batch.rs:42)
are applied on the chunk PI cells when `chain_checks` gives index pairs.
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
from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.gadgets.bigint import NL, from_limbs
from zkevm_tpu.gadgets.flex import FlexCtx
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.keygen import VerifyingKey
from zkevm_tpu.plonk.prover import Proof


HEADER_LEN = 193  # BatchHeader preimage bytes (batch.rs:104-131, codec v3)
_Z_OFF = HEADER_LEN - 64  # z span start
_Y_OFF = HEADER_LEN - 32  # y span start


@dataclass
class HeaderHashConfig:
    """In-circuit keccak of the BatchHeader preimage."""

    kt: object  # keccak_table.KeccakTableConfig
    challenges: object
    hbyte: object  # advice: the 193 preimage bytes
    hrlc: object  # phase-1 advice: running keccak_input RLC
    out_lo: object
    out_hi: object
    q_h: object  # fixed: rows 0..192
    q_h0: object
    q_hgt0: object
    q_hlast: object


@dataclass
class BatchCircuit:
    cs: ConstraintSystem
    cfg: VerifierConfig
    chip: VerifierChip
    n_chunks: int
    k: int
    bary: object = None  # BarycentricConfig when blob consistency is on
    hh: HeaderHashConfig | None = None  # keccak batch hash section
    _kw: object = None  # KeccakWitness (assign-time, phase-1 fill)
    _hbytes: bytes = b""

    @classmethod
    def build(cls, chunk_vk: VerifyingKey, chunk_instance_lens: list[int],
              n_chunks: int, k: int, n_blob: int = 0,
              ec_mode: str = "table", keccak_header: bool = False
              ) -> "BatchCircuit":
        """n_blob > 0 enables the EIP-4844 blob section: an in-circuit
        barycentric evaluation y = blob(z) over n_blob coefficients, with
        z squeezed from the batch transcript (bound to the coefficients)
        and (z, y) limbs appended to the instance for the L1-side KZG
        point-evaluation check (reference: aggregation/barycentric.rs +
        blob_data.rs)."""
        from zkevm_tpu.aggregation.barycentric import BarycentricConfig

        cs = ConstraintSystem()
        cfg = configure(cs)
        chip = VerifierChip(cs, cfg, chunk_vk, chunk_instance_lens,
                            ec_mode=ec_mode)
        bary = (BarycentricConfig.configure(cs, cfg.rt8, n_blob)
                if n_blob else None)
        hh = cls._configure_header_hash(cs, cfg) if keccak_header else None
        return cls(cs, cfg, chip, n_chunks, k, bary, hh)

    @staticmethod
    def _configure_header_hash(cs: ConstraintSystem,
                               cfg) -> HeaderHashConfig:
        """The keccak BatchHash section (batch.rs:104-131): preimage byte
        column -> running keccak_input RLC -> one KeccakTable lookup
        against the digest (lo, hi) halves exposed in the instance."""
        from zkevm_tpu.circuits import keccak_table as kt
        from zkevm_tpu.circuits.tables import Challenges
        from zkevm_tpu.plonk.expr import Const

        ch = Challenges.configure(cs)
        ktcfg = kt.configure(cs, ch)
        hbyte = cs.advice_column()
        hrlc = cs.advice_column(phase=1)
        out_lo = cs.advice_column()
        out_hi = cs.advice_column()
        q_h = cs.fixed_column()
        q_h0 = cs.fixed_column()
        q_hgt0 = cs.fixed_column()
        q_hlast = cs.fixed_column()

        cfg.rt8.lookup(cs, "bh_u8", [q_h.cur() * hbyte.cur()])
        r = ch.keccak_input.expr()
        cs.create_gate("bh_rlc", [
            q_h0.cur() * (hrlc.cur() - hbyte.cur()),
            q_hgt0.cur() * (hrlc.cur() - hrlc.prev() * r - hbyte.cur()),
        ])
        ktcfg.table.lookup_word(
            cs, "batch_hash", q_hlast.cur(), hrlc.cur(),
            Const(HEADER_LEN), out_lo.cur(), out_hi.cur(),
        )
        return HeaderHashConfig(ktcfg, ch, hbyte, hrlc, out_lo, out_hi,
                                q_h, q_h0, q_hgt0, q_hlast)

    def _acc_points(self, fx: FlexCtx, cells: list) -> tuple:
        """instance cells rows 0..11 -> (lhs PointCells, rhs PointCells)."""
        def point(limbs):
            x = from_limbs([c.val for c in limbs[:NL]])
            y = from_limbs([c.val for c in limbs[NL:]])
            return PointCells(list(limbs[:NL]), list(limbs[NL:]), x, y)

        return point(cells[:2 * NL]), point(cells[2 * NL:4 * NL])

    def assign(self, chunk_instances: list, proofs: list[Proof],
               n: int | None = None, chain_checks: list | None = None,
               blob_coeffs: list | None = None, header=None):
        """chunk_instances: per chunk, the full instance column lists (the
        compression convention: first column leads with 12 accumulator
        limbs). chain_checks: optional [(i_prev_idx, i_next_idx)] pairs of
        flat PI indices that must be equal across consecutive chunks
        (state-root continuity). Returns (asg, instance values,
        folded Accumulator)."""
        assert len(proofs) == self.n_chunks
        n = n if n is not None else (1 << self.k)
        cs, cfg, chip = self.cs, self.cfg, self.chip
        asg = Assignment(cs, n)
        cfg.rt8.load(asg)
        fx = FlexCtx(cs, cfg.flex, asg, 0)
        state = {"mc_row": 0, "ac_row": 0, "mul_events": [],
                 "add_events": []}

        # each chunk proof was generated against a FRESH transcript, so
        # each verification gets a fresh sponge chip (sharing the row
        # cursor); the fold/digest sponge is a fourth fresh instance
        sponge_row = 0
        perm_states: list = []

        def fresh_chip() -> TranscriptChip:
            c = TranscriptChip(cs, cfg.sponge, fx, asg, sponge_row)
            return c

        accums = []  # (lhs PointCells, rhs PointCells)
        all_pi_cells = []
        for ci in range(self.n_chunks):
            tchip = fresh_chip()
            res = chip.assign(fx, tchip, chunk_instances[ci], proofs[ci],
                              state)
            sponge_row = tchip.row
            perm_states += tchip.perm_states
            accums.append((res["lhs"], res["rhs"]))
            inst_cells = res["instance_cells"]
            flat = [c for col in inst_cells for c in col]
            emb_lhs, emb_rhs = self._acc_points(fx, flat[:ACC_ROWS])
            accums.append((emb_lhs, emb_rhs))
            all_pi_cells.append(flat[ACC_ROWS:])

        # chunk-continuity checks on the PI cells
        if chain_checks:
            for ci in range(1, self.n_chunks):
                for prev_idx, next_idx in chain_checks:
                    fx.assert_eq(all_pi_cells[ci - 1][prev_idx],
                                 all_pi_cells[ci][next_idx])

        # fold: r from a fresh transcript over every accumulator encoding
        tchip = fresh_chip()
        for lhs, rhs in accums:
            tchip.absorb_point_limbs(lhs.xl, lhs.yl)
            tchip.absorb_point_limbs(rhs.xl, rhs.yl)
        r = tchip.challenge()

        def fold(points):
            total = None
            rp = None  # r^j cell (j >= 1)
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

        # batch digest: hash chain over all chunk PIs
        for pis in all_pi_cells:
            for c in pis:
                tchip.absorb(c)
        batch_digest = tchip.challenge()

        # ---- EIP-4844 blob section ------------------------------------
        blob_zy_vals = []
        if self.bary is not None:
            assert blob_coeffs is not None and len(blob_coeffs) == \
                self.bary.n_coeffs
            from zkevm_tpu.aggregation.blob import BLS_R
            from zkevm_tpu.gadgets.bigint import LB, to_limbs
            from zkevm_tpu.ff.goldens import FR_MOD
            if self.hh is not None:
                # keccak-header mode: z is the header's protocol-derived
                # challenge (keccak challenge digest, header.py:100-106);
                # its limbs are bound below to the (z, y) byte spans of
                # the in-circuit-keccak'd header preimage — the same
                # bytes L1 recomputes the batch hash from (the contract
                # independently re-derives z, blob.rs:295-298 role)
                assert header is not None
                z_val = int.from_bytes(header.blob_data_proof[0], "big")
                res = self.bary.assign(
                    asg, [c % BLS_R for c in blob_coeffs], z_val)
            else:
                # standalone mode: z bound to the coefficients through
                # the Poseidon transcript
                for cv in blob_coeffs:
                    for l in to_limbs(cv % BLS_R):
                        tchip.absorb(fx.constant(l))
                z_cell = tchip.challenge()
                res = self.bary.assign(
                    asg, [c % BLS_R for c in blob_coeffs], z_cell.val)
                # bind the challenge to the region's z limbs natively
                from zkevm_tpu.gadgets.flex import Cell
                zl_cells = [Cell(col, row, asg.get_int(col, row))
                            for col, row in res["z_cells"]]
                comb = fx.raw(1, 1 << LB, 0, 0, 0, 1, a=zl_cells[0],
                              b=zl_cells[1])
                comb = fx.raw(1, pow(2, 2 * LB, FR_MOD), 0, 0, 0, 1,
                              a=comb, b=zl_cells[2])
                fx.assert_eq(comb, z_cell)
            blob_zy_vals = ([asg.get_int(c, r) for c, r in res["z_cells"]]
                            + [asg.get_int(c, r) for c, r in res["y_cells"]])
            self.blob_y = res["y"]
        perm_states += tchip.perm_states

        # ---- keccak BatchHash section (batch.rs:104-131) ---------------
        header_hash_vals = []
        if self.hh is not None:
            from zkevm_tpu.circuits import keccak_table as kt
            from zkevm_tpu.gadgets.flex import Cell

            assert header is not None, \
                "keccak_header circuit needs a BatchHeader"
            hh = self.hh
            pre = header.batch_hash_preimage()
            assert len(pre) == HEADER_LEN, len(pre)
            self._hbytes = pre
            self._kw = kt.assign(cs, hh.kt, n, [pre], asg)
            for i, b in enumerate(pre):
                asg.set_int(hh.hbyte, i, b)
                asg.set_int(hh.q_h, i, 1)
                asg.set_int(hh.q_h0 if i == 0 else hh.q_hgt0, i, 1)
            asg.set_int(hh.q_hlast, HEADER_LEN - 1, 1)
            dig = header.batch_hash()
            hi = int.from_bytes(dig[:16], "big")
            lo = int.from_bytes(dig[16:], "big")
            asg.set_int(hh.out_hi, HEADER_LEN - 1, hi)
            asg.set_int(hh.out_lo, HEADER_LEN - 1, lo)
            header_hash_vals = [hi, lo]

            if self.bary is not None:
                # bind the preimage's (z, y) 32-byte BE spans to the
                # barycentric region's 88-bit limbs (11-byte sub-spans)
                def span_cell(off: int, nbytes: int):
                    acc = None
                    for j in range(nbytes):
                        bcell = Cell(hh.hbyte, off + j, pre[off + j])
                        acc = (fx.raw(1, 0, 0, 0, 0, 1, a=bcell)
                               if acc is None else
                               fx.raw(256, 1, 0, 0, 0, 1, a=acc, b=bcell))
                    return acc

                for off, cellrefs in ((_Z_OFF, res["z_cells"]),
                                      (_Y_OFF, res["y_cells"])):
                    limb_cells = [Cell(c, r, asg.get_int(c, r))
                                  for c, r in cellrefs]
                    spans = [span_cell(off + 21, 11),
                             span_cell(off + 10, 11),
                             span_cell(off, 10)]
                    for scell, lcell in zip(spans, limb_cells):
                        fx.assert_eq(scell, lcell)

        pt.assign(cs, cfg.pt, n, perm_states, asg)
        ecc.assign(cs, cfg.ecc, n, state["add_events"], state["mul_events"],
                   asg)

        acc = Accumulator(lhs_total.affine, rhs_total.affine)
        inst_vals = []
        row = 0
        for cell in (lhs_total.xl + lhs_total.yl
                     + rhs_total.xl + rhs_total.yl):
            asg.set_int(cfg.inst, row, cell.val)
            cs.copy(cfg.inst, row, cell.col, cell.row)
            inst_vals.append(cell.val)
            row += 1
        asg.set_int(cfg.inst, row, batch_digest.val)
        cs.copy(cfg.inst, row, batch_digest.col, batch_digest.row)
        inst_vals.append(batch_digest.val)
        row += 1
        if blob_zy_vals:
            # expose (z, y) limbs for the L1-side KZG point-eval check
            for j, v in enumerate(blob_zy_vals):
                col = (self.bary.z + self.bary.y)[j]
                asg.set_int(cfg.inst, row, v)
                cs.copy(cfg.inst, row, col, 0)
                inst_vals.append(v)
                row += 1
        if header_hash_vals:
            # the keccak batch hash (hi, lo) — what the L1 rollup
            # contract pins for this batch (batch.rs:104 BatchHash)
            for col, v in ((self.hh.out_hi, header_hash_vals[0]),
                           (self.hh.out_lo, header_hash_vals[1])):
                asg.set_int(cfg.inst, row, v)
                cs.copy(cfg.inst, row, col, HEADER_LEN - 1)
                inst_vals.append(v)
                row += 1
        return asg, inst_vals, acc

    # ---- phase-1 (challenge-dependent RLC) machinery -------------------
    def fill_phase1(self, asg, r_keccak: int, r_word: int) -> None:
        """Fill the keccak table RLC columns + the header-preimage running
        RLC for the given challenge values."""
        if self.hh is None:
            return
        from zkevm_tpu.ff.goldens import FR_MOD

        self._kw.fill_phase1(r_keccak, r_word)
        acc = 0
        for i, b in enumerate(self._hbytes):
            acc = (acc * r_keccak + b) % FR_MOD
            asg.set_int(self.hh.hrlc, i, acc)

    def fill_mock_phase1(self, asg) -> None:
        """Fill phase-1 columns with MockProver's pseudo-challenges."""
        from zkevm_tpu.plonk.mock import MockProver

        vals = MockProver.default_challenges(self.cs)
        ch = self.hh.challenges
        self.fill_phase1(asg, vals[ch.keccak_input.index],
                         vals[ch.evm_word.index])

    def witness_phases(self, asg):
        """create_proof witness callback (real-proving path): phase 1
        computes the RLC columns from the transcript challenges."""
        def cb(phase: int, ch: dict) -> dict:
            if phase == 1 and self.hh is not None:
                c = self.hh.challenges
                self.fill_phase1(asg, ch[c.keccak_input], ch[c.evm_word])
            return {col: asg.cols[col]
                    for col in self.cs.advice_columns if col.phase == phase}

        return cb
