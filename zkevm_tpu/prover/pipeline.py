"""Chunk-prover orchestration: block traces -> witness -> (cached)
keys -> (cached) proof -> verification.

Reference counterpart: prover/src/zkevm/prover.rs:66 `gen_chunk_proof`
with the `load_or_gen_*` resume discipline (common/prover/inner.rs:41),
SRS handling (prover/src/utils.rs:36-84), capacity pre-check
(zkevm/capacity_checker.rs), and vk pinning (zkevm/prover.rs:131-151).
The compression/aggregation layers above this (layer1..6) land with the
aggregation stack; this is the inner ("chunk") layer around the
SuperCircuit.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.plonk.keygen import ProvingKey, keygen
from zkevm_tpu.plonk.prover import Proof, create_proof
from zkevm_tpu.plonk.verifier import verify_proof
from zkevm_tpu.prover.artifacts import (
    dump_proof,
    load_or_gen_proof,
    vk_fingerprint,
)
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import Block, CircuitsParams, block_convert

log = logging.getLogger("zkevm_tpu.prover")


@dataclass
class ChunkProof:
    """The inner proof + everything a verifier needs (reference
    ChunkProof, prover/src/proof/chunk.rs)."""

    proof: Proof
    instances: list[list[int]]
    k: int
    vk_fingerprint: str


@dataclass
class ChunkProver:
    """SuperCircuit prover with per-(params, k) key caching and
    per-block proof artifacts (reference zkevm::Prover)."""

    params_db: dict = field(default_factory=dict)  # k -> ParamsKZG
    key_db: dict = field(default_factory=dict)  # (k, shape) -> (cs, cfg, pk)
    circuits_params: CircuitsParams = field(default_factory=CircuitsParams)
    artifact_dir: str | None = None
    srs_path: str | None = None

    def _params(self, k: int) -> ParamsKZG:
        if k not in self.params_db:
            if self.srs_path is not None:
                from zkevm_tpu.kzg.srs import load_params_file

                self.params_db[k] = load_params_file(self.srs_path, k)
            else:
                log.warning("using unsafe test SRS for k=%d", k)
                self.params_db[k] = ParamsKZG.unsafe_setup(k, tau=777)
        return self.params_db[k]

    def _keys(self, k: int, block: Block):
        key = (k, self.circuits_params.max_txs,
               self.circuits_params.max_calldata, self.circuits_params.max_rlp)
        if key not in self.key_db:
            cs = ConstraintSystem()
            cfg = sup.configure(cs, self.circuits_params)
            wit = sup.assign(cs, cfg, 1 << k, block)
            t0 = time.time()
            pk = keygen(self._params(k), cs, wit.asg)
            log.info("keygen k=%d in %.1fs", k, time.time() - t0)
            self.key_db[key] = (cs, cfg, pk)
            return self.key_db[key], wit
        return self.key_db[key], None

    def gen_chunk_proof(self, ctx_or_block, name: str = "chunk") -> ChunkProof:
        """Trace context / Block -> proven chunk; resumes from the proof
        artifact when present (reference gen_chunk_proof + load_or_gen)."""
        block = (ctx_or_block if isinstance(ctx_or_block, Block)
                 else block_convert(ctx_or_block, self.circuits_params))
        cs0 = ConstraintSystem()
        cfg0 = sup.configure(cs0, self.circuits_params)
        usage = sup.row_usage(cfg0, block)
        k = sup.choose_k(cfg0, block)
        log.info("chunk %s: k=%d rows=%s", name, k, usage)

        (cs, cfg, pk), wit = self._keys(k, block)
        if wit is None:
            wit = sup.assign(cs, cfg, 1 << k, block)
        instances = wit.instance()
        params = self._params(k)

        def gen() -> Proof:
            t0 = time.time()
            proof = create_proof(params, pk, instances, wit.witness_phases())
            log.info("chunk %s: proved in %.1fs", name, time.time() - t0)
            return proof

        if self.artifact_dir:
            os.makedirs(self.artifact_dir, exist_ok=True)
            path = os.path.join(self.artifact_dir, f"proof_{name}.json")
            proof = load_or_gen_proof(path, gen, pk.vk)
        else:
            proof = gen()

        assert verify_proof(params, pk.vk, instances, proof), \
            "chunk proof failed verification"
        return ChunkProof(proof, instances, k, vk_fingerprint(pk.vk))

    def verify_chunk_proof(self, cp: ChunkProof) -> bool:
        key = next((kk for kk in self.key_db if kk[0] == cp.k), None)
        if key is None:
            raise ValueError("no keys for k; prove once first")
        _, _, pk = self.key_db[key]
        if vk_fingerprint(pk.vk) != cp.vk_fingerprint:
            return False
        return verify_proof(self._params(cp.k), pk.vk, cp.instances, cp.proof)


# ---------------------------------------------------------------------------
# aggregation layers (reference: prover/src/lib.rs inner -> layer6,
# prover/src/aggregator/prover.rs gen_batch_proof / gen_bundle_proof)
# ---------------------------------------------------------------------------

@dataclass
class LayerSnark:
    """One layer's output: the circuit instance (accumulator-first) plus
    the proof (None in mock mode) and its host-side accumulator."""

    instances: list  # instance column lists
    proof: object
    accumulator: object
    vk: object = None
    k: int = 0
    batch_header: object = None  # BatchHeader (layer3 snarks only)


@dataclass
class BundlePipeline:
    """inner snark -> compression (layer1/2) -> batch (layer3 + blob) ->
    recursion tree (layer5) with per-layer key caching.

    mock=True replaces create_proof with MockProver satisfaction for the
    CURRENT layer — the reference's MockProver-tier aggregation tests
    (SURVEY §4 tier 2). A layer's CHILDREN must always be real snarks
    (the in-circuit verifier replays their transcripts), so mock mode
    composes one layer at a time over real child proofs; end-to-end
    multi-layer proving uses mock=False (real Poseidon-transcript snark
    per layer — the TPU-scale path). ec_mode is forwarded to the
    in-circuit verifier ("host" = fast witness tier, "table" = full EC
    soundness)."""

    mock: bool = True
    ec_mode: str = "table"
    k_compress: int = 16
    k_batch: int = 17
    k_recursion: int = 17
    params_db: dict = field(default_factory=dict)

    def _params(self, k: int) -> ParamsKZG:
        if k not in self.params_db:
            log.warning("using unsafe test SRS for k=%d", k)
            p = ParamsKZG.unsafe_setup(k, tau=777, windowed=False)
            import jax

            if jax.device_count() > 1:
                # multi-chip visible: shard the commit hot path over the
                # mesh (parallel.mesh.MeshMSM)
                p.use_mesh()
            self.params_db[k] = p
        return self.params_db[k]

    def _prove(self, cc, asg, inst_vals, acc, name: str) -> LayerSnark:
        from zkevm_tpu.plonk.mock import MockProver as MP
        from zkevm_tpu.transcript import PoseidonTranscript

        if self.mock:
            if hasattr(cc, "fill_mock_phase1"):
                cc.fill_mock_phase1(asg)
            MP(cc.cs, asg).assert_satisfied()
            return LayerSnark([inst_vals], None, acc, None, cc.k)
        params = self._params(cc.k)
        fixed_only = Assignment(cc.cs, 1 << cc.k)
        for col in cc.cs.fixed_columns:
            fixed_only.cols[col][:] = asg.cols[col]
        pk = keygen(params, cc.cs, fixed_only)
        witness = (cc.witness_phases(asg)
                   if hasattr(cc, "witness_phases") else asg)
        proof = create_proof(params, pk, [inst_vals], witness,
                             transcript=PoseidonTranscript())
        assert verify_proof(params, pk.vk, [inst_vals], proof,
                            transcript=PoseidonTranscript())
        log.info("layer %s proved (k=%d)", name, cc.k)
        return LayerSnark([inst_vals], proof, acc, pk.vk, cc.k)

    def compress(self, inner_vk, inner_params, instances, proof,
                 name: str = "layer2") -> LayerSnark:
        """One snark -> compression snark (reference layer1/layer2)."""
        from zkevm_tpu.aggregation.compression import CompressionCircuit

        cc = CompressionCircuit.build(
            inner_vk, [len(i) for i in instances], self.k_compress,
            ec_mode=self.ec_mode)
        asg, inst_vals, acc = cc.assign(instances, proof)
        self._compress_vk_src = cc
        return self._prove(cc, asg, inst_vals, acc, name)

    def batch(self, chunk_vk, chunk_snarks: list, *, n_blob: int = 0,
              blob_coeffs=None, chain_checks=None, chunk_infos=None,
              batch_payload: bytes | None = None, blob_params=None,
              header_fields: dict | None = None,
              keccak_header: bool = False) -> LayerSnark:
        """N chunk-layer snarks -> batch snark (reference layer3).

        When `chunk_infos` (aggregation.header.ChunkInfo list) is given,
        the L1-facing BatchHeader is constructed with the reference's
        keccak byte layouts (batch.rs:42-131) and attached to the
        returned snark; `batch_payload` additionally enforces the
        blob-decode round-trip sanity gate (aggregator/prover.rs:211-218):
        zstd_decode(blob bytes) == batch payload."""
        from zkevm_tpu.aggregation.batch import BatchCircuit

        header = None
        if chunk_infos is not None:
            from zkevm_tpu.aggregation.header import BatchHeader
            from zkevm_tpu.aggregation.zstd import zstd_decode, zstd_encode

            blob_bytes = (zstd_encode(batch_payload)
                          if batch_payload is not None else b"")
            if batch_payload is not None:
                assert zstd_decode(blob_bytes) == batch_payload, \
                    "blob decode round-trip failed"
                if blob_coeffs is not None:
                    # Bind the circuit's blob section to the L1-facing
                    # header: the header's versioned hash / (z, y) derive
                    # from blob_bytes, so the independently-passed
                    # blob_coeffs must be exactly its coefficient packing
                    # or the header would disagree with what the snark
                    # proves (aggregator/prover.rs:211-218 sanity role).
                    from zkevm_tpu.aggregation.blob import (
                        batch_bytes_to_coeffs)
                    n = n_blob or len(blob_coeffs)
                    expect = batch_bytes_to_coeffs(blob_bytes, n)
                    assert list(blob_coeffs) == list(expect), \
                        "blob_coeffs do not match zstd(batch_payload)"
            hf = dict(version=3, batch_index=0, l1_message_popped=0,
                      total_l1_message_popped=0,
                      parent_batch_hash=b"\x00" * 32,
                      last_block_timestamp=0)
            hf.update(header_fields or {})
            header = BatchHeader.construct_from_chunks(
                chunks=chunk_infos, blob_bytes=blob_bytes,
                n_snarks=len(chunk_snarks), blob_params=blob_params,
                n_blob=n_blob or None, **hf)

        lens = [[len(c) for c in s.instances] for s in chunk_snarks]
        if keccak_header:
            assert header is not None, \
                "keccak_header needs chunk_infos to build the BatchHeader"
        bc = BatchCircuit.build(chunk_vk, lens[0], len(chunk_snarks),
                                self.k_batch, n_blob=n_blob,
                                ec_mode=self.ec_mode,
                                keccak_header=keccak_header)
        asg, inst_vals, acc = bc.assign(
            [s.instances for s in chunk_snarks],
            [s.proof for s in chunk_snarks],
            chain_checks=chain_checks, blob_coeffs=blob_coeffs,
            header=header if keccak_header else None)
        out = self._prove(bc, asg, inst_vals, acc, "layer3")
        out.batch_header = header
        return out

    def bundle(self, batch_vk, batch_snarks: list) -> LayerSnark:
        """Binary recursion tree over batch snarks (reference
        layer5/bundle); odd leftovers promote unchanged."""
        from zkevm_tpu.aggregation.recursion import RecursionCircuit

        level = list(batch_snarks)
        vk = batch_vk
        while len(level) > 1:
            nxt = []
            for i in range(0, len(level) - 1, 2):
                rc = RecursionCircuit.build(vk, self.k_recursion,
                                            ec_mode=self.ec_mode)
                asg, inst_vals, acc = rc.assign(
                    [level[i].instances, level[i + 1].instances],
                    [level[i].proof, level[i + 1].proof])
                nxt.append(self._prove(rc, asg, inst_vals, acc, "layer5"))
            if len(level) % 2:
                nxt.append(level[-1])
            level = nxt
            # above the first tree level, nodes verify the recursion vk
            vk = level[0].vk if level[0].vk is not None else vk
        return level[0]

    def finalize(self, params, snark: LayerSnark) -> bool:
        """The terminal pairing check on the final accumulator (the role
        of the reference's EVM/YUL verifier, prover/src/evm.rs)."""
        from zkevm_tpu.aggregation.verifier_circuit import (
            finalize_accumulator,
        )

        return finalize_accumulator(params, snark.accumulator)
