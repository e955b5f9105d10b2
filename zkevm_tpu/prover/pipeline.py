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
