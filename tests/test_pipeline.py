"""Chunk-prover orchestration (reference zkevm::Prover::gen_chunk_proof +
load_or_gen resume): k selection, key caching, artifact resume, vk
pinning — with the expensive create_proof stubbed out (the real proof of
the same pipeline runs in scripts/prove_super.py / the heavy tier)."""

import pytest

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.plonk.prover import Proof
from zkevm_tpu.prover import pipeline as pl
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

PARAMS = CircuitsParams(max_txs=2, max_calldata=16, max_rlp=128)


@pytest.fixture(scope="module")
def ctx():
    return TestContext.new(
        accounts=[lambda a: a.balance(10**19), lambda a: a.balance(10**18)],
        txs=[lambda t: t.from_(0).to(1).value(10**15)],
    )


def test_k_selection_and_usage(ctx):
    block = block_convert(ctx, PARAMS)
    from zkevm_tpu.plonk.cs import ConstraintSystem

    cs = ConstraintSystem()
    cfg = sup.configure(cs, PARAMS)
    usage = sup.row_usage(cfg, block)
    assert usage["keccak"] >= 4 * 1825  # 2 rlp + >=1 pi + padding perms
    k = sup.choose_k(cfg, block)
    assert (1 << k) - 64 >= max(usage.values())


def test_orchestration_with_stubbed_prover(ctx, monkeypatch, tmp_path):
    calls = {"prove": 0, "verify": 0}
    fake = Proof([], [], [], [], (0, 0), [], [], (0, 0), (0, 0))

    def fake_create(params, pk, instances, wit, **kw):
        calls["prove"] += 1
        return fake

    def fake_verify(params, vk, instances, proof):
        calls["verify"] += 1
        return True

    def fake_keygen(params, cs, asg):
        calls["keygen"] = calls.get("keygen", 0) + 1

        class _VK:
            def __init__(self, cs):
                self.cs = cs
                self.domain = type("D", (), {"k": params.k})()
                self.fixed_commitments = []
                self.sigma_commitments = []

        class _PK:
            def __init__(self, cs):
                self.vk = _VK(cs)

        return _PK(cs)

    dumped = {}

    def fake_dump(path, proof, vk=None):
        dumped[path] = proof

    def fake_logp(path, gen, vk=None):
        if path in dumped:
            return dumped[path]
        p = gen()
        dumped[path] = p
        return p

    monkeypatch.setattr(pl, "create_proof", fake_create)
    monkeypatch.setattr(pl, "verify_proof", fake_verify)
    monkeypatch.setattr(pl, "keygen", fake_keygen)
    monkeypatch.setattr(pl, "load_or_gen_proof", fake_logp)
    monkeypatch.setattr(pl, "vk_fingerprint", lambda vk: "fp0")

    prover = pl.ChunkProver(circuits_params=PARAMS,
                            artifact_dir=str(tmp_path))
    cp1 = prover.gen_chunk_proof(ctx, name="b1")
    assert calls == {"prove": 1, "verify": 1, "keygen": 1}
    assert cp1.vk_fingerprint == "fp0"

    # second proof of the same chunk: artifact hit, no second prove;
    # keys reused, verification still runs
    prover.gen_chunk_proof(ctx, name="b1")
    assert calls["prove"] == 1 and calls["keygen"] == 1
    assert calls["verify"] == 2

    assert prover.verify_chunk_proof(cp1)
    cp_bad = pl.ChunkProof(cp1.proof, cp1.instances, cp1.k, "other")
    assert not prover.verify_chunk_proof(cp_bad)
