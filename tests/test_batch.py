"""BatchCircuit (aggregation/batch.py) — chunk aggregation with KZG
accumulator folding, tested with mock chunk snarks exactly like the
reference's aggregator/src/tests/mock_chunk.rs strategy (SURVEY §4 tier
2): a tiny circuit whose instance leads with 12 limbs of a pairing-valid
accumulator fabricated from the test SRS's known tau."""

import os

import pytest

from zkevm_tpu.aggregation import batch as batch_mod
from zkevm_tpu.aggregation import verifier_circuit as vc
from zkevm_tpu.aggregation.compression import ACC_ROWS
from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.bigint import to_limbs
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.keygen import keygen
from zkevm_tpu.plonk.prover import create_proof
from zkevm_tpu.plonk.verifier import verify_proof
from zkevm_tpu.transcript import PoseidonTranscript

HEAVY = os.environ.get("ZKEVM_TPU_HEAVY") == "1"

K_INNER = 5
N_INNER = 1 << K_INNER
TAU = 0x712D  # known test tau for mock accumulators
NPI = 2  # chunk public inputs beyond the accumulator


def _mock_accumulator(a: int) -> vc.Accumulator:
    """rhs = a*G1, lhs = (a*tau)*G1 — passes e(lhs,G2)e(-rhs,tauG2)=1."""
    rhs = bn.scalar_mul(bn.G1_GEN, a)
    lhs = bn.scalar_mul(bn.G1_GEN, a * TAU % FR_MOD)
    return vc.Accumulator(lhs, rhs)


def _build_mock_chunk():
    """MockChunkCircuit: instance = [12 acc limbs ++ NPI values], one
    advice column mirroring the instance (so the instance is constrained),
    plus a genuine max-degree gate (b == a^5) — a circuit whose
    constraints don't REACH the static degree bound leaves the top
    quotient piece identically zero, i.e. an identity commitment the
    in-circuit verifier cannot witness (verifier_circuit.py caveats);
    real circuits reach full degree through blinding randomness."""
    cs = ConstraintSystem()
    q = cs.fixed_column()
    tbl = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    inst = cs.instance_column()
    ac = a.cur()
    cs.create_gate("pow5", [q.cur() * (ac * ac * ac * ac * ac - b.cur())])
    cs.lookup("rng", [(q.cur(), tbl.cur())])
    for i in range(ACC_ROWS + NPI):
        cs.copy(a, i, inst, i)
    return cs, (q, tbl, a, b, inst)


def _prove_mock_chunk(params, pk, cs, cols, inst_vals):
    q, tbl, a, b, inst = cols
    asg = Assignment(cs, N_INNER)
    asg.set_ints(tbl, 0, list(range(N_INNER - 8)))
    asg.set_ints(q, 0, [1] * (ACC_ROWS + NPI))
    asg.set_ints(a, 0, inst_vals)
    asg.set_ints(b, 0, [pow(v, 5, FR_MOD) for v in inst_vals])
    asg.set_ints(inst, 0, inst_vals)
    proof = create_proof(params, pk, [inst_vals], asg,
                         transcript=PoseidonTranscript(), seed=7)
    assert verify_proof(params, pk.vk, [inst_vals], proof,
                        transcript=PoseidonTranscript())
    return proof


@pytest.fixture(scope="module")
def chunks():
    cs, cols = _build_mock_chunk()
    params = ParamsKZG.unsafe_setup(K_INNER, tau=TAU, windowed=False)
    fixed_only = Assignment(cs, N_INNER)
    q, tbl, a, b, inst = cols
    fixed_only.set_ints(tbl, 0, list(range(N_INNER - 8)))
    fixed_only.set_ints(q, 0, [1] * (ACC_ROWS + NPI))
    pk = keygen(params, cs, fixed_only)
    insts, proofs = [], []
    for ci in range(2):
        acc = _mock_accumulator(1000 + ci)
        pis = [111 + ci, 222 + ci]
        iv = acc.limbs() + pis
        proofs.append(_prove_mock_chunk(params, pk, cs, cols, iv))
        insts.append([iv])
    return params, pk, insts, proofs


def _stub_ec(monkeypatch):
    def fake_mul(self, fx, state, s, p):
        res = bn.scalar_mul(p.affine, s.val)
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    def fake_add(self, fx, state, x, y):
        res = bn.add(x.affine, y.affine)
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    monkeypatch.setattr(vc.VerifierChip, "ec_mul", fake_mul)
    monkeypatch.setattr(vc.VerifierChip, "ec_add", fake_add)


def test_batch_fold_accumulator(chunks, monkeypatch):
    params, pk, insts, proofs = chunks
    _stub_ec(monkeypatch)
    bc = batch_mod.BatchCircuit.build(pk.vk, [ACC_ROWS + NPI], 2, 14)
    asg, inst_vals, acc = bc.assign(insts, proofs)
    assert vc.finalize_accumulator(params, acc), (
        "folded batch accumulator must pass the pairing check")
    assert inst_vals[:12] == acc.limbs()
    MockProver(bc.cs, asg).assert_satisfied()


def test_batch_rejects_bad_embedded_accumulator(chunks, monkeypatch):
    params, pk, insts, proofs = chunks
    _stub_ec(monkeypatch)
    # corrupt one embedded accumulator limb in chunk 1's instance — the
    # chunk proof itself is then invalid for this instance, AND the folded
    # accumulator must fail
    import copy
    bad = copy.deepcopy(insts)
    bad[1][0][0] = (bad[1][0][0] + 1) % FR_MOD
    bc = batch_mod.BatchCircuit.build(pk.vk, [ACC_ROWS + NPI], 2, 14)
    _, _, acc = bc.assign(bad, proofs)
    assert not vc.finalize_accumulator(params, acc)


def test_batch_chain_check(chunks, monkeypatch):
    params, pk, insts, proofs = chunks
    _stub_ec(monkeypatch)
    bc = batch_mod.BatchCircuit.build(pk.vk, [ACC_ROWS + NPI], 2, 14)
    # PI layout: [111+ci, 222+ci]; require pi[0] of chunk i == pi[0] of
    # chunk i-1 + nothing — use a pair that FAILS to prove checks bind
    with pytest.raises(AssertionError):
        bc.assign(insts, proofs, chain_checks=[(0, 0)])  # 111 != 112


def test_batch_with_blob(chunks, monkeypatch):
    """Blob-enabled batch: in-circuit barycentric y = blob(z) with z bound
    to the batch transcript; (z, y) exposed in the instance for the
    L1-side KZG point-eval check."""
    from zkevm_tpu.aggregation.blob import (
        BLS_R, barycentric_eval, batch_bytes_to_coeffs,
    )
    from zkevm_tpu.gadgets.bigint import from_limbs

    params, pk, insts, proofs = chunks
    _stub_ec(monkeypatch)
    n_blob = 16
    coeffs = batch_bytes_to_coeffs(b"batch payload bytes", n_blob)
    bc = batch_mod.BatchCircuit.build(pk.vk, [ACC_ROWS + NPI], 2, 14,
                                      n_blob=n_blob)
    asg, inst_vals, acc = bc.assign(insts, proofs, blob_coeffs=coeffs)
    assert vc.finalize_accumulator(params, acc)
    z = from_limbs(inst_vals[13:16])
    y = from_limbs(inst_vals[16:19])
    assert y == barycentric_eval(coeffs, z, n_blob), "instance (z,y) wrong"
    MockProver(bc.cs, asg).assert_satisfied()


def test_batch_keccak_header(chunks, monkeypatch):
    """keccak_header mode: the L1-facing BatchHash (batch.rs:104-131)
    proven IN-CIRCUIT — the 193-byte header preimage rides a byte column
    whose keccak_input RLC feeds a KeccakTable lookup; the digest (hi,lo)
    lands in the instance bit-equal to header.py's batch_hash(); the
    preimage's (z, y) byte spans are bound to the barycentric limbs."""
    from zkevm_tpu.aggregation.blob import (
        BLS_R, BlobParams, barycentric_eval, batch_bytes_to_coeffs,
    )
    from zkevm_tpu.aggregation.header import BatchHeader, ChunkInfo
    from zkevm_tpu.gadgets.bigint import from_limbs

    params, pk, insts, proofs = chunks
    _stub_ec(monkeypatch)
    n_blob = 16
    payload = b"keccak header batch payload"
    coeffs = batch_bytes_to_coeffs(payload, n_blob)
    infos = [
        ChunkInfo(5, b"\x11" * 32, b"\x22" * 32, b"\x33" * 32,
                  b"\x44" * 32, b"tx-bytes-0"),
        ChunkInfo(5, b"\x22" * 32, b"\x55" * 32, b"\x66" * 32,
                  b"\x77" * 32, b"tx-bytes-1"),
    ]
    header = BatchHeader.construct_from_chunks(
        version=3, batch_index=7, l1_message_popped=0,
        total_l1_message_popped=0, parent_batch_hash=b"\x01" * 32,
        last_block_timestamp=1234, chunks=infos, blob_bytes=payload,
        n_snarks=2, blob_params=BlobParams.unsafe_setup(n_blob))
    bc = batch_mod.BatchCircuit.build(pk.vk, [ACC_ROWS + NPI], 2, 14,
                                      n_blob=n_blob, keccak_header=True)
    asg, inst_vals, acc = bc.assign(insts, proofs, blob_coeffs=coeffs,
                                    header=header)
    assert vc.finalize_accumulator(params, acc)
    # instance tail: ... z limbs(3), y limbs(3), hash hi, hash lo
    dig = header.batch_hash()
    assert inst_vals[-2] == int.from_bytes(dig[:16], "big")
    assert inst_vals[-1] == int.from_bytes(dig[16:], "big")
    z = from_limbs(inst_vals[-8:-5])
    y = from_limbs(inst_vals[-5:-2])
    assert z == int.from_bytes(header.blob_data_proof[0], "big")
    assert y == barycentric_eval(coeffs, z, n_blob)
    bc.fill_mock_phase1(asg)
    MockProver(bc.cs, asg).assert_satisfied()

    # tamper: a different preimage byte must break the keccak lookup
    asg.set_int(bc.hh.hbyte, 3, (bc._hbytes[3] + 1) % 256)
    from zkevm_tpu.plonk.mock import MockProver as MP
    assert MP(bc.cs, asg).verify(), "tampered header byte must fail"
