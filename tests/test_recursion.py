"""RecursionCircuit (aggregation/recursion.py) — binary aggregation tree
over batch-shaped snarks, mock-child tier (reference:
aggregator/src/tests/recursion.rs with mock chunks)."""

import pytest

from zkevm_tpu.aggregation import recursion as rec
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

K_INNER = 5
N_INNER = 1 << K_INNER
TAU = 0x4AC4


def _mock_acc(a):
    return vc.Accumulator(bn.scalar_mul(bn.G1_GEN, a * TAU % FR_MOD),
                          bn.scalar_mul(bn.G1_GEN, a))


def _build_mock_batch():
    """Mock batch-shaped snark: instance = [12 acc limbs, state]."""
    cs = ConstraintSystem()
    q = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    inst = cs.instance_column()
    ac = a.cur()
    cs.create_gate("pow5", [q.cur() * (ac * ac * ac * ac * ac - b.cur())])
    for i in range(ACC_ROWS + 1):
        cs.copy(a, i, inst, i)
    return cs, (q, a, b, inst)


@pytest.fixture(scope="module")
def batches():
    cs, cols = _build_mock_batch()
    q, a, b, inst = cols
    params = ParamsKZG.unsafe_setup(K_INNER, tau=TAU, windowed=False)
    fixed_only = Assignment(cs, N_INNER)
    fixed_only.set_ints(q, 0, [1] * (ACC_ROWS + 1))
    pk = keygen(params, cs, fixed_only)
    insts, proofs = [], []
    for ci in range(2):
        iv = _mock_acc(50 + ci).limbs() + [777 + ci]
        asg = Assignment(cs, N_INNER)
        asg.set_ints(q, 0, [1] * (ACC_ROWS + 1))
        asg.set_ints(a, 0, iv)
        asg.set_ints(b, 0, [pow(v, 5, FR_MOD) for v in iv])
        asg.set_ints(inst, 0, iv)
        proofs.append(create_proof(params, pk, [iv], asg,
                                   transcript=PoseidonTranscript(), seed=9))
        assert verify_proof(params, pk.vk, [iv], proofs[-1],
                            transcript=PoseidonTranscript())
        insts.append([iv])
    return params, pk, insts, proofs


def _stub_ec(monkeypatch):
    def fake_mul(self, fx, state, s, p):
        res = bn.scalar_mul(p.affine, s.val)
        return vc.PointCells([fx.witness(v) for v in to_limbs(res[0])],
                             [fx.witness(v) for v in to_limbs(res[1])],
                             res[0], res[1])

    def fake_add(self, fx, state, x, y):
        res = bn.add(x.affine, y.affine)
        return vc.PointCells([fx.witness(v) for v in to_limbs(res[0])],
                             [fx.witness(v) for v in to_limbs(res[1])],
                             res[0], res[1])

    monkeypatch.setattr(vc.VerifierChip, "ec_mul", fake_mul)
    monkeypatch.setattr(vc.VerifierChip, "ec_add", fake_add)


def test_recursion_node(batches, monkeypatch):
    params, pk, insts, proofs = batches
    _stub_ec(monkeypatch)
    rc = rec.RecursionCircuit.build(pk.vk, 14)
    asg, inst_vals, acc = rc.assign(insts, proofs)
    assert vc.finalize_accumulator(params, acc)
    assert inst_vals[:12] == acc.limbs()
    # state transition: parent digest = H(left, right) chained sponge
    MockProver(rc.cs, asg).assert_satisfied()


def test_recursion_rejects_corrupt_child_acc(batches, monkeypatch):
    import copy

    params, pk, insts, proofs = batches
    _stub_ec(monkeypatch)
    bad = copy.deepcopy(insts)
    bad[0][0][5] = (bad[0][0][5] + 1) % FR_MOD
    rc = rec.RecursionCircuit.build(pk.vk, 14)
    _, _, acc = rc.assign(bad, proofs)
    assert not vc.finalize_accumulator(params, acc)
