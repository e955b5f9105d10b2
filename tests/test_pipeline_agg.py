"""BundlePipeline (prover/pipeline.py) — the layer orchestration analog
of prover/src/lib.rs inner->layer6, driven at the MockProver tier over
real mock-chunk snarks (reference aggregator test strategy)."""

import pytest

from zkevm_tpu.aggregation.compression import ACC_ROWS
from zkevm_tpu.aggregation.recursion import STATE_LEN
from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.plonk import ConstraintSystem
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.keygen import keygen
from zkevm_tpu.plonk.prover import create_proof
from zkevm_tpu.plonk.verifier import verify_proof
from zkevm_tpu.prover.pipeline import BundlePipeline, LayerSnark
from zkevm_tpu.transcript import PoseidonTranscript

K_INNER = 5
N_INNER = 1 << K_INNER
TAU = 0x777AB


def _mock_acc(a):
    from zkevm_tpu.aggregation.verifier_circuit import Accumulator

    return Accumulator(bn.scalar_mul(bn.G1_GEN, a * TAU % FR_MOD),
                       bn.scalar_mul(bn.G1_GEN, a))


@pytest.fixture(scope="module")
def setup():
    """Mock batch-shaped snarks: instance = [12 acc limbs, state]."""
    cs = ConstraintSystem()
    q = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    inst = cs.instance_column()
    ac = a.cur()
    cs.create_gate("pow5", [q.cur() * (ac * ac * ac * ac * ac - b.cur())])
    nrows = ACC_ROWS + STATE_LEN
    for i in range(nrows):
        cs.copy(a, i, inst, i)
    params = ParamsKZG.unsafe_setup(K_INNER, tau=TAU, windowed=False)
    fixed_only = Assignment(cs, N_INNER)
    fixed_only.set_ints(q, 0, [1] * nrows)
    pk = keygen(params, cs, fixed_only)

    def make(seed):
        iv = _mock_acc(30 + seed).limbs() + [500 + seed]
        asg = Assignment(cs, N_INNER)
        asg.set_ints(q, 0, [1] * nrows)
        asg.set_ints(a, 0, iv)
        asg.set_ints(b, 0, [pow(v, 5, FR_MOD) for v in iv])
        asg.set_ints(inst, 0, iv)
        proof = create_proof(params, pk, [iv], asg,
                             transcript=PoseidonTranscript(), seed=seed)
        assert verify_proof(params, pk.vk, [iv], proof,
                            transcript=PoseidonTranscript())
        return LayerSnark([iv], proof, _mock_acc(30 + seed), pk.vk, K_INNER)

    return params, pk, [make(i) for i in range(3)]


def test_bundle_tree_three_leaves(setup):
    """3 batch snarks -> recursion tree (2 fold + odd promote, then...
    mock mode composes one level, so drive one node directly and check
    the pipeline's tree logic handles the odd leaf)."""
    params, pk, snarks = setup
    pipe = BundlePipeline(mock=True, ec_mode="host", k_recursion=14)
    # one tree level over the first two leaves (third would need a real
    # level-1 proof, which mock mode doesn't produce)
    out = pipe.bundle(pk.vk, snarks[:2])
    assert pipe.finalize(params, out)
    # instance: accumulator-first + chained state digest
    assert out.instances[0][:12] == out.accumulator.limbs()
    assert len(out.instances[0]) == ACC_ROWS + STATE_LEN


def test_batch_layer_via_pipeline(setup):
    params, pk, snarks = setup
    pipe = BundlePipeline(mock=True, ec_mode="host", k_batch=14)
    out = pipe.batch(pk.vk, snarks[:2])
    assert pipe.finalize(params, out)


def test_finalize_rejects_corrupt(setup):
    params, pk, snarks = setup
    pipe = BundlePipeline(mock=True, ec_mode="host", k_batch=14)
    out = pipe.batch(pk.vk, snarks[:2])
    from zkevm_tpu.aggregation.verifier_circuit import Accumulator

    bad = Accumulator((out.accumulator.lhs[0] + 1, out.accumulator.lhs[1]),
                      out.accumulator.rhs)
    out.accumulator = bad
    assert not pipe.finalize(params, out)
