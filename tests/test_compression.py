"""CompressionCircuit / in-circuit PLONK verifier (aggregation/) — the
snark-verifier + compression layer analog (reference:
aggregator/src/compression/circuit.rs, prover/src/common/prover/chunk.rs).

Light tier: the scalar/transcript half of the verifier drives the REAL
FlexGate + sponge rows while EC ops run a host-math stub — the computed
accumulator must satisfy the real pairing check, proving every challenge,
instance/Lagrange eval, gate evaluation at x, and SHPLONK scalar is
correct. Heavy tier (ZKEVM_TPU_HEAVY=1): the full circuit incl. the ECC
region, MockProver-satisfied + tamper rejection.
"""

import os

import numpy as np
import pytest

from zkevm_tpu.aggregation import compression as comp
from zkevm_tpu.aggregation import verifier_circuit as vc
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


def _build_inner():
    """Tiny inner circuit exercising a gate, a lookup, copies, and an
    instance binding: b == a*a, a in [0,16), a[0] == instance[0]."""
    cs = ConstraintSystem()
    q = cs.fixed_column()
    tbl = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    inst = cs.instance_column()
    cs.create_gate("sq", [q.cur() * (b.cur() - a.cur() * a.cur())])
    cs.lookup("a_small", [(q.cur() * a.cur(), tbl.cur())])
    cs.copy(a, 0, inst, 0)
    cs.copy(b, 2, b, 3)
    return cs, (q, tbl, a, b, inst)


def _assign_inner(cs, cols, avals):
    q, tbl, a, b, inst = cols
    asg = Assignment(cs, N_INNER)
    asg.set_ints(tbl, 0, list(range(16)))
    rows = len(avals)
    asg.set_ints(q, 0, [1] * rows)
    asg.set_ints(a, 0, avals)
    asg.set_ints(b, 0, [v * v for v in avals])
    asg.set_int(inst, 0, avals[0])
    return asg


@pytest.fixture(scope="module")
def inner():
    cs, cols = _build_inner()
    avals = [7, 3, 5, 5, 11, 2]
    asg = _assign_inner(cs, cols, avals)
    MockProver(cs, asg).assert_satisfied()
    params = ParamsKZG.unsafe_setup(K_INNER, windowed=False)
    fixed_only = Assignment(cs, N_INNER)
    for col in cs.fixed_columns:
        fixed_only.cols[col][:] = asg.cols[col]
    pk = keygen(params, cs, fixed_only)
    instances = [[avals[0]]]
    proof = create_proof(params, pk, instances, asg,
                         transcript=PoseidonTranscript(), seed=42)
    assert verify_proof(params, pk.vk, instances, proof,
                        transcript=PoseidonTranscript())
    return params, pk, instances, proof


def test_scalar_side_accumulator(inner, monkeypatch):
    """Stub the EC backend: the flex/sponge-computed accumulator must pass
    the real pairing check (and challenges must equal the host's)."""
    params, pk, instances, proof = inner

    def fake_mul(self, fx, state, s, p):
        res = bn.scalar_mul(p.affine, s.val)
        state.setdefault("muls", []).append((p.affine, s.val))
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    def fake_add(self, fx, state, a, b):
        res = bn.add(a.affine, b.affine)
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    monkeypatch.setattr(vc.VerifierChip, "ec_mul", fake_mul)
    monkeypatch.setattr(vc.VerifierChip, "ec_add", fake_add)

    cc = comp.CompressionCircuit.build(pk.vk, [1], 13)
    asg, inst_vals, acc = cc.assign(instances, proof)
    assert vc.finalize_accumulator(params, acc), (
        "in-circuit-computed accumulator failed the pairing check"
    )
    # instance = accumulator limbs ++ inner instance
    assert inst_vals[:12] == acc.limbs()
    assert inst_vals[12:] == [instances[0][0]]
    # the scalar-side rows themselves are sound
    MockProver(cs=cc.cs, assignment=asg).assert_satisfied()


def test_tampered_inner_proof_breaks_accumulator(inner, monkeypatch):
    import copy

    params, pk, instances, proof = inner
    bad = copy.deepcopy(proof)
    bad.evals[3] = (bad.evals[3] + 1) % FR_MOD
    assert not verify_proof(params, pk.vk, instances, bad,
                            transcript=PoseidonTranscript())

    def fake_mul(self, fx, state, s, p):
        res = bn.scalar_mul(p.affine, s.val)
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    def fake_add(self, fx, state, a, b):
        res = bn.add(a.affine, b.affine)
        return vc.PointCells(
            [fx.witness(v) for v in to_limbs(res[0])],
            [fx.witness(v) for v in to_limbs(res[1])], res[0], res[1])

    monkeypatch.setattr(vc.VerifierChip, "ec_mul", fake_mul)
    monkeypatch.setattr(vc.VerifierChip, "ec_add", fake_add)
    cc = comp.CompressionCircuit.build(pk.vk, [1], 13)
    _, _, acc = cc.assign(instances, bad)
    assert not vc.finalize_accumulator(params, acc), (
        "tampered proof must yield a non-pairing accumulator"
    )


@pytest.mark.skipif(not HEAVY, reason="full in-circuit verifier is heavy "
                    "(ZKEVM_TPU_HEAVY=1)")
def test_full_compression_circuit(inner):
    params, pk, instances, proof = inner
    cc = comp.CompressionCircuit.build(pk.vk, [1], 16)
    need = cc.min_rows()
    assert need <= (1 << 16), need
    asg, inst_vals, acc = cc.assign(instances, proof)
    assert vc.finalize_accumulator(params, acc)
    MockProver(cc.cs, asg).assert_satisfied()

    # tamper: break one scalar-limb binding at a mul call site
    cfg = cc.cfg
    asg.set_int(cfg.mc["kl"][0], 0, (asg.get_int(cfg.mc["kl"][0], 0) + 1)
                % FR_MOD)
    assert MockProver(cc.cs, asg).verify(), "tampered kl limb must fail"
