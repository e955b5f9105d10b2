"""Non-native mul-mod gadget (halo2-ecc CRT bigint role): secp256k1 and
BN254-Fq products proven in the Fr constraint system, with forgery
rejection — the aggregation/Sig-circuit groundwork."""

import pytest

from zkevm_tpu.ec.secp256k1 import N as SECP_N, P as SECP_P
from zkevm_tpu.ff import FR
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.gadgets.bigint import LB, ForeignMul, from_limbs, to_limbs
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 9
NROWS = 1 << K
FQ_BN254 = 21888242871839275222246405745257275088696311157297823662689037894645226208583


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    q_en = cs.fixed_column()
    rt8 = RangeTable.configure(cs, 8)
    g_p = ForeignMul.configure(cs, q_en.cur(), SECP_P, rt8, "fp")
    g_n = ForeignMul.configure(cs, q_en.cur(), SECP_N, rt8, "fn")
    g_q = ForeignMul.configure(cs, q_en.cur(), FQ_BN254, rt8, "fq")
    return cs, q_en, rt8, g_p, g_n, g_q


CASES = [
    (3, 5),
    (SECP_P - 1, SECP_P - 1),
    (2**255 % SECP_P, 2**200 + 12345),
    (0, SECP_P - 2),
    (1, 2**256 % SECP_P),
]


def _assign(circuit, rows_pn):
    cs, q_en, rt8, g_p, g_n, g_q = circuit
    asg = Assignment(cs, NROWS)
    rt8.load(asg)
    for row, (a, b) in enumerate(rows_pn):
        asg.set_int(q_en, row, 1)
        rp = g_p.assign_row(asg, row, a % SECP_P, b % SECP_P)
        rn = g_n.assign_row(asg, row, a % SECP_N, b % SECP_N)
        rq = g_q.assign_row(asg, row, a % FQ_BN254, b % FQ_BN254)
        assert rp == a * b % SECP_P
        assert rn == (a % SECP_N) * (b % SECP_N) % SECP_N
        assert rq == (a % FQ_BN254) * (b % FQ_BN254) % FQ_BN254
    return asg


def test_foreign_mul_proven(circuit):
    cs = circuit[0]
    asg = _assign(circuit, CASES)
    MockProver(cs, asg).assert_satisfied()


def test_limb_roundtrip():
    v = 2**263 - 12345
    assert from_limbs(to_limbs(v)) == v


def test_forged_result_rejected(circuit):
    """Claim a different product residue."""
    cs, q_en, rt8, g_p, _, _ = circuit
    asg = _assign(circuit, CASES)
    cur = FR.decode(asg.cols[g_p.r[0]][0])
    asg.set_int(g_p.r[0], 0, (cur + 1) % (1 << LB))
    fails = MockProver(cs, asg).verify()
    assert fails, "forged residue accepted"


def test_noncanonical_result_rejected(circuit):
    """Claim (q-1, r+m) — the SAME integer identity a*b = q'm + r', with
    coherent carries, so only the borrow-chain r < m check can catch it."""
    from zkevm_tpu.gadgets.bigint import CB, NL

    cs, q_en, rt8, g_p, _, _ = circuit
    asg = _assign(circuit, [(SECP_P - 1, SECP_P - 1)])
    a = b = SECP_P - 1
    q_true, r_true = divmod(a * b, SECP_P)
    q_f, r_f = q_true - 1, r_true + SECP_P
    a_l, b_l = to_limbs(a), to_limbs(b)
    q_l, r_l, m_l = to_limbs(q_f), to_limbs(r_f), to_limbs(SECP_P)
    for i, col in enumerate(g_p.q):
        asg.set_int(col, 0, q_l[i])
        for j, ch in enumerate(g_p.chunks[col]):
            asg.set_int(ch, 0, (q_l[i] >> (8 * j)) & 0xFF)
    for i, col in enumerate(g_p.r):
        asg.set_int(col, 0, r_l[i])
        for j, ch in enumerate(g_p.chunks[col]):
            asg.set_int(ch, 0, (r_l[i] >> (8 * j)) & 0xFF)
    c = 0
    for k in range(2 * NL - 1):
        t = c
        for i in range(NL):
            j = k - i
            if 0 <= j < NL:
                t += a_l[i] * b_l[j] - q_l[i] * m_l[j]
        if k < NL:
            t -= r_l[k]
        if k < 2 * NL - 2:
            assert t % (1 << LB) == 0
            c = t >> LB
            cell = c + (1 << CB)
            asg.set_int(g_p.carries[k], 0, cell)
            for j, ch in enumerate(g_p.chunks[g_p.carries[k]]):
                asg.set_int(ch, 0, (cell >> (8 * j)) & 0xFF)
        else:
            assert t == 0  # the forged identity DOES close as integers
    fails = MockProver(cs, asg).verify()
    assert any("canon" in f.name or "d8" in f.name for f in fails), \
        f"non-canonical residue accepted: {fails[:3]}"
