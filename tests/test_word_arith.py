"""Word-arithmetic table circuit tests (reference role: the
mul_add_words.rs unit tests + mul_div_mod.rs table-side semantics)."""

import pytest

from zkevm_tpu.circuits import word_arith as wa
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 9
N = 1 << K
M256 = (1 << 256) - 1


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    cfg = wa.configure(cs, rt8)
    return cs, cfg, rt8


def _assign(cs, cfg, rt8, ops):
    asg = Assignment(cs, N)
    rt8.load(asg)
    return wa.assign(cs, cfg, N, ops, asg)


BIG = 0xFEDCBA9876543210FEDCBA9876543210FEDCBA9876543210FEDCBA9876543210


def test_mul_rows_satisfied(circuit):
    cs, cfg, rt8 = circuit
    ops = [
        wa.WordArithOp(wa.WordOp.MUL, 3, 5, 0),
        wa.WordArithOp(wa.WordOp.MUL, BIG, BIG, 0),  # wraps 2^256
        wa.WordArithOp(wa.WordOp.MUL, M256, M256, M256),
        wa.WordArithOp(wa.WordOp.MUL, 0, 0, 0),
    ]
    assert ops[1].d == (BIG * BIG) & M256
    MockProver(cs, _assign(cs, cfg, rt8, ops)).assert_satisfied()


def test_divmod_rows_satisfied(circuit):
    cs, cfg, rt8 = circuit
    # dividend d, divisor b: d = q*b + r
    cases = [(100, 7), (BIG, 12345), (M256, M256 - 1), (5, 100)]
    ops = []
    for d, b in cases:
        q, r = divmod(d, b)
        ops.append(wa.WordArithOp(wa.WordOp.DIVMOD, q, b, r))
        assert ops[-1].d == d
    MockProver(cs, _assign(cs, cfg, rt8, ops)).assert_satisfied()


def test_wrong_product_caught(circuit):
    cs, cfg, rt8 = circuit
    ops = [wa.WordArithOp(wa.WordOp.MUL, 3, 5, 0)]
    asg = _assign(cs, cfg, rt8, ops)
    asg.set_int(cfg.d_lo, 0, 16)  # 3*5 != 16
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_divmod_wrap_caught(circuit):
    """q*b + r that wraps 2^256 must be rejected for tag DIVMOD: forge a
    'division' whose quotient times divisor overflows."""
    cs, cfg, rt8 = circuit
    # honest MUL witness for a wrapping product, then flip the tag to
    # DIVMOD: the overflow gate must fire
    ops = [wa.WordArithOp(wa.WordOp.MUL, BIG, BIG, 0)]
    asg = _assign(cs, cfg, rt8, ops)
    asg.set_int(cfg.tag, 0, int(wa.WordOp.DIVMOD))
    # make the c < b witness consistent so ONLY the overflow gate fires
    b, c = BIG, 0
    borrow_in = 1
    for i in range(4):
        bl_i = (b >> (64 * i)) & wa.M64
        di = bl_i - ((c >> (64 * i)) & wa.M64) - borrow_in
        bo = 1 if di < 0 else 0
        di += bo << 64
        asg.set_int(cfg.borrows[i], 0, bo)
        for j in range(8):
            asg.set_int(cfg.g2[j], 8 + i, (di >> (8 * j)) & 0xFF)
        borrow_in = bo
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_divmod_remainder_ge_divisor_caught(circuit):
    """r >= b (non-canonical remainder) must be rejected: 100 = 7*7 + 51
    is arithmetically true but 51 >= 7."""
    cs, cfg, rt8 = circuit
    op = wa.WordArithOp(wa.WordOp.DIVMOD, 7, 7, 51)
    # assign bypassing the canonicality assert
    asg = Assignment(cs, N)
    rt8.load(asg)
    try:
        wa.assign(cs, cfg, N, [op], asg)
        raised = False
    except AssertionError:
        raised = True
    assert raised, "assign-time canonicality guard missing"
    # forge it cell by cell: honest-shaped witness with r=51, b=7; the
    # borrow chain cannot terminate with borrow_3 == 0
    fake = wa.WordArithOp(wa.WordOp.MUL, 7, 7, 51)
    asg = _assign(cs, cfg, rt8, [fake])
    asg.set_int(cfg.tag, 0, int(wa.WordOp.DIVMOD))
    # best-effort g2/borrow forgery: D = b - c - 1 mod 2^256 with final
    # borrow forced 0 — some limb identity must then fail
    d_forged = (7 - 51 - 1) % (1 << 256)
    for i in range(4):
        for j in range(8):
            asg.set_int(cfg.g2[j], 8 + i, (d_forged >> (8 * (8 * i + j))) & 0xFF)
        asg.set_int(cfg.borrows[i], 0, 1 if i == 0 else 0)
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_byte_grid_range_checked(circuit):
    cs, cfg, rt8 = circuit
    ops = [wa.WordArithOp(wa.WordOp.MUL, 3, 5, 0)]
    asg = _assign(cs, cfg, rt8, ops)
    asg.set_int(cfg.g1[0], 0, 256)  # out of byte range
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "lookup" for f in fails)


def test_mul512_rows_satisfied(circuit):
    cs, cfg, rt8 = circuit
    ops = [
        wa.WordArithOp(wa.WordOp.MUL512, BIG, BIG, 0),
        wa.WordArithOp(wa.WordOp.MUL512, M256, M256, M256),
        wa.WordArithOp(wa.WordOp.MUL512, 3, 5, 7),  # e = 0
    ]
    full = BIG * BIG
    assert ops[0].d == full & M256 and ops[0].e == full >> 256
    MockProver(cs, _assign(cs, cfg, rt8, ops)).assert_satisfied()


def test_divmod512_rows_satisfied(circuit):
    cs, cfg, rt8 = circuit
    # k*N + r covering > 2^256 products (the ADDMOD/MULMOD shape)
    cases = [(BIG, 12345, 12344), (M256, M256 - 1, M256 - 2), (0, 5, 4)]
    ops = [wa.WordArithOp(wa.WordOp.DIVMOD512, k, n, r)
           for k, n, r in cases]
    MockProver(cs, _assign(cs, cfg, rt8, ops)).assert_satisfied()


def test_mul512_wrong_high_word_caught(circuit):
    cs, cfg, rt8 = circuit
    ops = [wa.WordArithOp(wa.WordOp.MUL512, BIG, BIG, 0)]
    asg = _assign(cs, cfg, rt8, ops)
    e = ops[0].e
    asg.set_int(cfg.e_lo, 0, (e + 1) & ((1 << 128) - 1))
    fails = MockProver(cs, asg).verify()
    assert any(f.kind == "gate" for f in fails)


def test_divmod512_remainder_ge_divisor_caught(circuit):
    cs, cfg, rt8 = circuit
    try:
        wa.assign(cs, cfg, N, [wa.WordArithOp(wa.WordOp.DIVMOD512, 7, 7, 51)],
                  Assignment(cs, N))
        raised = False
    except AssertionError:
        raised = True
    assert raised, "assign-time canonicality guard missing for DIVMOD512"
