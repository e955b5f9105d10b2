"""Gadget library tests (reference role: gadgets/src/*.rs unit tests —
each gadget is mock-proven standalone with positive + negative cases)."""

import numpy as np
import pytest

from zkevm_tpu.ff import FR
from zkevm_tpu.gadgets import (
    BinaryNumber,
    IsEqual,
    IsZero,
    LtGadget,
    MulAddWord,
    RangeTable,
)
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 9
N = 1 << K


def test_is_zero_and_is_equal():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    v = cs.advice_column()
    w = cs.advice_column()
    iz = IsZero.configure(cs, q.cur(), v.cur())
    ie = IsEqual.configure(cs, q.cur(), v.cur(), w.cur())
    # consume the is_zero flag: out must equal the indicator
    out = cs.advice_column()
    cs.create_gate("bind", [q.cur() * (out.cur() - iz.expr())])

    asg = Assignment(cs, N)
    vals = [0, 5, 0, 123456]
    wals = [0, 5, 7, 0]
    for r, (a, b) in enumerate(zip(vals, wals)):
        asg.set_int(q, r, 1)
        asg.set_int(v, r, a)
        asg.set_int(w, r, b)
        asg.set_int(out, r, 1 if a == 0 else 0)
    iz.assign_rows(asg, 0, asg.cols[v][: len(vals)])
    ie.assign_rows(asg, 0, asg.cols[v][: len(vals)], asg.cols[w][: len(vals)])
    MockProver(cs, asg).assert_satisfied()

    # adversarial inv cannot flip the indicator
    asg.set_int(iz.inv, 1, 12345)
    asg.set_int(out, 1, 1)
    assert MockProver(cs, asg).verify()


def test_lt_gadget():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    a = cs.advice_column()
    b = cs.advice_column()
    table = RangeTable.configure(cs, 8)
    lt = LtGadget.configure(cs, q.cur(), a.cur(), b.cur(), table, n_limbs=2)

    asg = Assignment(cs, N)
    table.load(asg)
    avals = [3, 500, 500, 0, 65535]
    bvals = [4, 500, 499, 65535, 0]
    for r, (x, y) in enumerate(zip(avals, bvals)):
        asg.set_int(q, r, 1)
        asg.set_int(a, r, x)
        asg.set_int(b, r, y)
    lt.assign_rows(asg, 0, avals, bvals)
    MockProver(cs, asg).assert_satisfied()

    # lying about the comparison breaks the gate or range lookup
    asg.set_int(lt.lt, 0, 0)  # claim 3 >= 4
    assert MockProver(cs, asg).verify()


def test_binary_number():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    bn = BinaryNumber.configure(cs, q.cur(), 3)
    tagv = cs.advice_column()
    cs.create_gate("tag_value", [q.cur() * (tagv.cur() - bn.value())])
    ind5 = cs.advice_column()
    cs.create_gate("tag_is_5", [q.cur() * (ind5.cur() - bn.value_equals(5))])

    asg = Assignment(cs, N)
    vals = [0, 5, 7, 3]
    for r, t in enumerate(vals):
        asg.set_int(q, r, 1)
        asg.set_int(tagv, r, t)
        asg.set_int(ind5, r, 1 if t == 5 else 0)
    bn.assign_rows(asg, 0, vals)
    MockProver(cs, asg).assert_satisfied()

    asg.set_int(bn.bits[0], 1, 2)  # non-boolean bit
    assert MockProver(cs, asg).verify()


def test_mul_add_word():
    cs = ConstraintSystem()
    q = cs.fixed_column()
    table = RangeTable.configure(cs, 8)
    ma = MulAddWord.configure(cs, q.cur(), table)

    asg = Assignment(cs, N)
    table.load(asg)
    rng = np.random.default_rng(11)
    avals = [int(rng.integers(0, 1 << 62)) << 190, (1 << 256) - 1, 7, 0]
    bvals = [int(rng.integers(0, 1 << 62)) << 180, (1 << 256) - 1, 9, 5]
    cvals = [int(rng.integers(0, 1 << 62)), (1 << 256) - 1, 1, 0]
    for r in range(len(avals)):
        asg.set_int(q, r, 1)
    ds = ma.assign_rows(asg, 0, avals, bvals, cvals)
    for a, b, c, d in zip(avals, bvals, cvals, ds):
        assert d == (a * b + c) % (1 << 256)
    MockProver(cs, asg).assert_satisfied()

    # wrong product rejected
    asg.set_int(ma.d_lo, 2, 999)
    assert MockProver(cs, asg).verify()
