"""FlexGate chip (gadgets/flex.py) — the halo2-base FlexGateConfig analog
(reference: scroll-tech/halo2-lib flex_gate.rs) that carries the scalar
side of the in-circuit PLONK verifier."""

import numpy as np
import pytest

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.flex import Cell, FlexCtx, FlexGate
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 6
N = 1 << K


def _build(fn):
    cs = ConstraintSystem()
    cfg = FlexGate.configure(cs)
    asg = Assignment(cs, N)
    ctx = FlexCtx(cs, cfg, asg, 0)
    fn(ctx)
    assert ctx.row <= cs.usable_rows(N)
    return cs, asg


def test_arithmetic_graph():
    def body(ctx):
        x = ctx.constant(7)
        y = ctx.witness(11)
        s = ctx.add(x, y)
        assert s.val == 18
        p = ctx.mul(s, y)
        assert p.val == 198
        d = ctx.sub(p, x)
        assert d.val == 191
        ma = ctx.mul_add(x, y, d)
        assert ma.val == 7 * 11 + 191
        ctx.assert_const(ma, 268)
        inv = ctx.inv(y)
        assert inv.val * 11 % FR_MOD == 1
        q = ctx.div(ctx.constant(22), y)
        ctx.assert_const(q, 2)
        ip = ctx.inner_product([x, y], [ctx.constant(2), ctx.constant(3)])
        ctx.assert_const(ip, 7 * 2 + 11 * 3)
        h = ctx.horner([1, 2, 3], ctx.constant(10))
        ctx.assert_const(h, 321)
        pw = ctx.pow(ctx.constant(3), 13)
        ctx.assert_const(pw, 3**13)
        limbs = ctx.decompose(ctx.constant(0xABCD1234), 64, 16)
        assert [l.val for l in limbs] == [0x1234, 0xABCD, 0, 0]
        b = ctx.witness(1)
        ctx.assert_bool(b)
        sel = ctx.select(b, x, y)
        ctx.assert_const(sel, 7)

    cs, asg = _build(body)
    MockProver(cs, asg).assert_satisfied()


def test_copy_constraint_catches_tamper():
    cs = ConstraintSystem()
    cfg = FlexGate.configure(cs)
    asg = Assignment(cs, N)
    ctx = FlexCtx(cs, cfg, asg, 0)
    x = ctx.constant(5)
    y = ctx.add(x, x)
    ctx.assert_const(y, 10)
    # tamper: break the copied operand of the add row
    asg.set_int(cfg.a, x.row + 1, 6)
    errs = MockProver(cs, asg).verify()
    assert errs, "tampered copy must be caught"


def test_gate_violation_caught():
    cs = ConstraintSystem()
    cfg = FlexGate.configure(cs)
    asg = Assignment(cs, N)
    ctx = FlexCtx(cs, cfg, asg, 0)
    a = ctx.witness(3)
    m = ctx.mul(a, a)
    asg.set_int(cfg.o, m.row, 8)  # 3*3 != 8
    errs = MockProver(cs, asg).verify()
    assert errs
