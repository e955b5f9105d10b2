"""In-circuit Poseidon transcript (aggregation/sponge.py) vs the host
PoseidonTranscript — challenges must agree element-for-element, and every
permutation row must be backed by a real PoseidonTable slot."""

import numpy as np
import pytest

from zkevm_tpu.aggregation.sponge import SpongeConfig, TranscriptChip
from zkevm_tpu.circuits import poseidon_table as pt
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.gadgets.flex import FlexCtx, FlexGate
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.transcript import PoseidonTranscript

K = 11
N = 1 << K

PT = (
    0x2B149D40CEB8AAAE81BE18991BE06AC3B5B4C5E559DBEFA33267E6DC24A138E5,
    0x9713B03AF0FED4CD2CAFADEED8FDF4A74FA084E52D1852E4A2BD0685C315D2,
)


def _build():
    cs = ConstraintSystem()
    ptcfg = pt.configure(cs)
    flex = FlexGate.configure(cs)
    spcfg = SpongeConfig.configure(cs, ptcfg.perm_table)
    return cs, ptcfg, flex, spcfg


def test_transcript_chip_matches_host():
    cs, ptcfg, flexcfg, spcfg = _build()
    asg = Assignment(cs, N)
    fx = FlexCtx(cs, flexcfg, asg, 0)
    chip = TranscriptChip(cs, spcfg, fx, asg, 0)

    host = PoseidonTranscript()
    # scalar absorbs
    for v in (5, 7, 123456789):
        host.common_scalar(v)
        chip.absorb(fx.constant(v))
    c1h = host.challenge()
    c1c = chip.challenge()
    assert c1c.val == c1h
    # point absorb (3x88 limb encoding)
    host.common_point(PT)
    m = (1 << 88) - 1
    xl = [fx.constant((PT[0] >> (88 * i)) & m) for i in range(3)]
    yl = [fx.constant((PT[1] >> (88 * i)) & m) for i in range(3)]
    chip.absorb_point_limbs(xl, yl)
    c2h = host.challenge()
    c2c = chip.challenge()
    assert c2c.val == c2h
    # empty-pending challenge (chained)
    assert chip.challenge().val == host.challenge()

    # back the lookups with real table slots
    pt.assign(cs, ptcfg, N, chip.perm_states, asg)
    MockProver(cs, asg).assert_satisfied()


def test_transcript_chip_tamper_caught():
    cs, ptcfg, flexcfg, spcfg = _build()
    asg = Assignment(cs, N)
    fx = FlexCtx(cs, flexcfg, asg, 0)
    chip = TranscriptChip(cs, spcfg, fx, asg, 0)
    chip.absorb(fx.constant(42))
    ch = chip.challenge()
    pt.assign(cs, ptcfg, N, chip.perm_states, asg)
    # tamper the squeezed output cell -> lookup row no longer in table
    asg.set_int(ch.col, ch.row, (ch.val + 1) % FR_MOD)
    assert MockProver(cs, asg).verify(), "tampered squeeze must fail"
