"""Sig circuit: in-circuit secp256k1 ECDSA verification vs the host
library (reference role: sig_circuit.rs sign_verify tests). One
signature per region at k=12; heavy-ish (the ~2k-row ladder) but cached
after the first compile."""

import pytest

from zkevm_tpu.circuits import sig_circuit as sg
from zkevm_tpu.ec import secp256k1 as secp
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 12
N = 1 << K


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    cfg = sg.configure(cs, rt8)
    return cs, cfg, rt8


def _sig(seed=7, msg=0xDEADC0DE):
    priv = 0x1234567890ABCDEF + seed
    pub = secp.pubkey(priv)
    r, s, _parity = secp.ecdsa_sign(msg, priv)
    return (msg, pub, r, s)


def test_sig_region_rows():
    assert sg.region_rows(256) == 10 + 8 * 256 + 6


def test_valid_signature_proven(circuit):
    cs, cfg, rt8 = circuit
    asg = Assignment(cs, N)
    rt8.load(asg)
    sg.assign(cs, cfg, N, [_sig()], asg)
    MockProver(cs, asg).assert_satisfied()


def test_forged_r_rejected(circuit):
    """Tamper the signature's r limb on the surface: the final
    R.x mod n binding (or the u2 = r*s^-1 row) must break."""
    cs, cfg, rt8 = circuit
    asg = Assignment(cs, N)
    rt8.load(asg)
    z, pub, r, s = _sig()
    sg.assign(cs, cfg, N, [(z, pub, r, s)], asg)
    R = sg.region_rows(cfg.nbits)
    for row in range(R):
        asg.set_int(cfg.st["rsl"][0], row, (r + 1) % (1 << 88))
    fails = MockProver(cs, asg).verify()
    assert fails, "forged signature r accepted"


def test_forged_pubkey_rejected(circuit):
    """A pubkey off the curve must fail the Qy^2 = Qx^3 + 7 rows."""
    cs, cfg, rt8 = circuit
    asg = Assignment(cs, N)
    rt8.load(asg)
    z, (qx, qy), r, s = _sig()
    sg.assign(cs, cfg, N, [(z, (qx, qy), r, s)], asg)
    R = sg.region_rows(cfg.nbits)
    for row in range(R):
        asg.set_int(cfg.st["qy"][0], row, (qy + 1) % (1 << 88))
    fails = MockProver(cs, asg).verify()
    assert fails, "off-curve pubkey accepted"
