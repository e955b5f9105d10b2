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
    assert sg.region_rows(256) == 10 + 8 * 256 + 9
    assert sg.region_rows(256, addr=True) == 10 + 8 * 256 + 9 + 65


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


# -- ecrecover address extension ----------------------------------------
R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def addr_circuit():
    from zkevm_tpu.circuits import keccak_table as kt
    from zkevm_tpu.circuits.tables import Challenges

    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    rt8 = RangeTable.configure(cs, 8)
    cfg = sg.configure(cs, rt8, challenges=ch, keccak_table=ktcfg.table)
    return cs, ch, ktcfg, cfg, rt8


def _addr_witness(addr_circuit, sig, tamper=None):
    from zkevm_tpu.circuits import keccak_table as kt

    cs, ch, ktcfg, cfg, rt8 = addr_circuit
    z, (qx, qy), r, s = sig
    pk = qx.to_bytes(32, "big") + qy.to_bytes(32, "big")
    asg = Assignment(cs, N)
    rt8.load(asg)
    kwit = kt.assign(cs, ktcfg, N, [pk], asg)
    swit = sg.assign(cs, cfg, N, [sig], asg)
    kwit.fill_phase1(R_KECCAK, R_WORD)
    swit.fill_phase1(R_KECCAK)
    if tamper:
        tamper(asg, cfg)
    return asg


def test_ecrecover_address_proven(addr_circuit):
    """The pubkey's keccak address + recovery parity are proven: the
    full ecrecover statement behind the tx circuit's caller binding."""
    from zkevm_tpu.hash import keccak256

    cs, _, _, cfg, _ = addr_circuit
    sig = _sig(seed=3)
    asg = _addr_witness(addr_circuit, sig)
    MockProver(cs, asg, challenges=CHALLENGES).assert_satisfied()
    # the surface digest matches the host keccak address
    _, (qx, qy), _, _ = sig
    pk = qx.to_bytes(32, "big") + qy.to_bytes(32, "big")
    digest = int.from_bytes(keccak256(pk), "big")
    from zkevm_tpu.ff import FR

    arow = sg.PRE + 8 * 256 + 73
    assert FR.decode(asg.cols[cfg.db[16]][arow]) == digest & ((1 << 128) - 1)


def test_forged_parity_rejected(addr_circuit):
    cs, _, _, cfg, _ = addr_circuit
    sig = _sig(seed=3)

    def tamper(asg, cfg):
        row = sg.PRE + 8 * 256 + 8  # the Ry canon row
        from zkevm_tpu.ff import FR

        cur = int(FR.decode(asg.cols[cfg.vbit][row]))
        asg.set_int(cfg.vbit, row, 1 - cur)

    asg = _addr_witness(addr_circuit, sig, tamper)
    fails = MockProver(cs, asg, challenges=CHALLENGES).verify()
    assert fails, "forged recovery parity accepted"


def test_forged_pubkey_byte_rejected(addr_circuit):
    """Tamper one pubkey byte in the keccak strip: either the byte-sum
    binding or the keccak lookup must break."""
    cs, _, _, cfg, _ = addr_circuit
    sig = _sig(seed=3)

    def tamper(asg, cfg):
        row = sg.PRE + 8 * 256 + 9 + 5
        from zkevm_tpu.ff import FR

        cur = int(FR.decode(asg.cols[cfg.pkb][row]))
        asg.set_int(cfg.pkb, row, (cur + 1) % 256)

    asg = _addr_witness(addr_circuit, sig, tamper)
    fails = MockProver(cs, asg, challenges=CHALLENGES).verify()
    assert fails, "forged pubkey byte accepted"
