"""Tx circuit <-> Sig circuit bridge: the TxTable's CALLER_ADDRESS is
proven to be ecrecover(sign_hash, v, r, s) through the Sig circuit's
AddrTable (reference role: the SigTable lookup in tx_circuit.rs:332
area + sig_circuit.rs ecrecover).

One signed EIP-155 tx at k=12: the tx circuit's 128-byte strip composes
the sign-hash/z/r/s halves and 88-bit limbs, reduces z mod n in-circuit,
derives the recovery parity from v, and the AddrTable lookup ties all of
it (plus the caller address halves) to one proven ECDSA region."""

import pytest

from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import sig_circuit as sg
from zkevm_tpu.circuits import tx_circuit as txc
from zkevm_tpu.circuits.tables import Challenges
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 13  # 3 keccak permutations (pk + 2 rlp streams) need the extra room
N = 1 << K
R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    rt8 = RangeTable.configure(cs, 8)
    scfg = sg.configure(cs, rt8, challenges=ch, keccak_table=ktcfg.table)
    tcfg = txc.configure(
        cs, ch, ktcfg.table, cd_cap=16, rlp_cap=128, rt8=rt8,
        addr_table=scfg.addr_table,
    )
    return cs, ch, ktcfg, scfg, tcfg, rt8


def _tx() -> Transaction:
    return Transaction(
        nonce=3, gas_price=2_000_000_000, gas=21_064,
        to=0xCAFE00000000000000000000000000000000BEEF,
        value=10**15, data=b"\x00\x01\xfe", chain_id=1,
    ).sign(0x6AF3B9_5EED5EED_1234567890ABCDEF)


def _witness(circuit, tx, tamper=None):
    cs, ch, ktcfg, scfg, tcfg, rt8 = circuit
    sigs = txc.sig_inputs([tx])
    _, (qx, qy), _, _ = sigs[0]
    pk = qx.to_bytes(32, "big") + qy.to_bytes(32, "big")
    msgs = [pk] + txc.keccak_messages([tx])
    asg = Assignment(cs, N)
    rt8.load(asg)
    kwit = kt.assign(cs, ktcfg, N, msgs, asg)
    swit = sg.assign(cs, scfg, N, sigs, asg)
    twit = txc.assign(cs, tcfg, N, [tx], asg)
    if tamper:
        tamper(asg, tcfg)
    kwit.fill_phase1(R_KECCAK, R_WORD)
    swit.fill_phase1(R_KECCAK)
    twit.fill_phase1(R_KECCAK)
    return asg


def test_tx_caller_ecrecover_proven(circuit):
    cs = circuit[0]
    tx = _tx()
    assert tx.caller == tx.recover_caller()
    asg = _witness(circuit, tx)
    MockProver(cs, asg, challenges=CHALLENGES).assert_satisfied()


def test_forged_caller_rejected(circuit):
    """A wrong sender address must break the AddrTable lookup."""
    cs = circuit[0]
    tx = _tx()

    def tamper(asg, tcfg):
        row = txc.ROW[txc.TxFieldTag.CALLER_ADDRESS]
        asg.set_int(tcfg.value_lo, row, (tx.caller + 1) & txc.M128)

    asg = _witness(circuit, tx, tamper)
    assert MockProver(cs, asg, challenges=CHALLENGES).verify(), \
        "forged caller address accepted"


def test_forged_parity_rejected(circuit):
    """Flipping the witnessed recovery parity must break the v-derivation
    gate or the AddrTable lookup."""
    cs = circuit[0]
    tx = _tx()

    def tamper(asg, tcfg):
        asg.set_int(tcfg.inv, 2, 1 - tx.sig_parity)

    asg = _witness(circuit, tx, tamper)
    assert MockProver(cs, asg, challenges=CHALLENGES).verify(), \
        "forged recovery parity accepted"
