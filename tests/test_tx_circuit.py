"""Tx circuit: field rows + calldata accumulators + keccak-bound tx
hashes (reference tx_circuit.rs:332), proven against the keccak table."""

import pytest

from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import tx_circuit as txc
from zkevm_tpu.circuits.tables import Challenges
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 13  # 4 keccak perms (2 per tx: unsigned + signed rlp)
N = 1 << K
R_WORD = 0x100
R_KECCAK = 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]

PRIV1 = 0x4646464646464646464646464646464646464646464646464646464646464646
PRIV2 = 0x1111111111111111111111111111111111111111111111111111111111111111


@pytest.fixture(scope="module")
def txs():
    t1 = Transaction(
        nonce=9, gas_price=20 * 10**9, gas=21000,
        to=0x3535353535353535353535353535353535353535,
        value=10**18, chain_id=1,
    ).sign(PRIV1)
    t2 = Transaction(
        nonce=0, gas_price=10**9, gas=60000,
        to=0xBBBB, value=7, chain_id=1,
        data=bytes([0xA9, 0x05, 0x9C, 0xBB, 0x00, 0x00, 0x01]),
    ).sign(PRIV2)
    return [t1, t2]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    txcfg = txc.configure(cs, ch, ktcfg.table, cd_cap=16, rlp_cap=128)
    return cs, ktcfg, txcfg


def _witness(circuit, txs):
    cs, ktcfg, txcfg = circuit
    from zkevm_tpu.plonk.assign import Assignment

    asg = Assignment(cs, N)
    kwit = kt.assign(cs, ktcfg, N, txc.keccak_messages(txs), asg)
    twit = txc.assign(cs, txcfg, N, txs, asg)
    return kwit, twit


def _mock(circuit, kwit, twit):
    cs = circuit[0]
    kwit.fill_phase1(R_KECCAK, R_WORD)
    twit.fill_phase1(R_KECCAK)
    return MockProver(cs, twit.asg, challenges=CHALLENGES)


def test_tx_circuit_proven(circuit, txs):
    assert kt.num_perms(circuit[0], N) >= 2 * len(txs)
    kwit, twit = _witness(circuit, txs)
    _mock(circuit, kwit, twit).assert_satisfied()


def test_forged_tx_hash_rejected(circuit, txs):
    cs, _, txcfg = circuit
    kwit, twit = _witness(circuit, txs)
    row = txc.ROW[txc.TxFieldTag.TX_HASH]
    cur = FR.decode(twit.asg.cols[txcfg.value_lo][row])
    twit.asg.set_int(txcfg.value_lo, row, cur ^ 1)
    assert _mock(circuit, kwit, twit).verify(), "forged tx hash accepted"


def test_forged_rlp_byte_rejected(circuit, txs):
    cs, _, txcfg = circuit
    kwit, twit = _witness(circuit, txs)
    base, r0, data = twit.streams[0]
    row = base + r0 + 3
    cur = FR.decode(twit.asg.cols[txcfg.value_lo][row])
    twit.asg.set_int(txcfg.value_lo, row, (cur + 1) % 256)
    assert _mock(circuit, kwit, twit).verify(), "forged rlp byte accepted"


def test_forged_calldata_gas_rejected(circuit, txs):
    """Claim the wrong CallDataGasCost field value."""
    cs, _, txcfg = circuit
    kwit, twit = _witness(circuit, txs)
    B = txcfg.block
    row = B + txc.ROW[txc.TxFieldTag.CALL_DATA_GAS_COST]  # tx2 (has data)
    cur = FR.decode(twit.asg.cols[txcfg.value_lo][row])
    assert cur == txs[1].call_data_gas_cost() == 5 * 16 + 2 * 4
    twit.asg.set_int(txcfg.value_lo, row, cur - 12)
    assert _mock(circuit, kwit, twit).verify(), "forged calldata gas accepted"


def test_forged_calldata_length_rejected(circuit, txs):
    cs, _, txcfg = circuit
    kwit, twit = _witness(circuit, txs)
    B = txcfg.block
    row = B + txc.ROW[txc.TxFieldTag.CALL_DATA_LENGTH]
    cur = FR.decode(twit.asg.cols[txcfg.value_lo][row])
    twit.asg.set_int(txcfg.value_lo, row, cur + 1)
    assert _mock(circuit, kwit, twit).verify(), "forged calldata length accepted"


def test_fake_slot_rejected(circuit, txs):
    """Marking an unused slot as real must fail its hash lookups."""
    cs, _, txcfg = circuit
    kwit, twit = _witness(circuit, txs)
    B = txcfg.block
    base = 2 * B  # first unused slot
    one = FR.encode(1)
    twit.asg.cols[txcfg.is_real][base : base + B] = one
    assert _mock(circuit, kwit, twit).verify(), "fake tx slot accepted"
