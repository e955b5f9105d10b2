"""RLP circuit: the tx streams' bytes provably encode the TxTable field
rows (reference rlp_circuit_fsm.rs) — closes the tx-field <-> hashed-bytes
binding that the Tx circuit alone leaves open."""

import pytest

from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import rlp_circuit as rlp
from zkevm_tpu.circuits import tx_circuit as txc
from zkevm_tpu.circuits.tables import Challenges
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.ff import FR
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 13
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
    ).sign(PRIV1)  # empty data (0x80 field), 32-byte r/s (hi-half path)
    t2 = Transaction(
        nonce=0, gas_price=10**9, gas=60000,
        to=0xBBBB, value=7, chain_id=1,
        data=bytes([0xA9, 0x05, 0x9C, 0xBB, 0x00, 0x00, 0x01]),
    ).sign(PRIV2)  # short-string data (per-byte binding)
    return [t1, t2]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    txcfg = txc.configure(cs, ch, ktcfg.table, cd_cap=16, rlp_cap=128)
    rlpcfg = rlp.configure(cs, txcfg)
    return cs, ktcfg, txcfg, rlpcfg


def _witness(circuit, txs):
    cs, ktcfg, txcfg, rlpcfg = circuit
    asg = Assignment(cs, N)
    kwit = kt.assign(cs, ktcfg, N, txc.keccak_messages(txs), asg)
    twit = txc.assign(cs, txcfg, N, txs, asg)
    rlp.assign(cs, rlpcfg, N, txs, asg)
    return kwit, twit


def _mock(circuit, wits):
    kwit, twit = wits
    kwit.fill_phase1(R_KECCAK, R_WORD)
    twit.fill_phase1(R_KECCAK)
    return MockProver(circuit[0], twit.asg, challenges=CHALLENGES)


def test_rlp_proven(circuit, txs):
    wits = _witness(circuit, txs)
    _mock(circuit, wits).assert_satisfied()


def test_forged_nonce_field_rejected(circuit, txs):
    """Claim a different nonce in the TxTable than the signed bytes
    encode: the rlp_value lookup must break. (Without the RLP circuit
    this forgery passes — the hash binds only the bytes.)"""
    cs, _, txcfg, _ = circuit
    wits = _witness(circuit, txs)
    row = txc.ROW[txc.TxFieldTag.NONCE]
    cur = FR.decode(wits[1].asg.cols[txcfg.value_lo][row])
    assert cur == 9
    wits[1].asg.set_int(txcfg.value_lo, row, 8)
    fails = _mock(circuit, wits).verify()
    assert fails, "forged nonce accepted"


def test_forged_callee_field_rejected(circuit, txs):
    cs, _, txcfg, _ = circuit
    wits = _witness(circuit, txs)
    row = txc.ROW[txc.TxFieldTag.CALLEE_ADDRESS]
    cur = FR.decode(wits[1].asg.cols[txcfg.value_lo][row])
    wits[1].asg.set_int(txcfg.value_lo, row, cur ^ 1)
    fails = _mock(circuit, wits).verify()
    assert fails, "forged callee accepted"


def test_forged_calldata_byte_rejected(circuit, txs):
    """Change a TxTable calldata byte (coherently for the tx circuit's
    own gates): the per-byte rlp_data_byte lookup must break."""
    cs, _, txcfg, _ = circuit
    wits = _witness(circuit, txs)
    B = txcfg.block
    row = B + txc.NFIELDS + 2  # tx2 calldata index 2 (0x9C, nonzero)
    cur = FR.decode(wits[1].asg.cols[txcfg.value_lo][row])
    assert cur == 0x9C
    nb = 0x9D  # nonzero -> gas accumulator unchanged; fix the inverse
    wits[1].asg.set_int(txcfg.value_lo, row, nb)
    wits[1].asg.set_int(txcfg.inv, row, pow(nb, FR_MOD - 2, FR_MOD))
    fails = _mock(circuit, wits).verify()
    assert fails, "forged calldata byte accepted"


def test_forged_sig_r_rejected(circuit, txs):
    """The 32-byte r field exercises the hi-half accumulator; forging
    the TxTable SIG_R row must break the signed-stream binding."""
    cs, _, txcfg, _ = circuit
    wits = _witness(circuit, txs)
    row = txc.ROW[txc.TxFieldTag.SIG_R]
    cur_hi = FR.decode(wits[1].asg.cols[txcfg.value_hi][row])
    assert cur_hi != 0
    wits[1].asg.set_int(txcfg.value_hi, row, cur_hi ^ 1)
    fails = _mock(circuit, wits).verify()
    assert fails, "forged sig r accepted"


@pytest.fixture(scope="module")
def typed_txs():
    """EIP-2930 + EIP-1559 txs with non-empty access lists."""
    al = [(0xCAFE0000000000000000000000000000000000AA, [0x01]),
          (0xCAFE0000000000000000000000000000000000BB, [])]
    t1 = Transaction(
        nonce=3, gas_price=15 * 10**9, gas=30000,
        to=0x3535353535353535353535353535353535353535,
        value=123, chain_id=1, tx_type=1, access_list=al,
    ).sign(PRIV1)
    t2 = Transaction(
        nonce=0, gas=60000, to=0xBBBB, value=7, chain_id=1, tx_type=2,
        gas_price=10**9, max_priority_fee_per_gas=2,
        max_fee_per_gas=10**9,
        access_list=[(0xDEAD0000000000000000000000000000000000CC,
                      [0x1122334455667788990011223344556677889900112233445566778899001122])],
        data=bytes([0x01, 0x02, 0x03]),
    ).sign(PRIV2)
    return [t1, t2]


@pytest.fixture(scope="module")
def typed_circuit():
    """Own circuit at K=14: typed streams carry access-list bytes, so
    the 4 keccak permutations of the K=13 fixture don't fit."""
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    txcfg = txc.configure(cs, ch, ktcfg.table, cd_cap=16, rlp_cap=256)
    rlpcfg = rlp.configure(cs, txcfg)
    return cs, ktcfg, txcfg, rlpcfg


NT = 1 << 14


def _typed_witness(circuit, txs):
    cs, ktcfg, txcfg, rlpcfg = circuit
    asg = Assignment(cs, NT)
    kwit = kt.assign(cs, ktcfg, NT, txc.keccak_messages(txs), asg)
    twit = txc.assign(cs, txcfg, NT, txs, asg)
    rlp.assign(cs, rlpcfg, NT, txs, asg)
    return kwit, twit


def test_typed_rlp_proven(typed_circuit, typed_txs):
    """Typed envelopes (0x01/0x02) with access lists decode through the
    extended FSM and bind to the TxTable (VERDICT r4 item #5)."""
    wits = _typed_witness(typed_circuit, typed_txs)
    _mock(typed_circuit, wits).assert_satisfied()


def test_typed_forged_access_list_rejected(typed_circuit, typed_txs):
    """Claim a different access-list address in the table than the
    signed bytes encode: the rlp_al_addr lookup must break."""
    cs, _, txcfg, _ = typed_circuit
    wits = _typed_witness(typed_circuit, typed_txs)
    al0 = txc.NFIELDS + txcfg.cd_cap  # first AL address row of slot 0
    cur = FR.decode(wits[1].asg.cols[txcfg.value_lo][al0])
    assert cur == 0xCAFE0000000000000000000000000000000000AA & ((1 << 128) - 1)
    wits[1].asg.set_int(txcfg.value_lo, al0, cur + 1)
    fails = _mock(typed_circuit, wits).verify()
    assert fails, "forged access-list address accepted"


def test_typed_forged_max_fee_rejected(typed_circuit, typed_txs):
    """Claim a different max_fee for the 1559 tx."""
    cs, _, txcfg, _ = typed_circuit
    wits = _typed_witness(typed_circuit, typed_txs)
    row = txcfg.block + txc.ROW[txc.TxFieldTag.MAX_FEE]  # slot 1
    cur = FR.decode(wits[1].asg.cols[txcfg.value_lo][row])
    assert cur == 10**9
    wits[1].asg.set_int(txcfg.value_lo, row, cur + 1)
    fails = _mock(typed_circuit, wits).verify()
    assert fails, "forged max_fee accepted"
