"""PI circuit: public-input hash, BlockTable, instance binding, and the
two-way tx-hash coverage with the Tx circuit (reference pi_circuit.rs:33)."""

import pytest

from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import pi_circuit as pic
from zkevm_tpu.circuits import tx_circuit as txc
from zkevm_tpu.circuits.tables import Challenges
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 13
N = 1 << K
R_WORD = 0x100
R_KECCAK = 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]

PRIV = 0x4646464646464646464646464646464646464646464646464646464646464646


@pytest.fixture(scope="module")
def txs():
    return [Transaction(
        nonce=9, gas_price=20 * 10**9, gas=21000,
        to=0x3535353535353535353535353535353535353535,
        value=10**18, chain_id=1,
    ).sign(PRIV)]


@pytest.fixture(scope="module")
def block():
    return pic.BlockContext(
        chain_id=1, coinbase=0xC0FFEE,
        number=1234, timestamp=1_700_000_000, gas_limit=30_000_000,
        base_fee=7, prev_state_root=0x11 << 240, post_state_root=0x22 << 240,
    )


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    txcfg = txc.configure(cs, ch, ktcfg.table, cd_cap=16, rlp_cap=128)
    picfg = pic.configure(cs, ch, ktcfg.table, txcfg, ntx=2)
    return cs, ktcfg, txcfg, picfg


def _witness(circuit, txs, block):
    cs, ktcfg, txcfg, picfg = circuit
    hashes = [tx.hash() for tx in txs]
    msgs = txc.keccak_messages(txs) + pic.keccak_messages(block, hashes)
    asg = Assignment(cs, N)
    kwit = kt.assign(cs, ktcfg, N, msgs, asg)
    twit = txc.assign(cs, txcfg, N, txs, asg)
    pwit = pic.assign(cs, picfg, N, block, hashes, asg)
    return kwit, twit, pwit


def _mock(circuit, wits):
    kwit, twit, pwit = wits
    kwit.fill_phase1(R_KECCAK, R_WORD)
    twit.fill_phase1(R_KECCAK)
    pwit.fill_phase1(R_KECCAK)
    return MockProver(circuit[0], pwit.asg, challenges=CHALLENGES)


def test_pi_proven(circuit, txs, block):
    assert kt.num_perms(circuit[0], N) >= 4
    wits = _witness(circuit, txs, block)
    _mock(circuit, wits).assert_satisfied()


def test_block_table_values(circuit, txs, block):
    """The BlockTable exprs reconstruct the block fields from bytes."""
    cs, _, _, picfg = circuit
    wits = _witness(circuit, txs, block)
    import numpy as np

    from zkevm_tpu.plonk.expr import EvalContext

    ctx = EvalContext(wits[2].asg.cols, [])
    en, tag, lo, hi = [np.asarray(e.evaluate(ctx)) for e in picfg.table.exprs]
    rows = {FR.decode(tag[i]): (FR.decode(lo[i]), FR.decode(hi[i]))
            for i in range(8) if FR.decode(en[i]) == 1}
    assert rows[int(pic.BlockField.TIMESTAMP)] == (1_700_000_000, 0)
    assert rows[int(pic.BlockField.COINBASE)] == (0xC0FFEE, 0)
    assert rows[int(pic.BlockField.PREV_STATE_ROOT)] == (0, 0x11 << 112)


def test_forged_instance_rejected(circuit, txs, block):
    cs, _, _, picfg = circuit
    wits = _witness(circuit, txs, block)
    rows = picfg.rows
    cur = FR.decode(wits[2].asg.cols[picfg.out_lo][rows - 1])
    wits[2].asg.set_int(picfg.out_lo, rows - 1, cur ^ 1)
    assert _mock(circuit, wits).verify(), "forged pi digest accepted"


def test_forged_block_byte_rejected(circuit, txs, block):
    """Claiming a different timestamp changes the stream: keccak lookup
    must fail."""
    cs, _, _, picfg = circuit
    wits = _witness(circuit, txs, block)
    row = 36 + 7  # last timestamp byte
    cur = FR.decode(wits[2].asg.cols[picfg.byte][row])
    wits[2].asg.set_int(picfg.byte, row, (cur + 1) % 256)
    assert _mock(circuit, wits).verify(), "forged block byte accepted"


def test_dropped_tx_section_rejected(circuit, txs, block):
    """Hashing fewer txs than are real must break the coverage lookup."""
    cs, _, _, picfg = circuit
    wits = _witness(circuit, txs, block)
    for i in range(32):
        wits[2].asg.set_int(picfg.act, pic.HDR + i, 0)
        wits[2].asg.set_int(picfg.byte, pic.HDR + i, 0)
    assert _mock(circuit, wits).verify(), "dropped tx section accepted"
