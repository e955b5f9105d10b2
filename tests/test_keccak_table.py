"""Keccak table circuit tests (reference role: keccak_circuit tests +
multi_keccak witness tests): multi-permutation sponge, padding flags,
RLC table values, tamper rejection."""

import numpy as np
import pytest

from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits.tables import Challenges, rlc_bytes
from zkevm_tpu.ff import FR
from zkevm_tpu.hash.keccak import keccak256
from zkevm_tpu.plonk import ConstraintSystem, MockProver

K = 12
N = 1 << K
R_WORD = 0x100  # challenge index order: evm_word, keccak_input, lookup_input
R_KECCAK = 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    cfg = kt.configure(cs, ch)
    return cs, cfg


def _mock(cs, wit):
    wit.fill_phase1(R_KECCAK, R_WORD)
    return MockProver(cs, wit.asg, challenges=CHALLENGES)


def test_two_block_message(circuit):
    cs, cfg = circuit
    assert kt.num_perms(cs, N) == 2
    msg = bytes(range(200))  # 2 blocks: perm0 continues into final perm1
    wit = kt.assign(cs, cfg, N, [msg])
    _mock(cs, wit).assert_satisfied()

    # table surface values on the final permutation
    base = kt.PERM
    got_rlc = FR.decode(wit.asg.cols[cfg.rlc8.columns[7]][base + 16])
    assert got_rlc == rlc_bytes(msg, R_KECCAK)
    assert FR.decode(wit.asg.cols[cfg.dlen][base + 16]) == len(msg)
    got_orlc = FR.decode(wit.asg.cols[cfg.orlc][base + kt.DIGEST_ROW0 + 3])
    assert got_orlc == rlc_bytes(keccak256(msg), R_WORD)
    # perm0 is not final, perm1 is
    one = FR.encode(1)
    assert not (wit.asg.cols[cfg.is_final][0] == one).all()
    assert (wit.asg.cols[cfg.is_final][base] == one).all()


def test_two_messages(circuit):
    cs, cfg = circuit
    m1, m2 = b"abc", bytes(135)  # second: padding is the single 0x81 byte
    wit = kt.assign(cs, cfg, N, [m1, m2])
    _mock(cs, wit).assert_satisfied()
    for pi, msg in enumerate([m1, m2]):
        base = pi * kt.PERM
        assert FR.decode(wit.asg.cols[cfg.rlc8.columns[7]][base + 16]) == rlc_bytes(
            msg, R_KECCAK
        )
        assert FR.decode(wit.asg.cols[cfg.dlen][base + 16]) == len(msg)
        assert FR.decode(wit.asg.cols[cfg.orlc][base + kt.DIGEST_ROW0 + 3]) == rlc_bytes(
            keccak256(msg), R_WORD
        )


def test_empty_message_and_idle_perm(circuit):
    cs, cfg = circuit
    wit = kt.assign(cs, cfg, N, [b""])  # perm1 stays idle
    _mock(cs, wit).assert_satisfied()
    assert FR.decode(wit.asg.cols[cfg.rlc8.columns[7]][16]) == 0
    assert FR.decode(wit.asg.cols[cfg.orlc][kt.DIGEST_ROW0 + 3]) == rlc_bytes(
        keccak256(b""), R_WORD
    )


def test_tampered_padding_rejected(circuit):
    cs, cfg = circuit
    wit = kt.assign(cs, cfg, N, [b"abc"])
    # claim the message was shorter: extra padding flag without the 0x01 byte
    wit.asg.set_int(cfg.pads.columns[2], 0, 1)
    assert _mock(cs, wit).verify()


def test_tampered_digest_rejected(circuit):
    cs, cfg = circuit
    wit = kt.assign(cs, cfg, N, [b"abc"])
    row = kt.DIGEST_ROW0
    cur = FR.decode(wit.asg.cols[cfg.bits.columns[0]][row])
    wit.asg.set_int(cfg.bits.columns[0], row, 1 - cur)
    assert _mock(cs, wit).verify()
