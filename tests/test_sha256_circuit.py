"""SHA-256 table circuit (reference sha256_circuit/, SHA256Table):
multi-block sponge, FIPS padding discipline, digest/RLC surface, tamper
rejection."""

import hashlib

import numpy as np
import pytest

from zkevm_tpu.circuits import sha256_circuit as sh
from zkevm_tpu.circuits.tables import Challenges, rlc_bytes
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.expr import EvalContext

K = 10
N = 1 << K
R_WORD = 0x100
R_KECCAK = 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    ch = Challenges.configure(cs)
    cfg = sh.configure(cs, ch)
    return cs, cfg


def _mock(cs, wit):
    wit.fill_phase1(R_KECCAK, R_WORD)
    return MockProver(cs, wit.asg, challenges=CHALLENGES)


def test_single_block(circuit):
    cs, cfg = circuit
    assert sh.num_blocks(cs, N) >= 4
    msg = b"abc"
    wit = sh.assign(cs, cfg, N, [msg])
    _mock(cs, wit).assert_satisfied()
    assert wit.digests[0] == hashlib.sha256(msg).digest()


def test_multi_block_and_spanning_padding(circuit):
    """60-byte message: 0x80 lands in block 0, the length in block 1 —
    padding spans the block boundary."""
    cs, cfg = circuit
    msg = bytes(range(60))
    wit = sh.assign(cs, cfg, N, [msg])
    _mock(cs, wit).assert_satisfied()
    assert wit.digests[1] == hashlib.sha256(msg).digest()
    assert wit.snew_blocks[:2] == [1, 0]


def test_two_messages_table_surface(circuit):
    cs, cfg = circuit
    m1, m2 = b"hello world", bytes(range(100))
    wit = sh.assign(cs, cfg, N, [m1, m2])
    _mock(cs, wit).assert_satisfied()

    ctx = EvalContext(wit.asg.cols, [jl for jl in _mont_challenges()])
    import jax.numpy as jnp

    exprs = [cfg.table.enabled, cfg.table.input_rlc, cfg.table.input_len,
             cfg.table.output_rlc, cfg.table.output_lo, cfg.table.output_hi]
    en, irlc, ilen, orlc, olo, ohi = [
        np.asarray(e.evaluate(ctx)) for e in exprs
    ]
    rows = [i for i in range(N) if FR.decode(en[i]) == 1]
    assert len(rows) == 2
    for row, msg in zip(rows, [m1, m2]):
        d = hashlib.sha256(msg).digest()
        assert FR.decode(ilen[row]) == len(msg)
        assert FR.decode(irlc[row]) == rlc_bytes(msg, R_KECCAK)
        assert FR.decode(orlc[row]) == rlc_bytes(d, R_WORD)
        v = int.from_bytes(d, "big")
        assert FR.decode(olo[row]) == v & ((1 << 128) - 1)
        assert FR.decode(ohi[row]) == v >> 128


def _mont_challenges():
    import jax.numpy as jnp

    return [jnp.asarray(FR.encode(v)) for v in CHALLENGES]


def test_forged_digest_rejected(circuit):
    """Flip one H_out bit: the final-add constraint must break."""
    cs, cfg = circuit
    wit = sh.assign(cs, cfg, N, [b"abc"])
    row = sh.R_OUT0  # H_out[0] of block 0
    col = wit.asg.cols[cfg.A.columns[0]]
    cur = FR.decode(col[row])
    wit.asg.set_int(cfg.A.columns[0], row, 1 - cur)
    assert _mock(cs, wit).verify(), "forged digest accepted"


def test_forged_pad_claim_rejected(circuit):
    """Claim the message is one byte shorter (pad flag earlier): the
    0x80-at-flip rule must break."""
    cs, cfg = circuit
    msg = b"abcd"
    wit = sh.assign(cs, cfg, N, [msg])
    # mark byte 3 (the 'd', row 4 col j=3) as padding and patch dlen
    wit.asg.set_int(cfg.pads.columns[3], sh.R_ROUND0, 1)
    for l in range(16):
        cur = FR.decode(wit.asg.cols[cfg.dlen][sh.R_ROUND0 + l])
        wit.asg.set_int(cfg.dlen, sh.R_ROUND0 + l, max(cur - 1, 3))
    assert _mock(cs, wit).verify(), "forged padding accepted"
