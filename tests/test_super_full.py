"""FULL SuperCircuit composition: all subcircuits in one constraint
system (reference super_circuit.rs:472-515 composes 16).

On top of the 13-subcircuit composition (test_super_circuit.py), this
adds and LINKS:
- Poseidon + MPT with the MptTable wired into the State circuit: every
  storage transition in the RwTable is proven as a zktrie update, so the
  block's storage-root transition is part of the statement;
- Sig with the AddrTable wired into the Tx circuit: each tx's
  CALLER_ADDRESS is a proven in-circuit ecrecover of its sign hash;
- SHA256 / ModExp / ECC table circuits (the surfaces the EVM circuit's
  precompile-call states consume).
"""

import dataclasses
import os

import pytest

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]
K = 16
N = 1 << K


def _push_word(v: int) -> bytes:
    """Compose a 256-bit constant from PUSH2 pieces (the circuit's PUSH
    covers PUSH1/2; 0x10 SHL + ADD chains build the word)."""
    pieces = [(v >> (16 * i)) & 0xFFFF for i in reversed(range(16))]
    out = bytearray([0x61, pieces[0] >> 8, pieces[0] & 0xFF])
    for p in pieces[1:]:
        out += bytes([0x60, 16, 0x1B])            # PUSH1 16; SHL
        out += bytes([0x61, p >> 8, p & 0xFF])    # PUSH2 piece
        out += bytes([0x01])                      # ADD
    return bytes(out)


def _mstore(off: int, v: int) -> bytes:
    return _push_word(v) + bytes([0x60, off, 0x52])


def _staticcall(addr: int, in_off: int, in_ln: int, out_off: int,
                out_ln: int) -> bytes:
    # push order: outLen, outOff, inLen, inOff, addr, gas; then 0xFA; POP
    return bytes([
        0x60, out_ln, 0x60, out_off, 0x60, in_ln, 0x60, in_off,
        0x60, addr, 0x61, 0xFF, 0xFF, 0xFA, 0x50,
    ])


def _build_code() -> bytes:
    from zkevm_tpu.ec import secp256k1 as s256
    from zkevm_tpu.hash import keccak256

    # a valid signature for the ecrecover precompile call
    priv = 0x6AF3B95EED5EED1234567890ABCDEF01
    z = int.from_bytes(keccak256(b"precompile ecrecover message"), "big")
    r_, s_, par = s256.ecdsa_sign(z, priv)
    code = bytearray()
    # storage: slot 5: 3 -> 7, slot 6 insert 9
    code += bytes([0x60, 7, 0x60, 5, 0x55, 0x60, 9, 0x60, 6, 0x55])
    # ecrecover input at mem[0..128): hash, v, r, s; out at 128
    code += _mstore(0x00, z)
    code += _mstore(0x20, 27 + par)
    code += _mstore(0x40, r_)
    code += _mstore(0x60, s_)
    code += _staticcall(0x01, 0x00, 0x80, 0x80, 0x20)
    # sha256 of one 32-byte word at mem[160..192), out at 192
    code += _mstore(0xA0, int.from_bytes(b"\x11" * 32, "big"))
    code += _staticcall(0x02, 0xA0, 0x20, 0xC0, 0x20)
    code += bytes([0x00])
    return bytes(code)


CODE = _build_code()
PARAMS = CircuitsParams(max_txs=2, max_calldata=16, max_rlp=128)


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    cfg = sup.configure(cs, PARAMS, limb_bits=10, full=True)
    return cs, cfg


def build():
    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**19),
            lambda a: a.balance(10**18).code(CODE).storage({5: 3}),
        ],
        txs=[
            lambda t: t.from_(0).to(1).value(3),
        ],
    )
    return block_convert(ctx, PARAMS)


def _witness(circuit, block, rows=None):
    cs, cfg = circuit
    wit = sup.assign(cs, cfg, N, block, rows=rows)
    wit.fill_phase1(R_KECCAK, R_WORD)
    return wit


def test_full_super_proven(circuit):
    cs, cfg = circuit
    block = build()
    assert sup.choose_k(cfg, block) <= K
    wit = _witness(circuit, block)
    MockProver(cs, wit.asg, challenges=CHALLENGES).assert_satisfied()


def test_full_super_forged_storage_rejected(circuit):
    """Tampering a storage value must now break the trie link too: the
    MPT-connected state circuit cannot re-prove the root transition."""
    cs, cfg = circuit
    block = build()
    from zkevm_tpu.witness.rw import Target

    rows = [
        dataclasses.replace(r, value=8)
        if r.tag == Target.STORAGE and r.value == 7 else r
        for r in block.rws.rows
    ]
    import zkevm_tpu.circuits.state_circuit as st

    with pytest.raises(AssertionError):
        wit = _witness(circuit, block, rows=st.fix_value_prev(rows))
        MockProver(cs, wit.asg, challenges=CHALLENGES).assert_satisfied()


def test_full_super_forged_caller_rejected(circuit):
    """A wrong CALLER_ADDRESS must break the Sig AddrTable lookup."""
    import zkevm_tpu.circuits.tx_circuit as txc

    cs, cfg = circuit
    block = build()
    wit = _witness(circuit, block)
    row = txc.ROW[txc.TxFieldTag.CALLER_ADDRESS]
    caller = block.txs[0].caller
    wit.asg.set_int(cfg.tx.value_lo, row, (caller + 1) & txc.M128)
    assert MockProver(cs, wit.asg, challenges=CHALLENGES).verify(), \
        "forged caller address accepted"
