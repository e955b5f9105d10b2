"""FULL SuperCircuit composition smoke tier (VERDICT r4 item #10): a
minimal block — one EIP-1559 tx with a non-empty access list executing
one storage write — through ALL subcircuits at the smallest k the row
usage allows. The zktrie depth is shrunk to 32 for this harness (the
248-level production depth costs ~250 poseidon permutations per storage
update and forces k=15+; a compressed scroll-style trie is the real
fix, tracked as the zktrie-parity item).

This also closes VERDICT r4 item #5's composition leg: the typed tx is
proven through tx (TX_TYPE/MAX_FEE/access-list rows) + rlp (typed
envelope FSM) + sig (typed parity) inside the full composition.
"""

import os

import pytest

from zkevm_tpu.circuits import super_circuit as sup
from zkevm_tpu.ff import FR
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

R_WORD, R_KECCAK = 0x100, 0x107
CHALLENGES = [R_WORD, R_KECCAK, 0x10E]

# SSTORE(5, 7) [slot pre-warmed by the access list]; STOP
# (one touched storage slot keeps the poseidon/zktrie row budget at
# k=14 — each slot costs ~2*depth permutations)
CODE = bytes([0x60, 7, 0x60, 5, 0x55, 0x00])
PARAMS = CircuitsParams(max_txs=1, max_calldata=16, max_rlp=256)


def build():
    ctx = TestContext.new(
        accounts=[
            lambda a: a.balance(10**19),
            lambda a: a.balance(10**18).code(CODE).storage({5: 3}),
        ],
        txs=[
            lambda t: t.from_(0).to(1).value(3).type(2)
            .max_fee(10**9).max_priority_fee(2).gas_price(10**9)
            .access_list([(1, [5])]),
        ],
    )
    return ctx, block_convert(ctx, PARAMS)


def test_full_super_smoke():
    ctx, block = build()
    assert ctx.txs[0].tx_type == 2
    assert ctx.txs[0].access_list
    cs = ConstraintSystem()
    cfg = sup.configure(cs, PARAMS, limb_bits=10, full=True,
                        mpt_depth=32)
    k = sup.choose_k(cfg, block)
    assert k <= 14, f"smoke block needs k={k}"
    wit = sup.assign(cs, cfg, 1 << k, block)
    wit.fill_phase1(R_KECCAK, R_WORD)
    MockProver(cs, wit.asg, challenges=CHALLENGES).assert_satisfied()
    # the executed storage write really is part of the statement
    assert block.rws.rows
