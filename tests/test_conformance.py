"""Conformance suite through the testool-style runner (reference:
testool + ethereum/tests general state tests, scoped to the implemented
opcode families). WITNESS tier here; the CIRCUIT tier runs one spec
end-to-end to prove the wiring."""

import pytest

from zkevm_tpu import testool
from zkevm_tpu.testool import CIRCUIT, WITNESS, run_state_test, run_suite

ETH = 10**18


def _code(*ops):
    return bytes(ops)


SUITE = [
    {
        "name": "transfer_simple",
        "pre": {0: {"balance": 10 * ETH}, 1: {"balance": 1}},
        "txs": [{"frm": 0, "to": 1, "value": ETH}],
        "expect": {"post": {1: {"balance": ETH + 1},
                            0: {"nonce": 1}}},
    },
    {
        "name": "transfer_two_txs_interleaved",
        "pre": {0: {"balance": 10 * ETH}, 1: {"balance": 5 * ETH}},
        "txs": [{"frm": 0, "to": 1, "value": 3 * ETH},
                {"frm": 1, "to": 0, "value": 7 * ETH}],
        "expect": {"post": {0: {"balance": 14 * ETH},
                            1: {"balance": ETH}}},
    },
    {
        "name": "add_mstore_mload_sstore",
        "pre": {
            0: {"balance": ETH},
            1: {"code": _code(0x60, 5, 0x60, 7, 0x01, 0x60, 0, 0x52,
                              0x60, 0, 0x51, 0x60, 1, 0x55, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {1: 12}}}},
    },
    {
        "name": "sstore_overwrite_and_refund",
        "pre": {
            0: {"balance": ETH},
            1: {"code": _code(0x60, 0, 0x60, 7, 0x55, 0x00),  # slot7 <- 0
                "storage": {7: 99}},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {7: 0}}}},
    },
    {
        "name": "warm_cold_sload",
        "pre": {
            0: {"balance": ETH},
            # SLOAD slot5 twice (cold then warm), store sum at slot 6
            1: {"code": _code(0x60, 5, 0x54, 0x60, 5, 0x54, 0x01,
                              0x60, 6, 0x55, 0x00),
                "storage": {5: 21}},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {6: 42}}}},
    },
    {
        "name": "jump_over_invalid",
        "pre": {
            0: {"balance": ETH},
            1: {"code": _code(0x60, 4, 0x56, 0xFE, 0x5B, 0x60, 1,
                              0x60, 2, 0x55, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {2: 1}}}},
    },
    {
        "name": "revert_rolls_back_storage",
        "pre": {
            0: {"balance": ETH},
            # SSTORE then REVERT: storage must stay at pre value
            1: {"code": _code(0x60, 1, 0x60, 1, 0x55,
                              0x60, 0, 0x60, 0, 0xFD),
                "storage": {1: 7}},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"failed": [0], "post": {1: {"storage": {1: 7}}}},
    },
    {
        "name": "inner_call_storage",
        "pre": {
            0: {"balance": ETH},
            # callee 1 CALLs callee 2 which stores 9 at slot 3
            1: {"code": _code(
                0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0, 0x60, 0,
                0x61, 0xB0, 0xB2, 0x62, 0x0F, 0x42, 0x40, 0xF1, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1, "gas": 2_000_000}],
        "expect": {},
    },
    {
        "name": "calldata_logs_and_sha3",
        "pre": {
            0: {"balance": ETH},
            # CODECOPY 4 bytes, SHA3 mem[0..32], POP, LOG0 over mem[0..4]
            1: {"code": _code(0x60, 4, 0x60, 0, 0x60, 0, 0x39,
                              0x60, 0x20, 0x60, 0, 0x20, 0x50,
                              0x60, 4, 0x60, 0, 0xA0, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1, "data": b"\x01\x02"}],
        "expect": {},
    },
    {
        "name": "exp_opcode",
        "pre": {
            0: {"balance": ETH},
            # 3 ** 5 -> slot 0
            1: {"code": _code(0x60, 5, 0x60, 3, 0x0A, 0x60, 0, 0x55, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {0: 243}}}},
    },
    {
        "name": "dup_swap_pop_families",
        "pre": {
            0: {"balance": ETH},
            # [2,3] DUP2->[2,3,2] SWAP1->[2,2,3] POP->[2,2] ADD -> 4
            1: {"code": _code(0x60, 2, 0x60, 3, 0x81, 0x90, 0x50,
                              0x01, 0x60, 1, 0x55, 0x00)},
        },
        "txs": [{"frm": 0, "to": 1}],
        "expect": {"post": {1: {"storage": {1: 4}}}},
    },
    {
        "name": "small_value_transfer_dust",
        "pre": {0: {"balance": 10}, 1: {}},
        "txs": [{"frm": 0, "to": 1, "value": 5}],
        "expect": {"post": {1: {"balance": 5}, 0: {"balance": 5}}},
    },
    {
        "name": "value_to_raw_address",
        "pre": {0: {"balance": ETH}},
        "txs": [{"frm": 0, "to": 0xDEAD, "value": 3}],
        "expect": {"post": {0xDEAD: {"balance": 3}}},
    },
]


def test_witness_suite():
    rep = run_suite(SUITE, tier=WITNESS)
    print(rep.summary())
    rep.assert_all_pass()
    assert rep.counts["pass"] >= 12


def test_failure_is_reported():
    bad = {
        "name": "wrong_expectation",
        "pre": {0: {"balance": 10**18}, 1: {}},
        "txs": [{"frm": 0, "to": 1, "value": 5}],
        "expect": {"post": {1: {"balance": 6}}},
    }
    r = run_state_test(bad)
    assert r.status == "fail" and "balance" in r.detail


@pytest.mark.skipif(__import__("os").environ.get("ZKEVM_TPU_HEAVY") != "1",
                    reason="CIRCUIT tier is slow; set ZKEVM_TPU_HEAVY=1")
def test_circuit_tier_one_spec():
    r = run_state_test(SUITE[0], tier=CIRCUIT)
    assert r.status == "pass", r.detail


def test_circuit_tier_copy_sha3_log():
    """CODECOPY + SHA3 + LOG0 through the full super circuit — the
    EVM->CopyTable->KeccakTable link for the copy-backed states."""
    spec = next(s for s in SUITE if s["name"] == "calldata_logs_and_sha3")
    r = run_state_test(spec, tier=CIRCUIT)
    assert r.status == "pass", r.detail
