"""Native precompile execution (etypes/precompiles.py) — the
revm-precompile analog (reference: bus-mapping/src/precompile.rs)."""

import hashlib

import pytest

from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.ec import secp256k1 as s256
from zkevm_tpu.etypes import precompiles as pc


def test_ecrecover_roundtrip():
    priv = 0xA1B2C3D4E5F6
    msg_hash = int.from_bytes(hashlib.sha256(b"hello").digest(), "big")
    r, s, parity = s256.ecdsa_sign(msg_hash, priv)
    data = (msg_hash.to_bytes(32, "big") + (27 + parity).to_bytes(32, "big")
            + r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    ok, out, cost = pc.execute(1, data, 10_000)
    assert ok and cost == 3000
    assert int.from_bytes(out, "big") == s256.address_of(s256.pubkey(priv))
    # bad v -> empty output, success (EVM semantics)
    bad = bytearray(data)
    bad[63] = 99
    ok, out, _ = pc.execute(1, bytes(bad), 10_000)
    assert ok and out == b""


def test_hash_and_identity():
    ok, out, cost = pc.execute(2, b"abc", 1000)
    assert ok and out == hashlib.sha256(b"abc").digest() and cost == 72
    ok, out, cost = pc.execute(3, b"abc", 1000)
    assert ok and out[-20:] == hashlib.new("ripemd160", b"abc").digest()
    assert out[:12] == b"\0" * 12
    ok, out, cost = pc.execute(4, b"xyz", 1000)
    assert ok and out == b"xyz" and cost == 18
    # out of gas
    ok, _, _ = pc.execute(2, b"abc", 10)
    assert not ok


def test_modexp():
    data = ((1).to_bytes(32, "big") + (1).to_bytes(32, "big")
            + (1).to_bytes(32, "big") + bytes([3, 5, 7]))
    ok, out, cost = pc.execute(5, data, 10_000)
    assert ok and out == bytes([pow(3, 5, 7)]) and cost == 200


def test_bn254_ops():
    g = bn.G1_GEN
    g2 = bn.scalar_mul(g, 2)
    data = (g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big")
            + g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big"))
    ok, out, _ = pc.execute(6, data, 1000)
    assert ok
    assert (int.from_bytes(out[:32], "big"),
            int.from_bytes(out[32:], "big")) == g2
    data = g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big") + (
        7).to_bytes(32, "big")
    ok, out, _ = pc.execute(7, data, 10_000)
    assert ok
    assert (int.from_bytes(out[:32], "big"),
            int.from_bytes(out[32:], "big")) == bn.scalar_mul(g, 7)
    # off-curve input rejected
    bad = (1).to_bytes(32, "big") + (1).to_bytes(32, "big") + data[64:]
    ok, _, _ = pc.execute(7, bad, 10_000)
    assert not ok


def test_ecpairing():
    from zkevm_tpu.ec import pairing as pr

    g1 = bn.G1_GEN
    neg_g1 = bn.neg(g1)
    g2 = pr.G2_GEN

    def enc(p1, q2):
        (xr, xi_), (yr, yi_) = q2
        return (p1[0].to_bytes(32, "big") + p1[1].to_bytes(32, "big")
                + xi_.to_bytes(32, "big") + xr.to_bytes(32, "big")
                + yi_.to_bytes(32, "big") + yr.to_bytes(32, "big"))

    data = enc(g1, g2) + enc(neg_g1, g2)
    ok, out, cost = pc.execute(8, data, 200_000)
    assert ok and int.from_bytes(out, "big") == 1
    data = enc(g1, g2)
    ok, out, _ = pc.execute(8, data, 200_000)
    assert ok and int.from_bytes(out, "big") == 0


def test_blake2f_blake2b_abc():
    """F-compress the single-block blake2b("abc") state: the output state
    must reproduce hashlib's digest (EIP-152 semantics)."""
    IV = [0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
          0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
          0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179]
    h = list(IV)
    h[0] ^= 0x01010040  # param block: digest_len=64, fanout=1, depth=1
    data = ((12).to_bytes(4, "big")
            + b"".join(x.to_bytes(8, "little") for x in h)
            + b"abc".ljust(128, b"\0")
            + (3).to_bytes(8, "little") + (0).to_bytes(8, "little")
            + b"\x01")
    assert len(data) == 213
    ok, out, cost = pc.execute(9, data, 100)
    assert ok and cost == 12
    assert out == hashlib.blake2b(b"abc").digest()
    # malformed length rejected
    ok, _, _ = pc.execute(9, data[:-1], 100)
    assert not ok


def test_tracer_calls_precompile():
    """STATICCALL to sha256: the identity of the returned data is
    observable through the mini-EVM's memory write-back."""
    from zkevm_tpu.etypes.state import CodeDB, StateDB
    from zkevm_tpu.etypes.trace import trace_call

    # PUSH1 32 (retLen) PUSH1 0 (retOff) PUSH1 0 (argLen) PUSH1 0 (argOff)
    # PUSH1 2 (addr) PUSH2 0xFFFF (gas) STATICCALL; MLOAD(0); STOP
    code = bytes([0x60, 0x20, 0x60, 0x00, 0x60, 0x00, 0x60, 0x00,
                  0x60, 0x02, 0x61, 0xFF, 0xFF, 0xFA,
                  0x60, 0x00, 0x51, 0x00])
    sdb, cdb = StateDB(), CodeDB()
    caller = 0xCA11E5
    callee = 0xC0DE
    sdb.ensure(caller).balance = 10**18
    sdb.ensure(callee).code_hash = cdb.insert(code)
    tr = trace_call(sdb, cdb, caller=caller, callee=callee, gas=100_000)
    # the final STOP sees sha256(b"") on top of the stack (from MLOAD)
    stop = tr.struct_logs[-1]
    want = int.from_bytes(hashlib.sha256(b"").digest(), "big")
    assert stop.stack[-1] == want
