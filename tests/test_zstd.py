"""zstd codec + decoder circuit (aggregation/zstd.py,
circuits/zstd_circuit.py) — reference: aggregator/src/aggregation/
decoder.rs + decoder/witgen.rs zstd_encode (raw+RLE v1 subset)."""

import pytest

from zkevm_tpu.aggregation.zstd import zstd_decode, zstd_encode
from zkevm_tpu.circuits import zstd_circuit as zc
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk import ConstraintSystem, MockProver
from zkevm_tpu.plonk.assign import Assignment

K = 11
N = 1 << K

PAYLOADS = [
    b"",
    b"hello zstd world",
    b"a" * 100,
    b"ab" + b"\x00" * 50 + b"cd" * 9 + b"\xff" * 33,
    bytes(range(256)) + b"Z" * 40 + bytes(range(100)),
]


def test_codec_roundtrip():
    for p in PAYLOADS:
        frame = zstd_encode(p)
        assert zstd_decode(frame) == p
        # RLE actually compresses runs
    assert len(zstd_encode(b"x" * 1000)) < 30


def test_codec_matches_reference_decoder():
    zstd_mod = pytest.importorskip("zstandard")
    d = zstd_mod.ZstdDecompressor()
    for p in PAYLOADS:
        frame = zstd_encode(p)
        got = d.decompress(frame, max_output_size=max(len(p), 1))
        assert got == p, "a standard zstd decoder must accept our frames"


@pytest.fixture(scope="module")
def circuit():
    cs = ConstraintSystem()
    rt8 = RangeTable.configure(cs, 8)
    cfg = zc.configure(cs, rt8)
    return cs, rt8, cfg


def _assign(cs, rt8, cfg, frame):
    asg = Assignment(cs, N)
    rt8.load(asg)
    zc.assign(cs, cfg, N, frame, asg)
    return asg


def test_decoder_circuit_satisfied(circuit):
    cs, rt8, cfg = circuit
    payload = PAYLOADS[3]
    frame = zstd_encode(payload)
    rows, out = zc.decode_events(frame)
    assert out == payload
    asg = _assign(cs, rt8, cfg, frame)
    MockProver(cs, asg).assert_satisfied()


def test_decoder_circuit_empty_payload(circuit):
    cs, rt8, cfg = circuit
    frame = zstd_encode(b"")
    asg = _assign(cs, rt8, cfg, frame)
    MockProver(cs, asg).assert_satisfied()


def test_decoder_rejects_tampered_output(circuit):
    cs, rt8, cfg = circuit
    payload = b"tamper me" + b"\x11" * 20
    frame = zstd_encode(payload)
    asg = _assign(cs, rt8, cfg, frame)
    # claim a different output byte at index 2 (both FSM row + table row,
    # else the lookup itself trivially fails)
    rows, out = zc.decode_events(frame)
    emit_rows = [j for j, r in enumerate(rows)
                 if r["state"] in zc.EMITTING and r["out_idx"] == 2]
    asg.set_int(cfg.obyte, emit_rows[0], out[2] ^ 0xFF)
    asg.set_int(cfg.ot_byte, 2, out[2] ^ 0xFF)
    assert MockProver(cs, asg).verify(), "tampered emit must fail"


def test_decoder_rejects_truncated_stream(circuit):
    cs, rt8, cfg = circuit
    payload = b"abcdefgh" * 4
    frame = zstd_encode(payload)
    asg = _assign(cs, rt8, cfg, frame)
    rows, out = zc.decode_events(frame)
    # flip the declared block size down: the register chain must break
    bh2 = next(j for j, r in enumerate(rows) if r["state"] == zc.ZS.BH2)
    asg.set_int(cfg.rep, bh2 + 1, 1)
    assert MockProver(cs, asg).verify()
