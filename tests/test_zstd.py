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
    frame = zstd_encode(payload, sequences=False)
    rows, out = zc.decode_events(frame)
    assert out == payload
    asg = _assign(cs, rt8, cfg, frame)
    MockProver(cs, asg).assert_satisfied()


def test_decoder_circuit_empty_payload(circuit):
    cs, rt8, cfg = circuit
    frame = zstd_encode(b"", sequences=False)
    asg = _assign(cs, rt8, cfg, frame)
    MockProver(cs, asg).assert_satisfied()


def test_decoder_rejects_tampered_output(circuit):
    cs, rt8, cfg = circuit
    payload = b"tamper me" + b"\x11" * 20
    frame = zstd_encode(payload, sequences=False)
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
    frame = zstd_encode(payload, sequences=False)
    asg = _assign(cs, rt8, cfg, frame)
    rows, out = zc.decode_events(frame)
    # flip the declared block size down: the register chain must break
    bh2 = next(j for j, r in enumerate(rows) if r["state"] == zc.ZS.BH2)
    asg.set_int(cfg.rep, bh2 + 1, 1)
    assert MockProver(cs, asg).verify()


# ---- v2: compressed blocks (LZ77 + predefined-FSE sequences) ----------

def test_v2_fse_table_duality():
    """Every (state, read-bits) decode transition is inverted exactly by
    the encode table (RFC 8878 predefined distributions)."""
    from zkevm_tpu.aggregation import fse

    for dt, ct in ((fse.LL_DT, fse.LL_CT), (fse.ML_DT, fse.ML_CT),
                   (fse.OF_DT, fse.OF_CT)):
        size = 1 << dt.acc
        for u0 in range(size):
            s0 = dt.symbol[u0]
            for b in range(1 << dt.nbits[u0]):
                v1 = size + dt.base[u0] + b
                nb = (v1 + ct.delta_nbbits[s0]) >> 16
                assert nb == dt.nbits[u0]
                assert (v1 & ((1 << nb) - 1)) == b
                assert ct.state_table[(v1 >> nb) + ct.delta_find[s0]] \
                    == size + u0


def test_v2_ll_decode_table_matches_rfc():
    """RFC 8878 predefined literals-length table spot rows."""
    from zkevm_tpu.aggregation.fse import LL_DT

    assert (LL_DT.symbol[0], LL_DT.nbits[0], LL_DT.base[0]) == (0, 4, 0)
    assert (LL_DT.symbol[1], LL_DT.nbits[1], LL_DT.base[1]) == (0, 4, 16)
    assert (LL_DT.symbol[2], LL_DT.nbits[2], LL_DT.base[2]) == (1, 5, 32)
    assert (LL_DT.symbol[63], LL_DT.nbits[63], LL_DT.base[63]) == (32, 6, 0)


def test_v2_roundtrip_compressible():
    import random

    rng = random.Random(0)
    cases = [
        b"hello world hello world hello world!",
        b"0123456789abcdef" * 300,
        bytes(rng.choice(b"ab") for _ in range(5000)),
        open(__file__, "rb").read() * 2,
    ]
    for d in cases:
        frame = zstd_encode(d)
        assert zstd_decode(frame) == d
    # real compression on repetitive data (not just RLE)
    d = open(__file__, "rb").read()
    assert len(zstd_encode(d)) < 0.8 * len(d)


def test_v2_roundtrip_fuzz():
    import random

    rng = random.Random(7)
    for trial in range(12):
        n = rng.randrange(0, 8000)
        alpha = b"abcdefgh" if trial % 2 else bytes(range(256))
        d = bytes(rng.choice(alpha) for _ in range(n))
        assert zstd_decode(zstd_encode(d)) == d


def test_v2_repeat_offsets():
    """Decoder-side RFC 8878 repeat-offset semantics (all four cases)."""
    from zkevm_tpu.aggregation.zstd import (
        decode_sequences, encode_sequences, execute_sequences)

    seqs = [(4, 5, 7), (0, 4, 1), (2, 4, 1), (1, 6, 2), (0, 6, 3),
            (3, 4, 17)]
    lits = b"abcdXYzw*Q"
    bs = encode_sequences(seqs)
    assert decode_sequences(bs, len(seqs)) == seqs
    out, reps = execute_sequences(seqs, lits)
    # golden replay: initial reps [1,4,8]; ofv>3 -> dist=ofv-3
    assert out.startswith(b"abcdabcda")
    assert reps[0] == 14  # last sequence: ofv=17 -> dist 14 becomes rep1


def test_v2_cross_block_state():
    """Repeat offsets and match history persist across frame blocks
    (RFC 8878; reference decoder/witgen.rs:139)."""
    from zkevm_tpu.aggregation.zstd import decode_compressed_block

    # Block 1 establishes rep1 = 4 and leaves history "abcdabcdabcd".
    b1, reps = decode_compressed_block(
        _mk_block([(4, 8, 7)], b"abcd"))
    assert b1 == b"abcdabcdabcd" and reps[0] == 4
    # Block 2 uses repeat-offset code 1 (ofv=1, ll>0 -> rep1=4) and a
    # match reaching back into block 1's output.
    b2, reps2 = decode_compressed_block(
        _mk_block([(2, 6, 1)], b"XY"), reps=reps, history=b1)
    assert b2 == b"XYcdXYcd"  # off=rep1=4 reaches into block 1's output


def _mk_block(seqs, lits):
    from zkevm_tpu.aggregation.zstd import (_literals_header, _nseq_header,
                                            encode_sequences)
    payload = bytearray(_literals_header(len(lits)))
    payload += lits
    payload += _nseq_header(len(seqs))
    payload.append(0x00)
    payload += encode_sequences(seqs)
    return bytes(payload)


def test_v2_matches_reference_decoder():
    zstd_mod = pytest.importorskip("zstandard")
    d = zstd_mod.ZstdDecompressor()
    payload = open(__file__, "rb").read()
    frame = zstd_encode(payload)
    assert d.decompress(frame, max_output_size=len(payload) + 1) == payload
