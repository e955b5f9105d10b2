"""zstd batch-payload codec: host witgen encoder + decoder.

Reference counterpart: the aggregator's in-circuit zstd machinery —
`aggregation/decoder.rs` + `decoder/witgen.rs` `zstd_encode` (the witness
generator encodes the batch payload; the circuit proves blob bytes decode
back to it). The reference's subset (witgen/types.rs ZstdTag) is: frame
header, block header, RAW literals, FSE-coded sequence section, sequence
execution — no Huffman literals. This module implements the same shape:

- v1 blocks: RAW + RLE (block types 0/1).
- v2 blocks (`zstd_encode(data, sequences=True)`, the default): COMPRESSED
  (type 2) — greedy hash-chain LZ77 match finding, raw literals section,
  sequences section with the RFC 8878 PREDEFINED FSE tables (interleaved
  backward bitstream, repeat-offset semantics in the decoder). Predefined
  (not custom) distributions means no ZstdBlockSequenceFseCode section;
  custom-table serialization is the documented next increment.

Frame layout emitted (and proven by circuits' decoder FSM):

  magic 28 B5 2F FD
  frame header: FHD=0x00, window descriptor (1 byte)
  blocks: 3-byte little-endian header
      bit0 last_block · bits1-2 type (0 raw, 1 RLE, 2 compressed)
      bits3..23 block size
    raw block: `size` literal bytes follow
    RLE block: ONE byte follows, regenerated `size` times
    compressed block (`size` = compressed payload length):
      literals header (3-byte Raw_Literals_Block, Size_Format=11)
      + literal bytes + Number_of_Sequences (1-3 B) + modes byte (0x00:
      all predefined) + backward FSE bitstream
"""

from __future__ import annotations

from zkevm_tpu.aggregation import fse
from zkevm_tpu.aggregation.fse import (
    BitReader, BitWriter, CState, LL_DT, LL_EXTRA, ML_DT, ML_EXTRA, OF_DT,
    LL_CT, ML_CT, OF_CT, ll_code, ml_code, of_code,
)

MAGIC = bytes([0x28, 0xB5, 0x2F, 0xFD])
MAX_BLOCK = (1 << 17) - 1  # fits the 21-bit size field with margin
MIN_RLE_RUN = 8  # shorter runs stay raw (header overhead)


def _runs(data: bytes):
    """Split into maximal (byte, run_length) segments."""
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and data[j] == data[i]:
            j += 1
        yield data[i], j - i
        i = j


MIN_MATCH = 4  # greedy matcher floor (zstd allows 3; 4 keeps hashing cheap)


def _find_sequences(data: bytes):
    """Greedy hash-chain LZ77: -> (sequences [(ll, ml, offset)], literals).

    Matches stay inside `data` (one block = one window; no cross-block
    offsets, mirroring the reference's independent-block encoding)."""
    n = len(data)
    seqs = []
    lits = bytearray()
    head: dict = {}
    i = 0
    anchor = 0
    while i + MIN_MATCH <= n:
        key = data[i:i + MIN_MATCH]
        j = head.get(key, -1)
        head[key] = i
        if j >= 0 and i - j <= (1 << 17):
            ml = MIN_MATCH
            while i + ml < n and data[j + ml] == data[i + ml]:
                ml += 1
            lits += data[anchor:i]
            seqs.append((i - anchor, ml, i - j))
            # index the skipped positions sparsely (every 2nd) to keep the
            # host encoder linear-ish without losing most matches
            for p in range(i + 1, min(i + ml, n - MIN_MATCH), 2):
                head[data[p:p + MIN_MATCH]] = p
            i += ml
            anchor = i
        else:
            i += 1
    lits += data[anchor:]
    return seqs, bytes(lits)


def encode_sequences(seqs: list) -> bytes:
    """Sequences -> backward-interleaved FSE bitstream (predefined tables).

    Mirrors zstd ZSTD_encodeSequences_body: process in reverse, init
    states from the LAST sequence's codes, write its extra-bit fields
    first, then per earlier sequence FSE-encode (OF, ML, LL) + extras
    (LL, ML, OF), finally flush states (ML, OF, LL) and the sentinel."""
    assert seqs
    w = BitWriter()
    codes = [(ll_code(ll), ml_code(ml), of_code(ofv)) for ll, ml, ofv in seqs]
    lc, mc, oc = codes[-1]
    st_ml = CState(ML_CT, mc)
    st_of = CState(OF_CT, oc)
    st_ll = CState(LL_CT, lc)
    ll, ml, ofv = seqs[-1]
    w.add(ll - LL_EXTRA[lc][0], LL_EXTRA[lc][1])
    w.add(ml - ML_EXTRA[mc][0], ML_EXTRA[mc][1])
    w.add(ofv - (1 << oc), oc)
    for k in range(len(seqs) - 2, -1, -1):
        lc, mc, oc = codes[k]
        ll, ml, ofv = seqs[k]
        st_of.encode(w, oc)
        st_ml.encode(w, mc)
        st_ll.encode(w, lc)
        w.add(ll - LL_EXTRA[lc][0], LL_EXTRA[lc][1])
        w.add(ml - ML_EXTRA[mc][0], ML_EXTRA[mc][1])
        w.add(ofv - (1 << oc), oc)
    st_ml.flush(w)
    st_of.flush(w)
    st_ll.flush(w)
    return w.close()


def decode_sequences(bitstream: bytes, nseq: int) -> list:
    """Backward bitstream -> [(ll, ml, offset_value)] (golden model)."""
    r = BitReader(bitstream)
    ll_st = r.read(LL_DT.acc)
    of_st = r.read(OF_DT.acc)
    ml_st = r.read(ML_DT.acc)
    out = []
    for k in range(nseq):
        oc = OF_DT.symbol[of_st]
        ofv = (1 << oc) + r.read(oc)
        mc = ML_DT.symbol[ml_st]
        ml = ML_EXTRA[mc][0] + r.read(ML_EXTRA[mc][1])
        lc = LL_DT.symbol[ll_st]
        ll = LL_EXTRA[lc][0] + r.read(LL_EXTRA[lc][1])
        out.append((ll, ml, ofv))
        if k != nseq - 1:
            ll_st = LL_DT.base[ll_st] + r.read(LL_DT.nbits[ll_st])
            ml_st = ML_DT.base[ml_st] + r.read(ML_DT.nbits[ml_st])
            of_st = OF_DT.base[of_st] + r.read(OF_DT.nbits[of_st])
    assert r.exhausted, f"{r.pos} bits left"
    return out


def execute_sequences(seqs: list, literals: bytes, reps: list | None = None,
                      history: bytes = b"") -> tuple[bytes, list]:
    """Sequence execution with RFC 8878 repeat-offset semantics.

    `reps` / `history` carry the repeat-offset triple and prior decoded
    output ACROSS blocks of a frame (RFC 8878 §3.1.1.3.2.2; reference
    decoder/witgen.rs "carried forward between blocks") — resetting them
    per block would mis-decode valid multi-block frames. Returns
    (this block's decoded bytes, updated reps)."""
    out = bytearray(history)
    hlen = len(history)
    reps = [1, 4, 8] if reps is None else list(reps)
    li = 0
    for ll, ml, ofv in seqs:
        out += literals[li:li + ll]
        li += ll
        if ofv > 3:
            off = ofv - 3
            reps = [off, reps[0], reps[1]]
        else:
            idx = ofv - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                off = reps[0]
            elif idx == 1:
                off = reps[1]
                reps = [off, reps[0], reps[2]]
            elif idx == 2:
                off = reps[2]
                reps = [off, reps[0], reps[1]]
            else:  # idx == 3: rep1 - 1
                off = reps[0] - 1
                assert off > 0, "corrupt frame: zero offset"
                reps = [off, reps[0], reps[1]]
        assert 0 < off <= len(out), (off, len(out))
        for _ in range(ml):  # byte-wise: overlap allowed
            out.append(out[-off])
    out += literals[li:]
    return bytes(out[hlen:]), reps


def _literals_header(n: int) -> bytes:
    # Raw_Literals_Block (type 00), Size_Format 11 -> 3-byte header, 20 bits
    assert n < (1 << 20)
    v = 0x0 | (0x3 << 2) | (n << 4)
    return v.to_bytes(3, "little")


def _nseq_header(nseq: int) -> bytes:
    if nseq < 128:
        return bytes([nseq])
    if nseq < 0x7F00:
        return bytes([0x80 | (nseq >> 8), nseq & 0xFF])
    return bytes([0xFF]) + (nseq - 0x7F00).to_bytes(2, "little")


def _compress_block(chunk: bytes) -> bytes | None:
    """chunk -> compressed-block payload, or None if not smaller."""
    seqs, lits = _find_sequences(chunk)
    if not seqs:
        return None
    payload = bytearray(_literals_header(len(lits)))
    payload += lits
    payload += _nseq_header(len(seqs))
    payload.append(0x00)  # modes: all predefined
    # offset_value = distance + 3 (values 1-3 are the repeat-offset codes,
    # which this encoder does not emit; the decoder handles them)
    payload += encode_sequences([(ll, ml, d + 3) for ll, ml, d in seqs])
    if len(payload) >= len(chunk):
        return None
    return bytes(payload)


def decode_compressed_block(payload: bytes, reps: list | None = None,
                            history: bytes = b"") -> tuple[bytes, list]:
    """Golden decoder for one compressed-block payload.

    Threads the cross-block repeat-offset triple and decode history (see
    execute_sequences). Returns (decoded bytes, updated reps)."""
    h0 = payload[0]
    lit_type = h0 & 3
    assert lit_type == 0, "only Raw_Literals_Block in subset"
    size_fmt = (h0 >> 2) & 3
    if size_fmt in (0, 2):
        nlit, i = h0 >> 3, 1
    elif size_fmt == 1:
        nlit, i = int.from_bytes(payload[:2], "little") >> 4, 2
    else:
        nlit, i = int.from_bytes(payload[:3], "little") >> 4, 3
    lits = payload[i:i + nlit]
    i += nlit
    b0 = payload[i]
    if b0 < 128:
        nseq, i = b0, i + 1
    elif b0 < 255:
        nseq, i = ((b0 - 0x80) << 8) | payload[i + 1], i + 2
    else:
        nseq, i = int.from_bytes(payload[i + 1:i + 3], "little") + 0x7F00, i + 3
    if nseq == 0:
        assert i == len(payload)
        return bytes(lits), ([1, 4, 8] if reps is None else list(reps))
    modes = payload[i]
    i += 1
    assert modes == 0x00, "only predefined FSE modes in subset"
    seqs = decode_sequences(payload[i:], nseq)
    return execute_sequences(seqs, lits, reps=reps, history=history)


def zstd_encode(data: bytes, sequences: bool = True) -> bytes:
    """Batch payload -> zstd frame (raw + RLE + compressed blocks)."""
    if not sequences:
        return _zstd_encode_v1(data)
    out = bytearray(MAGIC)
    out.append(0x00)
    # window descriptor: exponent 8 -> 2^18 = 256 KiB window, covering the
    # largest back-reference a MAX_BLOCK-sized block can emit (standard
    # decoders enforce this bound; our own decoder ignores the byte)
    out.append(0x40)
    blocks = []
    for start in range(0, len(data), MAX_BLOCK) or [0]:
        chunk = data[start:start + MAX_BLOCK]
        comp = _compress_block(chunk)
        if comp is not None:
            blocks.append((2, comp, len(comp)))
        elif len(set(chunk)) == 1 and len(chunk) >= MIN_RLE_RUN:
            blocks.append((1, chunk[:1], len(chunk)))
        else:
            blocks.append((0, chunk, len(chunk)))
    if not blocks:
        blocks.append((0, b"", 0))
    for bi, (btype, payload, size) in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        hdr = last | (btype << 1) | (size << 3)
        out += hdr.to_bytes(3, "little")
        out += payload
    return bytes(out)


def _zstd_encode_v1(data: bytes) -> bytes:
    """Batch payload -> zstd frame (raw + RLE blocks only)."""
    out = bytearray(MAGIC)
    out.append(0x00)  # FHD: no flags
    out.append(0x00)  # window descriptor (decoder side ignores; exp=10)
    blocks = []  # (type, payload bytes, regenerated size)
    pend = bytearray()

    def flush_raw():
        while pend:
            chunk = bytes(pend[:MAX_BLOCK])
            del pend[:MAX_BLOCK]
            blocks.append((0, chunk, len(chunk)))

    for byte, run in _runs(data):
        if run >= MIN_RLE_RUN:
            flush_raw()
            r = run
            while r:
                c = min(r, MAX_BLOCK)
                blocks.append((1, bytes([byte]), c))
                r -= c
        else:
            pend += bytes([byte]) * run
            if len(pend) >= MAX_BLOCK:
                flush_raw()
    flush_raw()
    if not blocks:
        blocks.append((0, b"", 0))
    for bi, (btype, payload, size) in enumerate(blocks):
        last = 1 if bi == len(blocks) - 1 else 0
        hdr = last | (btype << 1) | (size << 3)
        out += hdr.to_bytes(3, "little")
        out += payload
    return bytes(out)


def zstd_decode(frame: bytes) -> bytes:
    """Decode the raw+RLE subset (golden model for the decoder circuit)."""
    assert frame[:4] == MAGIC, "bad magic"
    fhd = frame[4]
    assert fhd == 0x00, f"unsupported frame header descriptor {fhd:#x}"
    i = 6  # skip window descriptor
    out = bytearray()
    reps = [1, 4, 8]  # repeat offsets persist across blocks of a frame
    last = 0
    while not last:
        hdr = int.from_bytes(frame[i:i + 3], "little")
        i += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        size = hdr >> 3
        if btype == 0:  # raw
            out += frame[i:i + size]
            i += size
        elif btype == 1:  # RLE
            out += frame[i:i + 1] * size
            i += 1
        elif btype == 2:  # compressed (raw literals + FSE sequences)
            dec, reps = decode_compressed_block(
                frame[i:i + size], reps=reps, history=bytes(out))
            out += dec
            i += size
        else:
            raise ValueError("reserved block type")
    assert i == len(frame), "trailing bytes"
    return bytes(out)
