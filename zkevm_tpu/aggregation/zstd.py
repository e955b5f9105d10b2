"""zstd batch-payload codec: host witgen encoder + decoder.

Reference counterpart: the aggregator's in-circuit zstd machinery —
`aggregation/decoder.rs` + `decoder/witgen.rs` `zstd_encode` (the witness
generator encodes the batch payload; the circuit proves blob bytes decode
back to it). The reference implements the full RFC 8878 compressed-block
path (FSE + Huffman + sequence execution, ~9.4k LoC); this v1 implements
the RAW + RLE block subset — valid zstd frames any standard decoder
accepts, with run-length compression only. The FSE/Huffman sequence
section is the documented next increment.

Frame layout emitted (and proven by circuits' decoder FSM):

  magic 28 B5 2F FD
  frame header: FHD=0x00, window descriptor (1 byte)
  blocks: 3-byte little-endian header
      bit0 last_block · bits1-2 type (0 raw, 1 RLE) · bits3..23 size
    raw block: `size` literal bytes follow
    RLE block: ONE byte follows, regenerated `size` times
"""

from __future__ import annotations

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


def zstd_encode(data: bytes) -> bytes:
    """Batch payload -> zstd frame (raw + RLE blocks)."""
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
        else:
            raise ValueError("compressed blocks not in the v1 subset")
    assert i == len(frame), "trailing bytes"
    return bytes(out)
