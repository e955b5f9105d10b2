"""FSE (tANS) entropy coding for the zstd sequence section.

Reference counterpart: the FSE machinery of the aggregator's in-circuit
zstd decoder — aggregator/src/aggregation/decoder/witgen.rs (table
reconstruction + bitstream reads) and decoder/tables/fse.rs. This module
is the HOST golden model: RFC 8878 predefined distributions, decode/encode
table construction (the canonical symbol-spread + state-descriptor
algorithm), the backward bitstream, and the literals-length/match-length/
offset code maps. The in-circuit decoder (circuits/zstd_circuit.py) proves
transitions against these tables materialized as fixed columns.

Only the PREDEFINED distributions are used by our encoder (RFC 8878
§3.1.1.3.2.2 tables); custom FSE table serialization (the reference's
ZstdBlockSequenceFseCode tag) is a documented next increment.
"""

from __future__ import annotations

from dataclasses import dataclass

# RFC 8878 predefined normalized distributions
LL_DIST = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2,
           2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1]
ML_DIST = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1]
OF_DIST = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
           1, 1, 1, -1, -1, -1, -1, -1]
LL_ACC, ML_ACC, OF_ACC = 6, 6, 5

# literals-length code -> (baseline, extra bits): codes 0-15 are identity
LL_EXTRA = ([(i, 0) for i in range(16)]
            + [(16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2),
               (32, 3), (40, 3), (48, 4), (64, 6), (128, 7), (256, 8),
               (512, 9), (1024, 10), (2048, 11), (4096, 12), (8192, 13),
               (16384, 14), (32768, 15), (65536, 16)])
# match-length code -> (baseline, extra bits): codes 0-31 are ml-3
ML_EXTRA = ([(i + 3, 0) for i in range(32)]
            + [(35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2),
               (51, 3), (59, 3), (67, 4), (83, 4), (99, 5), (131, 7),
               (259, 8), (515, 9), (1027, 10), (2051, 11), (4099, 12),
               (8195, 13), (16387, 14), (32771, 15), (65539, 16)])


def ll_code(v: int) -> int:
    if v < 16:
        return v
    for c in range(len(LL_EXTRA) - 1, 15, -1):
        if v >= LL_EXTRA[c][0]:
            return c
    raise AssertionError(v)


def ml_code(v: int) -> int:
    assert v >= 3
    if v < 35:
        return v - 3
    for c in range(len(ML_EXTRA) - 1, 31, -1):
        if v >= ML_EXTRA[c][0]:
            return c
    raise AssertionError(v)


def of_code(offset_value: int) -> int:
    return offset_value.bit_length() - 1  # baseline 2^code, code extra bits


@dataclass
class DTable:
    """FSE decode table: per state -> (symbol, nbits to read, baseline)."""

    acc: int
    symbol: list
    nbits: list
    base: list


def build_dtable(dist: list, acc: int) -> DTable:
    size = 1 << acc
    assert sum(max(p, 1) if p == -1 else p for p in dist) == size
    symbols = [0] * size
    high = size
    state_desc = {}
    for s, p in enumerate(dist):
        if p == -1:
            high -= 1
            symbols[high] = s
            state_desc[s] = 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, p in enumerate(dist):
        if p <= 0:
            continue
        state_desc[s] = p
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= high:
                pos = (pos + step) & mask
    assert pos == 0
    nbits = [0] * size
    base = [0] * size
    for i in range(size):
        s = symbols[i]
        d = state_desc[s]
        state_desc[s] = d + 1
        nb = acc - (d.bit_length() - 1)
        nbits[i] = nb
        base[i] = (d << nb) - size
    return DTable(acc, symbols, nbits, base)


@dataclass
class CTable:
    """FSE encode table (zstd FSE_buildCTable layout)."""

    acc: int
    state_table: list  # spread-order -> next state value (size..2*size-1)
    delta_nbbits: list  # per symbol
    delta_find: list  # per symbol


def build_ctable(dist: list, acc: int) -> CTable:
    size = 1 << acc
    # same symbol spread as the decoder
    dt = build_dtable(dist, acc)
    cumul = [0] * (len(dist) + 1)
    for s, p in enumerate(dist):
        cumul[s + 1] = cumul[s] + (1 if p == -1 else max(p, 0))
    cumul_w = list(cumul)
    state_table = [0] * size
    for u in range(size):
        s = dt.symbol[u]
        state_table[cumul_w[s]] = size + u
        cumul_w[s] += 1
    delta_nbbits = [0] * len(dist)
    delta_find = [0] * len(dist)
    total = 0
    for s, p in enumerate(dist):
        if p == 0:
            delta_nbbits[s] = ((acc + 1) << 16) - size
        elif p in (-1, 1):
            delta_nbbits[s] = (acc << 16) - size
            delta_find[s] = total - 1
            total += 1
        else:
            max_bits = acc - ((p - 1).bit_length() - 1)  # acc - floor(log2(p-1))
            delta_nbbits[s] = (max_bits << 16) - (p << max_bits)
            delta_find[s] = total - p
            total += p
    return CTable(acc, state_table, delta_nbbits, delta_find)


LL_DT = build_dtable(LL_DIST, LL_ACC)
ML_DT = build_dtable(ML_DIST, ML_ACC)
OF_DT = build_dtable(OF_DIST, OF_ACC)
LL_CT = build_ctable(LL_DIST, LL_ACC)
ML_CT = build_ctable(ML_DIST, ML_ACC)
OF_CT = build_ctable(OF_DIST, OF_ACC)


class BitWriter:
    """Forward little-endian bit packer (zstd BIT_addBits model): field i
    occupies lower bit positions than field i+1; the closing sentinel is
    a single 1 bit followed by zero padding to a byte boundary. The
    backward reader consumes fields in reverse write order."""

    def __init__(self):
        self.acc = 0
        self.len = 0

    def add(self, value: int, nbits: int):
        assert nbits >= 0 and value >= 0
        if nbits:
            self.acc |= (value & ((1 << nbits) - 1)) << self.len
            self.len += nbits

    def close(self) -> bytes:
        self.acc |= 1 << self.len  # sentinel
        self.len += 1
        nbytes = (self.len + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


class BitReader:
    """Backward reader over a closed bitstream."""

    def __init__(self, data: bytes):
        assert data and data[-1] != 0, "missing sentinel"
        self.acc = int.from_bytes(data, "little")
        self.pos = self.acc.bit_length() - 1  # strip sentinel

    def read(self, nbits: int) -> int:
        assert self.pos >= nbits, "bitstream underrun"
        self.pos -= nbits
        return (self.acc >> self.pos) & ((1 << nbits) - 1)

    @property
    def exhausted(self) -> bool:
        return self.pos == 0


class CState:
    """FSE encoder state for one table."""

    def __init__(self, ct: CTable, first_symbol: int):
        nbits_out = (ct.delta_nbbits[first_symbol] + (1 << 15)) >> 16
        value = (nbits_out << 16) - ct.delta_nbbits[first_symbol]
        self.ct = ct
        self.value = ct.state_table[(value >> nbits_out)
                                    + ct.delta_find[first_symbol]]

    def encode(self, w: BitWriter, symbol: int):
        nbits = (self.value + self.ct.delta_nbbits[symbol]) >> 16
        w.add(self.value & ((1 << nbits) - 1), nbits)
        self.value = self.ct.state_table[(self.value >> nbits)
                                         + self.ct.delta_find[symbol]]

    def flush(self, w: BitWriter):
        w.add(self.value & ((1 << self.ct.acc) - 1), self.ct.acc)
