"""PI circuit: the public-input hash + BlockTable producer.

Reference counterpart: zkevm-circuits/src/pi_circuit.rs:33 — the circuit
keccaks the canonical public-input byte string (chain id, block fields,
state roots, tx hashes), exposes the digest's (hi, lo) halves as THE
instance of the whole zkEVM proof, and assigns the BlockTable
(table.rs:1345) that the EVM circuit reads block-context opcodes from.

TPU-native layout: ONE byte-stream region (a row per PI byte):

    rows 0..131          header bytes — chain_id(8) | coinbase(20) |
                         number(8) | timestamp(8) | gas_limit(8) |
                         base_fee(16) | prev_state_root(32) |
                         post_state_root(32), all big-endian
    then NTX x 32 rows   tx-hash sections (one per tx slot)

All structure is constant rotations off fixed selectors:
- block-field values are rotation-sums over their byte rows, exposed as
  the BlockTable on the first 8 region rows (fixed one-hot lane columns);
- each tx-hash section anchor rebuilds the digest (lo, hi) halves by
  rotation and the active sections are bound BOTH WAYS to the Tx
  circuit's TxTable (pi section i real <=> tx slot i real), so the PI
  hash covers exactly the real transactions;
- the running keccak_input RLC + length accumulate over active rows and
  the final row carries one KeccakTable lookup; the digest (hi, lo)
  cells on that row are copy-constrained to instance rows 0/1.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

from zkevm_tpu.circuits.tables import Challenges, KeccakTable
from zkevm_tpu.circuits.tx_circuit import (
    NFIELDS as TX_NFIELDS,
    ROW as TX_ROW,
    TxConfig,
    TxFieldTag,
)
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()
M128 = (1 << 128) - 1


class BlockField(IntEnum):
    """Reference table.rs BlockContextFieldTag (subset, same roles)."""

    CHAIN_ID = 1
    COINBASE = 2
    NUMBER = 3
    TIMESTAMP = 4
    GAS_LIMIT = 5
    BASE_FEE = 6
    PREV_STATE_ROOT = 7
    POST_STATE_ROOT = 8


# (field, byte offset, size) — the canonical PI header layout
HEADER_LAYOUT = [
    (BlockField.CHAIN_ID, 0, 8),
    (BlockField.COINBASE, 8, 20),
    (BlockField.NUMBER, 28, 8),
    (BlockField.TIMESTAMP, 36, 8),
    (BlockField.GAS_LIMIT, 44, 8),
    (BlockField.BASE_FEE, 52, 16),
    (BlockField.PREV_STATE_ROOT, 68, 32),
    (BlockField.POST_STATE_ROOT, 100, 32),
]
HDR = 132


@dataclass
class BlockContext:
    """Host-side block constants (reference eth-types BlockConstants +
    the chunk's state roots)."""

    chain_id: int = 1
    coinbase: int = 0
    number: int = 0
    timestamp: int = 0
    gas_limit: int = 0
    base_fee: int = 0
    prev_state_root: int = 0
    post_state_root: int = 0

    def header_bytes(self) -> bytes:
        vals = {
            BlockField.CHAIN_ID: self.chain_id,
            BlockField.COINBASE: self.coinbase,
            BlockField.NUMBER: self.number,
            BlockField.TIMESTAMP: self.timestamp,
            BlockField.GAS_LIMIT: self.gas_limit,
            BlockField.BASE_FEE: self.base_fee,
            BlockField.PREV_STATE_ROOT: self.prev_state_root,
            BlockField.POST_STATE_ROOT: self.post_state_root,
        }
        out = bytearray(HDR)
        for f, off, size in HEADER_LAYOUT:
            out[off : off + size] = vals[f].to_bytes(size, "big")
        return bytes(out)


@dataclass
class BlockTable:
    """(enabled, tag, value_lo, value_hi) over the first 8 region rows
    (table.rs:1345 BlockTable); consumed by block-context opcodes."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, q: Expr,
               tag: Expr, value_lo: Expr, value_hi: Expr) -> None:
        ins = [q, q * tag, q * value_lo, q * value_hi]
        cs.lookup(name, list(zip(ins, self.exprs)))


@dataclass
class PiConfig:
    ntx: int
    q_pi: Column  # all region rows
    q_p0: Column
    q_pi_gt0: Column
    q_tx0: Column  # tx-section anchors
    q_last: Column
    fb: list  # 8 fixed one-hot block-table lane columns
    pid: Column  # fixed: section tx_id on anchors
    byte: Column
    act: Column
    ln: Column
    out_lo: Column
    out_hi: Column
    rlc: Column  # phase 1
    instance: Column
    rt8: RangeTable
    challenges: Challenges
    table: BlockTable

    @property
    def rows(self) -> int:
        return HDR + 32 * self.ntx


def _span_value(byte: Column, off: int, size: int, row: int) -> Expr:
    """Big-endian integer of bytes [off, off+size) as rotations from
    `row` (both relative to the region base)."""
    acc = Const(0)
    for j in range(size):
        acc = acc + Const(1 << (8 * (size - 1 - j))) * byte.rot(off + j - row)
    return acc


def configure(
    cs: ConstraintSystem,
    challenges: Challenges,
    keccak_table: KeccakTable,
    tx_cfg: TxConfig,
    *,
    ntx: int = 4,
    rt8: RangeTable | None = None,
) -> PiConfig:
    assert ntx >= 1
    q_pi = cs.fixed_column()
    q_p0 = cs.fixed_column()
    q_pi_gt0 = cs.fixed_column()
    q_tx0 = cs.fixed_column()
    q_last = cs.fixed_column()
    fb = [cs.fixed_column() for _ in range(len(HEADER_LAYOUT))]
    pid = cs.fixed_column()
    byte = cs.advice_column()
    act = cs.advice_column()
    ln = cs.advice_column()
    out_lo = cs.advice_column()
    out_hi = cs.advice_column()
    rlc = cs.advice_column(phase=1)
    instance = cs.instance_column()
    rt8 = rt8 or tx_cfg.rt8

    one = Const(1)
    a = act.cur()

    # -- active flags: header always on; falls only at section anchors ---
    cs.create_gate("pi_act", [
        q_pi.cur() * a * (one - a),
        q_p0.cur() * (one - a),
        (q_pi_gt0.cur() - q_tx0.cur()) * (act.prev() - a),
        q_tx0.cur() * (act.prev() - a) * (one - act.prev() + a),
        q_pi.cur() * (one - a) * byte.cur(),
    ])
    rt8.lookup(cs, "pi_u8", [q_pi.cur() * byte.cur()])

    # -- running length + RLC --------------------------------------------
    r = challenges.keccak_input.expr()
    cs.create_gate("pi_acc", [
        q_p0.cur() * (ln.cur() - one),
        q_pi_gt0.cur() * (ln.cur() - ln.prev() - a),
        q_p0.cur() * (rlc.cur() - byte.cur()),
        q_pi_gt0.cur() * (
            rlc.cur() - (a * (rlc.prev() * r + byte.cur()) + (one - a) * rlc.prev())
        ),
    ])

    # -- final keccak lookup + instance binding ---------------------------
    keccak_table.lookup_word(
        cs, "pi_hash", q_last.cur(), rlc.cur(), ln.cur(),
        out_lo.cur(), out_hi.cur(),
    )

    # -- tx-hash sections <-> TxTable (both directions) -------------------
    def sec_half(lo: bool) -> Expr:
        j0 = 16 if lo else 0
        acc = Const(0)
        for j in range(16):
            acc = acc + Const(1 << (8 * (15 - j))) * byte.rot(j0 + j)
        return acc

    sec_lo, sec_hi = sec_half(True), sec_half(False)
    en = q_tx0.cur() * a
    ZERO = Const(0)
    tx_cfg.table.lookup(cs, "pi_tx_hash", [
        en, en * pid.cur(), en * Const(int(TxFieldTag.TX_HASH)), ZERO,
        en * sec_lo, en * sec_hi,
    ])
    # reverse: every real tx slot's hash appears at ITS pi section.
    # anchored on the tx circuit's first-calldata row (TX_HASH field row
    # sits 1 row above it; tx_id is on the same row).
    hash_rot = -(TX_NFIELDS - TX_ROW[TxFieldTag.TX_HASH])
    ten = tx_cfg.q_cd0.cur() * tx_cfg.is_real.cur()
    cs.lookup("pi_tx_cover", [
        (ten, en),
        (ten * tx_cfg.tx_id.cur(), en * pid.cur()),
        (ten * tx_cfg.value_lo.rot(hash_rot), en * sec_lo),
        (ten * tx_cfg.value_hi.rot(hash_rot), en * sec_hi),
    ])

    # -- BlockTable surface (first 8 region rows) ------------------------
    en_b = Const(0)
    tag_e = Const(0)
    lo_e = Const(0)
    hi_e = Const(0)
    for i, (f, off, size) in enumerate(HEADER_LAYOUT):
        fq = fb[i].cur()
        en_b = en_b + fq
        tag_e = tag_e + fq * Const(int(f))
        if size <= 16:
            lo_e = lo_e + fq * _span_value(byte, off, size, i)
        else:
            lo_e = lo_e + fq * _span_value(byte, off + size - 16, 16, i)
            hi_e = hi_e + fq * _span_value(byte, off, size - 16, i)
    table = BlockTable([en_b, tag_e, lo_e, hi_e])

    # instance binding: digest cells on the final region row (the region
    # shape is static, so the copy rows are circuit structure)
    last = HDR + 32 * ntx - 1
    cs.copy(instance, 0, out_hi, last)
    cs.copy(instance, 1, out_lo, last)

    return PiConfig(
        ntx, q_pi, q_p0, q_pi_gt0, q_tx0, q_last, fb, pid, byte, act, ln,
        out_lo, out_hi, rlc, instance, rt8, challenges, table,
    )


@dataclass
class PiWitness:
    asg: Assignment
    cfg: PiConfig
    pi_bytes: bytes  # the hashed (active) byte stream

    def fill_phase1(self, r_keccak: int) -> None:
        cfg = self.cfg
        acc = 0
        for i in range(cfg.rows):
            if i < len(self.pi_bytes):
                acc = (acc * r_keccak + self.pi_bytes[i]) % FR_MOD
            self.asg.set_int(cfg.rlc, i, acc)

    def witness_phases(self):
        cfg = self.cfg

        def cb(phase: int, ch: dict) -> dict:
            if phase == 1:
                self.fill_phase1(ch[cfg.challenges.keccak_input])
            return {
                c: self.asg.cols[c]
                for c in self.asg.cs.advice_columns
                if c.phase == phase
            }

        return cb


def pi_bytes_of(block: BlockContext, tx_hashes: list[bytes]) -> bytes:
    return block.header_bytes() + b"".join(tx_hashes)


def keccak_messages(block: BlockContext, tx_hashes: list[bytes]) -> list[bytes]:
    return [pi_bytes_of(block, tx_hashes)]


def instance_values(block: BlockContext, tx_hashes: list[bytes]) -> list[int]:
    """[pi_hash_hi, pi_hash_lo] (reference pi_circuit instance order)."""
    from zkevm_tpu.hash.keccak import keccak256

    h = int.from_bytes(keccak256(pi_bytes_of(block, tx_hashes)), "big")
    return [h >> 128, h & M128]


def assign(
    cs: ConstraintSystem,
    cfg: PiConfig,
    n: int,
    block: BlockContext,
    tx_hashes: list[bytes],
    asg: Assignment | None = None,
) -> PiWitness:
    asg = asg if asg is not None else Assignment(cs, n)
    assert len(tx_hashes) <= cfg.ntx
    rows = cfg.rows
    assert rows < cs.usable_rows(n)
    one = FR.encode(1)

    asg.cols[cfg.q_pi][:rows] = one
    asg.set_int(cfg.q_p0, 0, 1)
    asg.cols[cfg.q_pi_gt0][1:rows] = one
    asg.set_int(cfg.q_last, rows - 1, 1)
    for i in range(len(HEADER_LAYOUT)):
        asg.set_int(cfg.fb[i], i, 1)
    for s in range(cfg.ntx):
        asg.set_int(cfg.q_tx0, HDR + 32 * s, 1)
        asg.set_int(cfg.pid, HDR + 32 * s, s + 1)

    data = pi_bytes_of(block, tx_hashes)
    for i, b in enumerate(data):
        asg.set_int(cfg.byte, i, b)
    asg.cols[cfg.act][: len(data)] = one
    for i in range(rows):
        asg.set_int(cfg.ln, i, min(i + 1, len(data)))

    h = instance_values(block, tx_hashes)
    asg.set_int(cfg.out_hi, rows - 1, h[0])
    asg.set_int(cfg.out_lo, rows - 1, h[1])
    asg.set_ints(cfg.instance, 0, h)
    return PiWitness(asg, cfg, data)
