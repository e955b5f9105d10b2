"""Tx circuit: transaction fields, calldata, and hash binding — the
TxTable producer.

Reference counterpart: zkevm-circuits/src/tx_circuit.rs:332 (field
assignment into TxTable, keccak links for tx_hash / tx_sign_hash,
calldata gas cost) with table.rs:208 TxTable {tx_id, tag, index, value}.

TPU-native layout: one fixed-size block of rows per transaction slot —
    rows 0..13            field rows (tag/index/tx_id are FIXED columns,
                          so the table's shape is part of the circuit)
    rows 14..14+CD        calldata byte rows (capacity CD per tx)
    next RLP              unsigned-RLP byte stream rows
    next RLP              signed-RLP byte stream rows
Because every offset inside a block is a compile-time constant, all
cross-row links (calldata length/gas-cost field vs the accumulators over
the byte rows, hash fields vs the stream-end keccak lookups) are plain
constant rotations — no dynamic copy wiring. Unused slots carry
`is_real = 0` (block-constant, boolean): their keccak lookups are
disabled and the TxTable surface exposes enabled = is_real, so consumers
can never read an unproven slot.

What IS constrained in-circuit:
- calldata: bytes are u8, padding rows are zero, the active-flag flips
  exactly at index == CallDataLength, CallDataGasCost equals the 4/16
  per-byte accumulator (EIP-2028) over the active bytes;
- both RLP streams: bytes are u8, active flags are monotone, running
  length and keccak_input-RLC accumulate over active bytes, and the
  stream-final (rlc, len) pair is bound through the KeccakTable to the
  TxSignHash / TxHash field rows (digest lo/hi halves);
- IsCreate is boolean and zero iff a callee address is present (v1: the
  witness only produces calls).

Known v1 gaps (documented scope, mirrors the reference's split):
- the RLP STRUCTURE (that the byte stream is rlp([nonce, gas_price, ...])
  of exactly the field-row values) belongs to the RLP circuit
  (rlp_circuit_fsm.rs) — the streams here are witness bytes whose hashes
  are proven; the cross-check lands with that circuit;
- ECDSA (v, r, s) verification belongs to the Sig circuit
  (sig_circuit/ecdsa.rs). When a Sig circuit AddrTable is passed to
  configure(), the bridge below binds every real tx slot to one proven
  ecrecover row: a 128-byte strip (sign-hash / z / r / s, big-endian,
  u8-ranged) composes BOTH the 128-bit field-row halves and the
  88-bit-limb lookup tuple from the same byte cells (exact, no mod-p
  wrap), an in-circuit mod-n reduction ties z = sign_hash mod n
  (quotient/borrow booleans), the recovery parity is derived from
  SIG_V = 2*chain_id + 35 + parity (EIP-155), and CALLER_ADDRESS is
  equated with the keccak(pubkey) address halves through the lookup —
  the reference's tx_circuit.rs sig-table link (tx_circuit.rs:332 area).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

from zkevm_tpu.circuits.tables import Challenges, KeccakTable
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.gadgets import RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const
from zkevm_tpu.plonk.expr import Expr  # noqa: F401 (type refs in docs)

FR = fr_spec()
M128 = (1 << 128) - 1

# secp256k1 group order (the Sig circuit's scalar modulus), half-split
SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
N_LO, N_HI = SECP_N & M128, SECP_N >> 128


class TxFieldTag(IntEnum):
    """Reference table.rs TxFieldTag (subset, same names)."""

    NULL = 0
    NONCE = 1
    GAS_PRICE = 2
    GAS = 3
    CALLER_ADDRESS = 4
    CALLEE_ADDRESS = 5
    IS_CREATE = 6
    VALUE = 7
    CALL_DATA_LENGTH = 8
    CALL_DATA_GAS_COST = 9
    SIG_V = 10
    SIG_R = 11
    SIG_S = 12
    TX_SIGN_HASH = 13
    TX_HASH = 14
    CALL_DATA = 15
    CHAIN_ID = 16
    # typed transactions (EIP-2930/1559; reference tx_circuit.rs tx_type
    # + the access-list table section)
    TX_TYPE = 17
    MAX_PRIORITY_FEE = 18
    MAX_FEE = 19
    ACCESS_LIST_ADDRESSES_LEN = 20
    ACCESS_LIST_KEYS_LEN = 21
    ACCESS_LIST_ADDRESS = 22  # AL region rows: index = item position
    ACCESS_LIST_STORAGE_KEY = 23  # AL region rows: index = flat key pos


# field-row order inside a tx block (row index -> tag)
FIELD_TAGS = [
    TxFieldTag.NONCE, TxFieldTag.GAS_PRICE, TxFieldTag.GAS,
    TxFieldTag.CALLER_ADDRESS, TxFieldTag.CALLEE_ADDRESS,
    TxFieldTag.IS_CREATE, TxFieldTag.VALUE, TxFieldTag.CALL_DATA_LENGTH,
    TxFieldTag.CALL_DATA_GAS_COST, TxFieldTag.SIG_V, TxFieldTag.SIG_R,
    TxFieldTag.SIG_S, TxFieldTag.TX_SIGN_HASH, TxFieldTag.TX_HASH,
    TxFieldTag.CHAIN_ID, TxFieldTag.TX_TYPE, TxFieldTag.MAX_PRIORITY_FEE,
    TxFieldTag.MAX_FEE, TxFieldTag.ACCESS_LIST_ADDRESSES_LEN,
    TxFieldTag.ACCESS_LIST_KEYS_LEN,
]
NFIELDS = len(FIELD_TAGS)
ROW = {t: i for i, t in enumerate(FIELD_TAGS)}


@dataclass
class TxTable:
    """Lookup surface over the field + calldata rows: (enabled, tx_id,
    tag, index, value_lo, value_hi). enabled = is_real gates out unused
    slots (table.rs:208 TxTable)."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        """inputs: 6 expressions [enabled, tx_id, tag, index, value_lo,
        value_hi], already gated (all-zero when the consumer is off)."""
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class TxConfig:
    cd_cap: int  # calldata bytes per tx slot
    rlp_cap: int  # rlp-stream bytes per tx slot (each of the 2 streams)
    # fixed structure
    q_blk: Column  # every block row
    q_blk_gt0: Column  # every block row but the first
    q_tt: Column  # TxTable rows (field + calldata)
    tag: Column
    index: Column
    tx_id: Column
    q_cd0: Column  # first calldata row of each block
    q_cd_gt0: Column
    q_cd_last: Column
    q_cd: Column  # all calldata rows
    q_rlp0: Column  # first row of each rlp stream
    q_rlp_gt0: Column
    q_rlp: Column
    q_rlpu_last: Column  # last row of the unsigned stream
    q_rlps_last: Column
    # advice
    is_real: Column  # slot-in-use flag (block-constant boolean)
    value_lo: Column
    value_hi: Column
    is_act: Column  # calldata/rlp active flag
    aux: Column  # calldata: carried CallDataLength; rlp: running length
    gc_acc: Column  # calldata gas-cost accumulator
    inv: Column  # inverse witness for byte!=0 (calldata rows)
    rlc: Column  # phase-1 running keccak_input RLC (rlp rows)
    rt8: RangeTable
    challenges: Challenges
    table: TxTable
    # ecrecover bridge (present iff an AddrTable was given)
    addr_table: object = None
    q_sig: Column = None  # block-base row: the AddrTable lookup row
    q_sb: Column = None  # rows 0..127 of each block: the sig byte strip
    sb: Column = None  # hash(32) | z(32) | r(32) | s(32), big-endian
    # access-list table region (EIP-2930/1559): fixed-tag subregions
    # right after the calldata rows
    al_addr_cap: int = 4  # address rows per tx slot
    al_key_cap: int = 8  # storage-key rows per tx slot

    @property
    def al_cap(self) -> int:
        return self.al_addr_cap + self.al_key_cap

    @property
    def block(self) -> int:
        return NFIELDS + self.cd_cap + self.al_cap + 2 * self.rlp_cap


def configure(
    cs: ConstraintSystem,
    challenges: Challenges,
    keccak_table: KeccakTable,
    *,
    cd_cap: int = 64,
    rlp_cap: int = 160,
    rt8: RangeTable | None = None,
    addr_table=None,
    al_addr_cap: int = 4,
    al_key_cap: int = 8,
) -> TxConfig:
    al_cap = al_addr_cap + al_key_cap
    q_blk = cs.fixed_column()
    q_blk_gt0 = cs.fixed_column()
    q_tt = cs.fixed_column()
    tag = cs.fixed_column()
    index = cs.fixed_column()
    tx_id = cs.fixed_column()
    q_cd0 = cs.fixed_column()
    q_cd_gt0 = cs.fixed_column()
    q_cd_last = cs.fixed_column()
    q_cd = cs.fixed_column()
    q_rlp0 = cs.fixed_column()
    q_rlp_gt0 = cs.fixed_column()
    q_rlp = cs.fixed_column()
    q_rlpu_last = cs.fixed_column()
    q_rlps_last = cs.fixed_column()
    is_real = cs.advice_column()
    value_lo = cs.advice_column()
    value_hi = cs.advice_column()
    is_act = cs.advice_column()
    aux = cs.advice_column()
    gc_acc = cs.advice_column()
    inv = cs.advice_column()
    rlc = cs.advice_column(phase=1)
    rt8 = rt8 or RangeTable.configure(cs, 8)

    one = Const(1)
    act = is_act.cur()
    byte = value_lo.cur()
    real = is_real.cur()

    # -- slot flag --------------------------------------------------------
    cs.create_gate("tx_real", [
        q_blk.cur() * real * (one - real),
        q_blk_gt0.cur() * (real - is_real.prev()),
    ])

    # -- calldata rows ----------------------------------------------------
    # aux carries CallDataLength down the calldata rows; the active flag
    # is 1 exactly on rows with index < CallDataLength.
    cdl_rot = -(NFIELDS - ROW[TxFieldTag.CALL_DATA_LENGTH])  # from cd0
    # from cd_last (= block row NFIELDS + cd_cap - 1) back to the
    # gas-cost field row:
    gc_rot = -((NFIELDS + cd_cap - 1) - ROW[TxFieldTag.CALL_DATA_GAS_COST])
    nz = byte * inv.cur()  # 1 iff byte != 0 (pinned below)
    cs.create_gate("tx_calldata", [
        q_cd.cur() * act * (one - act),
        q_cd_gt0.cur() * (aux.cur() - aux.prev()),
        q_cd0.cur() * (aux.cur() - value_lo.rot(cdl_rot)),
        # monotone: act can only fall
        q_cd_gt0.cur() * (is_act.prev() - act) * (one - is_act.prev() + act),
        # flip row: index == CallDataLength
        q_cd_gt0.cur() * (is_act.prev() - act) * (index.cur() - aux.cur()),
        q_cd0.cur() * (one - act) * aux.cur(),  # empty calldata => cdl 0
        q_cd_last.cur() * act * (aux.cur() - Const(cd_cap)),  # full slot
        # padding bytes are zero; value_hi always zero on calldata rows
        q_cd.cur() * (one - act) * byte,
        q_cd.cur() * value_hi.cur(),
        # byte-nonzero witness: nz boolean via IsZero-style pinning
        q_cd.cur() * byte * (one - nz),
        q_cd.cur() * inv.cur() * (one - nz),
        # gas accumulator: +4 per zero byte, +16 per non-zero (active only)
        q_cd0.cur() * (gc_acc.cur() - act * (Const(4) + Const(12) * nz)),
        q_cd_gt0.cur() * (
            gc_acc.cur() - gc_acc.prev() - act * (Const(4) + Const(12) * nz)
        ),
        q_cd_last.cur() * (gc_acc.cur() - value_lo.rot(gc_rot)),
    ])
    rt8.lookup(cs, "tx_cd_u8", [q_cd.cur() * byte])

    # -- rlp streams ------------------------------------------------------
    r = challenges.keccak_input.expr()
    cs.create_gate("tx_rlp", [
        q_rlp.cur() * act * (one - act),
        q_rlp0.cur() * (act - real),  # real slots: streams never empty
        q_rlp_gt0.cur() * (is_act.prev() - act) * (one - is_act.prev() + act),
        q_rlp.cur() * (one - act) * byte,
        q_rlp.cur() * value_hi.cur(),
        # running length (aux) over active rows
        q_rlp0.cur() * (aux.cur() - act),
        q_rlp_gt0.cur() * (aux.cur() - aux.prev() - act),
        # running RLC over active rows (phase 1)
        q_rlp0.cur() * (rlc.cur() - byte),
        q_rlp_gt0.cur() * (
            rlc.cur() - (act * (rlc.prev() * r + byte) + (one - act) * rlc.prev())
        ),
    ])
    rt8.lookup(cs, "tx_rlp_u8", [q_rlp.cur() * byte])

    # -- hash binding through the KeccakTable -----------------------------
    # unsigned stream end -> TxSignHash field row; signed -> TxHash.
    u_last = NFIELDS + cd_cap + al_cap + rlp_cap - 1
    s_last = NFIELDS + cd_cap + al_cap + 2 * rlp_cap - 1
    rot_u = -(u_last - ROW[TxFieldTag.TX_SIGN_HASH])
    rot_s = -(s_last - ROW[TxFieldTag.TX_HASH])
    qu = q_rlpu_last.cur() * real
    qs_ = q_rlps_last.cur() * real
    keccak_table.lookup_word(
        cs, "tx_sign_hash", qu, rlc.cur(), aux.cur(),
        value_lo.rot(rot_u), value_hi.rot(rot_u),
    )
    keccak_table.lookup_word(
        cs, "tx_hash", qs_, rlc.cur(), aux.cur(),
        value_lo.rot(rot_s), value_hi.rot(rot_s),
    )

    # -- field-row structure ----------------------------------------------
    # anchored on the first calldata row (constant offsets to field rows):
    # IsCreate boolean; IsCreate * callee == 0 (v1: calls only).
    icr = value_lo.rot(-(NFIELDS - ROW[TxFieldTag.IS_CREATE]))
    callee_lo = value_lo.rot(-(NFIELDS - ROW[TxFieldTag.CALLEE_ADDRESS]))
    cs.create_gate("tx_fields", [
        q_cd0.cur() * icr * (one - icr),
        q_cd0.cur() * icr * callee_lo,
    ])

    # -- ecrecover bridge: TxTable <-> Sig circuit AddrTable --------------
    # (reference: the SigTable lookup wiring in tx_circuit.rs; here the
    # full statement is: CALLER_ADDRESS = ecrecover(sign_hash, v, r, s))
    q_sig = q_sb = sb = None
    if addr_table is not None:
        block_rows = NFIELDS + cd_cap + al_cap + 2 * rlp_cap
        assert block_rows >= 128, "tx block too small for the sig strip"
        q_sig = cs.fixed_column()
        q_sb = cs.fixed_column()
        sb = cs.advice_column()
        rt8.lookup(cs, "tx_sb_u8", [q_sb.cur() * sb.cur()])
        g = q_sig.cur() * real

        def half_sums(start: int):
            lo, hi = Const(0), Const(0)
            for j in range(16, 32):
                lo = lo + Const(1 << (8 * (31 - j))) * sb.rot(start + j)
            for j in range(16):
                hi = hi + Const(1 << (8 * (15 - j))) * sb.rot(start + j)
            return lo, hi

        def limb_sums(start: int):
            out = []
            for lob, hib, sh in ((21, 32, 0), (10, 21, 88), (0, 10, 176)):
                acc = Const(0)
                for j in range(lob, hib):
                    acc = acc + Const(1 << (8 * (31 - j) - sh)) * sb.rot(start + j)
                out.append(acc)
            return out

        hlo, hhi = half_sums(0)
        zlo, zhi = half_sums(32)
        rlo, rhi = half_sums(64)
        slo, shi = half_sums(96)
        fv = lambda t: value_lo.rot(ROW[t])
        fvh = lambda t: value_hi.rot(ROW[t])
        ty = fv(TxFieldTag.TX_TYPE)
        inv2 = pow(2, FR_MOD - 2, FR_MOD)
        leg = Const(inv2) * (ty - one) * (ty - Const(2))  # 1 iff ty == 0
        qb, bb, vp = inv.cur(), inv.rot(1), inv.rot(2)
        cs.create_gate("tx_sig_bridge", [
            # byte strip == the field-row halves (exact: bytes are u8)
            g * (hlo - fv(TxFieldTag.TX_SIGN_HASH)),
            g * (hhi - fvh(TxFieldTag.TX_SIGN_HASH)),
            g * (rlo - fv(TxFieldTag.SIG_R)),
            g * (rhi - fvh(TxFieldTag.SIG_R)),
            g * (slo - fv(TxFieldTag.SIG_S)),
            g * (shi - fvh(TxFieldTag.SIG_S)),
            # z = sign_hash mod n: hash = q*n + z with borrow chaining
            # (q, b boolean; hash < 2^256 < 2n so q is a single bit)
            g * qb * (one - qb),
            g * bb * (one - bb),
            g * (zlo - hlo + qb * Const(N_LO) - bb * Const(1 << 128)),
            g * (zhi - hhi + qb * Const(N_HI) + bb),
            # recovery parity: legacy (tx_type 0) v = 2*chain_id + 35 +
            # parity (EIP-155); typed (1/2) v IS the parity
            g * vp * (one - vp),
            g * ty * (ty - one) * (ty - Const(2)),  # tx_type in {0,1,2}
            g * (fv(TxFieldTag.SIG_V)
                 - leg * (Const(2) * fv(TxFieldTag.CHAIN_ID) + Const(35))
                 - vp),
            g * fvh(TxFieldTag.SIG_V),
            g * fvh(TxFieldTag.CHAIN_ID),
            g * fvh(TxFieldTag.TX_TYPE),
        ])
        addr_table.lookup(cs, "tx_sig_addr", [g]
            + [g * e for e in limb_sums(32)]
            + [g * e for e in limb_sums(64)]
            + [g * e for e in limb_sums(96)]
            + [g * vp,
               g * fv(TxFieldTag.CALLER_ADDRESS),
               g * fvh(TxFieldTag.CALLER_ADDRESS)])

    table = TxTable([
        q_tt.cur() * real,
        q_tt.cur() * real * tx_id.cur(),
        q_tt.cur() * real * tag.cur(),
        q_tt.cur() * real * index.cur(),
        q_tt.cur() * real * value_lo.cur(),
        q_tt.cur() * real * value_hi.cur(),
    ])

    return TxConfig(
        cd_cap, rlp_cap, q_blk, q_blk_gt0, q_tt, tag, index, tx_id,
        q_cd0, q_cd_gt0, q_cd_last, q_cd, q_rlp0, q_rlp_gt0, q_rlp,
        q_rlpu_last, q_rlps_last, is_real, value_lo, value_hi, is_act,
        aux, gc_acc, inv, rlc, rt8, challenges, table,
        addr_table, q_sig, q_sb, sb,
        al_addr_cap=al_addr_cap, al_key_cap=al_key_cap,
    )


def num_tx_slots(cs: ConstraintSystem, n: int, cfg: TxConfig) -> int:
    return cs.usable_rows(n) // cfg.block


@dataclass
class TxWitness:
    asg: Assignment
    cfg: TxConfig
    txs: list[Transaction]
    streams: list  # (block_base, stream_row0, bytes) per stream

    def fill_phase1(self, r_keccak: int) -> None:
        for base, row0, data in self.streams:
            acc = 0
            for i in range(self.cfg.rlp_cap):
                if i < len(data):
                    acc = (acc * r_keccak + data[i]) % FR_MOD
                self.asg.set_int(self.cfg.rlc, base + row0 + i, acc)

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


def sig_inputs(txs: list[Transaction]) -> list:
    """(z, pubkey, r, s) tuples for the Sig circuit regions, one per tx
    (the Sig side reduces z mod n itself; pubkey via host ecrecover)."""
    from zkevm_tpu.ec import secp256k1 as s256

    out = []
    for tx in txs:
        h = int.from_bytes(tx.sign_hash(), "big")
        pub = s256.ecrecover(h, tx.sig_parity, tx.r, tx.s)
        out.append((h, pub, tx.r, tx.s))
    return out


def keccak_messages(txs: list[Transaction]) -> list[bytes]:
    """The keccak-table inputs this circuit's lookups require."""
    out = []
    for tx in txs:
        out.append(tx.rlp_unsigned())
        out.append(tx.rlp_signed())
    return out


def assign(
    cs: ConstraintSystem,
    cfg: TxConfig,
    n: int,
    txs: list[Transaction],
    asg: Assignment | None = None,
) -> TxWitness:
    asg = asg if asg is not None else Assignment(cs, n)
    cfg.rt8.load(asg)
    nslots = num_tx_slots(cs, n, cfg)
    assert len(txs) <= nslots, f"{len(txs)} txs > {nslots} slots"
    one = FR.encode(1)
    B = cfg.block
    streams = []

    for slot in range(nslots):
        base = slot * B
        tid = slot + 1
        # fixed structure (every slot, used or not)
        asg.cols[cfg.q_blk][base : base + B] = one
        asg.cols[cfg.q_blk_gt0][base + 1 : base + B] = one
        asg.cols[cfg.q_tt][
            base : base + NFIELDS + cfg.cd_cap + cfg.al_cap] = one
        for i, t in enumerate(FIELD_TAGS):
            asg.set_int(cfg.tag, base + i, int(t))
            asg.set_int(cfg.tx_id, base + i, tid)
        cd0 = base + NFIELDS
        asg.set_int(cfg.q_cd0, cd0, 1)
        asg.cols[cfg.q_cd][cd0 : cd0 + cfg.cd_cap] = one
        asg.cols[cfg.q_cd_gt0][cd0 + 1 : cd0 + cfg.cd_cap] = one
        asg.set_int(cfg.q_cd_last, cd0 + cfg.cd_cap - 1, 1)
        for i in range(cfg.cd_cap):
            asg.set_int(cfg.tag, cd0 + i, int(TxFieldTag.CALL_DATA))
            asg.set_int(cfg.index, cd0 + i, i)
            asg.set_int(cfg.tx_id, cd0 + i, tid)
        # access-list subregions: fixed tags + indices
        al0 = cd0 + cfg.cd_cap
        for i in range(cfg.al_addr_cap):
            asg.set_int(cfg.tag, al0 + i,
                        int(TxFieldTag.ACCESS_LIST_ADDRESS))
            asg.set_int(cfg.index, al0 + i, i)
            asg.set_int(cfg.tx_id, al0 + i, tid)
        alk0 = al0 + cfg.al_addr_cap
        for i in range(cfg.al_key_cap):
            asg.set_int(cfg.tag, alk0 + i,
                        int(TxFieldTag.ACCESS_LIST_STORAGE_KEY))
            asg.set_int(cfg.index, alk0 + i, i)
            asg.set_int(cfg.tx_id, alk0 + i, tid)
        for si in range(2):
            r0 = NFIELDS + cfg.cd_cap + cfg.al_cap + si * cfg.rlp_cap
            asg.set_int(cfg.q_rlp0, base + r0, 1)
            asg.cols[cfg.q_rlp][base + r0 : base + r0 + cfg.rlp_cap] = one
            asg.cols[cfg.q_rlp_gt0][base + r0 + 1 : base + r0 + cfg.rlp_cap] = one
            # rlp rows carry the slot's tx_id too (the RLP circuit's
            # field-value lookups key off it)
            for i in range(cfg.rlp_cap):
                asg.set_int(cfg.tx_id, base + r0 + i, tid)
        asg.set_int(cfg.q_rlpu_last,
                    base + NFIELDS + cfg.cd_cap + cfg.al_cap
                    + cfg.rlp_cap - 1, 1)
        asg.set_int(cfg.q_rlps_last, base + B - 1, 1)
        if cfg.addr_table is not None:
            asg.set_int(cfg.q_sig, base, 1)
            asg.cols[cfg.q_sb][base : base + 128] = one

        if slot >= len(txs):
            continue  # unused slot: is_real = 0, all advice zero
        tx = txs[slot]
        assert len(tx.data) <= cfg.cd_cap, "calldata exceeds slot capacity"
        asg.cols[cfg.is_real][base : base + B] = one

        def put_field(t: TxFieldTag, v: int):
            asg.set_int(cfg.value_lo, base + ROW[t], v & M128)
            asg.set_int(cfg.value_hi, base + ROW[t], v >> 128)

        put_field(TxFieldTag.NONCE, tx.nonce)
        put_field(TxFieldTag.GAS_PRICE, tx.gas_price)
        put_field(TxFieldTag.GAS, tx.gas)
        put_field(TxFieldTag.CALLER_ADDRESS, tx.caller)
        put_field(TxFieldTag.CALLEE_ADDRESS, tx.to or 0)
        put_field(TxFieldTag.IS_CREATE, int(tx.is_create))
        put_field(TxFieldTag.VALUE, tx.value)
        put_field(TxFieldTag.CALL_DATA_LENGTH, len(tx.data))
        put_field(TxFieldTag.CALL_DATA_GAS_COST, tx.call_data_gas_cost())
        put_field(TxFieldTag.SIG_V, tx.v)
        put_field(TxFieldTag.SIG_R, tx.r)
        put_field(TxFieldTag.SIG_S, tx.s)
        put_field(TxFieldTag.TX_SIGN_HASH, int.from_bytes(tx.sign_hash(), "big"))
        put_field(TxFieldTag.TX_HASH, int.from_bytes(tx.hash(), "big"))
        put_field(TxFieldTag.CHAIN_ID, tx.chain_id)
        put_field(TxFieldTag.TX_TYPE, tx.tx_type)
        put_field(TxFieldTag.MAX_PRIORITY_FEE, tx.max_priority_fee_per_gas)
        put_field(TxFieldTag.MAX_FEE, tx.max_fee_per_gas)
        put_field(TxFieldTag.ACCESS_LIST_ADDRESSES_LEN,
                  len(tx.access_list))
        put_field(TxFieldTag.ACCESS_LIST_KEYS_LEN,
                  sum(len(k) for _, k in tx.access_list))
        # access-list rows
        assert len(tx.access_list) <= cfg.al_addr_cap, \
            "access-list addresses exceed slot capacity"
        kflat = 0
        al0_s = base + NFIELDS + cfg.cd_cap
        alk0_s = al0_s + cfg.al_addr_cap
        for i, (a_, keys) in enumerate(tx.access_list):
            asg.set_int(cfg.value_lo, al0_s + i, a_ & M128)
            asg.set_int(cfg.value_hi, al0_s + i, a_ >> 128)
            for k_ in keys:
                assert kflat < cfg.al_key_cap, \
                    "access-list keys exceed slot capacity"
                asg.set_int(cfg.value_lo, alk0_s + kflat, k_ & M128)
                asg.set_int(cfg.value_hi, alk0_s + kflat, k_ >> 128)
                kflat += 1

        # calldata rows
        gacc = 0
        for i in range(cfg.cd_cap):
            row = cd0 + i
            if i < len(tx.data):
                b = tx.data[i]
                asg.set_int(cfg.is_act, row, 1)
                gacc += 4 if b == 0 else 16
                asg.set_int(cfg.value_lo, row, b)
                if b:
                    asg.set_int(cfg.inv, row, pow(b, FR_MOD - 2, FR_MOD))
            asg.set_int(cfg.aux, row, len(tx.data))
            asg.set_int(cfg.gc_acc, row, gacc)

        # ecrecover bridge strip + mod-n reduction witnesses
        if cfg.addr_table is not None:
            h = int.from_bytes(tx.sign_hash(), "big")
            q = h // SECP_N
            z = h % SECP_N
            assert q in (0, 1)
            b = (((z & M128) - (h & M128) + q * N_LO) >> 128) & 1
            strip = (h.to_bytes(32, "big") + z.to_bytes(32, "big")
                     + tx.r.to_bytes(32, "big") + tx.s.to_bytes(32, "big"))
            for i, bt in enumerate(strip):
                asg.set_int(cfg.sb, base + i, bt)
            asg.set_int(cfg.inv, base, q)
            asg.set_int(cfg.inv, base + 1, b)
            asg.set_int(cfg.inv, base + 2, tx.sig_parity)

        # rlp streams
        for si, data in enumerate([tx.rlp_unsigned(), tx.rlp_signed()]):
            assert 0 < len(data) <= cfg.rlp_cap, "rlp exceeds slot capacity"
            r0 = NFIELDS + cfg.cd_cap + cfg.al_cap + si * cfg.rlp_cap
            for i in range(cfg.rlp_cap):
                row = base + r0 + i
                if i < len(data):
                    asg.set_int(cfg.is_act, row, 1)
                    asg.set_int(cfg.value_lo, row, data[i])
                asg.set_int(cfg.aux, row, min(i + 1, len(data)))
            streams.append((base, r0, data))

    return TxWitness(asg, cfg, txs, streams)
