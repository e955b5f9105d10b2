"""RLP circuit: proves the Tx circuit's RLP byte streams really encode
its field rows.

Reference counterpart: zkevm-circuits/src/rlp_circuit_fsm.rs:40 — a
byte-stream finite-state machine that decodes each transaction's RLP and
exports the decoded (tag, value) pairs for the Tx circuit. The reference
handles every tx format with ROM-table-driven tag transitions; this v1
is specialized to the legacy (EIP-155) 9-item list — the format the rest
of the stack produces — with the same structure: a per-row state one-hot,
byte-exact prefix decoding (incl. canonical-encoding minimality checks),
and per-field value binding through TxTable lookups.

Operates IN PLACE over the Tx circuit's rlp stream rows (tx_circuit.py:
`value_lo` is the byte, `is_act` the active flag, `tx_id` the fixed slot
id): `configure(cs, txcfg)` registers additional columns + gates on the
same rows, so stream bytes are shared by construction — what gets hashed
(the tx circuit's keccak binding) is exactly what is decoded here.

Per-row FSM states:
    LP  list prefix byte (first row of each stream)
    LL  extra list-length bytes (lists > 55 payload bytes)
    FP  field prefix byte — or the whole field when it is a single
        byte < 0x80 / the empty string 0x80
    SL  extra string-length bytes (only the data field can be > 55)
    PAY payload byte
    END inactive rows (stream exhausted)

What is constrained:
- prefix byte cases with exact ranges (single/empty/short/long), list
  payload length == remaining stream length, canonical minimality
  (no leading zero length bytes; one-byte strings >= 0x80);
- a 9-entry field one-hot that advances exactly on field completion;
  field K's decoded (lo, hi) value — big-endian split at 16 bytes via a
  cnt-pinned in_hi flag — is looked up in the TxTable under the right
  tag for the stream (unsigned: ... chain_id, 0, 0 / signed: ... v, r, s);
- the `to` field is a 20-byte string; the data field's payload bytes are
  looked up per-byte against the TxTable's CALL_DATA rows and its length
  against CALL_DATA_LENGTH, so calldata, RLP bytes, and the keccak'd
  stream all agree.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.circuits.tx_circuit import TxConfig, TxFieldTag
from zkevm_tpu.etypes.tx import Transaction, rlp_encode
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

FR = fr_spec()
M128 = (1 << 128) - 1

NFIELD = 9
# TxTable tag per field index, per stream (None = no value lookup)
TAGS_U = [TxFieldTag.NONCE, TxFieldTag.GAS_PRICE, TxFieldTag.GAS,
          TxFieldTag.CALLEE_ADDRESS, TxFieldTag.VALUE, None,
          TxFieldTag.CHAIN_ID, None, None]
TAGS_S = [TxFieldTag.NONCE, TxFieldTag.GAS_PRICE, TxFieldTag.GAS,
          TxFieldTag.CALLEE_ADDRESS, TxFieldTag.VALUE, None,
          TxFieldTag.SIG_V, TxFieldTag.SIG_R, TxFieldTag.SIG_S]
F_TO = 3
F_DATA = 5

# state indices
LP, LL, FP, SL, PAY, END = range(6)


@dataclass
class RlpConfig:
    tx: TxConfig
    sgn: Column  # fixed: 1 on signed-stream rows
    st: list  # 6 state one-hot columns
    fv: list  # 9 field one-hot columns
    sgl: Column  # FP case flags
    zstr: Column
    sht: Column
    lng: Column
    ls_long: Column  # LP case flag (long list)
    lst: Column  # cnt == 1 (on LL/SL/PAY rows)
    cinv: Column  # inverse witness for cnt-1
    binv: Column  # inverse witness for byte (minimality rows)
    in_hi: Column  # payload byte goes to the hi half
    cnt: Column  # run countdown (length bytes / payload bytes)
    trem: Column  # list payload bytes remaining
    plen: Column  # current field payload length
    acc_lo: Column  # big-endian field value accumulators
    acc_hi: Column


def configure(cs: ConstraintSystem, txcfg: TxConfig) -> RlpConfig:
    sgn = cs.fixed_column()
    st = [cs.advice_column() for _ in range(6)]
    fv = [cs.advice_column() for _ in range(NFIELD)]
    sgl = cs.advice_column()
    zstr = cs.advice_column()
    sht = cs.advice_column()
    lng = cs.advice_column()
    ls_long = cs.advice_column()
    lst = cs.advice_column()
    cinv = cs.advice_column()
    binv = cs.advice_column()
    in_hi = cs.advice_column()
    cnt = cs.advice_column()
    trem = cs.advice_column()
    plen = cs.advice_column()
    acc_lo = cs.advice_column()
    acc_hi = cs.advice_column()

    one = Const(1)
    q = txcfg.q_rlp.cur()  # all stream rows
    q0 = txcfg.q_rlp0.cur()  # first row of each stream
    qg = txcfg.q_rlp_gt0.cur()  # within-stream rows (prev is same stream)
    b = txcfg.value_lo.cur()  # the stream byte
    act = txcfg.is_act.cur()
    rt8 = txcfg.rt8

    S = [c.cur() for c in st]
    SP = [c.prev() for c in st]
    F = [c.cur() for c in fv]
    FP_ = [c.prev() for c in fv]

    # -- state structure --------------------------------------------------
    ssum = Const(0)
    for s in S:
        ssum = ssum + s
    cs.create_gate("rlp_state", [
        q * s * (one - s) for s in S
    ] + [
        q * (ssum - one),
        q0 * (S[LP] - act),  # active streams start at LP; empty: END
        (q - q0) * S[LP],  # LP only on the first row
        q * (S[END] - (one - act)),  # END <=> inactive
    ])

    # -- field one-hot ----------------------------------------------------
    # advance on completion: done = FP*(sgl+zstr) + PAY*lst
    done = S[FP] * (sgl.cur() + zstr.cur()) + S[PAY] * lst.cur()
    done_p = SP[FP] * (sgl.prev() + zstr.prev()) + SP[PAY] * lst.prev()
    fsum = Const(0)
    for f in F:
        fsum = fsum + f
    cs.create_gate("rlp_fields", [
        q * f * (one - f) for f in F
    ] + [
        q * (fsum - (one - S[END])),  # exactly one field while decoding
        q0 * (F[0] - act),
    ] + [
        qg * (F[j] - ((one - done_p) * FP_[j]
                      + (done_p * FP_[j - 1] if j > 0 else Const(0))))
        for j in range(NFIELD)
    ])

    # -- byte-case flags with exact prefix ranges -------------------------
    for c in (sgl, zstr, sht, lng, ls_long, lst, in_hi):
        cs.create_gate(f"rlp_bool_{c.index}", [q * c.cur() * (one - c.cur())])
    cs.create_gate("rlp_fp_cases", [
        q * S[FP] * (sgl.cur() + zstr.cur() + sht.cur() + lng.cur() - one),
        q * S[FP] * zstr.cur() * (b - Const(0x80)),
        # plen per case
        q * S[FP] * sgl.cur() * (plen.cur() - one),
        q * S[FP] * zstr.cur() * plen.cur(),
        q * S[FP] * sht.cur() * (plen.cur() - b + Const(0x80)),
        q * S[FP] * lng.cur() * plen.cur(),  # accumulated by SL rows
        # long strings only for the data field
        q * S[FP] * lng.cur() * (one - F[F_DATA]),
        # accumulators start fresh: the single-byte case IS the value
        q * S[FP] * (acc_lo.cur() - sgl.cur() * b),
        q * S[FP] * acc_hi.cur(),
    ])
    # range pins (conditional u8 lookups: flag*expr must land in [0,256))
    rt8.lookup(cs, "rlp_rng", [
        S[FP] * sgl.cur() * (Const(0x7F) - b),
        S[FP] * sht.cur() * (b - Const(0x81)),
        S[FP] * sht.cur() * (Const(0xB7) - b),
        S[FP] * lng.cur() * (b - Const(0xB8)),
        S[FP] * lng.cur() * (Const(0xBF) - b),
        S[LP] * (one - ls_long.cur()) * (b - Const(0xC0)),
        S[LP] * (one - ls_long.cur()) * (Const(0xF7) - b),
        S[LP] * ls_long.cur() * (b - Const(0xF8)),
        # in_hi pins: in_hi -> cnt >= 17; PAY & !in_hi -> cnt <= 16
        in_hi.cur() * (cnt.cur() - Const(17)),
        S[PAY] * (one - in_hi.cur()) * (Const(16) - cnt.cur()),
    ])

    # -- lst = (cnt == 1) on countdown rows -------------------------------
    run = S[LL] + S[SL] + S[PAY]
    cs.create_gate("rlp_lst", [
        q * run * (cnt.cur() - one) * lst.cur(),
        q * run * (lst.cur() + (cnt.cur() - one) * cinv.cur() - one),
    ])

    # -- state transitions (within a stream) ------------------------------
    first_of = lambda i: S[i] * (one - SP[i])
    cs.create_gate("rlp_trans", [
        # LP exits: long -> LL with cnt = lenlen; short -> FP
        qg * SP[LP] * ls_long.prev() * (one - S[LL]),
        qg * SP[LP] * (one - ls_long.prev()) * (one - S[FP]),
        qg * first_of(LL) * SP[LP] * (cnt.cur() - txcfg.value_lo.prev()
                                      + Const(0xF7)),
        # LL chain / exit
        qg * SP[LL] * (one - lst.prev()) * (one - S[LL]),
        qg * SP[LL] * lst.prev() * (one - S[FP]),
        qg * S[LL] * SP[LL] * (cnt.cur() - cnt.prev() + one),
        # FP exits
        qg * SP[FP] * (sgl.prev() + zstr.prev()) * (one - S[FP] - S[END]),
        qg * SP[FP] * sht.prev() * (one - S[PAY]),
        qg * SP[FP] * lng.prev() * (one - S[SL]),
        # SL: cnt = lenlen on entry; accumulate plen; exit to PAY
        qg * first_of(SL) * (cnt.cur() - txcfg.value_lo.prev()
                             + Const(0xB7)),
        qg * S[SL] * SP[SL] * (cnt.cur() - cnt.prev() + one),
        qg * S[SL] * (plen.cur() - Const(256) * plen.prev() - b),
        qg * SP[SL] * (one - lst.prev()) * (one - S[SL]),
        qg * SP[SL] * lst.prev() * (one - S[PAY]),
        # PAY: entry cnt = plen; chain; exit
        qg * first_of(PAY) * (cnt.cur() - plen.prev()),
        qg * S[PAY] * (plen.cur() - plen.prev()),
        qg * S[PAY] * SP[PAY] * (cnt.cur() - cnt.prev() + one),
        qg * SP[PAY] * (one - lst.prev()) * (one - S[PAY]),
        qg * SP[PAY] * lst.prev() * (one - S[FP] - S[END]),
        # END is absorbing and only enterable on field-9 completion
        qg * SP[END] * (one - S[END]),
        qg * S[END] * (one - SP[END]) * (one - done_p * FP_[NFIELD - 1]),
    ])

    # -- canonical minimality --------------------------------------------
    # first LL/SL byte nonzero; one-byte short strings must be >= 0x80
    cs.create_gate("rlp_minimal", [
        qg * first_of(LL) * (one - b * binv.cur()),
        qg * first_of(SL) * (one - b * binv.cur()),
        # int fields (not `to`, not data): first payload byte nonzero
        qg * first_of(PAY) * (one - F[F_TO] - F[F_DATA])
        * (one - b * binv.cur()),
    ])
    rt8.lookup(cs, "rlp_min1", [
        # a 1-byte short string's payload must be >= 0x80 (else the
        # single-byte form was mandatory)
        qg * S[PAY] * SP[FP] * sht.prev() * lst.cur() * (b - Const(0x80)),
    ])

    # -- list payload length == remaining stream --------------------------
    cs.create_gate("rlp_trem", [
        q * S[LP] * (one - ls_long.cur()) * (trem.cur() - b + Const(0xC0)),
        q * S[LP] * ls_long.cur() * trem.cur(),
        qg * S[LL] * (trem.cur() - Const(256) * trem.prev() - b),
        qg * (S[FP] + S[SL] + S[PAY]) * (trem.cur() - trem.prev() + one),
        # stream end: trem hits zero exactly when act falls...
        qg * (txcfg.is_act.prev() - act) * trem.prev(),
        # ...or at full capacity
        (txcfg.q_rlpu_last.cur() + txcfg.q_rlps_last.cur()) * act
        * trem.cur(),
    ])

    # -- value accumulation ----------------------------------------------
    ih = in_hi.cur()
    cs.create_gate("rlp_acc", [
        # length-byte rows keep the accumulators parked at zero so the
        # SL -> PAY chain starts clean
        q * S[SL] * acc_lo.cur(),
        q * S[SL] * acc_hi.cur(),
        qg * S[PAY] * (acc_hi.cur()
                       - ih * (Const(256) * acc_hi.prev() + b)
                       - (one - ih) * acc_hi.prev()),
        qg * S[PAY] * (acc_lo.cur()
                       - (one - ih) * (Const(256) * acc_lo.prev() + b)
                       - ih * acc_lo.prev()),
        # `to` is a 20-byte string
        q * S[FP] * F[F_TO] * (one - sht.cur()),
        q * S[FP] * F[F_TO] * (plen.cur() - Const(20)),
        # unsigned fields 7/8 are the EIP-155 zero placeholders
        q * S[FP] * (one - _sgn(sgn)) * (F[7] + F[8]) * (one - zstr.cur()),
    ])

    # -- TxTable bindings -------------------------------------------------
    table = txcfg.table
    ZERO = Const(0)
    sg = _sgn(sgn)
    tag_e = Const(0)
    has = Const(0)
    for j in range(NFIELD):
        tu = TAGS_U[j]
        ts = TAGS_S[j]
        e_u = Const(int(tu)) if tu is not None else Const(0)
        e_s = Const(int(ts)) if ts is not None else Const(0)
        h_u = one if tu is not None else Const(0)
        h_s = one if ts is not None else Const(0)
        tag_e = tag_e + F[j] * ((one - sg) * e_u + sg * e_s)
        has = has + F[j] * ((one - sg) * h_u + sg * h_s)
    en_v = done * has  # deg <= 4
    table.lookup(cs, "rlp_value", [
        en_v, en_v * txcfg.tx_id.cur(), en_v * tag_e, ZERO,
        en_v * acc_lo.cur(), en_v * acc_hi.cur(),
    ])
    # data payload bytes <-> CALL_DATA rows; index = plen - cnt
    en_d = S[PAY] * F[F_DATA]
    table.lookup(cs, "rlp_data_byte", [
        en_d, en_d * txcfg.tx_id.cur(), en_d * Const(int(TxFieldTag.CALL_DATA)),
        en_d * (plen.cur() - cnt.cur()), en_d * b, ZERO,
    ])
    # single-byte data: the FP row is the payload byte at index 0
    en_d1 = S[FP] * F[F_DATA] * sgl.cur()
    table.lookup(cs, "rlp_data_byte1", [
        en_d1, en_d1 * txcfg.tx_id.cur(),
        en_d1 * Const(int(TxFieldTag.CALL_DATA)), ZERO, en_d1 * b, ZERO,
    ])
    # data length == CallDataLength (checked on the data field's
    # completion row; plen is still live there)
    en_dl = done * F[F_DATA]
    table.lookup(cs, "rlp_data_len", [
        en_dl, en_dl * txcfg.tx_id.cur(),
        en_dl * Const(int(TxFieldTag.CALL_DATA_LENGTH)), ZERO,
        en_dl * plen.cur(), ZERO,
    ])

    return RlpConfig(txcfg, sgn, st, fv, sgl, zstr, sht, lng, ls_long,
                     lst, cinv, binv, in_hi, cnt, trem, plen, acc_lo,
                     acc_hi)


def _sgn(sgn: Column) -> Expr:
    return sgn.cur()


def assign(
    cs: ConstraintSystem,
    cfg: RlpConfig,
    n: int,
    txs: list[Transaction],
    asg: Assignment,
) -> None:
    """Fill the FSM columns over the tx circuit's rlp rows (must be
    called after tx_circuit.assign on the same Assignment)."""
    txcfg = cfg.tx
    one = FR.encode(1)
    from zkevm_tpu.circuits.tx_circuit import NFIELDS, num_tx_slots

    nslots = num_tx_slots(cs, n, txcfg)
    B = txcfg.block
    for slot in range(nslots):
        base = slot * B
        for si in range(2):
            r0 = base + NFIELDS + txcfg.cd_cap + si * txcfg.rlp_cap
            if si == 1:
                asg.cols[cfg.sgn][r0 : r0 + txcfg.rlp_cap] = one
            if slot >= len(txs):
                # empty slot: all rows are END (act == 0 everywhere)
                for i in range(txcfg.rlp_cap):
                    asg.set_int(cfg.st[END], r0 + i, 1)
                continue
            tx = txs[slot]
            data = tx.rlp_unsigned() if si == 0 else tx.rlp_signed()
            _fill_stream(cfg, asg, r0, data, txcfg.rlp_cap,
                         signed=(si == 1))


def _fill_stream(cfg: RlpConfig, asg: Assignment, r0: int, data: bytes,
                 cap: int, *, signed: bool) -> None:
    """Run the host-side FSM over `data`, writing one row per byte."""
    st_rows = []  # (state, fidx, cnt, trem, plen, acc_lo, acc_hi, flags)
    i = 0
    b0 = data[0]
    # list prefix
    if b0 >= 0xF8:
        lenlen = b0 - 0xF7
        trem = 0
        st_rows.append(dict(st=LP, f=0, ls_long=1, trem=0))
        for j in range(lenlen):
            i += 1
            trem = trem * 256 + data[i]
            st_rows.append(dict(st=LL, f=0, cnt=lenlen - j, trem=trem))
    else:
        trem = b0 - 0xC0
        st_rows.append(dict(st=LP, f=0, trem=trem))

    fidx = 0
    while fidx < NFIELD:
        i += 1
        trem -= 1
        b = data[i]
        row = dict(st=FP, f=fidx, trem=trem, acc_lo=0, acc_hi=0)
        if b < 0x80:
            row.update(sgl=1, plen=1, acc_lo=b)
            st_rows.append(row)
            fidx += 1
            continue
        if b == 0x80:
            row.update(zstr=1, plen=0)
            st_rows.append(row)
            fidx += 1
            continue
        if b <= 0xB7:
            plen = b - 0x80
            row.update(sht=1, plen=plen)
            st_rows.append(row)
        else:
            lenlen = b - 0xB7
            row.update(lng=1, plen=0)
            st_rows.append(row)
            plen = 0
            for j in range(lenlen):
                i += 1
                trem -= 1
                plen = plen * 256 + data[i]
                st_rows.append(dict(st=SL, f=fidx, cnt=lenlen - j,
                                    trem=trem, plen=plen))
        acc_lo = acc_hi = 0
        for j in range(plen):
            i += 1
            trem -= 1
            b = data[i]
            rem = plen - j  # bytes remaining including this one
            if rem > 16:
                acc_hi = acc_hi * 256 + b
            else:
                acc_lo = acc_lo * 256 + b
            st_rows.append(dict(st=PAY, f=fidx, cnt=rem, trem=trem,
                                plen=plen, acc_lo=acc_lo, acc_hi=acc_hi,
                                in_hi=1 if rem > 16 else 0))
        fidx += 1
    assert i == len(data) - 1, (i, len(data))
    assert trem == 0

    for j, row in enumerate(st_rows):
        r = r0 + j
        asg.set_int(cfg.st[row["st"]], r, 1)
        if row["st"] != END:
            asg.set_int(cfg.fv[row["f"]], r, 1)
        for key, col in [("sgl", cfg.sgl), ("zstr", cfg.zstr),
                         ("sht", cfg.sht), ("lng", cfg.lng),
                         ("ls_long", cfg.ls_long), ("in_hi", cfg.in_hi)]:
            if row.get(key):
                asg.set_int(col, r, 1)
        cntv = row.get("cnt", 0)
        asg.set_int(cfg.cnt, r, cntv)
        if row["st"] in (LL, SL, PAY):
            if cntv == 1:
                asg.set_int(cfg.lst, r, 1)
            else:
                asg.set_int(cfg.cinv, r,
                            pow(cntv - 1, FR_MOD - 2, FR_MOD))
        asg.set_int(cfg.trem, r, row.get("trem", 0) % FR_MOD)
        asg.set_int(cfg.plen, r, row.get("plen", 0))
        asg.set_int(cfg.acc_lo, r, row.get("acc_lo", 0))
        asg.set_int(cfg.acc_hi, r, row.get("acc_hi", 0))
        # minimality inverse witnesses (first LL/SL byte, first int
        # payload byte): set whenever the row's byte is nonzero
        bv = data[j] if j < len(data) else 0
        if bv:
            asg.set_int(cfg.binv, r, pow(bv, FR_MOD - 2, FR_MOD))
    for j in range(len(st_rows), cap):
        asg.set_int(cfg.st[END], r0 + j, 1)
