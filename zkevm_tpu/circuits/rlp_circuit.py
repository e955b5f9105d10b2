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

NFIELD = 12
_T = TxFieldTag
# TxTable tag per field index, per (type, stream) schedule
# (None = no value lookup: data / access-list / placeholder fields)
SCHEDULES = {
    # (tx_type, signed): (tags, f_to, f_data, f_al, last_field)
    (0, 0): ([_T.NONCE, _T.GAS_PRICE, _T.GAS, _T.CALLEE_ADDRESS,
              _T.VALUE, None, _T.CHAIN_ID, None, None], 3, 5, None, 8),
    (0, 1): ([_T.NONCE, _T.GAS_PRICE, _T.GAS, _T.CALLEE_ADDRESS,
              _T.VALUE, None, _T.SIG_V, _T.SIG_R, _T.SIG_S], 3, 5,
             None, 8),
    (1, 0): ([_T.CHAIN_ID, _T.NONCE, _T.GAS_PRICE, _T.GAS,
              _T.CALLEE_ADDRESS, _T.VALUE, None, None], 4, 6, 7, 7),
    (1, 1): ([_T.CHAIN_ID, _T.NONCE, _T.GAS_PRICE, _T.GAS,
              _T.CALLEE_ADDRESS, _T.VALUE, None, None, _T.SIG_V,
              _T.SIG_R, _T.SIG_S], 4, 6, 7, 10),
    (2, 0): ([_T.CHAIN_ID, _T.NONCE, _T.MAX_PRIORITY_FEE, _T.MAX_FEE,
              _T.GAS, _T.CALLEE_ADDRESS, _T.VALUE, None, None],
             5, 7, 8, 8),
    (2, 1): ([_T.CHAIN_ID, _T.NONCE, _T.MAX_PRIORITY_FEE, _T.MAX_FEE,
              _T.GAS, _T.CALLEE_ADDRESS, _T.VALUE, None, None,
              _T.SIG_V, _T.SIG_R, _T.SIG_S], 5, 7, 8, 11),
}

# state indices: the legacy six + the typed-envelope/access-list machine
# (TB type byte; ALP/ALL access-list prefix/length; IP item prefix;
# ASP/ASB address string prefix/bytes; KP keys-list prefix; KSP/KSB
# storage-key string prefix/bytes)
LP, LL, FP, SL, PAY, END, TB, ALP, ALL, IP, ASP, ASB, KP, KSP, KSB = \
    range(15)
NSTATE = 15


@dataclass
class RlpConfig:
    tx: TxConfig
    sgn: Column  # fixed: 1 on signed-stream rows
    st: list  # NSTATE state one-hot columns
    fv: list  # NFIELD field one-hot columns
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
    # typed-envelope / access-list machine
    t1: Column = None  # stream-constant type flags (EIP-2930 / 1559)
    t2: Column = None
    alrem: Column = None  # access-list payload bytes remaining
    itrem: Column = None  # current item payload bytes remaining
    aidx: Column = None  # item (address) counter
    kidx: Column = None  # flat storage-key counter
    al_lst: Column = None  # alrem == 1 flag
    alinv: Column = None  # inverse witness for alrem - 1
    dn: Column = None  # materialized done*has (value-lookup enable)
    tagc: Column = None  # materialized schedule tag


def configure(cs: ConstraintSystem, txcfg: TxConfig) -> RlpConfig:
    sgn = cs.fixed_column()
    st = [cs.advice_column() for _ in range(NSTATE)]
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
    t1 = cs.advice_column()
    t2 = cs.advice_column()
    alrem = cs.advice_column()
    itrem = cs.advice_column()
    aidx = cs.advice_column()
    kidx = cs.advice_column()
    al_lst = cs.advice_column()
    alinv = cs.advice_column()

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

    # -- stream type flags (constant over the stream, TxTable-bound) ------
    ty1, ty2 = t1.cur(), t2.cur()
    leg = one - ty1 - ty2
    typed = ty1 + ty2
    cs.create_gate("rlp_type", [
        q * ty1 * (one - ty1),
        q * ty2 * (one - ty2),
        q * ty1 * ty2,
        qg * (ty1 - t1.prev()),
        qg * (ty2 - t2.prev()),
    ])
    en0 = q0 * act
    txcfg.table.lookup(cs, "rlp_txtype", [
        en0, en0 * txcfg.tx_id.cur(),
        en0 * Const(int(TxFieldTag.TX_TYPE)), Const(0),
        en0 * (ty1 + Const(2) * ty2), Const(0),
    ])

    # -- state structure --------------------------------------------------
    ssum = Const(0)
    for s in S:
        ssum = ssum + s
    cs.create_gate("rlp_state", [
        q * s * (one - s) for s in S
    ] + [
        q * (ssum - one),
        # active legacy streams start at LP; typed at the TB type byte
        q0 * (S[LP] + S[TB] - act),
        q0 * (S[TB] - act * typed),
        (q - q0) * S[TB],  # TB only on the first row
        q * S[TB] * (b - ty1 - Const(2) * ty2),  # the envelope type byte
        q * (S[END] - (one - act)),  # END <=> inactive
        (q - q0) * S[LP] * (one - SP[TB]),  # LP: first row or after TB
    ])

    # -- field one-hot ----------------------------------------------------
    # advance on completion: done = FP*(sgl+zstr) + PAY*lst, plus the
    # access-list field's completion (empty AL, or the last item's end
    # on the alrem == 1 row)
    in_al = S[IP] + S[ASP] + S[ASB] + S[KP] + S[KSP] + S[KSB]
    item_end = S[KP] * zstr.cur() + S[KSB] * lst.cur()
    item_end_p = SP[KP] * zstr.prev() + SP[KSB] * lst.prev()
    al_done = S[ALP] * zstr.cur() + item_end * al_lst.cur()
    al_done_p = SP[ALP] * zstr.prev() + item_end_p * al_lst.prev()
    done = S[FP] * (sgl.cur() + zstr.cur()) + S[PAY] * lst.cur() + al_done
    done_p = (SP[FP] * (sgl.prev() + zstr.prev()) + SP[PAY] * lst.prev()
              + al_done_p)
    fsum = Const(0)
    for f in F:
        fsum = fsum + f
    cs.create_gate("rlp_fields", [
        q * f * (one - f) for f in F
    ] + [
        q * (fsum - (one - S[END])),  # exactly one field while decoding
        q0 * (F[0] - act),
    ] + [
        # advance chain (END rows excluded: fsum zeroes the one-hot
        # there, and END entry is gated on last-field completion)
        qg * (one - S[END])
        * (F[j] - ((one - done_p) * FP_[j]
                   + (done_p * FP_[j - 1] if j > 0 else Const(0))))
        for j in range(NFIELD)
    ])

    # -- type-dependent field selectors (see SCHEDULES) --------------------
    sg = _sgn(sgn)
    f_to = leg * F[3] + ty1 * F[4] + ty2 * F[5]
    f_data = leg * F[5] + ty1 * F[6] + ty2 * F[7]
    f_data_p = leg * FP_[5] + ty1 * FP_[6] + ty2 * FP_[7]
    last_f_p = (leg * FP_[8]
                + ty1 * ((one - sg) * FP_[7] + sg * FP_[10])
                + ty2 * ((one - sg) * FP_[8] + sg * FP_[11]))

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
        q * S[FP] * lng.cur() * (one - f_data),
        # accumulators start fresh: the single-byte case IS the value
        q * S[FP] * (acc_lo.cur() - sgl.cur() * b),
        q * S[FP] * acc_hi.cur(),
    ])
    # -- access-list prefix structure --------------------------------------
    # ALP reuses the zstr/sht/lng case flags: empty (0xC0), short
    # (payload = b - 0xC0 in [1,55]), long (v1: exactly one length byte,
    # 0xF8). KP: empty keys (0xC0) or exactly one 33-byte key (0xE1, v1).
    # IP: short item list, payload = b - 0xC0. ASP/KSP: exact string
    # prefixes 0x94 / 0xA0.
    cs.create_gate("rlp_al_cases", [
        q * S[ALP] * (zstr.cur() + sht.cur() + lng.cur() - one),
        q * S[ALP] * zstr.cur() * (b - Const(0xC0)),
        q * S[ALP] * lng.cur() * (b - Const(0xF8)),
        q * S[ALP] * sht.cur() * (alrem.cur() - b + Const(0xC0)),
        q * S[ALL] * (alrem.cur() - b),
        q * S[ALL] * (cnt.cur() - one),
        q * S[KP] * zstr.cur() * (b - Const(0xC0)),
        q * S[KP] * (one - zstr.cur()) * (b - Const(0xC0) - Const(33)),
        q * S[IP] * (itrem.cur() - b + Const(0xC0)),
        q * S[ASP] * (b - Const(0x94)),
        q * S[KSP] * (b - Const(0xA0)),
        # counters: reset on ALP, +1 at each IP / KSP, constant otherwise
        q * S[ALP] * aidx.cur(),
        q * S[ALP] * kidx.cur(),
        qg * S[ALL] * (aidx.cur() - aidx.prev()),
        qg * S[ALL] * (kidx.cur() - kidx.prev()),
        qg * S[IP] * (aidx.cur() - aidx.prev() - one),
        qg * (in_al - S[IP]) * (aidx.cur() - aidx.prev()),
        qg * S[KSP] * (kidx.cur() - kidx.prev() - one),
        qg * (in_al - S[KSP]) * (kidx.cur() - kidx.prev()),
        # payload countdowns: alrem over every in-AL row, itrem over
        # the in-item rows
        qg * in_al * (alrem.cur() - alrem.prev() + one),
        qg * (in_al - S[IP]) * (itrem.cur() - itrem.prev() + one),
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
        # in_hi pins: in_hi -> cnt >= 17; byte rows & !in_hi -> cnt <= 16
        in_hi.cur() * (cnt.cur() - Const(17)),
        (S[PAY] + S[ASB] + S[KSB]) * (one - in_hi.cur())
        * (Const(16) - cnt.cur()),
        # short AL / item list prefixes land in (0xC0, 0xF7]
        S[ALP] * sht.cur() * (b - Const(0xC1)),
        S[ALP] * sht.cur() * (Const(0xF7) - b),
        S[IP] * (b - Const(0xC1)),
        S[IP] * (Const(0xF7) - b),
    ])

    # -- lst = (cnt == 1) on countdown rows -------------------------------
    run = S[LL] + S[SL] + S[PAY] + S[ALL] + S[ASB] + S[KSB]
    cs.create_gate("rlp_lst", [
        q * run * (cnt.cur() - one) * lst.cur(),
        q * run * (lst.cur() + (cnt.cur() - one) * cinv.cur() - one),
    ])
    # al_lst = (alrem == 0) on access-list payload rows (alrem counts
    # the payload bytes remaining AFTER the row)
    cs.create_gate("rlp_al_lst", [
        q * in_al * alrem.cur() * al_lst.cur(),
        q * in_al * (al_lst.cur() + alrem.cur() * alinv.cur() - one),
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
        # TB -> LP
        qg * SP[TB] * (one - S[LP]),
        # FP exits (field completion may enter the access-list machine)
        qg * SP[FP] * (sgl.prev() + zstr.prev())
        * (one - S[FP] - S[END] - S[ALP]),
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
        qg * SP[PAY] * lst.prev() * (one - S[FP] - S[END] - S[ALP]),
        # ALP is reachable only on the data field's completion row of a
        # typed stream
        qg * S[ALP] * (one - done_p * f_data_p * typed),
        # access-list machine transitions
        qg * SP[ALP] * sht.prev() * (one - S[IP]),
        qg * SP[ALP] * lng.prev() * (one - S[ALL]),
        qg * SP[ALP] * zstr.prev() * (one - S[FP] - S[END]),
        qg * SP[ALL] * (one - S[IP]),  # v1: single length byte
        qg * SP[IP] * (one - S[ASP]),
        qg * SP[ASP] * (one - S[ASB]),
        qg * first_of(ASB) * (cnt.cur() - Const(20)),
        qg * S[ASB] * SP[ASB] * (cnt.cur() - cnt.prev() + one),
        qg * SP[ASB] * (one - lst.prev()) * (one - S[ASB]),
        qg * SP[ASB] * lst.prev() * (one - S[KP]),
        qg * SP[KP] * (one - zstr.prev()) * (one - S[KSP]),
        qg * SP[KSP] * (one - S[KSB]),
        qg * first_of(KSB) * (cnt.cur() - Const(32)),
        qg * S[KSB] * SP[KSB] * (cnt.cur() - cnt.prev() + one),
        qg * SP[KSB] * (one - lst.prev()) * (one - S[KSB]),
        # item end: next item, or (alrem exhausted) the field completes
        qg * item_end_p * (one - al_lst.prev()) * (one - S[IP]),
        qg * item_end_p * al_lst.prev() * (one - S[FP] - S[END]),
        # the item's declared payload must end exactly here (itrem
        # counts bytes remaining AFTER the row)
        q * item_end * itrem.cur(),
        # END is absorbing and only enterable on last-field completion
        qg * SP[END] * (one - S[END]),
        qg * S[END] * (one - SP[END]) * (one - done_p * last_f_p),
    ])

    # -- canonical minimality --------------------------------------------
    # first LL/SL byte nonzero; one-byte short strings must be >= 0x80
    cs.create_gate("rlp_minimal", [
        qg * first_of(LL) * (one - b * binv.cur()),
        qg * first_of(SL) * (one - b * binv.cur()),
        # int fields (not `to`, not data): first payload byte nonzero
        qg * first_of(PAY) * (one - f_to - f_data)
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
        qg * (S[FP] + S[SL] + S[PAY] + S[ALP] + S[ALL] + in_al)
        * (trem.cur() - trem.prev() + one),
        # stream end: trem hits zero exactly when act falls...
        qg * (txcfg.is_act.prev() - act) * trem.prev(),
        # ...or at full capacity
        (txcfg.q_rlpu_last.cur() + txcfg.q_rlps_last.cur()) * act
        * trem.cur(),
    ])

    # -- value accumulation ----------------------------------------------
    ih = in_hi.cur()
    byte_run = S[PAY] + S[ASB] + S[KSB]
    cs.create_gate("rlp_acc", [
        # length-byte / prefix rows keep the accumulators parked at zero
        # so the byte runs start clean
        q * (S[SL] + S[ALP] + S[ALL] + S[IP] + S[ASP] + S[KP] + S[KSP])
        * acc_lo.cur(),
        q * (S[SL] + S[ALP] + S[ALL] + S[IP] + S[ASP] + S[KP] + S[KSP])
        * acc_hi.cur(),
        qg * byte_run * (acc_hi.cur()
                         - ih * (Const(256) * acc_hi.prev() + b)
                         - (one - ih) * acc_hi.prev()),
        qg * byte_run * (acc_lo.cur()
                         - (one - ih) * (Const(256) * acc_lo.prev() + b)
                         - ih * acc_lo.prev()),
        # `to` is a 20-byte string — or empty for creation txs
        q * S[FP] * f_to * (one - sht.cur() - zstr.cur()),
        q * S[FP] * f_to * sht.cur() * (plen.cur() - Const(20)),
        # legacy unsigned fields 7/8 are the EIP-155 zero placeholders
        q * S[FP] * leg * (one - sg) * (F[7] + F[8]) * (one - zstr.cur()),
    ])

    # -- TxTable bindings -------------------------------------------------
    table = txcfg.table
    ZERO = Const(0)
    # field tag per (type, stream) schedule; `has` gates fields with no
    # value lookup (data, access list, placeholders)
    tag_e = Const(0)
    has = Const(0)
    for j in range(NFIELD):
        e_j = Const(0)
        h_j = Const(0)
        for (ty_, sg_), (tags, *_rest) in SCHEDULES.items():
            t_tag = tags[j] if j < len(tags) else None
            if t_tag is None:
                continue
            tsel = (leg, ty1, ty2)[ty_]
            ssel = sg if sg_ else (one - sg)
            e_j = e_j + tsel * ssel * Const(int(t_tag))
            h_j = h_j + tsel * ssel
        tag_e = tag_e + F[j] * e_j
        has = has + F[j] * h_j
    # materialized cells keep the lookup-input degrees flat
    dn = cs.advice_column()
    tagc = cs.advice_column()
    cs.create_gate("rlp_mat", [
        q * (dn.cur() - done * has),
        q * (tagc.cur() - tag_e),
    ])
    en_v = dn.cur()
    table.lookup(cs, "rlp_value", [
        en_v, en_v * txcfg.tx_id.cur(), en_v * tagc.cur(), ZERO,
        en_v * acc_lo.cur(), en_v * acc_hi.cur(),
    ])
    # data payload bytes <-> CALL_DATA rows; index = plen - cnt
    en_d = S[PAY] * f_data
    table.lookup(cs, "rlp_data_byte", [
        en_d, en_d * txcfg.tx_id.cur(), en_d * Const(int(TxFieldTag.CALL_DATA)),
        en_d * (plen.cur() - cnt.cur()), en_d * b, ZERO,
    ])
    # single-byte data: the FP row is the payload byte at index 0
    en_d1 = S[FP] * f_data * sgl.cur()
    table.lookup(cs, "rlp_data_byte1", [
        en_d1, en_d1 * txcfg.tx_id.cur(),
        en_d1 * Const(int(TxFieldTag.CALL_DATA)), ZERO, en_d1 * b, ZERO,
    ])
    # data length == CallDataLength (checked on the data field's
    # completion row; plen is still live there)
    en_dl = done * f_data
    table.lookup(cs, "rlp_data_len", [
        en_dl, en_dl * txcfg.tx_id.cur(),
        en_dl * Const(int(TxFieldTag.CALL_DATA_LENGTH)), ZERO,
        en_dl * plen.cur(), ZERO,
    ])
    # access-list items: each decoded address / storage key must sit in
    # the table's AL region at its decode position, and the item/key
    # counts bind to the length fields on the AL-completion row
    en_a = S[ASB] * lst.cur()
    table.lookup(cs, "rlp_al_addr", [
        en_a, en_a * txcfg.tx_id.cur(),
        en_a * Const(int(TxFieldTag.ACCESS_LIST_ADDRESS)),
        en_a * (aidx.cur() - one),
        en_a * acc_lo.cur(), en_a * acc_hi.cur(),
    ])
    en_k = S[KSB] * lst.cur()
    table.lookup(cs, "rlp_al_key", [
        en_k, en_k * txcfg.tx_id.cur(),
        en_k * Const(int(TxFieldTag.ACCESS_LIST_STORAGE_KEY)),
        en_k * (kidx.cur() - one),
        en_k * acc_lo.cur(), en_k * acc_hi.cur(),
    ])
    table.lookup(cs, "rlp_al_alen", [
        al_done, al_done * txcfg.tx_id.cur(),
        al_done * Const(int(TxFieldTag.ACCESS_LIST_ADDRESSES_LEN)),
        ZERO, al_done * aidx.cur(), ZERO,
    ])
    table.lookup(cs, "rlp_al_klen", [
        al_done, al_done * txcfg.tx_id.cur(),
        al_done * Const(int(TxFieldTag.ACCESS_LIST_KEYS_LEN)),
        ZERO, al_done * kidx.cur(), ZERO,
    ])

    return RlpConfig(txcfg, sgn, st, fv, sgl, zstr, sht, lng, ls_long,
                     lst, cinv, binv, in_hi, cnt, trem, plen, acc_lo,
                     acc_hi, t1, t2, alrem, itrem, aidx, kidx, al_lst,
                     alinv, dn, tagc)


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
            r0 = (base + NFIELDS + txcfg.cd_cap + txcfg.al_cap
                  + si * txcfg.rlp_cap)
            if si == 1:
                asg.cols[cfg.sgn][r0 : r0 + txcfg.rlp_cap] = one
            if slot >= len(txs):
                # empty slot: all rows are END (act == 0 everywhere)
                for i in range(txcfg.rlp_cap):
                    asg.set_int(cfg.st[END], r0 + i, 1)
                continue
            tx = txs[slot]
            data = tx.rlp_unsigned() if si == 0 else tx.rlp_signed()
            if tx.tx_type:
                # stream-constant type flags (incl. trailing END rows)
                col = cfg.t1 if tx.tx_type == 1 else cfg.t2
                asg.cols[col][r0 : r0 + txcfg.rlp_cap] = one
            _fill_stream(cfg, asg, r0, data, txcfg.rlp_cap,
                         signed=(si == 1), tx_type=tx.tx_type)


def _fill_stream(cfg: RlpConfig, asg: Assignment, r0: int, data: bytes,
                 cap: int, *, signed: bool, tx_type: int = 0) -> None:
    """Run the host-side FSM over `data`, writing one row per byte."""
    tags, f_to, f_data, f_al, last_f = SCHEDULES[(tx_type, int(signed))]
    nf = len(tags)
    st_rows = []  # per-row dicts of state/field/registers/flags
    i = 0
    if tx_type:
        assert data[0] == tx_type
        st_rows.append(dict(st=TB, f=0))
        i = 1
    b0 = data[i]
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

    def parse_al(fidx, i, trem):
        """Access-list parse: ALP [ALL] (IP ASP ASB*20 KP [KSP KSB*32])*.
        v1 scope: one AL length byte, <=1 storage key per item."""
        i += 1
        trem -= 1
        b = data[i]
        aidx = kidx = 0
        if b == 0xC0:
            st_rows.append(dict(st=ALP, f=fidx, zstr=1, trem=trem,
                                aidx=0, kidx=0))
            return i, trem
        if b == 0xF8:
            st_rows.append(dict(st=ALP, f=fidx, lng=1, trem=trem,
                                aidx=0, kidx=0))
            i += 1
            trem -= 1
            alrem = data[i]
            st_rows.append(dict(st=ALL, f=fidx, cnt=1, trem=trem,
                                alrem=alrem, aidx=0, kidx=0))
        elif b <= 0xF7:
            alrem = b - 0xC0
            st_rows.append(dict(st=ALP, f=fidx, sht=1, trem=trem,
                                alrem=alrem, aidx=0, kidx=0))
        else:
            raise NotImplementedError(
                "access list longer than 255 encoded bytes (v1)")
        while alrem > 0:
            # item prefix
            i += 1
            trem -= 1
            alrem -= 1
            aidx += 1
            b = data[i]
            assert 0xC0 < b <= 0xF7, "long access-list item (v1: <=1 key)"
            itrem = b - 0xC0
            st_rows.append(dict(st=IP, f=fidx, trem=trem, alrem=alrem,
                                itrem=itrem, aidx=aidx, kidx=kidx))
            # address: 0x94 + 20 bytes
            i += 1
            trem -= 1
            alrem -= 1
            itrem -= 1
            assert data[i] == 0x94
            st_rows.append(dict(st=ASP, f=fidx, trem=trem, alrem=alrem,
                                itrem=itrem, aidx=aidx, kidx=kidx))
            acc_lo = acc_hi = 0
            for j in range(20):
                i += 1
                trem -= 1
                alrem -= 1
                itrem -= 1
                rem = 20 - j
                if rem > 16:
                    acc_hi = acc_hi * 256 + data[i]
                else:
                    acc_lo = acc_lo * 256 + data[i]
                st_rows.append(dict(
                    st=ASB, f=fidx, cnt=rem, trem=trem, alrem=alrem,
                    itrem=itrem, aidx=aidx, kidx=kidx, acc_lo=acc_lo,
                    acc_hi=acc_hi, in_hi=1 if rem > 16 else 0))
            # keys list
            i += 1
            trem -= 1
            alrem -= 1
            itrem -= 1
            b = data[i]
            row = dict(st=KP, f=fidx, trem=trem, alrem=alrem,
                       itrem=itrem, aidx=aidx, kidx=kidx)
            if b == 0xC0:
                row.update(zstr=1)
                assert itrem == 0
                st_rows.append(row)
                continue
            assert b == 0xC0 + 33, "v1: at most one storage key per item"
            st_rows.append(row)
            i += 1
            trem -= 1
            alrem -= 1
            itrem -= 1
            kidx += 1
            assert data[i] == 0xA0
            st_rows.append(dict(st=KSP, f=fidx, trem=trem, alrem=alrem,
                                itrem=itrem, aidx=aidx, kidx=kidx))
            acc_lo = acc_hi = 0
            for j in range(32):
                i += 1
                trem -= 1
                alrem -= 1
                itrem -= 1
                rem = 32 - j
                if rem > 16:
                    acc_hi = acc_hi * 256 + data[i]
                else:
                    acc_lo = acc_lo * 256 + data[i]
                st_rows.append(dict(
                    st=KSB, f=fidx, cnt=rem, trem=trem,
                    alrem=alrem, itrem=itrem, aidx=aidx,
                    kidx=kidx, acc_lo=acc_lo, acc_hi=acc_hi,
                    in_hi=1 if rem > 16 else 0))
            assert itrem == 0
        return i, trem

    fidx = 0
    while fidx < nf:
        if fidx == f_al:
            i, trem = parse_al(fidx, i, trem)
            fidx += 1
            continue
        i += 1
        trem -= 1
        b = data[i]
        has_tag = tags[fidx] is not None
        row = dict(st=FP, f=fidx, trem=trem, acc_lo=0, acc_hi=0)
        if b < 0x80:
            row.update(sgl=1, plen=1, acc_lo=b, dn=int(has_tag))
            st_rows.append(row)
            fidx += 1
            continue
        if b == 0x80:
            row.update(zstr=1, plen=0, dn=int(has_tag))
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
                                in_hi=1 if rem > 16 else 0,
                                dn=int(has_tag and rem == 1)))
        fidx += 1
    assert i == len(data) - 1, (i, len(data))
    assert trem == 0

    for j, row in enumerate(st_rows):
        r = r0 + j
        asg.set_int(cfg.st[row["st"]], r, 1)
        if row["st"] != END:
            asg.set_int(cfg.fv[row["f"]], r, 1)
            t_tag = tags[row["f"]] if row["f"] < len(tags) else None
            if t_tag is not None:
                asg.set_int(cfg.tagc, r, int(t_tag))
        for key, col in [("sgl", cfg.sgl), ("zstr", cfg.zstr),
                         ("sht", cfg.sht), ("lng", cfg.lng),
                         ("ls_long", cfg.ls_long), ("in_hi", cfg.in_hi),
                         ("dn", cfg.dn)]:
            if row.get(key):
                asg.set_int(col, r, 1)
        cntv = row.get("cnt", 0)
        asg.set_int(cfg.cnt, r, cntv)
        if row["st"] in (LL, SL, PAY, ALL, ASB, KSB):
            if cntv == 1:
                asg.set_int(cfg.lst, r, 1)
            else:
                asg.set_int(cfg.cinv, r,
                            pow(cntv - 1, FR_MOD - 2, FR_MOD))
        if row["st"] in (IP, ASP, ASB, KP, KSP, KSB):
            alv = row.get("alrem", 0)
            if alv == 0:
                asg.set_int(cfg.al_lst, r, 1)
            else:
                asg.set_int(cfg.alinv, r,
                            pow(alv, FR_MOD - 2, FR_MOD))
        asg.set_int(cfg.trem, r, row.get("trem", 0) % FR_MOD)
        asg.set_int(cfg.plen, r, row.get("plen", 0))
        asg.set_int(cfg.acc_lo, r, row.get("acc_lo", 0))
        asg.set_int(cfg.acc_hi, r, row.get("acc_hi", 0))
        asg.set_int(cfg.alrem, r, row.get("alrem", 0))
        asg.set_int(cfg.itrem, r, row.get("itrem", 0))
        asg.set_int(cfg.aidx, r, row.get("aidx", 0))
        asg.set_int(cfg.kidx, r, row.get("kidx", 0))
        # minimality inverse witnesses (first LL/SL byte, first int
        # payload byte): set whenever the row's byte is nonzero
        bv = data[j] if j < len(data) else 0
        if bv:
            asg.set_int(cfg.binv, r, pow(bv, FR_MOD - 2, FR_MOD))
    for j in range(len(st_rows), cap):
        asg.set_int(cfg.st[END], r0 + j, 1)
