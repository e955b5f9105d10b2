"""zstd decoder circuit: blob bytes provably decode to the batch payload.

Reference counterpart: aggregator/src/aggregation/decoder.rs (the
in-circuit zstd decompression proof, ~9.4k LoC incl. FSE/Huffman tables)
— this v1 covers the RAW + RLE block subset emitted by
aggregation/zstd.zstd_encode (valid RFC 8878 frames; the compressed-block
sequence section is the next increment).

One row per DECODER EVENT (an input byte consumed and/or an output byte
emitted), a one-hot state machine over 13 states:

  M0..M3  magic bytes (constants)        FHD, WD   frame header bytes
  BH0..BH2  block header (bit-decomposed: last, type, 21-bit size)
  RAW      consume + emit one literal    RLEB      consume the RLE byte
  RLE      emit the RLE byte             END       absorbing terminal

Registers (advice, carried row to row): in_idx, out_idx, rep (bytes left
in the current block), last (current block is final), typ (0 raw/1 RLE),
sz (block-size accumulator), rbyte (current RLE byte). Byte IO is bound
through two dense index->byte tables: every consuming row looks up
(in_idx, byte) in the INPUT table, every emitting row (out_idx, obyte)
in the OUTPUT table; in_idx/out_idx increment by exactly one, so with
the final (in_len, out_len) binding the streams are covered exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum

from zkevm_tpu.gadgets.is_zero import IsZero
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr

MAGIC = (0x28, 0xB5, 0x2F, 0xFD)


class ZS(IntEnum):
    M0 = 0
    M1 = 1
    M2 = 2
    M3 = 3
    FHD = 4
    WD = 5
    BH0 = 6
    BH1 = 7
    BH2 = 8
    RAW = 9
    RLEB = 10
    RLE = 11
    END = 12


NST = len(ZS)
CONSUMING = (ZS.M0, ZS.M1, ZS.M2, ZS.M3, ZS.FHD, ZS.WD, ZS.BH0, ZS.BH1,
             ZS.BH2, ZS.RAW, ZS.RLEB)
EMITTING = (ZS.RAW, ZS.RLE)


@dataclass
class ZstdConfig:
    q_step: Column
    q_first: Column
    q_last: Column
    q_trans: Column
    st: list  # NST one-hot advice
    in_idx: Column
    out_idx: Column
    rep: Column
    last: Column
    typ: Column
    sz: Column
    rbyte: Column
    byte: Column  # input byte on consuming rows
    obyte: Column  # output byte on emitting rows
    bits: list  # 8 bit cells (BH0 decomposition)
    repinv: Column  # RLEB: rep != 0 witness inverse
    iz_next: IsZero  # rep.next() == 0 (after BH2/RAW/RLE updates)
    # IO tables
    q_it: Column
    it_idx: Column
    it_byte: Column
    q_ot: Column
    ot_idx: Column
    ot_byte: Column


def configure(cs: ConstraintSystem, rt8) -> ZstdConfig:
    q_step, q_first, q_last, q_trans = (cs.fixed_column() for _ in range(4))
    st = [cs.advice_column() for _ in range(NST)]
    (in_idx, out_idx, rep, last, typ, sz, rbyte, byte, obyte,
     repinv) = (cs.advice_column() for _ in range(10))
    bits = [cs.advice_column() for _ in range(8)]
    q_it, it_idx, it_byte = (cs.fixed_column(), cs.advice_column(),
                             cs.advice_column())
    q_ot, ot_idx, ot_byte = (cs.fixed_column(), cs.advice_column(),
                             cs.advice_column())

    one = Const(1)
    qs, qt, qf, ql = q_step.cur(), q_trans.cur(), q_first.cur(), q_last.cur()
    S = [st[i].cur() for i in range(NST)]
    SN = [st[i].next() for i in range(NST)]

    polys = [qs * s * (s - one) for s in S]
    ssum = Const(0)
    for s in S:
        ssum = ssum + s
    polys.append(qs * (ssum - one))
    polys += [
        qf * (S[ZS.M0] - one), qf * in_idx.cur(), qf * out_idx.cur(),
        qf * rep.cur(), qf * last.cur(),
        ql * (S[ZS.END] - one),
    ]

    # magic / FHD constants
    for k, s_i in enumerate((ZS.M0, ZS.M1, ZS.M2, ZS.M3)):
        polys.append(S[s_i] * (byte.cur() - Const(MAGIC[k])))
    polys.append(S[ZS.FHD] * byte.cur())  # FHD must be 0x00 (v1 frames)

    # BH0 bit decomposition: byte = last' + 2*typ' + 4*t1(==0) + 8*szlo5
    b = [c.cur() for c in bits]
    polys += [S[ZS.BH0] * bb * (one - bb) for bb in b]
    szlo5 = (b[3] + Const(2) * b[4] + Const(4) * b[5] + Const(8) * b[6]
             + Const(16) * b[7])
    polys.append(S[ZS.BH0] * (byte.cur() - b[0] - Const(2) * b[1]
                              - Const(4) * b[2] - Const(8) * szlo5))
    polys.append(S[ZS.BH0] * b[2])  # compressed blocks outside v1 subset

    # -- register transitions (q_trans rows) ------------------------------
    consume = Const(0)
    for s_i in CONSUMING:
        consume = consume + S[s_i]
    emit = Const(0)
    for s_i in EMITTING:
        emit = emit + S[s_i]
    polys.append(qt * (in_idx.next() - in_idx.cur() - consume))
    polys.append(qt * (out_idx.next() - out_idx.cur() - emit))
    # last/typ/sz: set at BH0, BH1; frozen elsewhere
    polys.append(qt * S[ZS.BH0] * (last.next() - b[0]))
    polys.append(qt * S[ZS.BH0] * (typ.next() - b[1]))
    polys.append(qt * S[ZS.BH0] * (sz.next() - szlo5))
    polys.append(qt * S[ZS.BH1] * (sz.next() - sz.cur()
                                   - Const(32) * byte.cur()))
    nb0 = one - S[ZS.BH0]
    polys.append(qt * nb0 * (last.next() - last.cur()))
    polys.append(qt * nb0 * (typ.next() - typ.cur()))
    polys.append(qt * nb0 * (one - S[ZS.BH1]) * (sz.next() - sz.cur()))
    # rep: BH2 loads sz + byte*2^13; RAW/RLE decrement; else frozen
    polys.append(qt * S[ZS.BH2] * (rep.next() - sz.cur()
                                   - Const(1 << 13) * byte.cur()))
    dec = S[ZS.RAW] + S[ZS.RLE]
    polys.append(qt * dec * (rep.next() - rep.cur() + one))
    oth = one - S[ZS.BH2] - dec
    polys.append(qt * oth * (rep.next() - rep.cur()))
    # rbyte: RLEB latches the consumed byte; else frozen
    polys.append(qt * S[ZS.RLEB] * (rbyte.next() - byte.cur()))
    polys.append(qt * (one - S[ZS.RLEB]) * (rbyte.next() - rbyte.cur()))
    # RLE emits the latched byte; RAW emits the consumed byte
    polys.append(S[ZS.RLE] * (obyte.cur() - rbyte.cur()))
    polys.append(S[ZS.RAW] * (obyte.cur() - byte.cur()))
    # RLEB requires a nonzero block size (rep * inv == 1)
    polys.append(S[ZS.RLEB] * (rep.cur() * repinv.cur() - one))

    # -- next-state schedule ----------------------------------------------
    chain = [(ZS.M0, ZS.M1), (ZS.M1, ZS.M2), (ZS.M2, ZS.M3), (ZS.M3, ZS.FHD),
             (ZS.FHD, ZS.WD), (ZS.WD, ZS.BH0), (ZS.BH0, ZS.BH1),
             (ZS.BH1, ZS.BH2), (ZS.RLEB, ZS.RLE), (ZS.END, ZS.END)]
    for a, bnx in chain:
        polys.append(qt * S[a] * (SN[bnx] - one))
    # decision states: BH2 / RAW / RLE consult rep.next() == 0
    iz_next = IsZero.configure(
        cs, qt * (S[ZS.BH2] + S[ZS.RAW] + S[ZS.RLE]), rep.next(), "zstd_iz")
    z = iz_next.expr()
    lastc = last.next()  # latched block flag (same value as .cur() here,
    # but BH2's `last` was set at BH0 and is frozen through the block)
    polys.append(qt * S[ZS.BH2] * (SN[ZS.RLEB] - typ.next()))
    polys.append(qt * S[ZS.BH2] * (one - typ.next())
                 * (SN[ZS.RAW] - (one - z)))
    polys.append(qt * S[ZS.BH2] * (one - typ.next()) * z
                 * (SN[ZS.END] - lastc))
    polys.append(qt * S[ZS.BH2] * (one - typ.next()) * z
                 * (SN[ZS.BH0] - (one - lastc)))
    for s_i, stay in ((ZS.RAW, ZS.RAW), (ZS.RLE, ZS.RLE)):
        polys.append(qt * S[s_i] * (SN[stay] - (one - z)))
        polys.append(qt * S[s_i] * z * (SN[ZS.END] - lastc))
        polys.append(qt * S[s_i] * z * (SN[ZS.BH0] - (one - lastc)))

    cs.create_gate("zstd_fsm", polys)

    # -- byte IO lookups ----------------------------------------------------
    cs.lookup("zstd_in", [
        (consume, q_it.cur()),
        (consume * in_idx.cur(), q_it.cur() * it_idx.cur()),
        (consume * byte.cur(), q_it.cur() * it_byte.cur()),
    ])
    cs.lookup("zstd_out", [
        (emit, q_ot.cur()),
        (emit * out_idx.cur(), q_ot.cur() * ot_idx.cur()),
        (emit * obyte.cur(), q_ot.cur() * ot_byte.cur()),
    ])
    rt8.lookup(cs, "zstd_u8", [qs * byte.cur(), qs * obyte.cur()])

    return ZstdConfig(q_step, q_first, q_last, q_trans, st, in_idx, out_idx,
                      rep, last, typ, sz, rbyte, byte, obyte, bits, repinv,
                      iz_next, q_it, it_idx, it_byte, q_ot, ot_idx, ot_byte)


def decode_events(frame: bytes) -> list:
    """Golden FSM replay -> one dict per row (the witness)."""
    rows = []
    regs = dict(in_idx=0, out_idx=0, rep=0, last=0, typ=0, sz=0, rbyte=0)
    i = 0
    state = ZS.M0
    out = bytearray()
    while True:
        r = dict(state=state, byte=0, obyte=0, **regs)
        if state in CONSUMING:
            r["byte"] = frame[i]
        nxt = None
        nr = dict(regs)
        if state in (ZS.M0, ZS.M1, ZS.M2, ZS.M3, ZS.FHD, ZS.WD):
            nxt = ZS(state + 1)
        elif state == ZS.BH0:
            b0 = frame[i]
            nr["last"], nr["typ"], nr["sz"] = b0 & 1, (b0 >> 1) & 3, b0 >> 3
            assert nr["typ"] < 2, "v1 subset"
            nxt = ZS.BH1
        elif state == ZS.BH1:
            nr["sz"] = regs["sz"] + 32 * frame[i]
            nxt = ZS.BH2
        elif state == ZS.BH2:
            nr["rep"] = regs["sz"] + (frame[i] << 13)
            if regs["typ"]:
                nxt = ZS.RLEB
            elif nr["rep"]:
                nxt = ZS.RAW
            else:
                nxt = ZS.END if regs["last"] else ZS.BH0
        elif state == ZS.RAW:
            r["obyte"] = frame[i]
            out.append(frame[i])
            nr["rep"] = regs["rep"] - 1
            nxt = (ZS.RAW if nr["rep"]
                   else (ZS.END if regs["last"] else ZS.BH0))
        elif state == ZS.RLEB:
            nr["rbyte"] = frame[i]
            nxt = ZS.RLE
        elif state == ZS.RLE:
            r["obyte"] = regs["rbyte"]
            out.append(regs["rbyte"])
            nr["rep"] = regs["rep"] - 1
            nxt = (ZS.RLE if nr["rep"]
                   else (ZS.END if regs["last"] else ZS.BH0))
        rows.append(r)
        if state in CONSUMING:
            i += 1
            nr["in_idx"] = regs["in_idx"] + 1
        if state in EMITTING:
            nr["out_idx"] = regs["out_idx"] + 1
        regs = nr
        if state == ZS.END:
            break
        state = nxt
        if state == ZS.END:
            rows.append(dict(state=ZS.END, byte=0, obyte=0, **regs))
            break
    assert i == len(frame), (i, len(frame))
    return rows, bytes(out)


def assign(cs: ConstraintSystem, cfg: ZstdConfig, n: int, frame: bytes,
           asg: Assignment | None = None, start: int = 0) -> Assignment:
    asg = asg if asg is not None else Assignment(cs, n)
    rows, out = decode_events(frame)
    m = cs.usable_rows(n)
    assert start + len(rows) <= m, (len(rows), m)
    for j, r in enumerate(rows):
        row = start + j
        asg.set_int(cfg.q_step, row, 1)
        if j == 0:
            asg.set_int(cfg.q_first, row, 1)
        if j < len(rows) - 1:
            asg.set_int(cfg.q_trans, row, 1)
        else:
            asg.set_int(cfg.q_last, row, 1)
        asg.set_int(cfg.st[int(r["state"])], row, 1)
        for nm in ("in_idx", "out_idx", "rep", "last", "typ", "sz",
                   "rbyte", "byte", "obyte"):
            asg.set_int(getattr(cfg, nm), row, r[nm])
        if r["state"] == ZS.BH0:
            b0 = r["byte"]
            vals = [b0 & 1, (b0 >> 1) & 1, (b0 >> 2) & 1]
            szlo = b0 >> 3
            vals += [(szlo >> k) & 1 for k in range(5)]
            for c, v in zip(cfg.bits, vals):
                asg.set_int(c, row, v)
        if r["state"] == ZS.RLEB:
            asg.set_int(cfg.repinv, row,
                        pow(r["rep"], -1, cs_modulus()))
        # iz_next inverse for decision states
        if j < len(rows) - 1 and r["state"] in (ZS.BH2, ZS.RAW, ZS.RLE):
            nrep = rows[j + 1]["rep"]
            asg.set_int(cfg.iz_next.inv, row,
                        pow(nrep, -1, cs_modulus()) if nrep else 0)
    # IO tables (dense)
    for i, bv in enumerate(frame):
        asg.set_int(cfg.q_it, i, 1)
        asg.set_int(cfg.it_idx, i, i)
        asg.set_int(cfg.it_byte, i, bv)
    for i, bv in enumerate(out):
        asg.set_int(cfg.q_ot, i, 1)
        asg.set_int(cfg.ot_idx, i, i)
        asg.set_int(cfg.ot_byte, i, bv)
    return asg


def cs_modulus() -> int:
    from zkevm_tpu.ff.goldens import FR_MOD

    return FR_MOD
