"""Copy circuit: proves the byte-copy side events (CopyEvents).

Reference counterpart: zkevm-circuits/src/copy_circuit.rs:71 (CopyTable
events for CALLDATACOPY / CODECOPY / RETURNDATACOPY / SHA3 / LOGn /
RETURN), consuming CopyEvents from bus-mapping
(circuit_input_builder.rs:37).

TPU-native redesign of the row layout: the reference interleaves
read/write step-pair rows with Lt chips for padding; here every event
occupies the 32-byte-WORD-ALIGNED span of its MEMORY side (exactly one
side of every supported event is memory), one row per byte, with word
anchors on a PERIODIC fixed selector (q_word is 1 every 32 region rows).
That makes the memory linkage a pair of rotation-combined expressions —
word_value_lo/hi = sum_j 2^(8(15-j)) byte.rot(j) over the group — so one
RwTable lookup per word anchor proves the full 32-byte content against
the word-level RW rows the witness builder emits, with zero
byte-decomposition gadgets. Bytes outside [addr, addr_end) are is_pad
rows carrying the surrounding memory content (constrained unchanged:
byte == prev_byte on pad rows of write events).

Per supported flow:
- BYTECODE -> MEMORY (CODECOPY): per-byte BytecodeTable lookup on non-pad
  rows + word WRITE RwTable lookups on anchors.
- TX_CALLDATA -> MEMORY (root CALLDATACOPY): word WRITE lookups; calldata
  bytes carried as witness (TxTable lookup arrives with the Tx circuit).
- MEMORY -> TX_LOG (LOGn data): word READ lookups + per-byte TxLog DATA
  RwTable lookups.
- MEMORY -> RLC_ACC (SHA3) and MEMORY -> RETURN_DATA (RETURN/REVERT):
  word READ lookups; the keccak link lands with the EVM SHA3 state.

v2 (this file): the event structure is fully pinned and exposed as a
CopyTable for the EVM circuit (reference table.rs:1724 CopyTable):
- a per-row memory byte-address chain (maddr = 32*wa + j) makes is_pad
  SOUND: pad can fall only at maddr == src/dst start (a0) and rise only
  at a0 + len — both transitions are unique because maddr strictly
  increases — and the event-end row binds the non-pad count to len;
- event-level cells (start addr, other-side addr, length, word count,
  first rw counter) are event-constant and surfaced on is_first rows;
- TX_CALLDATA sources are bound per byte to the TxTable (root
  CALLDATACOPY), when a TxTable is provided;
- RLC_ACC destinations (SHA3) accumulate a phase-1 keccak_input RLC
  over the non-pad bytes and bind (rlc, len) -> digest halves through
  the KeccakTable, when one is provided.

Remaining gaps: memory->memory copies (non-root CALLDATACOPY),
RETURN_DATA as a source (returndatacopy src binding), out-of-range
CODECOPY zero-fill (assigner rejects).
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr
from zkevm_tpu.witness.builder import CopyDataType, CopyEvent
from zkevm_tpu.witness.rw import RW, RwMap, Target

FR = fr_spec()
WORD = 32
M128 = (1 << 128) - 1


@dataclass
class CopyTable:
    """Event surface on is_first rows: (enabled, t_src, t_dst, src_id_lo,
    src_id_hi, dst_id, aux_id, mem_addr, other_addr, length, rwc_first,
    n_words, digest_lo, digest_hi). mem_addr is the memory-side start;
    other_addr the non-memory side's (reference table.rs:1724)."""

    exprs: list

    def lookup(self, cs: ConstraintSystem, name: str, inputs: list) -> None:
        assert len(inputs) == len(self.exprs)
        cs.lookup(name, list(zip(inputs, self.exprs)))


@dataclass
class CopyConfig:
    q_act: Column  # fixed: region rows
    q_word: Column  # fixed: every 32nd region row (word anchors)
    is_ev: Column
    is_first: Column  # first row of an event (always a word anchor)
    s_mem: Column  # src-type one-hot (under is_ev)
    s_code: Column
    s_free: Column  # src with no lookup yet (TX_CALLDATA, RETURN_DATA)
    d_mem: Column  # dst-type one-hot
    d_log: Column
    d_free: Column  # dst with no lookup (RLC_ACC, RETURN_DATA)
    t_src: Column  # numeric CopyDataType (for the CopyTable surface)
    t_dst: Column
    src_id: Column  # lo half (code-hash lo / call id / tx id)
    src_id_hi: Column
    dst_id: Column
    aux_id: Column  # log_id for TX_LOG events
    wa: Column  # memory word address (per group; +1 per continuation)
    oaddr: Column  # other-side byte address (+1 per row)
    rwc_w: Column  # word RW counter (read at anchors; honest via lookup)
    rwc_d: Column  # per-byte dst RW counter (TX_LOG)
    didx: Column  # per-byte dst data index (TX_LOG storage_key)
    byte: Column  # memory content (new content for write events)
    pbyte: Column  # previous memory content (write events)
    is_code: Column  # bytecode-source is_code flag
    is_pad: Column
    # v2 event structure
    q_gend: Column = None  # fixed: last row of each word group
    maddr: Column = None  # memory byte address chain (32*wa + j)
    a0c: Column = None  # event-constant: memory-side start address
    alen: Column = None  # event-constant: copy length
    w0c: Column = None  # event-constant: first word address
    nwc: Column = None  # event-constant: number of word groups
    lst: Column = None  # materialized event-last-row flag
    s_cd: Column = None  # src is TX_CALLDATA (TxTable-bound)
    d_rlc: Column = None  # dst is RLC_ACC (keccak-bound)
    crlc: Column = None  # phase-1 keccak_input RLC over non-pad bytes
    dlo: Column = None  # event-constant keccak digest halves (RLC events)
    dhi: Column = None
    table: CopyTable = None
    iz_cd: object = None  # IsZero(t_src - TX_CALLDATA) under s_free
    iz_rlc: object = None  # IsZero(t_dst - RLC_ACC) under d_free
    d_sha: Column = None  # dst is RLC_SHA (sha256-precompile-bound)
    iz_sha: object = None  # IsZero(t_dst - RLC_SHA) under d_free
    # v3: BYTECODE destinations (CREATE init-code / code deposit,
    # reference create.rs + begin_tx.rs is_create): per-byte
    # BytecodeTable lookup keyed (dst_id lo, aux_id hi, didx). no_mem
    # marks the TX_CALLDATA->BYTECODE root-create shape where NEITHER
    # side is memory: the bytecode side takes over the row anchoring
    # (addresses start at 0) and both sides bind per byte.
    d_code: Column = None
    no_mem: Column = None
    # v3: MEMORY->MEMORY (MCOPY, EIP-5656; 32-aligned offsets and
    # 32-multiple lengths — the builder guards). The DST side anchors
    # the rows; the SRC side gets its own word-address/rw-counter
    # chains and a second word READ lookup per anchor. The builder
    # emits ALL source reads then all destination writes (as-if-
    # intermediate overlap semantics), so both counters chain by +1.
    mm: Column = None
    wa_s: Column = None
    rwc_s: Column = None


def configure(cs: ConstraintSystem, rw_table, bytecode_table=None,
              tx_table=None, challenges=None,
              keccak_table=None, sha256_table=None) -> CopyConfig:
    q_act = cs.fixed_column()
    q_word = cs.fixed_column()
    q_gend = cs.fixed_column()
    cols = [cs.advice_column() for _ in range(23)]
    (is_ev, is_first, s_mem, s_code, s_free, d_mem, d_log, d_free,
     t_src, t_dst, src_id, src_id_hi, dst_id, aux_id, wa, oaddr,
     rwc_w, rwc_d, didx, byte, pbyte, is_code, is_pad) = cols
    (maddr, a0c, alen, w0c, nwc, lst, s_cd, d_rlc, dlo, dhi, d_sha,
     d_code, no_mem, mm, wa_s, rwc_s) = (cs.advice_column()
                                         for _ in range(16))
    crlc = cs.advice_column(phase=1)

    one = Const(1)
    qa, qw = q_act.cur(), q_word.cur()
    ev, first = is_ev.cur(), is_first.cur()

    # -- booleans + type structure ---------------------------------------
    cs.create_gate("cp_bool", [
        qa * c.cur() * (one - c.cur())
        for c in (is_ev, is_first, s_mem, s_code, s_free, d_mem, d_log,
                  d_free, is_code, is_pad, d_code, no_mem, mm)
    ])
    cs.create_gate("cp_types", [
        qa * (s_mem.cur() + s_code.cur() + s_free.cur() - ev),
        qa * (d_mem.cur() + d_log.cur() + d_free.cur() + d_code.cur()
              - ev),
        # exactly one side is memory (the anchored side) — except the
        # no_mem shape (TX_CALLDATA -> BYTECODE), where the bytecode
        # side anchors at address 0 and both sides bind per byte, and
        # the mm shape (MCOPY), where BOTH sides are memory
        qa * (s_mem.cur() + d_mem.cur() + no_mem.cur() - ev - mm.cur()),
        qa * no_mem.cur() * (one - d_code.cur()),
        qa * no_mem.cur() * a0c.cur(),  # memless events anchor at 0
        qa * mm.cur() * (one - s_mem.cur()),
        qa * mm.cur() * (one - d_mem.cur()),
        first * (one - ev),
        (qa - qw) * first,  # is_first only on word anchors
        # numeric tags for the CopyTable surface
        qa * s_mem.cur() * (t_src.cur() - Const(CopyDataType.MEMORY)),
        qa * s_code.cur() * (t_src.cur() - Const(CopyDataType.BYTECODE)),
        qa * d_mem.cur() * (t_dst.cur() - Const(CopyDataType.MEMORY)),
        qa * d_log.cur() * (t_dst.cur() - Const(CopyDataType.TX_LOG)),
        qa * d_code.cur() * (t_dst.cur() - Const(CopyDataType.BYTECODE)),
    ])

    # -- per-event constancy ---------------------------------------------
    # within a word group (rows 1..31), and across continuation anchors
    per_event = [is_ev, s_mem, s_code, s_free, d_mem, d_log, d_free,
                 t_src, t_dst, src_id, src_id_hi, dst_id, aux_id,
                 a0c, alen, w0c, nwc, s_cd, d_rlc, dlo, dhi,
                 d_code, no_mem, mm]
    inner = qa - qw  # non-anchor region rows
    cont = qw * ev * (one - first)  # continuation anchors
    cs.create_gate("cp_const", [
        inner * (c.cur() - c.rot(-1)) for c in per_event + [wa, wa_s]
    ] + [
        cont * (c.cur() - c.rot(-1)) for c in per_event
    ] + [
        cont * (wa.cur() - wa.rot(-1) - one),
        cont * (wa_s.cur() - wa_s.rot(-1) - one),
    ])
    # address / counter chains (+1 per row; rwc_d/didx advance on non-pad)
    step1 = inner * ev + cont
    np_ = one - is_pad.cur()
    cs.create_gate("cp_chains", [
        step1 * (oaddr.cur() - oaddr.rot(-1) - one),
        step1 * (rwc_d.cur() - rwc_d.rot(-1) - np_),
        step1 * (didx.cur() - didx.rot(-1) - np_),
    ])
    # write events leave surrounding bytes unchanged
    cs.create_gate("cp_pad", [qa * d_mem.cur() * is_pad.cur() * (byte.cur() - pbyte.cur())])

    # -- v2: event structure pinned (sound is_pad + surfaced cells) -------
    # maddr = 32*wa + row-in-group: anchor equation + inner chain
    cs.create_gate("cp_maddr", [
        qw * ev * (maddr.cur() - Const(WORD) * wa.cur()),
        inner * ev * (maddr.cur() - maddr.rot(-1) - one),
    ])
    # first-row structure: w0c anchor; a non-pad first row starts the copy
    # exactly at a0; didx starts at (1 - is_pad) - 1
    cs.create_gate("cp_event_start", [
        first * (w0c.cur() - wa.cur()),
        first * (one - is_pad.cur()) * (maddr.cur() - a0c.cur()),
        first * (didx.cur() + is_pad.cur()),
    ])
    # pad transitions are UNIQUE (maddr strictly increases): the fall can
    # only land on a0, the rise only on a0 + len
    fall = is_pad.rot(-1) * (one - is_pad.cur())
    rise = (one - is_pad.rot(-1)) * is_pad.cur()
    cs.create_gate("cp_pad_edges", [
        step1 * fall * (maddr.cur() - a0c.cur()),
        step1 * rise * (maddr.cur() - a0c.cur() - alen.cur()),
    ])
    # word rw counters are consecutive across anchors (builder emits the
    # event's word reads/writes back-to-back from rw_counter_start)
    cs.create_gate("cp_rwc_chain", [
        cont * (rwc_w.cur() - rwc_w.rot(-1) - one),
        cont * (rwc_s.cur() - rwc_s.rot(-1) - one),
        # mm: src word address anchored to the per-byte src chain, and
        # the write counters start right after the nwc read counters
        qw * mm.cur() * (Const(WORD) * wa_s.cur() - oaddr.cur()),
        qw * mm.cur() * (rwc_w.cur() - rwc_s.cur() - nwc.cur()),
    ])
    # event-last marker: the group-end row whose next anchor starts a new
    # event or is unused; binds non-pad count = len and word count = nwc
    last_expr = q_gend.cur() * ev * (is_first.rot(1) + one - is_ev.rot(1))
    cs.create_gate("cp_last", [
        qa * (lst.cur() - last_expr),
        lst.cur() * (didx.cur() + one - alen.cur()),
        lst.cur() * (nwc.cur() - wa.cur() + w0c.cur() - one),
    ])

    # -- TX_CALLDATA source: per-byte TxTable binding ----------------------
    from zkevm_tpu.gadgets import IsZero

    iz_cd = iz_rlc = None
    if tx_table is not None:
        from zkevm_tpu.circuits.tx_circuit import TxFieldTag

        iz_cd = IsZero.configure(
            cs, qa * s_free.cur(),
            t_src.cur() - Const(CopyDataType.TX_CALLDATA), "cp_iz_cd")
        cs.create_gate("cp_cd_flag", [
            qa * (s_cd.cur() - s_free.cur() * iz_cd.expr()),
        ])
        en_cd = qa * s_cd.cur() * np_
        tx_table.lookup(cs, "cp_calldata_byte", [
            en_cd, en_cd * src_id.cur(),
            en_cd * Const(int(TxFieldTag.CALL_DATA)),
            en_cd * oaddr.cur(), en_cd * byte.cur(), Const(0),
        ])
    else:
        cs.create_gate("cp_no_tx_table", [qa * s_cd.cur()])

    # -- RLC_ACC destination (SHA3): phase-1 RLC + keccak digest binding --
    if keccak_table is not None:
        assert challenges is not None
        iz_rlc = IsZero.configure(
            cs, qa * d_free.cur(),
            t_dst.cur() - Const(CopyDataType.RLC_ACC), "cp_iz_rlc")
        rk = challenges.keccak_input.expr()
        cs.create_gate("cp_rlc", [
            qa * (d_rlc.cur() - d_free.cur() * iz_rlc.expr()),
            first * (crlc.cur() - np_ * byte.cur()),
            step1 * (crlc.cur() - crlc.rot(-1)
                     - np_ * (crlc.rot(-1) * (rk - one) + byte.cur())),
        ])
        en_k = lst.cur() * d_rlc.cur()
        keccak_table.lookup_word(cs, "cp_sha3_digest", en_k,
                                 crlc.cur(), alen.cur(),
                                 dlo.cur(), dhi.cur())
    else:
        cs.create_gate("cp_no_keccak_table", [qa * d_rlc.cur()])

    # -- RLC_SHA destination (sha256 precompile): same phase-1 RLC, but
    # the digest binds into the Sha256Table instead of Keccak ----------
    iz_sha = None
    if sha256_table is not None:
        assert challenges is not None
        iz_sha = IsZero.configure(
            cs, qa * d_free.cur(),
            t_dst.cur() - Const(CopyDataType.RLC_SHA), "cp_iz_sha")
        cs.create_gate("cp_sha", [
            qa * (d_sha.cur() - d_free.cur() * iz_sha.expr()),
        ])
        en_s = lst.cur() * d_sha.cur()
        sha256_table.lookup_word(cs, "cp_presha_digest", en_s,
                                 crlc.cur(), alen.cur(),
                                 dlo.cur(), dhi.cur())
    else:
        cs.create_gate("cp_no_sha_table", [qa * d_sha.cur()])

    # -- word-anchor RwTable lookups -------------------------------------
    def word_half(col: Column, j0: int) -> Expr:
        acc = Const(0)
        for j in range(j0, j0 + 16):
            acc = acc + Const(1 << (8 * (j0 + 15 - j))) * col.rot(j)
        return acc

    v_hi, v_lo = word_half(byte, 0), word_half(byte, 16)
    p_hi, p_lo = word_half(pbyte, 0), word_half(pbyte, 16)
    ZERO = Const(0)
    MEM = Const(int(Target.MEMORY))

    en_r = qw * s_mem.cur() * (one - mm.cur())
    rw_table.lookup(cs, "cp_word_read", [
        en_r, en_r * rwc_w.cur(), ZERO, en_r * MEM, en_r * src_id.cur(),
        en_r * wa.cur(), ZERO, ZERO,
        en_r * v_lo, en_r * v_hi, en_r * v_lo, en_r * v_hi,
    ])
    # mm (MCOPY): the src word READ against its own addr/counter chains;
    # aligned 32-multiple copies mean the dst new content == src content,
    # so the same byte-composed halves serve both lookups
    en_ms = qw * mm.cur()
    rw_table.lookup(cs, "cp_word_read_mm", [
        en_ms, en_ms * rwc_s.cur(), ZERO, en_ms * MEM,
        en_ms * src_id.cur(), en_ms * wa_s.cur(), ZERO, ZERO,
        en_ms * v_lo, en_ms * v_hi, en_ms * v_lo, en_ms * v_hi,
    ])
    en_w = qw * d_mem.cur()
    rw_table.lookup(cs, "cp_word_write", [
        en_w, en_w * rwc_w.cur(), en_w, en_w * MEM, en_w * dst_id.cur(),
        en_w * wa.cur(), ZERO, ZERO,
        en_w * v_lo, en_w * v_hi, en_w * p_lo, en_w * p_hi,
    ])

    # -- per-byte dst TX_LOG data rows -----------------------------------
    en_l = qa * d_log.cur() * np_
    rw_table.lookup(cs, "cp_log_data", [
        en_l, en_l * rwc_d.cur(), en_l, en_l * Const(int(Target.TX_LOG)),
        en_l * dst_id.cur(), en_l * aux_id.cur(), en_l * Const(2),
        en_l * didx.cur(), en_l * byte.cur(), ZERO, ZERO, ZERO,
    ])

    # -- per-byte src bytecode lookup ------------------------------------
    if bytecode_table is not None:
        en_c = qa * s_code.cur() * np_
        bytecode_table.lookup(
            cs, "cp_code_byte", en_c,
            src_id.cur(), src_id_hi.cur(), oaddr.cur(), byte.cur(),
            is_code.cur(),
        )
        # -- per-byte DST bytecode lookup (CREATE init code / deposit):
        # dst code hash in (dst_id lo, aux_id hi), byte index = didx
        en_dc = qa * d_code.cur() * np_
        bytecode_table.lookup(
            cs, "cp_code_byte_dst", en_dc,
            dst_id.cur(), aux_id.cur(), didx.cur(), byte.cur(),
            is_code.cur(),
        )
    else:
        cs.create_gate("cp_no_bytecode_table", [qa * d_code.cur()])

    fc = is_first.cur()
    table = CopyTable([
        fc, fc * t_src.cur(), fc * t_dst.cur(),
        fc * src_id.cur(), fc * src_id_hi.cur(), fc * dst_id.cur(),
        fc * aux_id.cur(), fc * a0c.cur(),
        fc * (oaddr.cur() - maddr.cur() + a0c.cur()),
        fc * alen.cur(), fc * rwc_w.cur(), fc * nwc.cur(),
        fc * dlo.cur(), fc * dhi.cur(),
    ])
    return CopyConfig(
        q_act, q_word, is_ev, is_first, s_mem, s_code, s_free, d_mem,
        d_log, d_free, t_src, t_dst, src_id, src_id_hi, dst_id, aux_id,
        wa, oaddr, rwc_w, rwc_d, didx, byte, pbyte, is_code, is_pad,
        q_gend, maddr, a0c, alen, w0c, nwc, lst, s_cd, d_rlc, crlc,
        dlo, dhi, table, iz_cd, iz_rlc, d_sha, iz_sha, d_code, no_mem,
        mm, wa_s, rwc_s,
    )


def capacity_groups(cs: ConstraintSystem, n: int) -> int:
    return (cs.usable_rows(n) - 1) // WORD


@dataclass
class CopyWitness:
    """Phase-0 assignment + the phase-1 RLC filler for SHA3 events."""

    asg: Assignment
    cfg: CopyConfig
    rlc_plan: list  # (rows, pads, bytes) per event

    def fill_phase1(self, r_keccak: int) -> None:
        for row0, pads, bts in self.rlc_plan:
            acc = 0
            for i, (pad, b) in enumerate(zip(pads, bts)):
                if not pad:
                    acc = (acc * r_keccak + b) % FR_MOD
                self.asg.set_int(self.cfg.crlc, row0 + i, acc)


def assign(
    cs: ConstraintSystem,
    cfg: CopyConfig,
    n: int,
    events: list[CopyEvent],
    rws: RwMap,
    asg: Assignment | None = None,
) -> CopyWitness:
    asg = asg if asg is not None else Assignment(cs, n)
    ngroups = capacity_groups(cs, n)
    m = ngroups * WORD
    one = FR.encode(1)
    asg.cols[cfg.q_act][:m] = one
    for g in range(ngroups):
        asg.cols[cfg.q_word][g * WORD] = one
        asg.cols[cfg.q_gend][g * WORD + WORD - 1] = one

    def _inv(v: int) -> int:
        return pow(v % FR_MOD, FR_MOD - 2, FR_MOD)

    from zkevm_tpu.hash import keccak256

    by_rwc = {r.rw_counter: r for r in rws.rows}
    rlc_plan = []
    g = 0  # next free group
    for ev in events:
        src_is_mem = ev.src_type == CopyDataType.MEMORY
        dst_is_code = ev.dst_type == CopyDataType.BYTECODE
        mem_less = not src_is_mem and dst_is_code  # TX_CALLDATA->BYTECODE
        mem_mem = src_is_mem and ev.dst_type == CopyDataType.MEMORY
        if not src_is_mem and ev.dst_type != CopyDataType.MEMORY \
                and not mem_less:
            raise NotImplementedError("one event side must be memory")
        if mem_mem:
            ln0 = ev.src_addr_end - ev.src_addr
            assert ev.src_addr % WORD == 0 and ev.dst_addr % WORD == 0 \
                and ln0 % WORD == 0, \
                "MCOPY events must be 32-aligned with 32-multiple length"
        if mem_less:
            assert ev.dst_addr == 0 and ev.src_addr == 0, \
                "memless copy events anchor at address 0"
        # the DST side anchors mem->mem events; the memory side anchors
        # everything else
        anchor_src = src_is_mem and not mem_mem
        off = ev.src_addr if anchor_src else ev.dst_addr
        end = (ev.src_addr_end - ev.src_addr) + off
        other0 = ev.dst_addr if anchor_src else ev.src_addr
        w0, w1 = off // WORD, -(-end // WORD) if end > off else off // WORD
        nw = w1 - w0
        if nw == 0:
            continue  # zero-length event: no rows (consumers gate len=0)
        assert g + nw <= ngroups, "copy region overflow"
        ln_ = end - off
        # feature flags only light up when the consumer tables are wired
        is_rlc = (ev.dst_type == CopyDataType.RLC_ACC
                  and cfg.iz_rlc is not None)
        is_sha = (ev.dst_type == CopyDataType.RLC_SHA
                  and cfg.iz_sha is not None)
        is_cd = (ev.src_type == CopyDataType.TX_CALLDATA
                 and cfg.iz_cd is not None)
        dlo_v = dhi_v = 0
        if is_rlc:
            data = bytes(b for b, _ in ev.bytes_)
            dg = int.from_bytes(keccak256(data), "big")
            dlo_v, dhi_v = dg & M128, dg >> 128
        if is_sha:
            import hashlib

            data = bytes(b for b, _ in ev.bytes_)
            dg = int.from_bytes(hashlib.sha256(data).digest(), "big")
            dlo_v, dhi_v = dg & M128, dg >> 128

        src_words = None
        if mem_less:
            # no memory side: synthesize the word-group bytes from the
            # event payload (both sides bind per byte via table lookups)
            data_all = bytes(b for b, _ in ev.bytes_).ljust(nw * WORD,
                                                            b"\x00")
            words = None
        elif mem_mem:
            # builder order: nw src READS then nw dst WRITES
            src_words = [by_rwc[ev.rw_counter_start + i]
                         for i in range(nw)]
            words = [by_rwc[ev.rw_counter_start + nw + i]
                     for i in range(nw)]
            for w_ in src_words + words:
                assert w_.tag == Target.MEMORY and w_.id == ev.src_id
        else:
            mem_id = ev.src_id if src_is_mem else ev.dst_id
            # word rows by rw counter (builder: consecutive from
            # rw_counter_start)
            words = [by_rwc[ev.rw_counter_start + i] for i in range(nw)]
            for w in words:
                assert w.tag == Target.MEMORY and w.id == mem_id

        # per-byte dst rows for TX_LOG: locate the first DATA row
        rwc_d0 = 0
        if ev.dst_type == CopyDataType.TX_LOG:
            rwc_d0 = next(
                r.rw_counter for r in rws.rows
                if r.tag == Target.TX_LOG and r.field == 2
                and r.id == ev.dst_id and r.address == ev.dst_addr
                and r.storage_key == 0
            )

        if ev.src_type == CopyDataType.BYTECODE:
            assert ev.src_addr_end <= ev.src_addr + len(ev.bytes_), \
                "out-of-range CODECOPY zero-fill is a v1 gap"

        t_src, t_dst = ev.src_type, ev.dst_type
        sid_lo, sid_hi = ev.src_id & M128, ev.src_id >> 128
        # BYTECODE dst ids are 256-bit code hashes: lo half in dst_id,
        # hi half in aux_id (unused by code events otherwise)
        did_lo = ev.dst_id & M128 if dst_is_code else ev.dst_id
        did_hi = ev.dst_id >> 128 if dst_is_code else 0
        cur_d = -1  # running non-pad counters (didx / rwc_d chains)
        cur_rwc = rwc_d0 - 1
        pads_ev, bytes_ev = [], []
        for gi in range(nw):
            if mem_less:
                vb = data_all[gi * WORD : (gi + 1) * WORD]
                pb = bytes(WORD)
            else:
                word = words[gi]
                vb = int(word.value).to_bytes(32, "big")
                pb = int(word.value_prev).to_bytes(32, "big")
            for j in range(WORD):
                r = (g + gi) * WORD + j
                mb = WORD * (w0 + gi) + j  # memory byte address
                pad = not (off <= mb < end)
                asg.set_int(cfg.is_ev, r, 1)
                if gi == 0 and j == 0:
                    asg.set_int(cfg.is_first, r, 1)
                asg.set_int(cfg.s_mem, r, int(src_is_mem))
                asg.set_int(cfg.s_code, r, int(ev.src_type == CopyDataType.BYTECODE))
                asg.set_int(cfg.s_free, r, int(not src_is_mem and ev.src_type != CopyDataType.BYTECODE))
                asg.set_int(cfg.d_mem, r, int(ev.dst_type == CopyDataType.MEMORY))
                asg.set_int(cfg.d_log, r, int(ev.dst_type == CopyDataType.TX_LOG))
                asg.set_int(cfg.d_code, r, int(dst_is_code))
                asg.set_int(cfg.no_mem, r, int(mem_less))
                asg.set_int(cfg.d_free, r, int(
                    src_is_mem
                    and ev.dst_type != CopyDataType.TX_LOG
                    and not dst_is_code and not mem_mem))
                asg.set_int(cfg.mm, r, int(mem_mem))
                asg.set_int(cfg.wa_s, r,
                            (ev.src_addr // WORD + gi) if mem_mem else gi)
                asg.set_int(cfg.rwc_s, r,
                            src_words[gi].rw_counter if mem_mem else gi)
                asg.set_int(cfg.t_src, r, t_src)
                asg.set_int(cfg.t_dst, r, t_dst)
                asg.set_int(cfg.src_id, r, sid_lo)
                asg.set_int(cfg.src_id_hi, r, sid_hi)
                asg.set_int(cfg.dst_id, r, did_lo)
                asg.set_int(cfg.aux_id, r,
                            ev.dst_addr if ev.dst_type == CopyDataType.TX_LOG
                            else did_hi)
                asg.set_int(cfg.wa, r, w0 + gi)
                asg.set_int(cfg.oaddr, r, (other0 + (mb - off)) % FR_MOD)
                asg.set_int(cfg.rwc_w, r,
                            gi if mem_less else word.rw_counter)
                if not pad:
                    cur_d += 1
                    cur_rwc += 1
                asg.set_int(cfg.didx, r, cur_d % FR_MOD)
                asg.set_int(cfg.rwc_d, r, cur_rwc % FR_MOD)
                asg.set_int(cfg.byte, r, vb[j])
                asg.set_int(cfg.pbyte, r, pb[j])
                if not pad and (ev.src_type == CopyDataType.BYTECODE
                                or dst_is_code):
                    asg.set_int(cfg.is_code, r, int(ev.bytes_[mb - off][1]))
                asg.set_int(cfg.is_pad, r, int(pad))
                # v2 event structure
                asg.set_int(cfg.maddr, r, mb)
                asg.set_int(cfg.a0c, r, off)
                asg.set_int(cfg.alen, r, ln_)
                asg.set_int(cfg.w0c, r, w0)
                asg.set_int(cfg.nwc, r, nw)
                asg.set_int(cfg.s_cd, r, int(is_cd))
                asg.set_int(cfg.d_rlc, r, int(is_rlc))
                asg.set_int(cfg.d_sha, r, int(is_sha))
                asg.set_int(cfg.dlo, r, dlo_v)
                asg.set_int(cfg.dhi, r, dhi_v)
                if cfg.iz_cd is not None and not src_is_mem \
                        and ev.src_type != CopyDataType.BYTECODE:
                    asg.set_int(cfg.iz_cd.inv, r,
                                _inv(t_src - CopyDataType.TX_CALLDATA))
                if cfg.iz_rlc is not None and src_is_mem \
                        and ev.dst_type != CopyDataType.TX_LOG \
                        and not dst_is_code:
                    asg.set_int(cfg.iz_rlc.inv, r,
                                _inv(t_dst - CopyDataType.RLC_ACC))
                if cfg.iz_sha is not None and src_is_mem \
                        and ev.dst_type != CopyDataType.TX_LOG \
                        and not dst_is_code:
                    asg.set_int(cfg.iz_sha.inv, r,
                                _inv(t_dst - CopyDataType.RLC_SHA))
                pads_ev.append(pad)
                bytes_ev.append(vb[j])
        asg.set_int(cfg.lst, (g + nw) * WORD - 1, 1)
        rlc_plan.append((g * WORD, pads_ev, bytes_ev))
        g += nw
    return CopyWitness(asg, cfg, rlc_plan)
