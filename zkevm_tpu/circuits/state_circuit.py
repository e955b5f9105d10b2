"""State circuit: in-circuit lexicographic ordering + read/write
consistency of the RW table.

Reference counterpart: zkevm-circuits/src/state_circuit.rs:56-86 with
state_circuit/lexicographic_ordering.rs (first_different_limb +
limb_difference over 16-bit limbs of the packed sort key) and
multiple_precision_integer.rs (key limb decomposition). Round 1 only had
a host-side audit (witness/rw.py check_consistency); this module makes
the ordering and consistency *proven*.

TPU-native redesign of the lexicographic gadget: instead of a
BinaryNumber first_different_limb index with per-limb equality chips, the
key is one LANES-wide vector column K (limbs, most-significant first) and
the "first differing limb" witness is a monotone boolean vector column P
(P_j = 1 iff the first difference is at lane <= j). Three *vector* gates
(boolean, monotone via lane roll, prefix-equality) plus one scalar
lane-combined difference lookup replace the reference's per-limb chip
stack; all lanes evaluate as one (n, LANES) array op.

Sort key layout (MSB lane first), widths in bits:
  tag(B) | id(32) | address(160) | field_tag(B) | storage_key(240) | rwc(32)
with B = LIMB_BITS per lane. storage_key is capped at 240 bits this
round (< 2^252 keeps the scalar binding injective in Fr); full 256-bit
word keys arrive with the word-RLC upgrade (reference keeps sort-key
bytes separate from the RLC'd word for the same reason).

Padding: rows after the last real op carry tag=PADDING (sorts above every
real tag) with rw_counter counting up — each padding row is a read of
value 0 in its own trailing group, so every row of the region satisfies
the same uniform constraint set (reference pads with Start rows at the
front, circuit_input_builder.rs:455; padding at the tail composes better
with our fixed-capacity layout).

Values are 256-bit EVM words stored as (value_lo, value_hi) 128-bit
halves — the PSE word-lo-hi representation rather than scroll v0.14's
challenge-RLC words: injective without randomness, so the RW fabric stays
phase-0 (word RLC would force every RW consumer into phase 1). The halves
are range-checked here (one limb vector column), so EVM-circuit consumers
can treat looked-up halves as < 2^128 for free.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.gadgets import BinaryNumber, RangeTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ColumnGroup, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr, GroupQuery
from zkevm_tpu.witness.rw import RW, RwRow, Target

FR = fr_spec()

PADDING_TAG = 12  # one above Target.TX_RECEIPT; sorts after all real rows

# bit widths of the sort-key fields (id/address/rwc as in the reference's
# MPI config: u32 ids, 160-bit addresses, u32 rw_counter)
ID_BITS = 32
ADDR_BITS = 160
SKEY_BITS = 240
RWC_BITS = 32


def _nlanes(bits: int, B: int) -> int:
    return -(-bits // B)


@dataclass
class StateConfig:
    limb_bits: int
    q_active: Column  # fixed: 1 on every region row
    q_first: Column  # fixed: 1 on the first region row
    q_ord: Column  # fixed: 1 on region rows 1.. (prev row also in region)
    rwc: Column
    is_write: Column
    tag: Column
    id: Column
    address: Column
    field_tag: Column
    storage_key: Column
    value_lo: Column
    value_hi: Column
    value_prev_lo: Column
    value_prev_hi: Column
    tag_bits: BinaryNumber
    key: ColumnGroup  # LANES advice: sort-key limbs, MSB lane first
    pfx: ColumnGroup  # LANES advice: monotone boolean prefix vector P
    lane_mask: ColumnGroup  # LANES fixed: 0 on lane 0, q_ord elsewhere
    val_limbs: ColumnGroup  # 2*VLANES advice: value_lo/value_hi B-bit limbs
    range_table: RangeTable
    lanes: int
    spans: dict  # field name -> (start lane, lane count)
    q_slast: Column  # fixed: last region row
    cnt: Column  # running count of real (non-padding) rows
    count_surface: list  # (enabled, cnt) exprs for the EVM's end-rwc bind
    init_lo: Column = None  # group-initial value (the MPT v_old)
    init_hi: Column = None
    root: Column = None  # running storage-trie root
    gl: Column = None  # storage-group-last indicator (MPT lookup enable)
    roots_surface: list = None  # [(qf, root), (q_slast, root)]


def configure(
    cs: ConstraintSystem, limb_bits: int = 12,
    range_table: RangeTable | None = None, mpt_table=None,
) -> StateConfig:
    B = limb_bits
    spans = {}
    lane = 0
    for name, bits in [
        ("tag", B),
        ("id", ID_BITS),
        ("address", ADDR_BITS),
        ("field_tag", B),
        ("storage_key", SKEY_BITS),
        ("rwc", RWC_BITS),
    ]:
        w = _nlanes(bits, B)
        spans[name] = (lane, w)
        lane += w
    LANES = lane

    q_active = cs.fixed_column()
    q_first = cs.fixed_column()
    q_ord = cs.fixed_column()
    q_slast = cs.fixed_column()
    cnt = cs.advice_column()
    rwc = cs.advice_column()
    is_write = cs.advice_column()
    tag = cs.advice_column()
    id_ = cs.advice_column()
    address = cs.advice_column()
    field_tag = cs.advice_column()
    storage_key = cs.advice_column()
    value_lo = cs.advice_column()
    value_hi = cs.advice_column()
    value_prev_lo = cs.advice_column()
    value_prev_hi = cs.advice_column()
    tag_bits = BinaryNumber.configure(cs, q_active.cur(), 4, "state_tag")
    key = cs.advice_group("st_key", LANES)
    pfx = cs.advice_group("st_pfx", LANES)
    lane_mask = cs.fixed_group("st_mask", LANES)
    VLANES = _nlanes(128, B)
    val_limbs = cs.advice_group("st_val", 2 * VLANES)
    rt = range_table or RangeTable.configure(cs, B)
    init_lo = init_hi = root = gl = None
    if mpt_table is not None:
        init_lo, init_hi = cs.advice_column(), cs.advice_column()
        root, gl = cs.advice_column(), cs.advice_column()

    one = Const(1)
    qa, qo, qf = q_active.cur(), q_ord.cur(), q_first.cur()
    K, P, M = key.q, pfx.q, lane_mask.q

    # -- limb decomposition binds the scalar key columns ------------------
    for name, col in [
        ("tag", tag),
        ("id", id_),
        ("address", address),
        ("field_tag", field_tag),
        ("storage_key", storage_key),
        ("rwc", rwc),
    ]:
        start, w = spans[name]
        acc = Const(0)
        for j in range(start, start + w):
            acc = acc * Const(1 << B) + key.columns[j].cur()
        cs.create_gate(f"state_bind_{name}", [qa * (col.cur() - acc)])
    # every limb is range-checked to B bits
    rt.lookup(cs, "state_limb", [qa * c.cur() for c in key.columns])
    cs.create_gate("state_tag_bits", [qa * (tag.cur() - tag_bits.value())])
    # value halves bound to B-bit limbs (MSB lane first per half) and
    # range-checked -> every looked-up half is provably < 2^128
    for hname, hcol, h0 in [("lo", value_lo, 0), ("hi", value_hi, VLANES)]:
        acc = Const(0)
        for j in range(h0, h0 + VLANES):
            acc = acc * Const(1 << B) + val_limbs.columns[j].cur()
        cs.create_gate(f"state_bind_value_{hname}", [qa * (hcol.cur() - acc)])
    rt.lookup(cs, "state_val_limb", [qa * c.cur() for c in val_limbs.columns])

    # -- lexicographic ordering (vector first-difference gadget) ----------
    # P boolean; P monotone along lanes (lane roll; lane 0 masked out);
    # P_last = 1 (strict increase: some lane differs)
    cs.create_vector_gate("state_pfx_bool", qo * P() * (P() - one), LANES)
    dP = P() - GroupQuery(pfx, 0, 1)  # lane j minus lane j-1 (cyclic)
    cs.create_vector_gate("state_pfx_mono", M() * dP * (one - dP), LANES)
    cs.create_gate("state_pfx_last", [qo * (pfx.columns[LANES - 1].cur() - one)])
    # lanes before the first difference are equal to the previous row
    cs.create_vector_gate(
        "state_key_eq", qo * (one - P()) * (K() - K(-1)), LANES
    )
    # the first differing limb increased: sum_j (P_j - P_{j-1})(K_j - K_j^prev)
    # is that limb's difference; it must be in [1, 2^B-1]
    diff = Const(0)
    for j in range(LANES):
        s = pfx.columns[j].cur()
        if j > 0:
            s = s - pfx.columns[j - 1].cur()
        diff = diff + s * (key.columns[j].cur() - key.columns[j].rot(-1))
    rt.lookup(cs, "state_diff", [qo * (diff - one)])

    # -- read/write consistency ------------------------------------------
    # new_group = 1 iff the first difference is within the key fields
    # (i.e. before the rwc lanes): cumulative P at the last non-rwc lane
    rwc_start, _ = spans["rwc"]
    new_group = pfx.columns[rwc_start - 1].cur()
    same = one - new_group
    cs.create_gate(
        "state_consistency",
        [
            qa * is_write.cur() * (one - is_write.cur()),
            # a read returns the previous value in its group
            qo * same * (one - is_write.cur()) * (value_lo.cur() - value_lo.rot(-1)),
            qo * same * (one - is_write.cur()) * (value_hi.cur() - value_hi.rot(-1)),
            # value_prev always carries the group's previous value
            qo * same * (value_prev_lo.cur() - value_lo.rot(-1)),
            qo * same * (value_prev_hi.cur() - value_hi.rot(-1)),
        ],
    )
    # per-tag first-access rules (reference state_circuit/constraint_builder):
    # STACK first access must be a write; MEMORY first read returns 0;
    # PADDING rows are zero-valued reads
    ind = tag_bits.value_equals
    cs.create_gate(
        "state_first_access",
        [
            (qo * new_group + qf) * ind(int(Target.STACK)) * (one - is_write.cur()),
            (qo * new_group + qf)
            * ind(int(Target.MEMORY))
            * (one - is_write.cur())
            * (value_lo.cur() + value_hi.cur()),
            qa * ind(PADDING_TAG) * is_write.cur(),
            qa * ind(PADDING_TAG) * (value_lo.cur() + value_hi.cur()),
        ],
    )

    # -- MptTable connection (state_circuit.rs mpt lookups / scroll's
    # MptUpdates): each STORAGE group's last row proves the slot's
    # (initial -> final) transition against one MPT update row, and the
    # running `root` column chains update roots across the region so
    # (root@first, root@last) are the block's storage state roots -------
    roots_surface = None
    if mpt_table is not None:
        ind_sto = tag_bits.value_equals(int(Target.STORAGE))
        nxt_new_group = pfx.columns[rwc_start - 1].rot(1)
        cs.create_gate("state_mpt", [
            # group-initial value threading
            (qo * new_group + qf) * (init_lo.cur() - value_prev_lo.cur()),
            (qo * new_group + qf) * (init_hi.cur() - value_prev_hi.cur()),
            qo * same * (init_lo.cur() - init_lo.rot(-1)),
            qo * same * (init_hi.cur() - init_hi.rot(-1)),
            # gl = storage row whose successor opens a new group
            qa * (gl.cur() - ind_sto * nxt_new_group),
            # the root changes only across storage-group-last rows
            qo * (one - gl.rot(-1)) * (root.cur() - root.rot(-1)),
        ])
        mpt_table.lookup(cs, "state_mpt_update", [
            gl.cur(),
            gl.cur() * address.cur(),
            gl.cur() * storage_key.cur(),
            gl.cur() * init_lo.cur(),
            gl.cur() * init_hi.cur(),
            gl.cur() * value_lo.cur(),
            gl.cur() * value_hi.cur(),
            gl.cur() * root.cur(),
            gl.cur() * root.rot(1),
        ])
        roots_surface = [(qf, root.cur()), (q_slast.cur(), root.cur())]

    # -- rw-set completeness: count the real rows ------------------------
    # real rows are a PREFIX (padding sorts last); cnt accumulates them
    # and the last region row exposes the total so the EVM circuit can
    # bind its final rw counter to it (reference: end_block.rs's
    # total-rws argument; with the EVM's contiguous counter coverage this
    # pins the RwTable to EXACTLY the executed accesses).
    is_real = one - ind(PADDING_TAG)
    cs.create_gate("state_count", [
        qf * (cnt.cur() - is_real),
        qo * (cnt.cur() - cnt.rot(-1) - is_real),
    ])
    count_surface = [q_slast.cur(), q_slast.cur() * cnt.cur()]

    return StateConfig(
        B, q_active, q_first, q_ord, rwc, is_write, tag, id_, address,
        field_tag, storage_key, value_lo, value_hi, value_prev_lo,
        value_prev_hi, tag_bits, key, pfx, lane_mask, val_limbs, rt,
        LANES, spans, q_slast, cnt, count_surface,
        init_lo, init_hi, root, gl, roots_surface,
    )


def capacity(cs: ConstraintSystem, cfg: StateConfig, n: int) -> int:
    """Max RW rows the region holds. One lookup-active row (active rows =
    usable - 1, the prover's l_active gating) stays outside the region so
    the RwTable surface keeps an all-zero row — the match for consumers'
    disabled lookup slots."""
    return cs.usable_rows(n) - 2


def _limbs_of(values: np.ndarray, start: int, w: int, B: int, out: np.ndarray, objcol=None):
    """Decompose uint64 values (or Python ints via objcol) into w B-bit
    limbs, MSB lane first, into out[:, start:start+w]."""
    if objcol is not None:
        for j in range(w):
            sh = B * (w - 1 - j)
            out[:, start + j] = [(int(v) >> sh) & ((1 << B) - 1) for v in objcol]
    else:
        for j in range(w):
            sh = np.uint64(B * (w - 1 - j))
            out[:, start + j] = (values >> sh) & np.uint64((1 << B) - 1)


def assign(
    cs: ConstraintSystem,
    cfg: StateConfig,
    n: int,
    rows: list[RwRow],
    asg: Assignment | None = None,
    trie=None,
    updates_out: list | None = None,
) -> Assignment:
    """rows: RW ops in ANY order; sorted + padded here (the circuit proves
    the ordering). Region size = usable rows. With an MptTable connection
    configured, pass the PRE-STATE storage ZkTrie: storage-group
    transitions are applied to it in row order and the resulting
    MptUpdate records are appended to `updates_out` (feed them to
    mpt_circuit.assign)."""
    asg = asg if asg is not None else Assignment(cs, n)
    B = cfg.limb_bits
    cfg.range_table.load(asg)
    m = capacity(cs, cfg, n)  # region rows (one zero row reserved)
    srows = sorted(rows, key=RwRow.sort_key)
    npad = m - len(srows)
    assert npad >= 0, f"{len(srows)} RW rows > capacity {m}"
    max_rwc = max((r.rw_counter for r in srows), default=0)

    one = FR.encode(1)
    asg.cols[cfg.q_active][:m] = one
    asg.cols[cfg.q_first][0] = one
    asg.cols[cfg.q_ord][1:m] = one
    asg.cols[cfg.q_slast][m - 1] = one
    cnts = np.minimum(np.arange(1, m + 1, dtype=np.uint64), len(srows))
    asg.set_u64s(cfg.cnt, 0, cnts)
    for j in range(1, cfg.lanes):
        asg.cols[cfg.lane_mask.columns[j]][1:m] = one

    tags = np.array(
        [int(r.tag) for r in srows] + [PADDING_TAG] * npad, dtype=np.uint64
    )
    ids = np.array([r.id for r in srows] + [0] * npad, dtype=np.uint64)
    addrs = [r.address for r in srows] + [0] * npad
    fields = np.array([r.field for r in srows] + [0] * npad, dtype=np.uint64)
    skeys = [r.storage_key for r in srows] + [0] * npad
    rwcs = np.array(
        [r.rw_counter for r in srows]
        + [max_rwc + 1 + i for i in range(npad)],
        dtype=np.uint64,
    )
    writes = np.array([int(r.rw) for r in srows] + [0] * npad, dtype=np.uint64)
    values = [r.value for r in srows] + [0] * npad
    vprevs = [r.value_prev for r in srows] + [0] * npad

    for v in skeys:
        assert 0 <= int(v) < 1 << SKEY_BITS, "storage_key exceeds 240 bits"
    for v in addrs:
        assert 0 <= int(v) < 1 << ADDR_BITS

    asg.set_u64s(cfg.tag, 0, tags)
    asg.set_u64s(cfg.id, 0, ids)
    asg.set_u64s(cfg.field_tag, 0, fields)
    asg.set_u64s(cfg.rwc, 0, rwcs)
    asg.set_u64s(cfg.is_write, 0, writes)
    cfg.tag_bits.assign_rows(asg, 0, tags)
    for r, v in enumerate(addrs):
        asg.set_int(cfg.address, r, int(v))
    for r, v in enumerate(skeys):
        asg.set_int(cfg.storage_key, r, int(v))
    M128 = (1 << 128) - 1
    for v in values:
        assert 0 <= int(v) < 1 << 256
    vlo = [int(v) & M128 for v in values]
    vhi = [int(v) >> 128 for v in values]
    for r in range(m):
        asg.set_int(cfg.value_lo, r, vlo[r])
        asg.set_int(cfg.value_hi, r, vhi[r])
    for r in range(m):
        # value_prev on same-group rows must equal the previous row's
        # value; row 0's cell is only read by the MPT init binding
        asg.set_int(cfg.value_prev_lo, r, int(vprevs[r]) & M128)
        asg.set_int(cfg.value_prev_hi, r, int(vprevs[r]) >> 128)
    if cfg.gl is not None:
        from zkevm_tpu.circuits.mpt_circuit import apply_update

        assert trie is not None, "MPT-connected state circuit needs the trie"
        # group boundaries: next row differs in (tag,id,addr,field,key)
        def grp_key(r):
            return RwRow.sort_key(r)[:5]

        upds = []
        i = 0
        while i < len(srows):
            j = i
            while (j + 1 < len(srows)
                   and grp_key(srows[j + 1]) == grp_key(srows[i])):
                j += 1
            if srows[i].tag == Target.STORAGE:
                last = srows[j]
                u = apply_update(trie, last.address, last.storage_key,
                                 int(last.value) & ((1 << 128) - 1),
                                 int(last.value) >> 128)
                upds.append(u)
                asg.set_int(cfg.gl, j, 1)
            i = j + 1
        if updates_out is not None:
            updates_out.extend(upds)
        # init columns: the group's first value_prev threaded down
        gi = 0
        cur_init = 0
        for r in range(m):
            if r == 0 or (r < len(srows)
                          and grp_key(srows[r]) != grp_key(srows[r - 1])) \
                    or (r >= len(srows) and r == len(srows)):
                cur_init = int(vprevs[r])
            asg.set_int(cfg.init_lo, r, cur_init & M128)
            asg.set_int(cfg.init_hi, r, cur_init >> 128)
        # root chain: starts at the pre-state root, advances after each
        # storage-group-last row
        rootv = upds[0].root_old if upds else trie.root
        k = 0
        for r in range(m):
            asg.set_int(cfg.root, r, rootv)
            if k < len(upds) and r < len(srows) \
                    and srows[r].tag == Target.STORAGE:
                # advance when this row is the group-last (gl set above)
                if int(FR.decode(asg.cols[cfg.gl][r])) == 1:
                    rootv = upds[k].root_new
                    k += 1

    VLANES = _nlanes(128, B)
    vlimbs = np.zeros((m, 2 * VLANES), dtype=np.uint64)
    _limbs_of(None, 0, VLANES, B, vlimbs, objcol=vlo)
    _limbs_of(None, VLANES, VLANES, B, vlimbs, objcol=vhi)
    for j in range(2 * VLANES):
        asg.set_u64s(cfg.val_limbs.columns[j], 0, vlimbs[:, j])

    # key limbs (MSB lane first per field)
    limbs = np.zeros((m, cfg.lanes), dtype=np.uint64)
    _limbs_of(tags, *cfg.spans["tag"], B, limbs)
    _limbs_of(ids, *cfg.spans["id"], B, limbs)
    _limbs_of(None, *cfg.spans["address"], B, limbs, objcol=addrs)
    _limbs_of(fields, *cfg.spans["field_tag"], B, limbs)
    _limbs_of(None, *cfg.spans["storage_key"], B, limbs, objcol=skeys)
    _limbs_of(rwcs, *cfg.spans["rwc"], B, limbs)
    for j in range(cfg.lanes):
        asg.set_u64s(cfg.key.columns[j], 0, limbs[:, j])

    # prefix vector P: rows 1..m-1, P_j = 1 iff first diff lane <= j
    dif = limbs[1:m] != limbs[: m - 1]
    first = np.where(dif.any(axis=1), dif.argmax(axis=1), cfg.lanes - 1)
    pfx = (np.arange(cfg.lanes)[None, :] >= first[:, None]).astype(np.uint64)
    for j in range(cfg.lanes):
        asg.set_u64s(cfg.pfx.columns[j], 1, pfx[:, j])
    return asg


def fix_value_prev(rows: list[RwRow]) -> list[RwRow]:
    """Return rows with value_prev rewritten to the group-previous value
    (what the circuit constrains on every same-group row). Builders that
    already track prev values per tag can skip this."""
    import dataclasses

    srows = sorted(rows, key=RwRow.sort_key)
    out = []
    prev_key, prev_val = None, 0
    for r in srows:
        k = r.sort_key()[:5]
        if k == prev_key:
            out.append(dataclasses.replace(r, value_prev=prev_val))
        else:
            out.append(r)
        prev_key, prev_val = k, r.value
    return out
