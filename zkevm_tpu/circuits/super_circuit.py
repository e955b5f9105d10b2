"""SuperCircuit: every implemented subcircuit composed over the shared
table fabric in ONE constraint system.

Reference counterpart: zkevm-circuits/src/super_circuit.rs:472-515 (the
SuperCircuit type), :714-806 (ordered sub-assignment), :536-605 and
:921-938 (per-subcircuit row accounting and k selection). The reference
stacks subcircuits vertically inside shared columns; here each subcircuit
owns its columns over the full height (the vector-column idiom), so
composition is purely additive: one ConstraintSystem, one Assignment,
cross-circuit links via the table lookups:

    EVM circuit  --opcode fetch----->  BytecodeTable (bytecode circuit)
    EVM circuit  --rw slots--------->  RwTable       (state circuit)
    EVM circuit  --BeginTx tx bind-->  TxTable       (tx circuit)
    RLP circuit  --decoded fields--->  TxTable       (field<->bytes binding)
    Copy circuit --word anchors----->  RwTable + BytecodeTable
    bytecode     --code_hash-------->  KeccakTable   (keccak circuit)
    tx circuit   --rlp hashes------->  KeccakTable
    PI circuit   --pi hash---------->  KeccakTable
    PI circuit   <--tx-hash cover-->   TxTable       (both directions)

so a proven block ties every executed opcode to keccak-committed code,
every state access to the lexicographically-proven RwTable, every tx to
its signed RLP hashes, and the whole statement to ONE public instance:
the PI hash (hi, lo).
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.circuits import bitwise_circuit as bwc
from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import copy_circuit as cp
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import exp_circuit as ec
from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import pi_circuit as pic
from zkevm_tpu.circuits import rlp_circuit as rlp
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits import tx_circuit as txc
from zkevm_tpu.circuits import word_arith as wac
from zkevm_tpu.circuits.tables import (BytecodeLenTable, BytecodeTable,
                                       Challenges, RwTable)
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.witness.block import Block, CircuitsParams


@dataclass
class SuperConfig:
    params: CircuitsParams
    challenges: Challenges
    kt: kt.KeccakTableConfig
    bc: bc.BytecodeConfig
    st: st.StateConfig
    tx: txc.TxConfig
    rlp: rlp.RlpConfig
    ev: evm.EvmConfig
    cp: cp.CopyConfig
    pi: pic.PiConfig
    wa: wac.WordArithConfig
    bw: bwc.BitwiseConfig
    ex: ec.ExpConfig
    # full composition (reference super_circuit.rs:472-515 composes all
    # 16 subcircuits; these are None in the reduced configuration)
    pt: object = None   # poseidon_table.PoseidonTableConfig
    mpt: object = None  # mpt_circuit.MptConfig
    sig: object = None  # sig_circuit.SigConfig
    sha: object = None  # sha256_circuit.Sha256Config
    me: object = None   # modexp_circuit.ModExpConfig
    ecc: object = None  # ecc_circuit.EccConfig


def configure(
    cs: ConstraintSystem,
    params: CircuitsParams | None = None,
    limb_bits: int = 10,
    *,
    full: bool = False,
    mpt_depth: int = 248,
) -> SuperConfig:
    """Configure the composed constraint system.

    full=False: the 13-subcircuit composition (round-3 scope).
    full=True: ALL subcircuits (reference super_circuit.rs:472-515):
    adds Poseidon + MPT (with the MptTable wired into the State circuit,
    so storage transitions prove a trie-root transition), Sig (with the
    AddrTable wired into the Tx circuit, so CALLER_ADDRESS is a proven
    ecrecover), SHA256, ModExp and ECC — the precompile table surfaces
    the EVM circuit's precompile-call states consume."""
    from zkevm_tpu.gadgets import RangeTable

    params = params or CircuitsParams()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    bccfg = bc.configure(cs, ch, ktcfg.table)

    ptcfg = mcfg = scfg = shcfg = mecfg = ecccfg = None
    rt8 = addr_table = mpt_table = None
    if full:
        from zkevm_tpu.circuits import ecc_circuit as eccc
        from zkevm_tpu.circuits import modexp_circuit as me
        from zkevm_tpu.circuits import mpt_circuit as mpt
        from zkevm_tpu.circuits import poseidon_table as pt
        from zkevm_tpu.circuits import sha256_circuit as sha
        from zkevm_tpu.circuits import sig_circuit as sg

        rt8 = RangeTable.configure(cs, 8)
        ptcfg = pt.configure(cs)
        mcfg = mpt.configure(cs, ptcfg.table, depth=mpt_depth)
        mpt_table = mcfg.table
        scfg = sg.configure(cs, rt8, challenges=ch, keccak_table=ktcfg.table)
        addr_table = scfg.addr_table
        shcfg = sha.configure(cs, ch)
        mecfg = me.configure(cs, rt8)
        ecccfg = eccc.configure(cs, rt8)

    stcfg = st.configure(cs, limb_bits=limb_bits, mpt_table=mpt_table)
    rw_table = RwTable.from_state(stcfg)
    bt = BytecodeTable.from_config(bccfg)
    txcfg = txc.configure(cs, ch, ktcfg.table,
                          cd_cap=params.max_calldata, rlp_cap=params.max_rlp,
                          rt8=rt8, addr_table=addr_table)
    rlpcfg = rlp.configure(cs, txcfg)
    wacfg = wac.configure(cs, txcfg.rt8)
    bwcfg = bwc.configure(cs)
    picfg = pic.configure(cs, ch, ktcfg.table, txcfg, ntx=params.max_txs,
                          rt8=txcfg.rt8)
    excfg = ec.configure(cs, wacfg.table)
    cpcfg = cp.configure(cs, rw_table, bt, tx_table=txcfg.table,
                         challenges=ch, keccak_table=ktcfg.table,
                         sha256_table=shcfg.table if full else None)
    evcfg = evm.configure(cs, rw_table, bt, tx_table=txcfg.table,
                          rt8=txcfg.rt8, rw_count=stcfg.count_surface,
                          word_table=wacfg.table, bitwise_table=bwcfg.table,
                          block_table=picfg.table, exp_table=excfg.table,
                          copy_table=cpcfg.table,
                          bytecode_len_table=BytecodeLenTable.from_config(
                              bccfg),
                          sig_word_table=(scfg.addr_word_table
                                          if full else None),
                          ecadd_word_table=(ecccfg.add_word_table
                                            if full else None),
                          ecmul_word_table=(ecccfg.mul_word_table
                                            if full else None))
    return SuperConfig(params, ch, ktcfg, bccfg, stcfg, txcfg, rlpcfg,
                       evcfg, cpcfg, picfg, wacfg, bwcfg, excfg,
                       pt=ptcfg, mpt=mcfg, sig=scfg, sha=shcfg, me=mecfg,
                       ecc=ecccfg)


def keccak_messages(block: Block, full: bool = False) -> list[bytes]:
    from zkevm_tpu.witness.builder import CopyDataType

    codes = [c for c in block.codes if len(c)]
    sha3_inputs = [bytes(b for b, _ in e.bytes_) for e in block.copy_events
                   if e.dst_type == CopyDataType.RLC_ACC]
    pks = []
    if full:
        # sig circuit address derivation: keccak(pubkey) per proven sig
        # (tx signatures + ecrecover precompile calls)
        for (_, (qx, qy), _, _) in (txc.sig_inputs(block.txs)
                                    + list(block.ecrecover_sigs)):
            pks.append(qx.to_bytes(32, "big") + qy.to_bytes(32, "big"))
    return (codes + txc.keccak_messages(block.txs)
            + pic.keccak_messages(block.context, block.tx_hashes)
            + sha3_inputs + pks)


def row_usage(cfg: SuperConfig, block: Block) -> dict:
    """Per-subcircuit row demand (reference super_circuit.rs:536
    min_num_rows_block_subcircuits)."""
    full = cfg.mpt is not None
    msgs = keccak_messages(block, full)
    perms = sum(len(m) // kt.RATE + 1 for m in msgs)
    copy_rows = sum(
        cp.WORD * max(1, -(-(e.src_addr_end - e.src_addr) // cp.WORD) + 1)
        for e in block.copy_events
    )
    return {
        "keccak": perms * kt.PERM,
        "bytecode": sum(len(c) + 1 for c in block.codes) + 1,
        "state": len(block.rws.rows) + 2,
        "evm": len(block.steps) + 2,
        "tx": len(block.txs) * cfg.tx.block + 1,
        "copy": copy_rows + cp.WORD + 1,
        "pi": cfg.pi.rows + 1,
        "word_arith": wac.R * (
            len(evm.word_arith_ops(block.steps, block.rws))
            + len(ec.word_arith_ops(evm.exp_events(block.steps, block.rws)))
        ) + 1,
        "exp": sum(
            len(ec.unroll_event(b, e))
            for b, e in evm.exp_events(block.steps, block.rws)
        ) + 1,
        "bitwise": bwc.R * len(evm.bitwise_events(block.steps, block.rws))
        + 769,
    } | (
        _full_row_usage(cfg, block) if cfg.mpt is not None else {}
    )


def _full_row_usage(cfg: SuperConfig, block: Block) -> dict:
    from zkevm_tpu.circuits import sig_circuit as sg
    from zkevm_tpu.witness.rw import Target

    n_storage = len({
        (r.address, r.storage_key)
        for r in block.rws.rows if r.tag == Target.STORAGE
    })
    from zkevm_tpu.circuits import poseidon_table as pt

    depth = cfg.mpt.depth
    from zkevm_tpu.circuits.mpt_circuit import KEY_BITS

    return {
        "mpt": n_storage * KEY_BITS + 1,
        # <= 2 path perms per trie level (old+new) + ~5 key/value perms
        "poseidon": n_storage * (2 * depth + 5) * pt.PERM + 1,
        "sig": (len(block.txs) + len(block.ecrecover_sigs))
        * sg.region_rows(256, True) + 1,
        "sha256": 1,    # no precompile events yet: padding only
        "modexp": 1,
        "ecc": 1,
    }


def choose_k(cfg: SuperConfig, block: Block) -> int:
    """Smallest k whose usable rows fit every subcircuit (reference
    super_circuit.rs:921-938)."""
    need = max(row_usage(cfg, block).values())
    p = block.params
    for k in range(p.k_min, p.k_max + 1):
        # 64-row margin covers usable_rows' blinding tail; 2^8 rows is
        # the u8 range table's floor
        if (1 << k) - 64 >= need and (1 << k) >= 256:
            return k
    raise ValueError(f"{need} rows exceed k<={p.k_max}")


@dataclass
class SuperWitness:
    """Shared assignment + the phase-1 fill hooks of every linked
    subcircuit (keccak RLCs, bytecode byte-RLC, tx rlp RLCs, pi RLC)."""

    asg: Assignment
    cfg: SuperConfig
    kwit: kt.KeccakWitness
    bwit: bc.BytecodeWitness
    twit: txc.TxWitness
    pwit: pic.PiWitness
    cwit: cp.CopyWitness = None
    swit: object = None   # sig_circuit.SigWitness (full composition)
    shwit: object = None  # sha256_circuit.Sha256Witness

    def fill_phase1(self, r_keccak: int, r_word: int) -> None:
        self.kwit.fill_phase1(r_keccak, r_word)
        self.bwit.fill_phase1(r_keccak, r_word)
        self.twit.fill_phase1(r_keccak)
        self.pwit.fill_phase1(r_keccak)
        if self.cwit is not None:
            self.cwit.fill_phase1(r_keccak)
        if self.swit is not None:
            self.swit.fill_phase1(r_keccak)
        if self.shwit is not None:
            self.shwit.fill_phase1(r_keccak, r_word)

    def instance(self) -> list[list[int]]:
        """Public inputs: the PI hash halves (pi circuit instance)."""
        from zkevm_tpu.ff.limbs import fr_spec

        FR = fr_spec()
        col = self.asg.cols[self.cfg.pi.instance]
        return [[FR.decode(col[0]), FR.decode(col[1])]]

    def witness_phases(self):
        """create_proof witness callback: phase-1 advice is computed from
        the transcript challenges, like the reference's multi-phase
        synthesis (util.rs:55)."""
        ch = self.cfg.challenges

        def cb(phase: int, chvals: dict) -> dict:
            if phase == 1:
                self.fill_phase1(
                    chvals[ch.keccak_input], chvals[ch.evm_word]
                )
            return {
                c: self.asg.cols[c]
                for c in self.asg.cs.advice_columns
                if c.phase == phase
            }

        return cb


def assign(
    cs: ConstraintSystem,
    cfg: SuperConfig,
    n: int,
    block: Block,
    *,
    rows=None,
) -> SuperWitness:
    """Assign every subcircuit into one shared Assignment (reference
    super_circuit.rs:714 synthesize order). `rows` overrides the RW rows
    (tamper tests). In the full composition the storage pre-state trie is
    built from the block's first-seen value_prev per slot and every
    storage transition is proven as a zktrie update."""
    full = cfg.mpt is not None
    asg = Assignment(cs, n)
    swit = shwit = None
    if full:
        from zkevm_tpu.circuits import ecc_circuit as eccc
        from zkevm_tpu.circuits import modexp_circuit as me
        from zkevm_tpu.circuits import mpt_circuit as mpt
        from zkevm_tpu.circuits import poseidon_table as pt
        from zkevm_tpu.circuits import sha256_circuit as sha
        from zkevm_tpu.circuits import sig_circuit as sg
        from zkevm_tpu.state.zktrie import ZkTrie
        from zkevm_tpu.witness.rw import Target

        trie = ZkTrie(depth=cfg.mpt.depth)
        seen = set()
        for r in sorted((r for r in block.rws.rows
                         if r.tag == Target.STORAGE),
                        key=lambda r: r.rw_counter):
            slot = (r.address, r.storage_key)
            if slot not in seen:
                seen.add(slot)
                if r.value_prev:
                    trie.update([r.address, r.storage_key], [r.value_prev, 0])
        ups: list = []
        st.assign(cs, cfg.st, n,
                  rows if rows is not None
                  else st.fix_value_prev(block.rws.rows),
                  asg, trie=trie, updates_out=ups)
        states = mpt.poseidon_states(ups, cfg.mpt.depth)
        assert len(states) <= pt.capacity(cs, n), "poseidon capacity"
        pt.assign(cs, cfg.pt, n, states, asg)
        mpt.assign(cs, cfg.mpt, n, ups, asg)
        sigs = txc.sig_inputs(block.txs) + list(block.ecrecover_sigs)
        swit = sg.assign(cs, cfg.sig, n, sigs, asg)
        shwit = sha.assign(cs, cfg.sha, n, list(block.sha256_inputs), asg)
        me.assign(cs, cfg.me, n, getattr(block, "modexp_events", []), asg)
        adds = []
        for (p1, p2, r3) in block.ecadd_events:
            e = eccc.EcAddEvent(p1, p2)
            assert e.result == r3, "traced ecAdd result mismatch"
            adds.append(e)
        muls = []
        for (pt_, k_, r3) in block.ecmul_events:
            e = eccc.EcMulEvent(pt_, k_)
            assert e.result == r3, "traced ecMul result mismatch"
            muls.append(e)
        eccc.assign(cs, cfg.ecc, n, adds, muls, asg)
    else:
        st.assign(cs, cfg.st, n,
                  rows if rows is not None
                  else st.fix_value_prev(block.rws.rows),
                  asg)
    kwit = kt.assign(cs, cfg.kt, n, keccak_messages(block, full), asg)
    bwit = bc.assign(cs, cfg.bc, n, block.codes, asg)
    evm.assign(cs, cfg.ev, n, block.steps, block.rws, asg=asg,
               calls=block.calls, codes=block.codes)
    xevents = evm.exp_events(block.steps, block.rws)
    ec.assign(cs, cfg.ex, n, xevents, asg)
    wac.assign(cs, cfg.wa, n,
               evm.word_arith_ops(block.steps, block.rws)
               + ec.word_arith_ops(xevents), asg)
    bwc.assign(cs, cfg.bw, n, evm.bitwise_events(block.steps, block.rws), asg)
    cwit = cp.assign(cs, cfg.cp, n, block.copy_events, block.rws, asg)
    twit = txc.assign(cs, cfg.tx, n, block.txs, asg)
    rlp.assign(cs, cfg.rlp, n, block.txs, asg)
    pwit = pic.assign(cs, cfg.pi, n, block.context, block.tx_hashes, asg)
    return SuperWitness(asg, cfg, kwit, bwit, twit, pwit, cwit,
                        swit=swit, shwit=shwit)
