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
from zkevm_tpu.circuits.tables import BytecodeTable, Challenges, RwTable
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


def configure(
    cs: ConstraintSystem,
    params: CircuitsParams | None = None,
    limb_bits: int = 10,
) -> SuperConfig:
    params = params or CircuitsParams()
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    bccfg = bc.configure(cs, ch, ktcfg.table)
    stcfg = st.configure(cs, limb_bits=limb_bits)
    rw_table = RwTable.from_state(stcfg)
    bt = BytecodeTable.from_config(bccfg)
    txcfg = txc.configure(cs, ch, ktcfg.table,
                          cd_cap=params.max_calldata, rlp_cap=params.max_rlp)
    rlpcfg = rlp.configure(cs, txcfg)
    wacfg = wac.configure(cs, txcfg.rt8)
    bwcfg = bwc.configure(cs)
    picfg = pic.configure(cs, ch, ktcfg.table, txcfg, ntx=params.max_txs,
                          rt8=txcfg.rt8)
    excfg = ec.configure(cs, wacfg.table)
    cpcfg = cp.configure(cs, rw_table, bt, tx_table=txcfg.table,
                         challenges=ch, keccak_table=ktcfg.table)
    evcfg = evm.configure(cs, rw_table, bt, tx_table=txcfg.table,
                          rt8=txcfg.rt8, rw_count=stcfg.count_surface,
                          word_table=wacfg.table, bitwise_table=bwcfg.table,
                          block_table=picfg.table, exp_table=excfg.table,
                          copy_table=cpcfg.table)
    return SuperConfig(params, ch, ktcfg, bccfg, stcfg, txcfg, rlpcfg,
                       evcfg, cpcfg, picfg, wacfg, bwcfg, excfg)


def keccak_messages(block: Block) -> list[bytes]:
    from zkevm_tpu.witness.builder import CopyDataType

    codes = [c for c in block.codes if len(c)]
    sha3_inputs = [bytes(b for b, _ in e.bytes_) for e in block.copy_events
                   if e.dst_type == CopyDataType.RLC_ACC]
    return (codes + txc.keccak_messages(block.txs)
            + pic.keccak_messages(block.context, block.tx_hashes)
            + sha3_inputs)


def row_usage(cfg: SuperConfig, block: Block) -> dict:
    """Per-subcircuit row demand (reference super_circuit.rs:536
    min_num_rows_block_subcircuits)."""
    msgs = keccak_messages(block)
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

    def fill_phase1(self, r_keccak: int, r_word: int) -> None:
        self.kwit.fill_phase1(r_keccak, r_word)
        self.bwit.fill_phase1(r_keccak, r_word)
        self.twit.fill_phase1(r_keccak)
        self.pwit.fill_phase1(r_keccak)
        if self.cwit is not None:
            self.cwit.fill_phase1(r_keccak)

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
    (tamper tests)."""
    asg = Assignment(cs, n)
    st.assign(cs, cfg.st, n,
              rows if rows is not None else st.fix_value_prev(block.rws.rows),
              asg)
    kwit = kt.assign(cs, cfg.kt, n, keccak_messages(block), asg)
    bwit = bc.assign(cs, cfg.bc, n, block.codes, asg)
    evm.assign(cs, cfg.ev, n, block.steps, block.rws, asg=asg,
               calls=block.calls)
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
    return SuperWitness(asg, cfg, kwit, bwit, twit, pwit, cwit)
