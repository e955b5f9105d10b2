"""SuperCircuit: every implemented subcircuit composed over the shared
table fabric in ONE constraint system.

Reference counterpart: zkevm-circuits/src/super_circuit.rs:472-515 (the
SuperCircuit type), :714-806 (ordered sub-assignment), :536-605 and
:921-938 (per-subcircuit row accounting and k selection). The reference
stacks subcircuits vertically inside shared columns; here each subcircuit
owns its columns over the full height (the vector-column idiom), so
composition is purely additive: one ConstraintSystem, one Assignment,
cross-circuit links via the table lookups:

    EVM circuit  --opcode fetch-->  BytecodeTable (bytecode circuit)
    EVM circuit  --rw slots----->   RwTable       (state circuit)
    bytecode     --code_hash---->   KeccakTable   (keccak table circuit)

so a proven block ties every executed opcode to keccak-committed code and
every state access to the lexicographically-proven RW table.
"""

from __future__ import annotations

from dataclasses import dataclass

from zkevm_tpu.circuits import bytecode_circuit as bc
from zkevm_tpu.circuits import evm_circuit as evm
from zkevm_tpu.circuits import keccak_table as kt
from zkevm_tpu.circuits import state_circuit as st
from zkevm_tpu.circuits.tables import BytecodeTable, Challenges, RwTable
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import ConstraintSystem
from zkevm_tpu.witness.builder import CircuitInputBuilder


@dataclass
class SuperConfig:
    challenges: Challenges
    kt: kt.KeccakTableConfig
    bc: bc.BytecodeConfig
    st: st.StateConfig
    ev: evm.EvmConfig


def configure(cs: ConstraintSystem, limb_bits: int = 10) -> SuperConfig:
    ch = Challenges.configure(cs)
    ktcfg = kt.configure(cs, ch)
    bccfg = bc.configure(cs, ch, ktcfg.table)
    stcfg = st.configure(cs, limb_bits=limb_bits)
    evcfg = evm.configure(
        cs, RwTable.from_state(stcfg), BytecodeTable.from_config(bccfg)
    )
    return SuperConfig(ch, ktcfg, bccfg, stcfg, evcfg)


def row_usage(builder: CircuitInputBuilder, codes: list) -> dict:
    """Per-subcircuit row demand (reference super_circuit.rs:536
    min_num_rows_block_subcircuits)."""
    perms = sum(len(c) // kt.RATE + 1 for c in codes)
    return {
        "keccak": perms * kt.PERM,
        "bytecode": sum(len(c) + 1 for c in codes) + 1,
        "state": len(builder.rws.rows) + 2,
        "evm": len(builder.steps) + 2,
    }


def choose_k(cs: ConstraintSystem, builder: CircuitInputBuilder,
             codes: list, k_min: int = 11, k_max: int = 22) -> int:
    """Smallest k whose usable rows fit every subcircuit (reference
    super_circuit.rs:921-938)."""
    need = max(row_usage(builder, codes).values())
    for k in range(k_min, k_max + 1):
        if cs.usable_rows(1 << k) >= need:
            return k
    raise ValueError(f"{need} rows exceed k<={k_max}")


@dataclass
class SuperWitness:
    """Shared assignment + the phase-1 fill hooks of every linked
    subcircuit (keccak RLCs, bytecode byte-RLC)."""

    asg: Assignment
    cfg: SuperConfig
    kwit: kt.KeccakWitness
    bwit: bc.BytecodeWitness

    def fill_phase1(self, r_keccak: int, r_word: int) -> None:
        self.kwit.fill_phase1(r_keccak, r_word)
        self.bwit.fill_phase1(r_keccak, r_word)

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
    builder: CircuitInputBuilder,
    codes: list,
    *,
    callee: int,
    code_hash: int,
    rows=None,
) -> SuperWitness:
    """Assign every subcircuit into one shared Assignment (reference
    super_circuit.rs:714 synthesize order). `rows` overrides the RW rows
    (tamper tests)."""
    asg = Assignment(cs, n)
    st.assign(cs, cfg.st, n,
              rows if rows is not None else st.fix_value_prev(builder.rws.rows),
              asg)
    kwit = kt.assign(cs, cfg.kt, n, [c for c in codes if len(c)], asg)
    bwit = bc.assign(cs, cfg.bc, n, codes, asg)
    evm.assign(cs, cfg.ev, n, builder.steps, builder.rws,
               callee=callee, code_hash=code_hash, asg=asg)
    return SuperWitness(asg, cfg, kwit, bwit)
