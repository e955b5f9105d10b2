"""Block witness container + block_convert: the bridge from traced
transactions to the circuit-facing witness.

Reference counterparts:
- `CircuitsParams` (bus-mapping/src/circuit_input_builder.rs:74-118):
  per-subcircuit row capacities fixed up front (the TPU static-shape
  discipline is exactly this max-row idiom);
- `witness::Block` + `block_convert` (zkevm-circuits/src/witness/
  block.rs:39,578): one object holding every subcircuit's input — RW map,
  exec steps, bytecodes, txs, copy/exp events, block context.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.circuits.pi_circuit import BlockContext
from zkevm_tpu.etypes.tx import Transaction
from zkevm_tpu.testctx import TestContext
from zkevm_tpu.witness.builder import CircuitInputBuilder, CopyEvent, ExpEvent
from zkevm_tpu.witness.rw import RwMap


@dataclass
class CircuitsParams:
    """Row/capacity budgets (circuit_input_builder.rs:74 CircuitsParams).
    Defaults are test-scale; production presets live with the prover
    orchestration (super_circuit/params.rs analog)."""

    max_txs: int = 2
    max_calldata: int = 64  # per tx slot (tx circuit cd_cap)
    max_rlp: int = 160  # per tx rlp stream capacity
    max_rws: int = 0  # 0 = derive from k
    max_copy_groups: int = 0
    max_exp_steps: int = 0
    k_min: int = 11
    k_max: int = 22


@dataclass
class Block:
    """Everything the circuits consume for one chunk (witness/block.rs:39)."""

    context: BlockContext
    txs: list[Transaction]
    codes: list[bytes]
    rws: RwMap
    steps: list
    copy_events: list[CopyEvent]
    exp_events: list[ExpEvent]
    calls: list = field(default_factory=list)
    params: CircuitsParams = field(default_factory=CircuitsParams)
    prev_state_root: int = 0
    post_state_root: int = 0
    # precompile side events (builder PrecompileEvents analog)
    sha256_inputs: list = field(default_factory=list)
    ecrecover_sigs: list = field(default_factory=list)
    ecadd_events: list = field(default_factory=list)
    ecmul_events: list = field(default_factory=list)

    @property
    def tx_hashes(self) -> list[bytes]:
        return [tx.hash() for tx in self.txs]


def block_convert(
    ctx: TestContext,
    params: CircuitsParams | None = None,
    builder: CircuitInputBuilder | None = None,
) -> Block:
    """TestContext (+ its replayed builder) -> circuit-facing Block
    (witness/block.rs:578 block_convert). State roots come from the
    Poseidon zktrie over pre/post StateDB when available; zeros otherwise
    (the MPT-circuit link is a later-round item)."""
    params = params or CircuitsParams()
    b = builder if builder is not None else ctx.builder()
    assert len(ctx.txs) <= params.max_txs, "tx count exceeds CircuitsParams"
    for tx in ctx.txs:
        assert len(tx.data) <= params.max_calldata
    codes = [c for h, c in ctx.cdb.codes.items() if len(c)]
    bc = ctx.block_ctx
    context = BlockContext(
        chain_id=ctx.chain_id,
        coinbase=bc.get("coinbase", 0),
        number=bc.get("number", 0),
        timestamp=bc.get("timestamp", 0),
        gas_limit=bc.get("gas_limit", 0),
        base_fee=bc.get("base_fee", 0),
    )
    blk = Block(
        context=context,
        txs=list(ctx.txs),
        codes=codes,
        rws=b.rws,
        steps=b.steps,
        copy_events=b.copy_events,
        exp_events=b.exp_events,
        sha256_inputs=b.sha256_inputs,
        ecrecover_sigs=b.ecrecover_sigs,
        ecadd_events=b.ecadd_events,
        ecmul_events=b.ecmul_events,
        calls=b.calls,
        params=params,
    )
    return blk
