"""Keccak-f[1600] circuit: proves keccak256 of one padded rate block.

Reference counterpart: zkevm-circuits' keccak circuit
(zkevm-circuits/src/keccak_circuit.rs:48 + keccak_packed_multi.rs — a
"packed multi" design: 3-bit-spaced packed lanes, 12 rows per round,
normalization lookup tables). This implementation is a from-scratch
TPU-native redesign, NOT a translation:

- the 64 bit positions of a lane are ONE vector column group (64 advice
  columns evaluated as a (rows, 64) tensor on device);
- rho's per-lane bit rotations are GroupQuery lane-rolls, theta/pi wiring
  is fixed row-offset rotations — ZERO copy constraints for wiring (the
  reference's design needs none either, but ours also needs no lookup
  tables: xor/chi are low-degree polynomial gates over boolean cells);
- one permutation costs 25 + 24*75 = 1825 rows at degree 6 -> k = 11
  (matches BASELINE milestone config #1).

Row layout: input state block (25 rows, lane l = x + 5y at row l), then
per round r a 75-row block at base_r = 25 + 75 r:
  +0..24   C rows ("smeared": row l holds C[l mod 5] = xor5 of column x)
  +25..49  A' rows: theta output A[x,y] ^ C[x-1] ^ rot1(C[x+1])
  +50..74  OUT rows: chi(B[x,y], B[x+1,y], B[x+2,y]) (+ iota on lane 0)
The next round reads its A state from the previous OUT block (constant
row offsets; round 0 reads the input block, laid out identically).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from zkevm_tpu.ff.limbs import fr_spec
from zkevm_tpu.hash.keccak import _RC, _ROT, pad_message
from zkevm_tpu.plonk.assign import Assignment
from zkevm_tpu.plonk.cs import Column, ColumnGroup, ConstraintSystem
from zkevm_tpu.plonk.expr import Const, Expr, GroupQuery

FR = fr_spec()

K = 11
N = 1 << K
ROUNDS = 24
BLOCK = 75
INPUT_ROWS = 25
TOTAL_ROWS = INPUT_ROWS + ROUNDS * BLOCK  # 1825


def _xor2(a: Expr, b: Expr) -> Expr:
    return a + b - Const(2) * a * b


def _xor5(vs) -> Expr:
    acc = vs[0]
    for v in vs[1:]:
        acc = _xor2(acc, v)
    return acc  # degree 5 multilinear parity


@dataclass
class KeccakConfig:
    bits: ColumnGroup  # 64 advice columns: the state/working bits
    rc: ColumnGroup  # 64 fixed columns: iota round-constant bits
    q_in: Column  # booleanity on input rows
    q_cap: Column  # capacity lanes of the input must be 0
    q_c: list  # 5 selectors (by y residue) for C rows
    q_a: list  # 3 selectors (x==0 / 1<=x<=3 / x==4) for A' rows
    q_o: list  # 25 selectors (by lane) for OUT rows
    instance: Column


def configure(cs: ConstraintSystem) -> KeccakConfig:
    bits = cs.advice_group("kbits", 64)
    rc = cs.fixed_group("krc", 64)
    q_in = cs.fixed_column()
    q_cap = cs.fixed_column()
    q_c = [cs.fixed_column() for _ in range(5)]
    q_a = [cs.fixed_column() for _ in range(3)]
    q_o = [cs.fixed_column() for _ in range(25)]
    instance = cs.instance_column()

    B = bits.q  # B(rot, roll)

    # input booleanity + capacity-zero
    cs.create_vector_gate("keccak_in_bool", q_in.cur() * B() * (B() - Const(1)), 64)
    cs.create_vector_gate("keccak_capacity_zero", q_cap.cur() * B(), 64)

    # theta C: row l (l = x + 5y, smeared) = xor5 of A[x, y'] for y' = 0..4,
    # A lane l' at rotation -25 + 5*(y' - y)
    for y in range(5):
        ops = [B(-25 + 5 * (yp - y)) for yp in range(5)]
        cs.create_vector_gate(f"keccak_theta_c_y{y}", q_c[y].cur() * (_xor5(ops) - B()), 64)

    # theta A': A[x,y] ^ C[x-1] ^ rot1(C[x+1]); A at rot -50;
    # C[x-1] at rot -26 (x>=1) or -21 (x==0); C[x+1] at -24 (x<=3) or -29 (x==4)
    for qi, (rot_m1, rot_p1) in enumerate([(-21, -24), (-26, -24), (-26, -29)]):
        expr = _xor2(_xor2(B(-50), B(rot_m1)), GroupQuery(bits, rot_p1, 1)) - B()
        cs.create_vector_gate(f"keccak_theta_aprime_{qi}", q_a[qi].cur() * expr, 64)

    # chi (+iota on lane 0): OUT[x,y] = B0 ^ (~B1 & B2), Bi = B[x+i, y]
    # B[u,y] = roll_rho(A'[u', y']) with y' = u, u' = 3*(y - 3u) mod 5
    def b_operand(u: int, y: int, l_out: int) -> GroupQuery:
        yp = u
        up = (3 * (y - 3 * u)) % 5
        l_src = up + 5 * yp
        rot = l_src - l_out - 25
        roll = _ROT[5 * yp + up]
        return GroupQuery(bits, rot, roll)

    for l in range(25):
        x, y = l % 5, l // 5
        b0 = b_operand(x, y, l)
        b1 = b_operand((x + 1) % 5, y, l)
        b2 = b_operand((x + 2) % 5, y, l)
        chi = b0 + (Const(1) - b1) * b2 * (Const(1) - Const(2) * b0)
        if l == 0:
            rcq = rc.q()
            out_val = chi + rcq - Const(2) * chi * rcq  # ^ rc (degree 5)
        else:
            out_val = chi
        cs.create_vector_gate(f"keccak_chi_l{l}", q_o[l].cur() * (out_val - B()), 64)

    cfg = KeccakConfig(bits, rc, q_in, q_cap, q_c, q_a, q_o, instance)
    _add_io_copies(cs, cfg)
    return cfg


def _add_io_copies(cs: ConstraintSystem, cfg: KeccakConfig) -> None:
    """Bind instance rows to the padded-block input bits and digest bits.

    instance rows 0..1087: the padded 136-byte rate block, bit i of lane l
    at row 64*l + z; rows 1088..1343: digest bits (lanes 0..3 of the final
    state)."""
    for l in range(17):
        for z in range(64):
            cs.copy(cfg.instance, 64 * l + z, cfg.bits.columns[z], l)
    digest_base = INPUT_ROWS + 23 * BLOCK + 50
    for l in range(4):
        for z in range(64):
            cs.copy(cfg.instance, 1088 + 64 * l + z, cfg.bits.columns[z], digest_base + l)


def assign_fixed(cs: ConstraintSystem, cfg: KeccakConfig) -> Assignment:
    """Fixed-column (selector + rc) assignment; shared by keygen."""
    asg = Assignment(cs, N)
    one = FR.encode(1)
    asg.cols[cfg.q_in][:INPUT_ROWS] = one
    # capacity lanes 17..24 of the input block must be zero
    asg.cols[cfg.q_cap][17:INPUT_ROWS] = one
    for r in range(ROUNDS):
        base = INPUT_ROWS + r * BLOCK
        for l in range(25):
            y = l // 5
            asg.cols[cfg.q_c[y]][base + l] = one
            x = l % 5
            qa = 0 if x == 0 else (2 if x == 4 else 1)
            asg.cols[cfg.q_a[qa]][base + 25 + l] = one
            asg.cols[cfg.q_o[l]][base + 50 + l] = one
        # iota rc bits on the OUT row of lane 0
        rc_val = _RC[r]
        for z in range(64):
            if (rc_val >> z) & 1:
                asg.cols[cfg.rc.columns[z]][base + 50] = one
    return asg


def _simulate_rows(block_lanes: list[int]) -> np.ndarray:
    """Run keccak-f at bit level, producing all TOTAL_ROWS x 64 bit rows."""
    rows = np.zeros((TOTAL_ROWS, 64), dtype=np.uint8)
    a = list(block_lanes) + [0] * (25 - len(block_lanes))

    def bits_of(v):
        return [(v >> z) & 1 for z in range(64)]

    for l in range(25):
        rows[l] = bits_of(a[l])
    rot64 = lambda v, r: ((v << r) | (v >> (64 - r))) & ((1 << 64) - 1)
    for r in range(ROUNDS):
        base = INPUT_ROWS + r * BLOCK
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        for l in range(25):
            rows[base + l] = bits_of(c[l % 5])
        ap = [0] * 25
        for l in range(25):
            x, y = l % 5, l // 5
            ap[l] = a[l] ^ c[(x - 1) % 5] ^ rot64(c[(x + 1) % 5], 1)
            rows[base + 25 + l] = bits_of(ap[l])
        b = [0] * 25
        for y in range(5):
            for x in range(5):
                nx, ny = y, (2 * x + 3 * y) % 5
                b[5 * ny + nx] = rot64(ap[5 * y + x], _ROT[5 * y + x])
        out = [0] * 25
        for l in range(25):
            x, y = l % 5, l // 5
            out[l] = b[l] ^ ((~b[5 * y + (x + 1) % 5]) & b[5 * y + (x + 2) % 5] & ((1 << 64) - 1))
        out[0] ^= _RC[r]
        for l in range(25):
            rows[base + 50 + l] = bits_of(out[l])
        a = out
    return rows


def assign(cs: ConstraintSystem, cfg: KeccakConfig, msg: bytes) -> tuple:
    """-> (Assignment with advice+fixed filled, instance value list)."""
    blocks = pad_message(msg)
    assert blocks.shape[0] == 1, "single rate block in this circuit"
    lanes = [
        int(blocks[0, i, 0]) | (int(blocks[0, i, 1]) << 32) for i in range(17)
    ]
    rows = _simulate_rows(lanes)
    asg = assign_fixed(cs, cfg)
    one = FR.encode(1)
    for z in range(64):
        col = np.zeros((N, 16), dtype=np.uint32)
        nz = np.nonzero(rows[:, z])[0]
        col[nz] = one
        asg.cols[cfg.bits.columns[z]] = col

    instance_bits = []
    for l in range(17):
        for z in range(64):
            instance_bits.append(int(rows[l, z]))
    digest_base = INPUT_ROWS + 23 * BLOCK + 50
    for l in range(4):
        for z in range(64):
            instance_bits.append(int(rows[digest_base + l, z]))
    # mirror instance into its column for the MockProver's copy checks
    asg.set_ints(cfg.instance, 0, instance_bits)
    return asg, instance_bits


def digest_from_instance(instance_bits: list[int]) -> bytes:
    out = bytearray(32)
    for i, bit in enumerate(instance_bits[1088:1344]):
        if bit:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)
