"""Keccak-f[1600] permutation + keccak256 sponge, batched on device.

TPU-native replacement for the host keccak used throughout the reference
(tiny-keccak / ethers `keccak256`; witness collection at
/root/reference/zkevm-circuits/src/witness/keccak.rs:14, circuit at
keccak_circuit/keccak_packed_multi.rs). State is (..., 25, 2) uint32 —
each 64-bit lane split (lo, hi) because the TPU VPU has no 64-bit integer
path; rotations compose from 32-bit shifts. All 24 rounds unroll into
straight-line vector code, batching over leading dims (one lane of the
VPU per hash in a batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

# Rotation offsets r[x][y] laid out by lane index 5y + x? We keep the flat
# 25-lane order lane[i] = A[x, y] with i = 5*y + x (row-major y).
_ROT = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]


def _rotl(lo, hi, r: int):
    """Rotate a (lo, hi) 64-bit lane left by r."""
    r %= 64
    if r == 0:
        return lo, hi
    if r == 32:
        return hi, lo
    if r < 32:
        nlo = (lo << np.uint32(r)) | (hi >> np.uint32(32 - r))
        nhi = (hi << np.uint32(r)) | (lo >> np.uint32(32 - r))
        return nlo, nhi
    r -= 32
    nlo = (hi << np.uint32(r)) | (lo >> np.uint32(32 - r))
    nhi = (lo << np.uint32(r)) | (hi >> np.uint32(32 - r))
    return nlo, nhi


def keccak_f(state: jnp.ndarray) -> jnp.ndarray:
    """Apply keccak-f[1600]. state: (..., 25, 2) uint32 (lane = [lo, hi])."""
    lanes = [(state[..., i, 0], state[..., i, 1]) for i in range(25)]

    for rnd in range(24):
        # theta
        c = [
            (
                lanes[x][0] ^ lanes[x + 5][0] ^ lanes[x + 10][0] ^ lanes[x + 15][0] ^ lanes[x + 20][0],
                lanes[x][1] ^ lanes[x + 5][1] ^ lanes[x + 10][1] ^ lanes[x + 15][1] ^ lanes[x + 20][1],
            )
            for x in range(5)
        ]
        d = []
        for x in range(5):
            rl, rh = _rotl(*c[(x + 1) % 5], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        lanes = [
            (lanes[5 * y + x][0] ^ d[x][0], lanes[5 * y + x][1] ^ d[x][1])
            for y in range(5)
            for x in range(5)
        ]

        # rho + pi: B[y, 2x+3y] = rot(A[x, y])
        b = [None] * 25
        for y in range(5):
            for x in range(5):
                nx, ny = y, (2 * x + 3 * y) % 5
                b[5 * ny + nx] = _rotl(*lanes[5 * y + x], _ROT[5 * y + x])

        # chi
        lanes = [
            (
                b[5 * y + x][0] ^ (~b[5 * y + (x + 1) % 5][0] & b[5 * y + (x + 2) % 5][0]),
                b[5 * y + x][1] ^ (~b[5 * y + (x + 1) % 5][1] & b[5 * y + (x + 2) % 5][1]),
            )
            for y in range(5)
            for x in range(5)
        ]

        # iota
        rc = _RC[rnd]
        lanes[0] = (
            lanes[0][0] ^ np.uint32(rc & 0xFFFFFFFF),
            lanes[0][1] ^ np.uint32(rc >> 32),
        )

    flat = []
    for lo, hi in lanes:
        flat.append(jnp.stack([lo, hi], axis=-1))
    return jnp.stack(flat, axis=-2).astype(U32)


# NOTE: keccak_f is intentionally NOT jax.jit-wrapped. The fused xor-chain
# graph (24 unrolled rounds) makes XLA:CPU's LLVM backend pathologically
# slow/unreliable to compile; eager per-op dispatch runs a permutation in
# ~1s on CPU and each tiny op is compile-cached. On TPU, wrap call sites
# in an outer jit where measurements justify it.

RATE_BYTES = 136  # keccak256 rate (17 lanes)


def pad_message(msg: bytes) -> np.ndarray:
    """keccak (original, pad 0x01/0x80) -> (nblocks, 17, 2) uint32 lanes."""
    padded = bytearray(msg)
    pad_len = RATE_BYTES - (len(msg) % RATE_BYTES)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    arr = np.frombuffer(bytes(padded), dtype="<u8").reshape(-1, 17)
    out = np.zeros(arr.shape + (2,), dtype=np.uint32)
    out[..., 0] = arr & 0xFFFFFFFF
    out[..., 1] = arr >> 32
    return out


def keccak256(msg: bytes) -> bytes:
    """Host-convenience single-message keccak256 via the device permutation."""
    blocks = pad_message(msg)
    state = jnp.zeros((25, 2), U32)
    for blk in blocks:
        state = state.at[:17].set(state[:17] ^ jnp.asarray(blk))
        state = keccak_f(state)
    lanes = np.asarray(state[:4]).astype(np.uint64)
    out = (lanes[:, 0] | (lanes[:, 1] << np.uint64(32))).astype("<u8")
    return out.tobytes()


def keccak256_batch(msgs: list[bytes]) -> np.ndarray:
    """Batch of variable-length messages -> (N, 32) uint8 digests.

    Pads every message to the max block count and runs one batched absorb
    loop on device (lanes of shorter messages finish early; their extra
    permutations are discarded by tracking each message's block count).
    """
    import jax

    blocks = [pad_message(m) for m in msgs]
    max_blocks = max(b.shape[0] for b in blocks)
    n = len(msgs)
    data = np.zeros((n, max_blocks, 17, 2), dtype=np.uint32)
    nblk = np.zeros((n,), dtype=np.int32)
    for i, b in enumerate(blocks):
        data[i, : b.shape[0]] = b
        nblk[i] = b.shape[0]

    def run(data, nblk):
        state = jnp.zeros((n, 25, 2), U32)
        digest = jnp.zeros((n, 4, 2), U32)
        for j in range(max_blocks):
            state = state.at[:, :17].set(state[:, :17] ^ data[:, j])
            state = keccak_f(state)
            take = (nblk == j + 1)[:, None, None]
            digest = jnp.where(take, state[:, :4], digest)
        return digest

    lanes = np.asarray(run(data, nblk)).astype(np.uint64)
    vals = (lanes[..., 0] | (lanes[..., 1] << np.uint64(32))).astype("<u8")
    return np.frombuffer(vals.tobytes(), dtype=np.uint8).reshape(n, 32)
