"""Poseidon permutation over BN254 Fr: Grain-LFSR constants + batched device
permutation + sponge.

Replaces the external poseidon crates of the reference stack
(scroll-tech/poseidon-circuit `poseidon-base`, /root/reference/Cargo.toml:38-39;
used by the Poseidon subcircuit at zkevm-circuits/src/poseidon_circuit.rs:13,
the zktrie at zktrie/src/state.rs, and the recursion transcript). Constant
generation follows the Poseidon reference algorithm (Grain LFSR + Cauchy MDS)
as implemented by halo2_gadgets' `primitives::grain`, so specs like
P128Pow5T3 reproduce the ecosystem's standard constants.

The device permutation is batched: state shape (..., t, 16) Montgomery Fr
limbs; rounds run under `lax.scan` (full | partial | full) so the traced
graph stays small. Host golden model included for tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FR_MOD
from zkevm_tpu.ff.limbs import fr_spec

FR = fr_spec()


# ---------------------------------------------------------------------------
# Grain LFSR (Poseidon reference constant generation)
# ---------------------------------------------------------------------------

class _Grain:
    def __init__(self, t: int, r_f: int, r_p: int, n_bits: int = 255):
        bits = []

        def append(value: int, width: int):
            for i in range(width - 1, -1, -1):
                bits.append((value >> i) & 1)

        append(1, 2)       # field type: prime
        append(0, 4)       # sbox: x^alpha
        append(n_bits, 12)  # field size in bits
        append(t, 12)
        append(r_f, 10)
        append(r_p, 10)
        append((1 << 30) - 1, 30)
        assert len(bits) == 80
        self.state = bits
        self.n_bits = n_bits
        for _ in range(160):
            self._next_bit()

    def _next_bit(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        s.pop(0)
        s.append(new)
        return new

    def _sample_bit(self) -> int:
        # shrinking generator: emit the second bit of a pair iff the first is 1
        while True:
            if self._next_bit() == 1:
                return self._next_bit()

    def next_field_element(self, p: int = FR_MOD) -> int:
        """Rejection-sample a field element (used for round constants)."""
        while True:
            v = 0
            for _ in range(self.n_bits):
                v = (v << 1) | self._sample_bit()
            if v < p:
                return v

    def next_field_element_without_rejection(self, p: int = FR_MOD) -> int:
        """Reduce mod p without rejection (used for MDS x/y vectors)."""
        v = 0
        for _ in range(self.n_bits):
            v = (v << 1) | self._sample_bit()
        return v % p


@dataclass(frozen=True)
class PoseidonSpec:
    """Poseidon instance parameters; t = rate + capacity(1), alpha = 5."""

    t: int
    r_f: int  # total full rounds (split half before / half after partials)
    r_p: int

    @property
    def rate(self) -> int:
        return self.t - 1


P128_POW5_T3 = PoseidonSpec(t=3, r_f=8, r_p=56)


@lru_cache(maxsize=None)
def generate_constants(spec: PoseidonSpec):
    """-> (round_constants [(r_f + r_p) x t ints], mds [t x t ints])."""
    grain = _Grain(spec.t, spec.r_f, spec.r_p)
    rc = [
        [grain.next_field_element() for _ in range(spec.t)]
        for _ in range(spec.r_f + spec.r_p)
    ]
    # Cauchy MDS: M[i][j] = 1 / (x_i + y_j)
    while True:
        xs = [grain.next_field_element_without_rejection() for _ in range(spec.t)]
        ys = [grain.next_field_element_without_rejection() for _ in range(spec.t)]
        flat = xs + ys
        if len(set(flat)) == 2 * spec.t and all(
            (x + y) % FR_MOD != 0 for x in xs for y in ys
        ):
            break
    mds = [
        [pow((xs[i] + ys[j]) % FR_MOD, FR_MOD - 2, FR_MOD) for j in range(spec.t)]
        for i in range(spec.t)
    ]
    return rc, mds


# ---------------------------------------------------------------------------
# Host golden permutation
# ---------------------------------------------------------------------------

def permute_golden(spec: PoseidonSpec, state: list[int]) -> list[int]:
    rc, mds = generate_constants(spec)
    p = FR_MOD
    t = spec.t
    half = spec.r_f // 2
    s = list(state)

    def full_round(r):
        nonlocal s
        s = [pow((s[i] + rc[r][i]) % p, 5, p) for i in range(t)]
        s = [sum(mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    def partial_round(r):
        nonlocal s
        s = [(s[i] + rc[r][i]) % p for i in range(t)]
        s[0] = pow(s[0], 5, p)
        s = [sum(mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    r = 0
    for _ in range(half):
        full_round(r)
        r += 1
    for _ in range(spec.r_p):
        partial_round(r)
        r += 1
    for _ in range(half):
        full_round(r)
        r += 1
    return s


# ---------------------------------------------------------------------------
# Device permutation (batched)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _device_constants(spec: PoseidonSpec):
    rc, mds = generate_constants(spec)
    rc_m = np.stack([np.stack([FR.encode(c) for c in row]) for row in rc])
    mds_m = np.stack([np.stack([FR.encode(c) for c in row]) for row in mds])
    return rc_m, mds_m  # (R, t, 16), (t, t, 16)


def _sbox(x):
    x2 = ff.sqr(FR, x)
    x4 = ff.sqr(FR, x2)
    return ff.mont_mul(FR, x4, x)


def _mds_apply(mds, state):
    """state (..., t, 16) x mds (t, t, 16) -> (..., t, 16)."""
    t = state.shape[-2]
    prod = ff.mont_mul(FR, mds, state[..., None, :, :])  # (..., t, t, 16)
    acc = prod[..., 0, :]
    for j in range(1, t):
        acc = ff.add(FR, acc, prod[..., j, :])
    return acc


def permute(spec: PoseidonSpec, state: jnp.ndarray) -> jnp.ndarray:
    """Batched Poseidon permutation. state: (..., t, 16) Montgomery Fr."""
    rc_m, mds_m = _device_constants(spec)
    rc_m = jnp.asarray(rc_m)
    mds = jnp.asarray(mds_m)
    half = spec.r_f // 2

    def full_body(s, rcs):
        s = ff.add(FR, s, rcs)
        s = _sbox(s)
        return _mds_apply(mds, s), None

    def partial_body(s, rcs):
        s = ff.add(FR, s, rcs)
        head = _sbox(s[..., :1, :])
        s = jnp.concatenate([head, s[..., 1:, :]], axis=-2)
        return _mds_apply(mds, s), None

    state, _ = jax.lax.scan(full_body, state, rc_m[:half])
    state, _ = jax.lax.scan(partial_body, state, rc_m[half : half + spec.r_p])
    state, _ = jax.lax.scan(full_body, state, rc_m[half + spec.r_p :])
    return state


permute = jax.jit(permute, static_argnums=0)


# ---------------------------------------------------------------------------
# Sponge (fixed-length hash, halo2_gadgets ConstantLength-style padding)
# ---------------------------------------------------------------------------

def hash_golden(spec: PoseidonSpec, msg: list[int]) -> int:
    """ConstantLength<L> Poseidon hash (host golden): capacity holds the
    domain tag 2^64 * ... -> halo2_gadgets uses initial capacity =
    (length encoded) for ConstantLength: cap = 2^64 * L? It uses
    `Domain::initial_capacity_element` = 2^64 * L for ConstantLength<L>."""
    rate = spec.rate
    cap = (1 << 64) * len(msg) % FR_MOD
    padded = list(msg) + [0] * ((-len(msg)) % rate)
    state = [0] * rate + [cap]
    for i in range(0, len(padded), rate):
        for j in range(rate):
            state[j] = (state[j] + padded[i + j]) % FR_MOD
        state = permute_golden(spec, state)
    return state[0]


def hash_many(spec: PoseidonSpec, msgs: np.ndarray) -> jnp.ndarray:
    """Batched fixed-length hash. msgs: (N, L, 16) Montgomery Fr limbs
    -> (N, 16) Montgomery digests. L must be a multiple-padded host-side."""
    n, length = msgs.shape[0], msgs.shape[1]
    rate = spec.rate
    pad = (-length) % rate
    if pad:
        msgs = jnp.concatenate(
            [msgs, jnp.zeros((n, pad, ff.L), jnp.uint32)], axis=1
        )
    cap = FR.encode((1 << 64) * length % FR_MOD)
    state = jnp.concatenate(
        [
            jnp.zeros((n, rate, ff.L), jnp.uint32),
            jnp.broadcast_to(jnp.asarray(cap), (n, 1, ff.L)),
        ],
        axis=1,
    )
    for i in range(0, length + pad, rate):
        absorbed = ff.add(FR, state[:, :rate], msgs[:, i : i + rate])
        state = jnp.concatenate([absorbed, state[:, rate:]], axis=1)
        state = permute(spec, state)
    return state[:, 0]
