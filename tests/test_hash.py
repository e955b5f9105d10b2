"""Keccak + Poseidon tests (golden vectors + device-vs-host agreement)."""

import jax
import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ff import FR
from zkevm_tpu.hash import keccak, poseidon


# --- keccak -----------------------------------------------------------------

def test_keccak256_known_vectors():
    # Ethereum's canonical empty-string digest
    assert (
        keccak.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    # keccak256("abc") (original Keccak padding, not NIST SHA-3)
    assert (
        keccak.keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block message agrees between scalar and batch paths
    msg = bytes(range(256)) * 2
    assert keccak.keccak256(msg) == keccak.keccak256_batch([msg])[0].tobytes()


def test_keccak_batch_mixed_lengths():
    msgs = [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 300]
    got = keccak.keccak256_batch(msgs)
    for i, m in enumerate(msgs):
        assert got[i].tobytes() == keccak.keccak256(m), i


# --- poseidon ---------------------------------------------------------------

def test_poseidon_device_matches_golden(rng):
    spec = poseidon.P128_POW5_T3
    states = [[int(rng.integers(0, 1 << 62)) for _ in range(spec.t)] for _ in range(3)]
    states.append([0] * spec.t)
    dev_in = jnp.asarray(
        np.stack([np.stack([FR.encode(v) for v in s]) for s in states])
    )
    out = jax.jit(lambda s: poseidon.permute(spec, s))(dev_in)
    for i, s in enumerate(states):
        want = poseidon.permute_golden(spec, s)
        got = [FR.decode(np.asarray(out)[i, j]) for j in range(spec.t)]
        assert got == want, i


def test_poseidon_hash_many_matches_golden(rng):
    spec = poseidon.P128_POW5_T3
    msgs = [[123, 456], [0, 0], [int(rng.integers(1, 1 << 60)), 7]]
    dev_in = jnp.asarray(
        np.stack([np.stack([FR.encode(v) for v in m]) for m in msgs])
    )
    out = poseidon.hash_many(spec, dev_in)
    for i, m in enumerate(msgs):
        assert FR.decode(np.asarray(out)[i]) == poseidon.hash_golden(spec, m), i


def test_poseidon_constants_sane():
    rc, mds = poseidon.generate_constants(poseidon.P128_POW5_T3)
    assert len(rc) == 64 and all(len(r) == 3 for r in rc)
    assert len(set(rc[0])) == 3  # constants differ
    # MDS is invertible (det != 0) — check via golden permutation bijectivity proxy
    from zkevm_tpu.ff.goldens import FR_MOD

    m = mds
    det = (
        m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
        - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
        + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0])
    ) % FR_MOD
    assert det != 0
