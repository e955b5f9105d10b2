"""Field-core tests: JAX limb kernels vs the pure-Python golden model.

Plays the role of halo2curves' field test vectors in the reference
(SURVEY.md §7 stage 1 gate).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zkevm_tpu.ff import FQ, FR, goldens, limbs


def rand_elems(rng, spec, n):
    ints = [int(rng.integers(0, 1 << 62)) for _ in range(n * 5)]
    vals = []
    for i in range(n):
        x = 0
        for j in range(5):
            x = (x << 62) | ints[i * 5 + j]
        vals.append(x % spec.modulus)
    return vals


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_roundtrip_encode_decode(rng, spec):
    vals = rand_elems(rng, spec, 8) + [0, 1, spec.modulus - 1]
    enc = np.stack([spec.encode(v) for v in vals])
    dec = spec.decode_many(enc)
    assert dec == [v % spec.modulus for v in vals]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_to_from_mont_device(rng, spec):
    vals = rand_elems(rng, spec, 16)
    raw = limbs.limbs_from_ints(vals)
    mont = jax.jit(lambda a: limbs.to_mont(spec, a))(raw)
    np.testing.assert_array_equal(np.asarray(mont), np.stack([spec.encode(v) for v in vals]))
    back = jax.jit(lambda a: limbs.from_mont(spec, a))(mont)
    assert limbs.ints_from_limbs(back) == vals


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_add_sub_neg(rng, spec):
    n = 32
    avals = rand_elems(rng, spec, n)
    bvals = rand_elems(rng, spec, n)
    # include edge cases
    avals[0], bvals[0] = 0, 0
    avals[1], bvals[1] = spec.modulus - 1, spec.modulus - 1
    avals[2], bvals[2] = 0, spec.modulus - 1
    a = jnp.asarray(np.stack([spec.encode(v) for v in avals]))
    b = jnp.asarray(np.stack([spec.encode(v) for v in bvals]))

    s = jax.jit(lambda x, y: limbs.add(spec, x, y))(a, b)
    d = jax.jit(lambda x, y: limbs.sub(spec, x, y))(a, b)
    ng = jax.jit(lambda x: limbs.neg(spec, x))(a)

    assert spec.decode_many(s) == [(x + y) % spec.modulus for x, y in zip(avals, bvals)]
    assert spec.decode_many(d) == [(x - y) % spec.modulus for x, y in zip(avals, bvals)]
    assert spec.decode_many(ng) == [(-x) % spec.modulus for x in avals]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_mul(rng, spec):
    n = 64
    avals = rand_elems(rng, spec, n)
    bvals = rand_elems(rng, spec, n)
    avals[0], bvals[0] = 0, 12345
    avals[1], bvals[1] = spec.modulus - 1, spec.modulus - 1
    avals[2], bvals[2] = 1, spec.modulus - 1
    a = jnp.asarray(np.stack([spec.encode(v) for v in avals]))
    b = jnp.asarray(np.stack([spec.encode(v) for v in bvals]))
    p = jax.jit(lambda x, y: limbs.mont_mul(spec, x, y))(a, b)
    assert spec.decode_many(p) == [(x * y) % spec.modulus for x, y in zip(avals, bvals)]


@pytest.mark.parametrize("spec", [FR, FQ], ids=["Fr", "Fq"])
def test_inv_pow(rng, spec):
    vals = rand_elems(rng, spec, 8)
    vals[0] = 1
    a = jnp.asarray(np.stack([spec.encode(v) for v in vals]))
    ia = jax.jit(lambda x: limbs.inv(spec, x))(a)
    assert spec.decode_many(ia) == [pow(v, spec.modulus - 2, spec.modulus) for v in vals]
    # inv(0) == 0 convention
    z = jnp.asarray(spec.zero)[None]
    assert spec.decode_many(jax.jit(lambda x: limbs.inv(spec, x))(z)) == [0]
    # a^7
    p7 = jax.jit(lambda x: limbs.pow_const(spec, x, 7))(a)
    assert spec.decode_many(p7) == [pow(v, 7, spec.modulus) for v in vals]


def test_broadcasting(rng):
    spec = FR
    vals = rand_elems(rng, spec, 6)
    a = jnp.asarray(np.stack([spec.encode(v) for v in vals])).reshape(2, 3, 16)
    b = jnp.asarray(spec.encode(7))
    p = limbs.mont_mul(spec, a, b)
    assert p.shape == (2, 3, 16)
    assert spec.decode_many(p.reshape(-1, 16)) == [v * 7 % spec.modulus for v in vals]


def test_scalar_bits_and_windows(rng):
    x = int(rng.integers(0, 1 << 63)) | (1 << 250)
    raw = limbs.limbs_from_int(x)[None]
    bits = np.asarray(limbs.scalar_bits(jnp.asarray(raw)))
    for i in range(256):
        assert bits[0, i] == (x >> i) & 1
    for c in (4, 8, 13, 16):
        for w in range(256 // c):
            win = np.asarray(limbs.scalar_window(jnp.asarray(raw), w, c))
            assert win[0] == (x >> (w * c)) & ((1 << c) - 1), (c, w)


def test_fr_root_of_unity():
    for k in (1, 2, 10, 28):
        w = goldens.fr_root_of_unity(k)
        assert pow(w, 1 << k, goldens.FR_MOD) == 1
        assert pow(w, 1 << (k - 1), goldens.FR_MOD) != 1
