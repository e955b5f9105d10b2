"""Golden tests for the lazy 13-bit field core (ff/lazy13.py).

Every kernel is stress-checked against python bigint arithmetic, with
long random op CHAINS to exercise the lazy-value invariants (values
< 2^263, quasi-canonical limbs) across compositions — the bound
bookkeeping is the risky part, not single ops.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from zkevm_tpu.ff import lazy13 as lz13
from zkevm_tpu.ff.limbs import fq_spec, fr_spec


@pytest.fixture(scope="module", params=["Fq", "Fr"])
def lz(request):
    return lz13._ctx(fq_spec() if request.param == "Fq" else fr_spec())


def _rand(lz, rng, n):
    xs = [int(rng.integers(0, 1 << 62)) << s | int(rng.integers(0, 1 << 62))
          for s in (0, 64, 128, 192) for _ in range(0)] or None
    vals = [rng_int(rng) % lz.p for _ in range(n)]
    return vals, jnp.asarray(lz.from_ints(vals))


def rng_int(rng):
    return int.from_bytes(rng.bytes(32), "little")


def test_roundtrip(lz):
    rng = np.random.default_rng(1)
    vals, a = _rand(lz, rng, 33)
    assert lz.to_ints(np.asarray(a)) == [v % lz.p for v in vals]


def test_mul_add_sub_golden(lz):
    rng = np.random.default_rng(2)
    va, a = _rand(lz, rng, 65)
    vb, b = _rand(lz, rng, 65)
    p = lz.p
    m = lz13.mul13(lz, a, b)
    s = lz13.add13(lz, a, b)
    d = lz13.sub13(lz, a, b)
    q = lz13.sqr13(lz, a)
    assert lz.to_ints(np.asarray(m)) == [x * y % p for x, y in zip(va, vb)]
    assert lz.to_ints(np.asarray(s)) == [(x + y) % p for x, y in zip(va, vb)]
    assert lz.to_ints(np.asarray(d)) == [(x - y) % p for x, y in zip(va, vb)]
    assert lz.to_ints(np.asarray(q)) == [x * x % p for x in va]


def test_long_random_chain(lz):
    """Random op chains: outputs feed inputs 200 deep; catches any lazy
    bound violation (u32 overflow corrupts values detectably)."""
    rng = np.random.default_rng(3)
    p = lz.p
    vals, regs = _rand(lz, rng, 16)
    vals = list(vals)
    regs = np.asarray(regs)
    regs = jnp.asarray(regs)
    for step in range(200):
        op = rng.integers(0, 4)
        i, j, k = rng.integers(0, 16, size=3)
        ai = regs[:, i:i + 1]
        bj = regs[:, j:j + 1]
        if op == 0:
            r = lz13.mul13(lz, ai, bj)
            vals[k] = vals[i] * vals[j] % p
        elif op == 1:
            r = lz13.add13(lz, ai, bj)
            vals[k] = (vals[i] + vals[j]) % p
        elif op == 2:
            r = lz13.sub13(lz, ai, bj)
            vals[k] = (vals[i] - vals[j]) % p
        else:
            r = lz13.sqr13(lz, ai)
            vals[k] = vals[i] * vals[i] % p
        regs = regs.at[:, k:k + 1].set(r)
        # limb invariant: quasi-canonical
        assert int(jnp.max(r)) < (1 << 13) + (1 << 6)
        assert int(r[20, 0]) <= 8
    assert lz.to_ints(np.asarray(regs)) == [v % p for v in vals]


def test_canon_and_zero(lz):
    rng = np.random.default_rng(4)
    p = lz.p
    va, a = _rand(lz, rng, 33)
    vb, b = _rand(lz, rng, 33)
    # build lazy (non-canonical) values via chains, then canonicalize
    m = lz13.mul13(lz, a, b)
    s = lz13.add13(lz, m, m)
    c = lz13.canon13(lz, s)
    got = lz.to_ints(np.asarray(c))
    assert got == [(2 * x * y) % p for x, y in zip(va, vb)]
    # strictly canonical limbs and < p
    cn = np.asarray(c, dtype=np.uint64)
    for i in range(cn.shape[1]):
        v = sum(int(cn[l, i]) << (13 * l) for l in range(lz13.L13))
        assert v < p
    # zero tests on lazy zeros: x - x == 0, x + (p-x) == 0
    d = lz13.sub13(lz, m, m)
    assert bool(jnp.all(lz13.is_zero13(lz, d)))
    pm = jnp.asarray(lz.from_ints([(p - v) % p for v in va]))
    z = lz13.add13(lz, a, pm)
    assert bool(jnp.all(lz13.is_zero13(lz, z)))
    # non-zero stays non-zero
    assert not bool(jnp.any(lz13.is_zero13(lz, m)))
    assert bool(jnp.all(lz13.eq13(lz, s, s)))


def test_u16_conversions(lz):
    from zkevm_tpu.ff import limbs as ff

    rng = np.random.default_rng(5)
    vals = [rng_int(rng) % lz.p for _ in range(17)]
    a16 = jnp.asarray(ff.limbs_from_ints(vals).T)  # (16, N) standard form
    a13 = lz13.from_u16_t(a16)
    assert lz.to_ints(np.asarray(a13)) == vals
    back = lz13.to_u16_t(lz13.canon13(lz, a13))
    assert np.array_equal(np.asarray(back), np.asarray(a16))


def test_combine_reduce(lz):
    """Fused signed-scaled reduction: x3-style 4rh^2 - 4h^3 - 8x1h^2."""
    rng = np.random.default_rng(6)
    p = lz.p
    vr, rh = _rand(lz, rng, 33)
    vh, h = _rand(lz, rng, 33)
    vx, x1 = _rand(lz, rng, 33)
    hh = lz13.sqr13(lz, h)
    vhh = [v * v % p for v in vh]
    out = lz13.combine_reduce(lz, [
        (lz13.sqr_T(rh), 4),
        (lz13.prod_T(h, hh), -4),
        (lz13.prod_T(x1, hh), -8),
    ])
    want = [(4 * r * r - 4 * a * b - 8 * c * b) % p
            for r, a, b, c in zip(vr, vh, vhh, vx)]
    assert lz.to_ints(np.asarray(out)) == want
    # combined outputs survive as sub/add operands and zero-tests
    d = lz13.sub13(lz, out, out)
    assert bool(jnp.all(lz13.is_zero13(lz, d)))
    s = lz13.add13(lz, out, lz13.sub13(lz, jnp.asarray(lz.from_ints([0] * 33)), out))
    assert bool(jnp.all(lz13.is_zero13(lz, s)))
    assert not bool(jnp.any(lz13.is_zero13(lz, lz13.add13(lz, out, jnp.asarray(lz.from_ints([1] * 33))))))
    assert lz.to_ints(np.asarray(lz13.canon13(lz, lz13.mul13(lz, out, rh)))) == [
        w * r % p for w, r in zip(want, vr)]


def test_edge_values(lz):
    p = lz.p
    edges = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, 1 << 13, (1 << 247) % p]
    a = jnp.asarray(lz.from_ints(edges))
    b = jnp.asarray(lz.from_ints(list(reversed(edges))))
    m = lz13.mul13(lz, a, b)
    assert lz.to_ints(np.asarray(m)) == [
        x * y % p for x, y in zip(edges, reversed(edges))]
    z = lz13.sub13(lz, a, a)
    assert bool(jnp.all(lz13.is_zero13(lz, z)))
