"""secp256k1 ECDSA (host side): sign / verify / ecrecover / address.

Reference counterpart: the reference executes signature recovery natively
during witness generation via geth (sender recovery) and
`revm-precompile` (ecrecover precompile, bus-mapping/src/precompile.rs),
and verifies ECDSA *in-circuit* in the Sig circuit
(zkevm-circuits/src/sig_circuit/ecdsa.rs via halo2-ecc).

This module is the witness/golden side only: pure-Python affine
arithmetic over the secp256k1 base field — correctness-grade (a few
hundred sigs/s), used by the tracer/builder and as the golden model for
the future in-circuit ECDSA gadget. The in-circuit side (non-native Fp
arithmetic over BN254 Fr) is the Sig-circuit work item.
"""

from __future__ import annotations

import hmac
import hashlib

from zkevm_tpu.hash.keccak import keccak256

# Curve: y^2 = x^3 + 7 over F_P, generator order N
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
G = (GX, GY)

# point at infinity
INF = None


def _inv(a: int, m: int) -> int:
    return pow(a, m - 2, m)


def add(p1, p2):
    if p1 is INF:
        return p2
    if p2 is INF:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return INF
        lam = (3 * x1 * x1) * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def mul(p, k: int):
    k %= N
    acc, base = INF, p
    while k:
        if k & 1:
            acc = add(acc, base)
        base = add(base, base)
        k >>= 1
    return acc


def is_on_curve(p) -> bool:
    if p is INF:
        return False
    x, y = p
    return 0 <= x < P and 0 <= y < P and (y * y - x * x * x - 7) % P == 0


def pubkey(priv: int):
    assert 0 < priv < N
    return mul(G, priv)


def address_of(pub) -> int:
    """keccak256(uncompressed pubkey)[12:] as an int address."""
    x, y = pub
    h = keccak256(x.to_bytes(32, "big") + y.to_bytes(32, "big"))
    return int.from_bytes(h[12:], "big")


def _rfc6979_k(h: int, priv: int) -> int:
    """Deterministic nonce (RFC 6979, HMAC-SHA256) — the geth default."""
    hb = (h % N).to_bytes(32, "big")
    xb = priv.to_bytes(32, "big")
    v = b"\x01" * 32
    key = b"\x00" * 32
    key = hmac.new(key, v + b"\x00" + xb + hb, hashlib.sha256).digest()
    v = hmac.new(key, v, hashlib.sha256).digest()
    key = hmac.new(key, v + b"\x01" + xb + hb, hashlib.sha256).digest()
    v = hmac.new(key, v, hashlib.sha256).digest()
    while True:
        v = hmac.new(key, v, hashlib.sha256).digest()
        k = int.from_bytes(v, "big")
        if 0 < k < N:
            return k
        key = hmac.new(key, v + b"\x00", hashlib.sha256).digest()
        v = hmac.new(key, v, hashlib.sha256).digest()


def ecdsa_sign(h: int, priv: int, k: int | None = None):
    """Sign hash h; returns (r, s, recovery_parity) with low-s
    normalization (EIP-2 / geth homestead rule)."""
    while True:
        kk = _rfc6979_k(h, priv) if k is None else k
        R = mul(G, kk)
        r = R[0] % N
        if r == 0:
            assert k is None, "bad explicit k"
            continue
        s = _inv(kk, N) * (h % N + r * priv) % N
        if s == 0:
            assert k is None, "bad explicit k"
            continue
        parity = R[1] & 1
        if s > N // 2:
            s = N - s
            parity ^= 1
        return r, s, parity


def ecdsa_verify(h: int, pub, r: int, s: int) -> bool:
    if not (0 < r < N and 0 < s < N) or not is_on_curve(pub):
        return False
    w = _inv(s, N)
    u1, u2 = (h % N) * w % N, r * w % N
    pt = add(mul(G, u1), mul(pub, u2))
    return pt is not INF and pt[0] % N == r


def ecrecover(h: int, parity: int, r: int, s: int):
    """Recover the public key (the ecrecover precompile's core;
    bus-mapping/src/precompile.rs ecrecover). Raises on invalid input."""
    assert 0 < r < N and 0 < s < N and parity in (0, 1)
    x = r  # r < N < P: the r+N lift is astronomically rare; reject it
    y2 = (x * x * x + 7) % P
    y = pow(y2, (P + 1) // 4, P)
    assert y * y % P == y2, "r is not an x-coordinate"
    if y & 1 != parity:
        y = P - y
    rinv = _inv(r, N)
    # Q = r^-1 (sR - hG)
    pt = add(mul((x, y), s), mul(G, N - (h % N)))
    return mul(pt, rinv)
