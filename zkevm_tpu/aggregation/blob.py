"""EIP-4844 blob machinery: coefficients, BLS12-381 KZG, barycentric eval.

Reference counterpart: aggregator/src/blob.rs (BatchData -> 4096x31-byte
blob coefficients), eip4844.rs (c-kzg versioned hash + blob commitment),
aggregation/barycentric.rs (in-circuit barycentric evaluation of the blob
polynomial at challenge z over the BLS12-381 SCALAR field, emulated with
88-bit limbs). The reference links the C library c-kzg for the trusted
setup + commitment; here the BLS12-381 curve/KZG is implemented directly
(host-side — one 4096-point MSM per batch is not a prover hot path) and
the trusted setup is generated from a tau parameter (the production
Ethereum setup loads the same (n, G1 powers, G2 tau) shape from file).

The blob polynomial is in EVALUATION form over the bit-reversed 4096th
roots of unity (EIP-4844 convention): blob(z) at an out-of-domain z uses
the barycentric formula
    y = (z^n - 1)/n * sum_i c_i * w_i / (z - w_i).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

# --- BLS12-381 ---------------------------------------------------------
BLS_P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
BLS_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
BLS_G1 = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)
# 2^32 divides BLS_R - 1; primitive 2^32 root of unity
BLS_ROOT_2_32 = pow(7, (BLS_R - 1) >> 32, BLS_R)
FIELD_ELEMENTS_PER_BLOB = 4096
BYTES_PER_COEFF = 31


def bls_root_of_unity(k: int) -> int:
    """Primitive 2^k-th root of unity in the BLS scalar field."""
    assert k <= 32
    return pow(BLS_ROOT_2_32, 1 << (32 - k), BLS_R)


def _bitrev(i: int, bits: int) -> int:
    return int(format(i, f"0{bits}b")[::-1], 2) if bits else 0


def blob_domain(n: int) -> list[int]:
    """EIP-4844 evaluation domain: bit-reversed powers of the 2^k root."""
    k = n.bit_length() - 1
    w = bls_root_of_unity(k)
    return [pow(w, _bitrev(i, k), BLS_R) for i in range(n)]


# --- BLS12-381 G1 (host; y^2 = x^3 + 4) ---------------------------------

def bls_g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % BLS_P == 0:
            return None
        lam = (3 * x1 * x1) * pow(2 * y1, BLS_P - 2, BLS_P) % BLS_P
    else:
        lam = (y2 - y1) * pow(x2 - x1, BLS_P - 2, BLS_P) % BLS_P
    x3 = (lam * lam - x1 - x2) % BLS_P
    return (x3, (lam * (x1 - x3) - y1) % BLS_P)


def bls_g1_mul(p, k: int):
    k %= BLS_R
    acc = None
    while k:
        if k & 1:
            acc = bls_g1_add(acc, p)
        p = bls_g1_add(p, p)
        k >>= 1
    return acc


@dataclass
class BlobParams:
    """EIP-4844 trusted setup over the blob domain (LAGRANGE basis, like
    the c-kzg setup files: L_i(tau)*G1 for the bit-reversed domain)."""

    n: int
    lagrange_g1: list  # L_i(tau) * G1 per domain point
    tau_g2_tau: int  # kept only for tests via known tau

    @classmethod
    def unsafe_setup(cls, n: int, tau: int = 0xB10B) -> "BlobParams":
        dom = blob_domain(n)
        zn = (pow(tau, n, BLS_R) - 1) % BLS_R
        n_inv = pow(n, BLS_R - 2, BLS_R)
        pts = []
        for wi in dom:
            # L_i(tau) = w_i (tau^n - 1) / (n (tau - w_i))
            li = wi * zn % BLS_R * n_inv % BLS_R * pow(
                (tau - wi) % BLS_R, BLS_R - 2, BLS_R) % BLS_R
            pts.append(bls_g1_mul(BLS_G1, li))
        return cls(n, pts, tau)


def blob_commit(params: BlobParams, coeffs: list[int]):
    """KZG commitment of the blob (sum c_i * L_i(tau) G1)."""
    acc = None
    for c, p in zip(coeffs, params.lagrange_g1):
        if c:
            acc = bls_g1_add(acc, bls_g1_mul(p, c))
    return acc


def g1_compress(pt) -> bytes:
    """ZCash-flavoured BLS12-381 G1 compression (48 bytes)."""
    if pt is None:
        return bytes([0xC0] + [0] * 47)
    x, y = pt
    flag = 0x80 | (0x20 if y > (BLS_P - 1) // 2 else 0)
    b = bytearray(x.to_bytes(48, "big"))
    b[0] |= flag
    return bytes(b)


def versioned_hash(commitment_bytes: bytes) -> bytes:
    """EIP-4844: 0x01 ++ sha256(commitment)[1:] (eip4844.rs:8-46)."""
    h = bytearray(hashlib.sha256(commitment_bytes).digest())
    h[0] = 0x01
    return bytes(h)


# --- batch bytes <-> blob coefficients ----------------------------------

def batch_bytes_to_coeffs(data: bytes, n: int = FIELD_ELEMENTS_PER_BLOB
                          ) -> list[int]:
    """31 bytes per coefficient, zero padded (blob.rs:23-44): every
    coefficient stays < 2^248 < BLS_R, so encoding is canonical."""
    cap = n * BYTES_PER_COEFF
    assert len(data) <= cap, f"batch payload {len(data)} > blob cap {cap}"
    out = []
    for i in range(n):
        chunk = data[i * BYTES_PER_COEFF:(i + 1) * BYTES_PER_COEFF]
        out.append(int.from_bytes(chunk.ljust(BYTES_PER_COEFF, b"\0"),
                                  "big"))
    return out


def barycentric_eval(coeffs: list[int], z: int, n: int | None = None) -> int:
    """blob(z) for out-of-domain z (host golden; barycentric.rs:26-55)."""
    n = n if n is not None else len(coeffs)
    dom = blob_domain(n)
    zn1 = (pow(z, n, BLS_R) - 1) % BLS_R
    n_inv = pow(n, BLS_R - 2, BLS_R)
    acc = 0
    for c, wi in zip(coeffs, dom):
        acc = (acc + c * wi % BLS_R
               * pow((z - wi) % BLS_R, BLS_R - 2, BLS_R)) % BLS_R
    return acc * zn1 % BLS_R * n_inv % BLS_R


def point_eval_precompile(params: BlobParams, coeffs, z: int, y: int) -> bool:
    """The 0x0A point-evaluation precompile's statement, checked directly
    with the known-tau test setup: blob(z) == y (revm-precompile analog,
    bus-mapping/src/precompile.rs role)."""
    return barycentric_eval(coeffs, z, params.n) == y % BLS_R
