"""Native execution of EVM precompiles during witness generation.

Reference counterpart: revm-precompile as consumed by
bus-mapping/src/precompile.rs:9-42 (the reference links the Rust crate;
here each precompile is implemented directly on the host — witness-side
execution, not prover math). Gas schedules follow the mainnet rules the
reference tests against (EIP-2565 modexp, Istanbul bn254 costs).

execute(addr, input, gas) -> (ok, output, gas_cost); ok=False means the
call fails (out of gas or malformed input) and consumes all `gas`.
"""

from __future__ import annotations

import hashlib

from zkevm_tpu.ec import goldens as bn
from zkevm_tpu.ec import secp256k1 as s256
from zkevm_tpu.ff.goldens import FQ_MOD, FR_MOD

ADDR_ECRECOVER = 1
ADDR_SHA256 = 2
ADDR_RIPEMD160 = 3
ADDR_IDENTITY = 4
ADDR_MODEXP = 5
ADDR_ECADD = 6
ADDR_ECMUL = 7
ADDR_ECPAIRING = 8
ADDR_BLAKE2F = 9

PRECOMPILE_ADDRS = set(range(1, 10))


def is_precompile(addr: int) -> bool:
    return addr in PRECOMPILE_ADDRS


def _word(data: bytes, i: int) -> int:
    return int.from_bytes(data[32 * i:32 * (i + 1)].ljust(32, b"\0"), "big")


def _ecrecover(data: bytes):
    h = _word(data, 0)
    v = _word(data, 1)
    r = _word(data, 2)
    s = _word(data, 3)
    if v not in (27, 28):
        return True, b""
    try:
        pub = s256.ecrecover(h, v - 27, r, s)
        addr = s256.address_of(pub)
    except Exception:
        return True, b""
    return True, int(addr).to_bytes(32, "big")


def _modexp_gas(data: bytes) -> tuple:
    bl = _word(data, 0)
    el = _word(data, 1)
    ml = _word(data, 2)
    if bl > 1024 or el > 1024 or ml > 1024:  # sane witness bound
        return None
    body = data[96:]
    base = int.from_bytes(body[:bl].ljust(bl, b"\0"), "big")
    exp = int.from_bytes(body[bl:bl + el].ljust(el, b"\0"), "big")
    mod = int.from_bytes(body[bl + el:bl + el + ml].ljust(ml, b"\0"), "big")
    # EIP-2565
    words = (max(bl, ml) + 7) // 8
    mult = words * words
    if el <= 32:
        iters = max(exp.bit_length() - 1, 0)
    else:
        head = int.from_bytes(body[bl:bl + 32].ljust(32, b"\0"), "big")
        iters = 8 * (el - 32) + max(head.bit_length() - 1, 0)
    gas = max(200, mult * max(iters, 1) // 3)
    return gas, base, exp, mod, ml


def _bn_point(data: bytes, i: int):
    x, y = _word(data, i), _word(data, i + 1)
    if x == 0 and y == 0:
        return None
    if x >= FQ_MOD or y >= FQ_MOD:
        raise ValueError("coordinate out of range")
    if (y * y - (x * x * x + 3)) % FQ_MOD:
        raise ValueError("not on curve")
    return (x, y)


def _encode_pt(p) -> bytes:
    if p is None:
        return b"\0" * 64
    return p[0].to_bytes(32, "big") + p[1].to_bytes(32, "big")


def _blake2f(data: bytes):
    """EIP-152 BLAKE2b F compression (RFC 7693)."""
    if len(data) != 213 or data[212] > 1:
        return None
    rounds = int.from_bytes(data[0:4], "big")
    h = [int.from_bytes(data[4 + 8 * i:12 + 8 * i], "little")
         for i in range(8)]
    m = [int.from_bytes(data[68 + 8 * i:76 + 8 * i], "little")
         for i in range(16)]
    t = [int.from_bytes(data[196 + 8 * i:204 + 8 * i], "little")
         for i in range(2)]
    flag = data[212] == 1
    IV = [0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
          0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
          0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179]
    SIGMA = [
        [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
        [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
        [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
        [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
        [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
        [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
        [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
        [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
        [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
        [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    ]
    M64 = (1 << 64) - 1

    def rotr(x, nb):
        return ((x >> nb) | (x << (64 - nb))) & M64

    v = h[:] + IV[:]
    v[12] ^= t[0]
    v[13] ^= t[1]
    if flag:
        v[14] ^= M64

    def G(a, b, c, d, x, y):
        v[a] = (v[a] + v[b] + x) & M64
        v[d] = rotr(v[d] ^ v[a], 32)
        v[c] = (v[c] + v[d]) & M64
        v[b] = rotr(v[b] ^ v[c], 24)
        v[a] = (v[a] + v[b] + y) & M64
        v[d] = rotr(v[d] ^ v[a], 16)
        v[c] = (v[c] + v[d]) & M64
        v[b] = rotr(v[b] ^ v[c], 63)

    for r in range(rounds):
        s = SIGMA[r % 10]
        G(0, 4, 8, 12, m[s[0]], m[s[1]])
        G(1, 5, 9, 13, m[s[2]], m[s[3]])
        G(2, 6, 10, 14, m[s[4]], m[s[5]])
        G(3, 7, 11, 15, m[s[6]], m[s[7]])
        G(0, 5, 10, 15, m[s[8]], m[s[9]])
        G(1, 6, 11, 12, m[s[10]], m[s[11]])
        G(2, 7, 8, 13, m[s[12]], m[s[13]])
        G(3, 4, 9, 14, m[s[14]], m[s[15]])
    out = b"".join(((h[i] ^ v[i] ^ v[i + 8]) & M64).to_bytes(8, "little")
                   for i in range(8))
    return rounds, out


def execute(addr: int, data: bytes, gas: int) -> tuple:
    """-> (ok, output bytes, gas_cost). ok=False consumes all gas."""
    if addr == ADDR_ECRECOVER:
        cost = 3000
        if gas < cost:
            return False, b"", gas
        ok, out = _ecrecover(data)
        return True, out, cost
    if addr == ADDR_SHA256:
        cost = 60 + 12 * ((len(data) + 31) // 32)
        if gas < cost:
            return False, b"", gas
        return True, hashlib.sha256(data).digest(), cost
    if addr == ADDR_RIPEMD160:
        cost = 600 + 120 * ((len(data) + 31) // 32)
        if gas < cost:
            return False, b"", gas
        h = hashlib.new("ripemd160", data).digest()
        return True, h.rjust(32, b"\0"), cost
    if addr == ADDR_IDENTITY:
        cost = 15 + 3 * ((len(data) + 31) // 32)
        if gas < cost:
            return False, b"", gas
        return True, bytes(data), cost
    if addr == ADDR_MODEXP:
        parsed = _modexp_gas(data)
        if parsed is None:
            return False, b"", gas
        cost, base, exp, mod, ml = parsed
        if gas < cost:
            return False, b"", gas
        out = pow(base, exp, mod) if mod else 0
        return True, out.to_bytes(ml, "big") if ml else b"", cost
    if addr == ADDR_ECADD:
        cost = 150
        if gas < cost:
            return False, b"", gas
        try:
            p1, p2 = _bn_point(data, 0), _bn_point(data, 2)
        except ValueError:
            return False, b"", gas
        return True, _encode_pt(bn.add(p1, p2)), cost
    if addr == ADDR_ECMUL:
        cost = 6000
        if gas < cost:
            return False, b"", gas
        try:
            p = _bn_point(data, 0)
        except ValueError:
            return False, b"", gas
        k = _word(data, 2)
        return True, _encode_pt(bn.scalar_mul(p, k)), cost
    if addr == ADDR_ECPAIRING:
        if len(data) % 192:
            return False, b"", gas
        npairs = len(data) // 192
        cost = 45000 + 34000 * npairs
        if gas < cost:
            return False, b"", gas
        from zkevm_tpu.ec import pairing as pr

        pairs = []
        try:
            for i in range(npairs):
                seg = data[192 * i:192 * (i + 1)]
                g1 = _bn_point(seg, 0)
                # G2 coords arrive (x_im, x_re, y_im, y_re)
                xi, xr = _word(seg, 2), _word(seg, 3)
                yi, yr = _word(seg, 4), _word(seg, 5)
                for cc in (xi, xr, yi, yr):
                    if cc >= FQ_MOD:
                        raise ValueError("g2 coord range")
                g2 = ((xr, xi), (yr, yi))
                if g1 is None or (xi | xr | yi | yr) == 0:
                    continue  # identity factor contributes nothing
                pairs.append((g1, g2))
        except ValueError:
            return False, b"", gas
        ok = pr.pairing_check(pairs) if pairs else True
        return True, int(ok).to_bytes(32, "big"), cost
    if addr == ADDR_BLAKE2F:
        res = _blake2f(data)
        if res is None:
            return False, b"", gas
        rounds, out = res
        if gas < rounds:
            return False, b"", gas
        return True, out, rounds
    raise KeyError(f"not a precompile: {addr}")
