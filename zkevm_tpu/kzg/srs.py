"""SRS (structured reference string) file handling, halo2-layout.

Reference counterpart: prover/src/utils.rs:36-84 `load_params` — Scroll
loads perpetual-powers-of-tau params files in halo2's
`SerdeFormat::RawBytesUnchecked` layout and rejects any file whose
`s_g2` is not the known production point (PARAMS_G2_SECRET_POWER,
utils.rs:36). This module reads/writes that exact byte layout:

    [k: u32 LE]
    [2^k G1 points, 64 B each: x||y, Fq raw]      (monomial basis g)
    [2^k G1 points, 64 B each]                    (lagrange basis)
    [G2 point, 128 B: x.c0||x.c1||y.c0||y.c1]     (g2)
    [G2 point, 128 B]                             (s_g2)

Fq "raw bytes" = the Montgomery-form residue (R = 2^256, same as
halo2curves) as 32 little-endian bytes, so files written by halo2 load
bit-identically here and vice versa. Identity encodes as zeros.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from zkevm_tpu.ec import goldens as g1g
from zkevm_tpu.ec import group, group_t, pairing as pr
from zkevm_tpu.ec.msm import FixedBaseMSM
from zkevm_tpu.ec.pippenger import PippengerMSMT
from zkevm_tpu.ff import limbs as ff
from zkevm_tpu.ff.goldens import FQ_MOD, FR_MOD
from zkevm_tpu.kzg.params import ParamsKZG
from zkevm_tpu.poly.goldens import domain_omega

R256 = 1 << 256
R_INV = pow(R256 % FQ_MOD, FQ_MOD - 2, FQ_MOD)

# The production perpetual-powers-of-tau [tau]G2 (prover/src/utils.rs:36).
SCROLL_S_G2 = (
    (
        0x17944351223333F260DDC3B4AF45191B856689EDA9EAB5CBCDDBBE570CE860D2,
        0x186282957DB913ABD99F91DB59FE69922E95040603EF44C0BD7AA3ADEEF8F5AC,
    ),
    (
        0x297772D34BC9AA8AE56162486363FFE417B02DC7E8C207FC2CC20203E67A02AD,
        0x298ADC7396BD3865CBF6D6DF91BAE406694E6D2215BAA893BDEADB63052895F4,
    ),
)


def _fq_raw(v: int) -> bytes:
    return (v * R256 % FQ_MOD).to_bytes(32, "little")


def _fq_unraw(b: bytes) -> int:
    v = int.from_bytes(b, "little")
    if v >= FQ_MOD:
        raise ValueError("non-canonical Fq raw bytes")
    return v * R_INV % FQ_MOD


def _g2_raw(pt) -> bytes:
    (xc0, xc1), (yc0, yc1) = pt
    return _fq_raw(xc0) + _fq_raw(xc1) + _fq_raw(yc0) + _fq_raw(yc1)


def _g2_unraw(b: bytes):
    vals = [_fq_unraw(b[i : i + 32]) for i in range(0, 128, 32)]
    return ((vals[0], vals[1]), (vals[2], vals[3]))


def params_path(params_dir: str, k: int) -> str:
    """The reference's per-degree file naming (utils.rs param_path_for_degree)."""
    return os.path.join(params_dir, f"params{k}")


def write_params_file(params: ParamsKZG, path: str, *, tau: int) -> None:
    """Write a test SRS in the halo2 layout. `tau` is required to compute
    the lagrange-basis section ([L_i(tau)]G1) without an EC-NTT — only
    test SRS from `unsafe_setup` are ever written locally (production
    files come from the ceremony, as in the reference)."""
    k, n = params.k, params.n
    affine = group.to_affine_ints(params.g1_powers)
    # lagrange scalars: L_i(tau) = (tau^n - 1) * omega^i / (n * (tau - omega^i))
    omega = domain_omega(k)
    tau %= FR_MOD
    zn = (pow(tau, n, FR_MOD) - 1) % FR_MOD
    ninv = pow(n, FR_MOD - 2, FR_MOD)
    lag = []
    wi = 1
    for i in range(n):
        d = pow((tau - wi) % FR_MOD, FR_MOD - 2, FR_MOD)
        lag.append(zn * wi % FR_MOD * d % FR_MOD * ninv % FR_MOD)
        wi = wi * omega % FR_MOD
    with open(path, "wb") as f:
        f.write(int(k).to_bytes(4, "little"))
        for x, y in affine:
            f.write(_fq_raw(x) + _fq_raw(y))
        for s in lag:
            x, y = g1g.scalar_mul(g1g.G1_GEN, s)
            f.write(_fq_raw(x) + _fq_raw(y))
        f.write(_g2_raw(params.g2))
        f.write(_g2_raw(params.s_g2))


def load_params_file(
    path_or_dir: str,
    k: int | None = None,
    *,
    expected_s_g2=None,
    windowed: bool = False,
) -> ParamsKZG:
    """Load a halo2-layout params file; validates length, curve
    membership of g2/s_g2, and (when `expected_s_g2` is given, e.g.
    SCROLL_S_G2 for production files) the s_g2 fingerprint — the
    reference's checks at prover/src/utils.rs:55-80."""
    path = path_or_dir
    if os.path.isdir(path_or_dir):
        assert k is not None, "need k to pick a file from a params dir"
        path = params_path(path_or_dir, k)
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        kf = int.from_bytes(f.read(4), "little")
        if k is not None and kf != k:
            raise ValueError(f"params file has k={kf}, expected {k}")
        n = 1 << kf
        expected = 4 + 2 * n * 64 + 2 * 128
        if size != expected:
            raise ValueError(
                f"invalid params file len {size} for degree {kf} "
                f"(expected {expected})"
            )
        raw = np.frombuffer(f.read(n * 64), dtype=np.uint8).reshape(n, 2, 32)
        f.seek(n * 64, 1)  # skip the lagrange section (we commit via iNTT)
        g2 = _g2_unraw(f.read(128))
        s_g2 = _g2_unraw(f.read(128))

    # vectorized raw->canonical: interpret 16-bit LE limbs, then un-Montgomery
    # on device via from_mont (the values ARE the Montgomery residues)
    limbs = raw.view("<u2").astype(np.uint32).reshape(n, 2, 16)
    xs = jnp.asarray(limbs[:, 0])
    ys = jnp.asarray(limbs[:, 1])
    from zkevm_tpu.ff.limbs import fq_spec

    FQ = fq_spec()
    g1_powers = group.G1(xs, ys, jnp.broadcast_to(jnp.asarray(FQ.encode(1)), (n, ff.L)))

    # spot validation: first/last points on curve (full batch check is a
    # device reduction; cofactor 1 makes on-curve sufficient)
    for i in (0, n - 1):
        x = int(np.asarray(limbs[i, 0]) @ (1 << (16 * np.arange(16, dtype=object)))) * R_INV % FQ_MOD
        y = int(np.asarray(limbs[i, 1]) @ (1 << (16 * np.arange(16, dtype=object)))) * R_INV % FQ_MOD
        if (y * y - x * x * x - 3) % FQ_MOD != 0:
            raise ValueError(f"g1[{i}] not on curve")
    if not pr.g2_is_on_curve(g2) or not pr.g2_is_on_curve(s_g2):
        raise ValueError("g2/s_g2 not on curve")
    if expected_s_g2 is not None and s_g2 != tuple(map(tuple, expected_s_g2)):
        raise ValueError(f"wrong params file: s_g2 fingerprint mismatch")

    committer = None
    pippenger = None
    if kf > 10:
        pippenger = PippengerMSMT(group_t.from_g1(g1_powers))
    elif windowed:
        committer = FixedBaseMSM(g1_powers)
    return ParamsKZG(
        k=kf, g1_powers=g1_powers, g2=g2, s_g2=s_g2,
        committer=committer, pippenger=pippenger,
    )
