"""Fiat-Shamir transcripts.

Mirrors the two transcript roles of the reference stack (SURVEY.md §1 L0):
- Keccak transcript — the EVM-facing proof transcript
  (halo2 `EvmTranscript` role; final bundle proof, prover/src/evm.rs:13);
- Poseidon transcript — the recursion-friendly transcript
  (snark-verifier `PoseidonTranscript` role; all inner/agg layers,
  prover/src/common/prover/utils.rs:31 `gen_snark_shplonk`).

Transcripts are host-side (they touch a few hundred bytes per proof; the
heavy math stays on device). Byte-level parity with scroll's halo2 fork
(coordinate encoding, squeeze schedule) is tracked as a later-round
bit-exactness work item; prover and verifier here are symmetric by
construction.
"""

from __future__ import annotations

from zkevm_tpu.ec import group
from zkevm_tpu.ff.goldens import FQ_MOD, FR_MOD
from zkevm_tpu.hash import keccak
from zkevm_tpu.hash import poseidon as pos


class KeccakTranscript:
    """Write/read symmetric keccak-based transcript over BN254.

    Points absorb as 64 bytes (x ∥ y big-endian); scalars as 32 bytes BE.
    Challenges: state = keccak256(state ∥ absorbed); c = state mod r.
    """

    def __init__(self):
        self._buf = bytearray()
        self._state = b"\x00" * 32

    # -- absorb ---------------------------------------------------------
    def common_point(self, pt) -> None:
        """pt: affine int pair or device G1 batch of one."""
        if isinstance(pt, group.G1):
            pt = group.to_affine_ints(pt)[0]
        if pt is None:
            x = y = 0
        else:
            x, y = pt
        self._buf += int(x).to_bytes(32, "big") + int(y).to_bytes(32, "big")

    def common_scalar(self, v: int) -> None:
        self._buf += int(v % FR_MOD).to_bytes(32, "big")

    def common_bytes(self, raw: bytes) -> None:
        self._buf += raw

    # -- squeeze --------------------------------------------------------
    def challenge(self) -> int:
        self._state = keccak.keccak256(self._state + bytes(self._buf))
        self._buf = bytearray()
        return int.from_bytes(self._state, "big") % FR_MOD

    def challenge_n(self, n: int) -> list[int]:
        return [self.challenge() for _ in range(n)]


class PoseidonTranscript:
    """Poseidon-sponge transcript over Fr (recursion-friendly: every
    absorb/squeeze is a field-native operation provable in-circuit)."""

    def __init__(self, spec: pos.PoseidonSpec = pos.P128_POW5_T3):
        self.spec = spec
        self._pending: list[int] = []
        self._state = 0  # running chain value

    def common_scalar(self, v: int) -> None:
        self._pending.append(v % FR_MOD)

    def common_point(self, pt) -> None:
        if isinstance(pt, group.G1):
            pt = group.to_affine_ints(pt)[0]
        if pt is None:
            self._pending += [0, 0, 0, 0, 0, 0]
        else:
            # Fq coordinates (Fq > Fr) absorb as three 88-bit limbs each —
            # the SAME representation the in-circuit EC gadgets carry
            # (gadgets/bigint.py LB=88, NL=3), so the recursion verifier's
            # transcript reuses the EC lookup limb cells with no
            # re-decomposition (snark-verifier absorbs loader-native limbs
            # for the same reason).
            for c in pt:
                c = int(c)
                m = (1 << 88) - 1
                self._pending += [c & m, (c >> 88) & m, c >> 176]

    def common_bytes(self, raw: bytes) -> None:
        for i in range(0, len(raw), 31):
            self._pending.append(int.from_bytes(raw[i : i + 31], "big"))

    def challenge(self) -> int:
        msg = [self._state] + self._pending
        self._pending = []
        self._state = pos.hash_golden(self.spec, msg)
        return self._state

    def challenge_n(self, n: int) -> list[int]:
        return [self.challenge() for _ in range(n)]
