"""Batch/chunk header hashing — byte-exact keccak layouts of the reference.

Reference counterparts:
- ChunkInfo.public_input_hash / extract_hash_preimage
  (aggregator/src/chunk.rs:318-353)
- BatchHeader.construct_from_chunks / batch_hash
  (aggregator/src/batch.rs:42-131)
- BatchData metadata + challenge digest (aggregator/src/blob.rs:230-378)

These are the L1-facing byte layouts: the batch hash the rollup contract
recomputes, and the challenge-digest that seeds the EIP-4844
point-evaluation challenge z. They are computed host-side here (witgen
parity); the in-circuit binding of the batch digest currently uses the
Poseidon transcript (aggregation/batch.py, documented deviation) with
these keccak forms carried in the proof metadata.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.hash.keccak import keccak256


def _be(v: int, nbytes: int) -> bytes:
    return int(v).to_bytes(nbytes, "big")


@dataclass
class ChunkInfo:
    """Chunk public-input container (aggregator/src/chunk.rs:19)."""

    chain_id: int
    prev_state_root: bytes  # 32
    post_state_root: bytes  # 32
    withdraw_root: bytes  # 32
    data_hash: bytes  # 32: keccak(DA header bytes ++ l1-msg tx hashes)
    tx_bytes: bytes = b""  # flattened RLP-signed L2 tx bytes
    is_padding: bool = False

    def tx_bytes_hash(self) -> bytes:
        """keccak of the flattened RLP-signed tx bytes (chunk.rs:184)."""
        return keccak256(self.tx_bytes)

    def extract_hash_preimage(self) -> bytes:
        """chain_id(8) || prev_root || post_root || withdraw_root ||
        data_hash || tx_bytes_hash (chunk.rs:333-353)."""
        return (_be(self.chain_id, 8) + self.prev_state_root
                + self.post_state_root + self.withdraw_root
                + self.data_hash + self.tx_bytes_hash())

    def public_input_hash(self) -> bytes:
        return keccak256(self.extract_hash_preimage())

    def padded_copy(self) -> "ChunkInfo":
        return ChunkInfo(self.chain_id, self.prev_state_root,
                         self.post_state_root, self.withdraw_root,
                         self.data_hash, self.tx_bytes, True)


def pad_chunks(chunks: list[ChunkInfo], n_snarks: int) -> list[ChunkInfo]:
    """Repeat the last chunk as padding up to the fan-in
    (batch.rs:55-62; aggregator/prover.rs:155-163)."""
    assert 0 < len(chunks) <= n_snarks
    out = list(chunks)
    while len(out) < n_snarks:
        out.append(chunks[-1].padded_copy())
    return out


def batch_data_hash(chunks_with_padding: list[ChunkInfo]) -> bytes:
    """keccak over the VALID chunks' data hashes (batch.rs:64-79)."""
    n_valid = next((i for i, c in enumerate(chunks_with_padding)
                    if c.is_padding), len(chunks_with_padding))
    pre = b"".join(c.data_hash for c in chunks_with_padding[:n_valid])
    return keccak256(pre)


def metadata_bytes(chunks_with_padding: list[ChunkInfo]) -> bytes:
    """num_valid_chunks (u16 BE) ++ per-chunk tx-byte sizes (u32 BE;
    0 for padding) — BatchData::to_metadata_bytes (blob.rs:368-378)."""
    n_valid = next((i for i, c in enumerate(chunks_with_padding)
                    if c.is_padding), len(chunks_with_padding))
    out = _be(n_valid, 2)
    for c in chunks_with_padding:
        out += _be(0 if c.is_padding else len(c.tx_bytes), 4)
    return out


def challenge_digest_preimage(chunks_with_padding: list[ChunkInfo],
                              versioned_hash: bytes) -> bytes:
    """metadata_digest ++ per-chunk tx-data digests (padding repeats the
    last valid chunk's) ++ blob versioned hash (blob.rs:275-292)."""
    pre = keccak256(metadata_bytes(chunks_with_padding))
    for c in chunks_with_padding:
        pre += keccak256(c.tx_bytes)
    return pre + versioned_hash


def challenge_digest(chunks_with_padding: list[ChunkInfo],
                     versioned_hash: bytes) -> int:
    """The EIP-4844 point-evaluation challenge seed (blob.rs:295-298);
    z = digest mod BLS_R (barycentric.rs convention)."""
    return int.from_bytes(
        keccak256(challenge_digest_preimage(chunks_with_padding,
                                            versioned_hash)), "big")


@dataclass
class BatchHeader:
    """The L1 batch header (aggregator/src/batch.rs:18-40, codec v3+)."""

    version: int
    batch_index: int
    l1_message_popped: int
    total_l1_message_popped: int
    parent_batch_hash: bytes  # 32
    last_block_timestamp: int
    data_hash: bytes  # 32 (batch data hash over chunk data hashes)
    blob_versioned_hash: bytes  # 32
    blob_data_proof: tuple = (b"\x00" * 32, b"\x00" * 32)  # (z, y) 32B BE

    @classmethod
    def construct_from_chunks(cls, version: int, batch_index: int,
                              l1_message_popped: int,
                              total_l1_message_popped: int,
                              parent_batch_hash: bytes,
                              last_block_timestamp: int,
                              chunks: list[ChunkInfo], blob_bytes: bytes,
                              n_snarks: int, blob_params=None,
                              n_blob: int | None = None) -> "BatchHeader":
        """batch.rs:42-101 — pads the chunk list, hashes the chunk data
        hashes, commits the blob (`blob_params`: BlobParams; the c-kzg
        trusted-setup role) and derives (z, y) via the barycentric
        evaluation at the keccak challenge digest."""
        from zkevm_tpu.aggregation.blob import (
            BLS_R, BlobParams, barycentric_eval, batch_bytes_to_coeffs,
            blob_commit, g1_compress, versioned_hash)

        padded = pad_chunks(chunks, n_snarks)
        dh = batch_data_hash(padded)
        if blob_params is None:
            blob_params = BlobParams.unsafe_setup(
                n_blob if n_blob else 4096)
        coeffs = batch_bytes_to_coeffs(blob_bytes, blob_params.n)
        commitment = blob_commit(blob_params, coeffs)
        versioned = versioned_hash(g1_compress(commitment))
        z = challenge_digest(padded, versioned) % BLS_R
        y = barycentric_eval(coeffs, z)
        return cls(version, batch_index, l1_message_popped,
                   total_l1_message_popped, parent_batch_hash,
                   last_block_timestamp, dh, versioned,
                   (_be(z, 32), _be(y, 32)))

    def batch_hash_preimage(self) -> bytes:
        """version(1) || batch_index(8) || l1_message_popped(8) ||
        total_l1_message_popped(8) || data_hash || versioned_hash ||
        parent_batch_hash || last_block_timestamp(8) || z || y
        (batch.rs:104-131)."""
        return (bytes([self.version]) + _be(self.batch_index, 8)
                + _be(self.l1_message_popped, 8)
                + _be(self.total_l1_message_popped, 8)
                + self.data_hash + self.blob_versioned_hash
                + self.parent_batch_hash
                + _be(self.last_block_timestamp, 8)
                + self.blob_data_proof[0] + self.blob_data_proof[1])

    def batch_hash(self) -> bytes:
        return keccak256(self.batch_hash_preimage())
