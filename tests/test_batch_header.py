"""BatchHeader / ChunkInfo keccak byte layouts (aggregation/header.py) —
reference: aggregator/src/chunk.rs:318-353, batch.rs:42-131,
blob.rs:230-378."""

import pytest

from zkevm_tpu.aggregation.header import (
    BatchHeader, ChunkInfo, batch_data_hash, challenge_digest,
    challenge_digest_preimage, metadata_bytes, pad_chunks,
)
from zkevm_tpu.hash.keccak import keccak256


def _chunk(i: int, tx_bytes: bytes = b"") -> ChunkInfo:
    return ChunkInfo(
        chain_id=534352,
        prev_state_root=bytes([i] * 32),
        post_state_root=bytes([i + 1] * 32),
        withdraw_root=bytes([0xAA] * 32),
        data_hash=keccak256(bytes([i, 7])),
        tx_bytes=tx_bytes,
    )


def test_chunk_pi_hash_layout():
    c = _chunk(1, b"\x01\x02\x03")
    pre = c.extract_hash_preimage()
    # chain_id(8) + 4 roots/hashes (32 each) + tx hash (32)
    assert len(pre) == 8 + 32 * 5
    assert pre[:8] == (534352).to_bytes(8, "big")
    assert pre[8:40] == c.prev_state_root
    assert pre[-32:] == keccak256(b"\x01\x02\x03")
    assert c.public_input_hash() == keccak256(pre)


def test_pad_chunks_repeats_last():
    chunks = [_chunk(0), _chunk(1)]
    padded = pad_chunks(chunks, 4)
    assert len(padded) == 4
    assert not padded[1].is_padding
    assert padded[2].is_padding and padded[3].is_padding
    assert padded[2].data_hash == chunks[-1].data_hash


def test_batch_data_hash_skips_padding():
    chunks = [_chunk(0), _chunk(1)]
    padded = pad_chunks(chunks, 4)
    # only the valid chunks' data hashes enter the preimage (batch.rs:73)
    assert batch_data_hash(padded) == keccak256(
        chunks[0].data_hash + chunks[1].data_hash)


def test_metadata_and_challenge_digest_layout():
    chunks = [_chunk(0, b"abc"), _chunk(1, b"defg")]
    padded = pad_chunks(chunks, 3)
    md = metadata_bytes(padded)
    # u16 num_valid + 3x u32 sizes; padding size = 0
    assert md == (2).to_bytes(2, "big") + (3).to_bytes(4, "big") \
        + (4).to_bytes(4, "big") + (0).to_bytes(4, "big")
    vh = b"\x01" + bytes(31)
    pre = challenge_digest_preimage(padded, vh)
    # metadata digest + one tx-data digest per padded slot + versioned
    assert len(pre) == 32 + 32 * 3 + 32
    assert pre[:32] == keccak256(md)
    # padded slot repeats the last valid chunk's tx-data digest
    assert pre[32 + 32 * 2:32 + 32 * 3] == keccak256(b"defg")
    assert challenge_digest(padded, vh) == int.from_bytes(
        keccak256(pre), "big")


def test_batch_hash_preimage_layout():
    h = BatchHeader(
        version=3, batch_index=7, l1_message_popped=2,
        total_l1_message_popped=5, parent_batch_hash=bytes([9] * 32),
        last_block_timestamp=1234, data_hash=bytes([1] * 32),
        blob_versioned_hash=bytes([2] * 32),
        blob_data_proof=(bytes([3] * 32), bytes([4] * 32)))
    pre = h.batch_hash_preimage()
    # 1 + 8*3 + 32*3 + 8 + 32*2 = 193 (batch.rs:104-131)
    assert len(pre) == 193
    assert pre[0] == 3
    assert pre[1:9] == (7).to_bytes(8, "big")
    assert pre[25:57] == bytes([1] * 32)
    assert pre[-64:-32] == bytes([3] * 32)
    assert h.batch_hash() == keccak256(pre)


def test_construct_from_chunks_end_to_end():
    from zkevm_tpu.aggregation.blob import (
        BLS_R, BlobParams, barycentric_eval, batch_bytes_to_coeffs)

    chunks = [_chunk(0, b"tx-bytes-0" * 10), _chunk(1, b"tx1" * 30)]
    params = BlobParams.unsafe_setup(16)
    payload = b"batch payload " * 4
    h = BatchHeader.construct_from_chunks(
        version=3, batch_index=1, l1_message_popped=0,
        total_l1_message_popped=0, parent_batch_hash=bytes(32),
        last_block_timestamp=99, chunks=chunks, blob_bytes=payload,
        n_snarks=4, blob_params=params)
    assert h.data_hash == batch_data_hash(pad_chunks(chunks, 4))
    assert h.blob_versioned_hash[0] == 0x01
    z = int.from_bytes(h.blob_data_proof[0], "big")
    y = int.from_bytes(h.blob_data_proof[1], "big")
    assert z == challenge_digest(pad_chunks(chunks, 4),
                                 h.blob_versioned_hash) % BLS_R
    assert y == barycentric_eval(
        batch_bytes_to_coeffs(payload, 16), z)
    assert len(h.batch_hash()) == 32
