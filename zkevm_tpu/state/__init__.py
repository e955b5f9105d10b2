"""State layer: zktrie (sparse Poseidon Merkle trie), StateDB/CodeDB.

Reference counterparts: the `zktrie` crate (mpt-zktrie, /root/reference/
zktrie/src/state.rs wrapping scroll-tech/zktrie) and eth-types'
StateDB/CodeDB (/root/reference/eth-types/src/state_db.rs).
"""

from zkevm_tpu.state.zktrie import ZkTrie

__all__ = ["ZkTrie"]
