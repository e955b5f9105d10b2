"""zktrie tests: root evolution, inclusion/exclusion proofs
(reference role: zktrie/src/state/builder.rs witness tests)."""

import pytest

from zkevm_tpu.state import ZkTrie

DEPTH = 40  # keep host Poseidon cost low in tests; production uses 248


def test_empty_root_and_single_insert():
    t = ZkTrie(depth=DEPTH)
    r0 = t.root
    r1 = t.update([1234], [5, 6, 7])
    assert r1 == t.root != r0
    assert t.get([1234]) == [5, 6, 7]
    assert t.get([99]) is None


def test_update_and_delete_restores_root():
    t = ZkTrie(depth=DEPTH)
    t.update([1], [10])
    r1 = t.root
    t.update([2], [20])
    assert t.root != r1
    t.update([2], None)
    assert t.root == r1


def test_proofs_inclusion_exclusion():
    t = ZkTrie(depth=DEPTH)
    t.update([7], [70, 71])
    t.update([8], [80])
    root = t.root
    p = t.prove([7])
    assert t.verify(p, root)
    # exclusion proof for an absent key
    pa = t.prove([12345])
    assert pa.value_hash == 0
    assert t.verify(pa, root)
    # tampered sibling fails
    p.siblings[3] = (p.siblings[3] + 1) % (1 << 200)
    assert not t.verify(p, root)


def test_order_independence():
    a = ZkTrie(depth=DEPTH)
    b = ZkTrie(depth=DEPTH)
    a.update([1], [1])
    a.update([2], [2])
    b.update([2], [2])
    b.update([1], [1])
    assert a.root == b.root
