"""Transaction / RLP / secp256k1 host-side goldens.

EIP-155 example vector + well-known private-key->address fixtures
(reference behavior: eth-types geth_types::Transaction + geth sender
recovery)."""

from zkevm_tpu.ec import secp256k1 as s256
from zkevm_tpu.etypes.tx import Transaction, rlp_decode, rlp_encode


def test_rlp_spec_vectors():
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    assert rlp_encode([]) == b"\xc0"
    # set-theoretic representation of 3
    assert rlp_encode([[], [[]], [[], [[]]]]) == bytes.fromhex("c7c0c1c0c3c0c1c0")
    lorem = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert rlp_encode(lorem) == b"\xb8\x38" + lorem


def test_rlp_roundtrip():
    item = [b"\x01\x02", [b"", b"abc" * 30], b"\x7f", [[]]]
    assert rlp_decode(rlp_encode(item)) == item


def test_eip155_example():
    """The worked example from the EIP-155 spec."""
    tx = Transaction(
        nonce=9, gas_price=20 * 10**9, gas=21000,
        to=0x3535353535353535353535353535353535353535,
        value=10**18, data=b"", chain_id=1,
    )
    assert tx.rlp_unsigned().hex() == (
        "ec098504a817c800825208943535353535353535353535353535353535353535"
        "880de0b6b3a764000080018080"
    )
    assert tx.sign_hash().hex() == (
        "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"
    )
    priv = 0x4646464646464646464646464646464646464646464646464646464646464646
    tx.sign(priv)
    assert tx.v == 37
    assert tx.r == 18515461264373351373200002665853028612451056578545711640558177340181847433846
    assert tx.s == 46948507304638947509940763649030358759909902576025900602547168820602576006531
    # sender recovery round-trips
    assert tx.recover_caller() == tx.caller
    assert tx.caller == s256.address_of(s256.pubkey(priv))


def test_known_addresses():
    # famous fixture: priv=1 -> address of G
    assert s256.address_of(s256.pubkey(1)) == \
        0x7E5F4552091A69125D5DFCB7B8C2659029395BDF
    assert s256.address_of(s256.pubkey(2)) == \
        0x2B5AD5C4795C026514F8317C7A215E218DCCD6CF


def test_ecdsa_verify_and_tamper():
    priv = 0xDEADBEEF1234
    pub = s256.pubkey(priv)
    h = 0x1234567890ABCDEF
    r, s, parity = s256.ecdsa_sign(h, priv)
    assert s <= s256.N // 2  # low-s
    assert s256.ecdsa_verify(h, pub, r, s)
    assert not s256.ecdsa_verify(h + 1, pub, r, s)
    assert not s256.ecdsa_verify(h, pub, r, s + 1)
    assert s256.ecrecover(h, parity, r, s) == pub


def test_call_data_gas_cost():
    tx = Transaction(data=bytes([0, 0, 1, 0xFF]))
    assert tx.call_data_gas_cost() == 4 + 4 + 16 + 16


def test_eip2930_roundtrip_and_recovery():
    from zkevm_tpu.etypes.tx import Transaction, rlp_decode

    tx = Transaction(
        tx_type=1, nonce=7, gas_price=10**9, gas=40_000,
        to=0xCAFE00000000000000000000000000000000BEEF, value=123,
        data=b"\x01\x02", chain_id=5,
        access_list=[(0xAAAA, [1, 2]), (0xBBBB, [])],
    ).sign(0x1234_5678_9ABC)
    assert tx.caller == tx.recover_caller()
    signed = tx.rlp_signed()
    assert signed[0] == 0x01
    items = rlp_decode(signed[1:])
    assert len(items) == 11
    # access list structure: [[addr, [k1, k2]], [addr, []]]
    al = items[7]
    assert len(al) == 2 and len(al[0][1]) == 2 and al[1][1] == []
    assert int.from_bytes(al[0][0], "big") == 0xAAAA


def test_eip1559_roundtrip_and_recovery():
    from zkevm_tpu.etypes.tx import Transaction, rlp_decode

    tx = Transaction(
        tx_type=2, nonce=1, gas=60_000, gas_price=7,  # effective price
        max_priority_fee_per_gas=2, max_fee_per_gas=50,
        to=0xD00D, value=5, data=b"", chain_id=1,
        access_list=[(0xCCCC, [42])],
    ).sign(0xDEADBEEF5EED)
    assert tx.caller == tx.recover_caller()
    signed = tx.rlp_signed()
    assert signed[0] == 0x02
    items = rlp_decode(signed[1:])
    assert len(items) == 12
    assert int.from_bytes(items[2], "big") == 2   # max priority fee
    assert int.from_bytes(items[3], "big") == 50  # max fee
    # sign-hash domain separation: unsigned payload is 0x02-prefixed
    assert tx.rlp_unsigned()[0] == 0x02
    # parity-v convention for typed txs
    assert tx.v in (0, 1)


def test_typed_vs_legacy_hash_domains_disjoint():
    from zkevm_tpu.etypes.tx import Transaction

    base = dict(nonce=3, gas_price=5, gas=30_000, to=0xBEEF, value=9,
                data=b"xy", chain_id=1)
    legacy = Transaction(**base).sign(0x51EE9)
    t1 = Transaction(tx_type=1, **base).sign(0x51EE9)
    t2 = Transaction(tx_type=2, max_fee_per_gas=5, **base).sign(0x51EE9)
    hashes = {legacy.hash(), t1.hash(), t2.hash()}
    assert len(hashes) == 3
    sh = {legacy.sign_hash(), t1.sign_hash(), t2.sign_hash()}
    assert len(sh) == 3
