"""Transaction types + RLP encoding (host side).

Reference counterparts:
- `eth-types/src/geth_types.rs` `Transaction` (nonce, gas, gas_price, to,
  value, data, v/r/s) and its `sign_data()` path;
- RLP encoding rules used by `zkevm-circuits/src/witness/tx.rs` and the
  RLP circuit's witness generator (`witness/rlp_fsm.rs`): legacy
  (EIP-155) transactions are
      signed:   rlp([nonce, gas_price, gas, to, value, data, v, r, s])
      unsigned: rlp([nonce, gas_price, gas, to, value, data, chain_id, 0, 0])
  with tx_hash = keccak256(signed bytes) and
  tx_sign_hash = keccak256(unsigned bytes).

The RLP encoder here is the canonical spec encoder (strings + lists,
minimal big-endian integers); it is the golden model the RLP circuit
constrains against.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from zkevm_tpu.hash.keccak import keccak256

M160 = (1 << 160) - 1


def rlp_encode_int(v: int) -> bytes:
    """Minimal big-endian integer encoding (0 -> empty string)."""
    assert v >= 0
    if v == 0:
        return rlp_encode(b"")
    return rlp_encode(v.to_bytes((v.bit_length() + 7) // 8, "big"))


def _length_prefix(length: int, offset: int) -> bytes:
    if length < 56:
        return bytes([offset + length])
    lb = length.to_bytes((length.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(lb)]) + lb


def rlp_encode(item) -> bytes:
    """Spec RLP: bytes encode as strings, ints minimally, lists recurse."""
    if isinstance(item, int):
        return rlp_encode_int(item)
    if isinstance(item, (bytes, bytearray)):
        b = bytes(item)
        if len(b) == 1 and b[0] < 0x80:
            return b
        return _length_prefix(len(b), 0x80) + b
    if isinstance(item, (list, tuple)):
        payload = b"".join(rlp_encode(x) for x in item)
        return _length_prefix(len(payload), 0xC0) + payload
    raise TypeError(type(item))


def rlp_decode(data: bytes):
    """Inverse of rlp_encode (strict: rejects trailing bytes)."""
    item, rest = _decode_one(memoryview(data))
    assert len(rest) == 0, "trailing bytes after RLP item"
    return item


def _decode_one(mv):
    assert len(mv), "empty RLP input"
    b0 = mv[0]
    if b0 < 0x80:
        return bytes(mv[:1]), mv[1:]
    if b0 < 0xB8:  # short string
        ln = b0 - 0x80
        s = bytes(mv[1 : 1 + ln])
        assert len(s) == ln
        assert not (ln == 1 and s[0] < 0x80), "non-minimal single byte"
        return s, mv[1 + ln :]
    if b0 < 0xC0:  # long string
        lb = b0 - 0xB7
        ln = int.from_bytes(bytes(mv[1 : 1 + lb]), "big")
        assert ln >= 56 and mv[1] != 0, "non-minimal long-string length"
        s = bytes(mv[1 + lb : 1 + lb + ln])
        assert len(s) == ln
        return s, mv[1 + lb + ln :]
    if b0 < 0xF8:  # short list
        ln = b0 - 0xC0
        payload = mv[1 : 1 + ln]
        assert len(payload) == ln
        rest = mv[1 + ln :]
    else:
        lb = b0 - 0xF7
        ln = int.from_bytes(bytes(mv[1 : 1 + lb]), "big")
        assert ln >= 56 and mv[1] != 0, "non-minimal long-list length"
        payload = mv[1 + lb : 1 + lb + ln]
        assert len(payload) == ln
        rest = mv[1 + lb + ln :]
    items = []
    while len(payload):
        it, payload = _decode_one(payload)
        items.append(it)
    return items, rest


@dataclass
class Transaction:
    """An Ethereum transaction. Addresses are ints (<2^160); `to=None`
    means contract creation.

    tx_type selects the envelope (reference: witness/tx.rs TxType +
    witness/rlp_fsm.rs:79 formats):
      0 — legacy EIP-155
      1 — EIP-2930 (access list; 0x01-prefixed typed envelope)
      2 — EIP-1559 (dynamic fees + access list; 0x02 envelope)
    For typed txs `gas_price` carries the EFFECTIVE gas price the
    execution layer uses (min(max_fee, base_fee + max_priority_fee));
    the fee caps are RLP fields only."""

    nonce: int = 0
    gas_price: int = 0
    gas: int = 21_000
    to: int | None = None
    value: int = 0
    data: bytes = b""
    chain_id: int = 1
    v: int = 0  # legacy: chain_id*2 + 35 + parity; typed: the parity
    r: int = 0
    s: int = 0
    caller: int = 0  # sender address (recovered or known)
    tx_type: int = 0
    access_list: list = field(default_factory=list)  # [(addr, [keys])]
    max_priority_fee_per_gas: int = 0
    max_fee_per_gas: int = 0

    @property
    def is_create(self) -> bool:
        return self.to is None

    def _to_field(self) -> bytes:
        return b"" if self.to is None else (self.to & M160).to_bytes(20, "big")

    def _al_field(self) -> list:
        """access list -> RLP structure: [[addr20, [key32...]]...]."""
        return [
            [(a & M160).to_bytes(20, "big"),
             [k.to_bytes(32, "big") for k in keys]]
            for a, keys in self.access_list
        ]

    def rlp_unsigned(self) -> bytes:
        """Signing payload (EIP-155 / 2930 / 1559 per tx_type)."""
        if self.tx_type == 0:
            return rlp_encode([
                self.nonce, self.gas_price, self.gas, self._to_field(),
                self.value, self.data, self.chain_id, 0, 0,
            ])
        if self.tx_type == 1:
            return b"\x01" + rlp_encode([
                self.chain_id, self.nonce, self.gas_price, self.gas,
                self._to_field(), self.value, self.data, self._al_field(),
            ])
        assert self.tx_type == 2
        return b"\x02" + rlp_encode([
            self.chain_id, self.nonce, self.max_priority_fee_per_gas,
            self.max_fee_per_gas, self.gas, self._to_field(),
            self.value, self.data, self._al_field(),
        ])

    def rlp_signed(self) -> bytes:
        if self.tx_type == 0:
            return rlp_encode([
                self.nonce, self.gas_price, self.gas, self._to_field(),
                self.value, self.data, self.v, self.r, self.s,
            ])
        if self.tx_type == 1:
            return b"\x01" + rlp_encode([
                self.chain_id, self.nonce, self.gas_price, self.gas,
                self._to_field(), self.value, self.data, self._al_field(),
                self.v, self.r, self.s,
            ])
        assert self.tx_type == 2
        return b"\x02" + rlp_encode([
            self.chain_id, self.nonce, self.max_priority_fee_per_gas,
            self.max_fee_per_gas, self.gas, self._to_field(),
            self.value, self.data, self._al_field(),
            self.v, self.r, self.s,
        ])

    def sign_hash(self) -> bytes:
        return keccak256(self.rlp_unsigned())

    def hash(self) -> bytes:
        return keccak256(self.rlp_signed())

    @property
    def sig_parity(self) -> int:
        if self.tx_type:
            return self.v & 1
        return (self.v - 35 - 2 * self.chain_id) & 1

    def call_data_gas_cost(self) -> int:
        """4 per zero byte, 16 per non-zero (EIP-2028); reference
        witness/tx.rs call_data_gas_cost."""
        return sum(4 if b == 0 else 16 for b in self.data)

    def sign(self, priv: int, k: int | None = None) -> "Transaction":
        """Sign in place with secp256k1 (host; witness-side only) and set
        caller to the derived address. Returns self."""
        from zkevm_tpu.ec import secp256k1 as s256

        h = int.from_bytes(self.sign_hash(), "big")
        r, s, parity = s256.ecdsa_sign(h, priv, k=k)
        self.r, self.s = r, s
        self.v = parity if self.tx_type else self.chain_id * 2 + 35 + parity
        self.caller = s256.address_of(s256.pubkey(priv))
        return self

    def recover_caller(self) -> int:
        """ecrecover over the sign hash (reference: geth sender recovery)."""
        from zkevm_tpu.ec import secp256k1 as s256

        h = int.from_bytes(self.sign_hash(), "big")
        pub = s256.ecrecover(h, self.sig_parity, self.r, self.s)
        return s256.address_of(pub)
