"""GeneralStateTest (ethereum/tests) JSON front-end for the testool
runner.

Reference counterpart: testool/src/statetest/{json.rs,spec.rs} — parse
the official state-test container format (env / pre / transaction /
post) into executable specs. The official corpus is consumed verbatim
when available; the in-repo generated corpus (scripts/gen_corpus.py)
uses the same container format plus an `_expect` section with explicit
post-account assertions (the information the official fillers carry,
which the compiled corpus reduces to a bare post-state root hash we
cannot recompute without secure-trie parity).

Format notes (json.rs:1-120, spec.rs StateTest):
- `transaction` is a template: `data`/`gasLimit`/`value` are LISTS; each
  `post.<fork>[j].indexes {data, gas, value}` selects one combination.
- addresses/quantities are 0x-hex strings; `code` is 0x-hex bytes.
- `secretKey` identifies the sender; we recover the sender address from
  it (statetest executor does the same) and optionally REMAP it to a
  mock wallet so the tx is signable by the Tx/Sig circuits.
"""

from __future__ import annotations

from zkevm_tpu.ec import secp256k1 as s256


def _int(x) -> int:
    if isinstance(x, int):
        return x
    s = x.strip()
    if s.startswith("0x") or s.startswith("0X"):
        return int(s, 16) if len(s) > 2 else 0
    return int(s or "0", 10)


def _bytes(x) -> bytes:
    if isinstance(x, bytes):
        return x
    s = x[2:] if x.startswith("0x") else x
    return bytes.fromhex(s) if s else b""


def _account(st: dict) -> dict:
    out = {
        "balance": _int(st.get("balance", 0)),
        "nonce": _int(st.get("nonce", 0)),
    }
    code = _bytes(st.get("code", ""))
    if code:
        out["code"] = code
    storage = {_int(k): _int(v) for k, v in st.get("storage", {}).items()}
    if storage:
        out["storage"] = storage
    return out


def parse_general_state_tests(
    doc: dict, fork: str | None = None, remap_sender: int | None = None,
) -> list[dict]:
    """Official container {testname: {env, pre, transaction, post,
    _expect?}} -> testool spec dicts (one per post index).

    remap_sender: replace the secretKey-derived sender address with this
    address everywhere (pre/post/expect) so the tx signs with a known
    mock wallet key — state semantics are address-blind for the sender
    except ORIGIN/CALLER reads, which the remap keeps consistent."""
    specs = []
    for name, t in doc.items():
        tx = t["transaction"]
        sender = t.get("_sender")
        if sender is None and "secretKey" in tx:
            sender = s256.address_of(s256.pubkey(_int(tx["secretKey"])))
        sender = _int(sender) if sender is not None else 0
        swap = (lambda a: remap_sender if a == sender else a) \
            if remap_sender is not None else (lambda a: a)

        pre = {}
        for addr_s, st in t["pre"].items():
            pre[swap(_int(addr_s))] = _account(st)

        datas = [_bytes(d) for d in tx.get("data", ["0x"])]
        gases = [_int(g) for g in tx.get("gasLimit", [10_000_000])]
        values = [_int(v) for v in tx.get("value", ["0x00"])]
        to = tx.get("to", "")
        to_i = _int(to) if to else None  # empty to = CREATE
        gas_price = _int(tx.get("gasPrice", "0x0a"))

        post = t.get("post", {})
        forks = [fork] if fork else list(post.keys())
        expect_all = t.get("_expect", {})
        seen = set()
        for fk in forks:
            for case in post.get(fk, []):
                idx = case.get("indexes", {"data": 0, "gas": 0, "value": 0})
                key = (idx.get("data", 0), idx.get("gas", 0),
                       idx.get("value", 0))
                if key in seen:
                    continue  # same combination under another fork label
                seen.add(key)
                spec_tx = {
                    "frm": swap(sender), "to": to_i,
                    "value": values[key[2]], "data": datas[key[0]],
                    "gas": gases[key[1]], "gas_price": gas_price,
                }
                expect: dict = {"post": {}}
                if case.get("expectException"):
                    expect["failed"] = [0]
                for addr_s, want in expect_all.get("post", {}).items():
                    w = {}
                    if "balance" in want:
                        w["balance"] = _int(want["balance"])
                    if "nonce" in want:
                        w["nonce"] = _int(want["nonce"])
                    if "storage" in want:
                        w["storage"] = {_int(k): _int(v)
                                        for k, v in want["storage"].items()}
                    expect["post"][swap(_int(addr_s))] = w
                if "failed" in expect_all:
                    expect["failed"] = expect_all["failed"]
                suffix = "" if len(post.get(fk, [])) == 1 else \
                    f"_d{key[0]}g{key[1]}v{key[2]}"
                specs.append({
                    "name": f"{name}{suffix}",
                    "pre": pre,
                    "txs": [spec_tx],
                    "expect": expect,
                    "env": {k: _int(v) for k, v in t.get("env", {}).items()
                            if k != "previousHash"},
                })
    return specs
