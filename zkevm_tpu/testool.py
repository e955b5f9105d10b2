"""Conformance test runner: declarative state tests -> trace -> witness
-> (optionally) MockProver.

Reference counterpart: the `testool` crate (testool/src/statetest/
executor.rs:427-714) — parse a state-test spec, execute it through the
tracer, build the witness, check the post state, and either stop at
witness checks or run the circuits; results are collected into a report
(statetest/results.rs). The reference feeds official ethereum/tests
YAML/JSON; here specs are plain dicts (the same information content as a
StateTest: pre-state, one or more txs, expected post-state), so suites
are versioned Python/JSON files instead of a submodule checkout.

Tiers (executor.rs's `witness` vs `circuit` modes):
- WITNESS: trace + CircuitInputBuilder + RW consistency + gas audit +
  post-state check against the spec expectations.
- CIRCUIT: everything above, then the full SuperCircuit through
  MockProver (slow — the caller picks the tier).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from zkevm_tpu.testctx import MOCK_ADDRS, TestContext
from zkevm_tpu.witness.block import CircuitsParams, block_convert

WITNESS = "witness"
CIRCUIT = "circuit"


@dataclass
class StateTestResult:
    name: str
    status: str  # "pass" | "fail" | "skip"
    detail: str = ""
    seconds: float = 0.0


@dataclass
class Report:
    """Aggregate results (statetest/results.rs analog)."""

    results: list = field(default_factory=list)

    def add(self, r: StateTestResult) -> None:
        self.results.append(r)

    @property
    def counts(self) -> dict:
        out = {"pass": 0, "fail": 0, "skip": 0}
        for r in self.results:
            out[r.status] += 1
        return out

    def summary(self) -> str:
        c = self.counts
        total = len(self.results)
        ok = c["pass"] + c["skip"]
        lines = [f"{total} tests: {c['pass']} pass, {c['fail']} fail, "
                 f"{c['skip']} skip"]
        for r in self.results:
            mark = {"pass": "PASS", "fail": "FAIL", "skip": "SKIP"}[r.status]
            lines.append(f"  [{mark}] {r.name} ({r.seconds:.2f}s) {r.detail}")
        return "\n".join(lines)

    def assert_all_pass(self) -> None:
        bad = [r for r in self.results if r.status == "fail"]
        assert not bad, "\n" + self.summary()


def _resolve(spec_addr, addrs):
    if isinstance(spec_addr, int) and 0 <= spec_addr < len(MOCK_ADDRS):
        return addrs[spec_addr]
    return spec_addr


_CS_CACHE: dict = {}


def _configured_super(params):
    """Memoized SuperCircuit configure — the constraint-system build is
    expensive and identical across corpus tests with the same params."""
    key = (params.max_txs, params.max_calldata, params.max_rlp)
    if key not in _CS_CACHE:
        from zkevm_tpu.circuits import super_circuit as sup
        from zkevm_tpu.plonk import ConstraintSystem

        cs = ConstraintSystem()
        cfg = sup.configure(cs, params)
        _CS_CACHE[key] = (cs, cfg)
    return _CS_CACHE[key]


def run_state_test(spec: dict, tier: str = WITNESS,
                   mock_challenges=None) -> StateTestResult:
    """Execute one spec. Spec keys:
        name: str
        pre:  {account index | address: {balance?, code?, nonce?,
               storage? {slot: value}}}
        txs:  [{frm, to, value?, data?, gas?}]  (indices or addresses)
        expect: {post: {address spec: {balance?, nonce?, storage?}},
                 failed?: [tx indices expected to revert]}
    """
    name = spec.get("name", "unnamed")
    t0 = time.time()
    try:
        acc_fns = []
        for key in sorted(spec["pre"]):
            st = spec["pre"][key]

            def fn(a, key=key, st=st):
                if isinstance(key, int) and key >= 0x10000:
                    a.address(key)
                a.balance(st.get("balance", 0)).nonce(st.get("nonce", 0))
                if "code" in st:
                    a.code(st["code"])
                if "storage" in st:
                    a.storage(dict(st["storage"]))

            acc_fns.append(fn)

        tx_fns = []
        for t in spec["txs"]:
            def tfn(m, t=t):
                m.from_(t["frm"]).to(t.get("to")).value(t.get("value", 0))
                m.input(t.get("data", b""))
                if "gas" in t:
                    m.gas(t["gas"])
                if "gas_price" in t:
                    m.gas_price(t["gas_price"])

            tx_fns.append(tfn)

        # env block (statetest `env` section -> block context)
        env = spec.get("env", {})
        env_map = {"currentCoinbase": "coinbase", "currentNumber": "number",
                   "currentTimestamp": "timestamp",
                   "currentGasLimit": "gas_limit",
                   "currentBaseFee": "base_fee"}
        block = {env_map[k]: v for k, v in env.items() if k in env_map}
        ctx = TestContext.new(accounts=acc_fns, txs=tx_fns,
                              block=block or None)

        # expected revert pattern
        exp = spec.get("expect", {})
        want_failed = set(exp.get("failed", []))
        for i, tr in enumerate(ctx.traces):
            if bool(tr.failed) != (i in want_failed):
                return StateTestResult(
                    name, "fail",
                    f"tx{i} failed={bool(tr.failed)}, expected "
                    f"{'failure' if i in want_failed else 'success'}",
                    time.time() - t0)

        b = ctx.builder()
        errs = b.rws.check_consistency()
        if errs:
            return StateTestResult(name, "fail", f"rw: {errs[:2]}",
                                   time.time() - t0)
        perrs = b.check_post_state(ctx.post_sdb)
        if perrs:
            return StateTestResult(name, "fail", f"post: {perrs[:2]}",
                                   time.time() - t0)

        # spec post-state expectations
        for key, want in exp.get("post", {}).items():
            addr = _resolve(key, ctx.addrs)
            acc = ctx.post_sdb.get_account(addr)
            if "balance" in want and acc.balance != want["balance"]:
                return StateTestResult(
                    name, "fail",
                    f"{hex(addr)} balance {acc.balance} != {want['balance']}",
                    time.time() - t0)
            if "nonce" in want and acc.nonce != want["nonce"]:
                return StateTestResult(
                    name, "fail", f"{hex(addr)} nonce {acc.nonce}",
                    time.time() - t0)
            for slot, v in want.get("storage", {}).items():
                got = ctx.post_sdb.get_storage(addr, slot)
                if got != v:
                    return StateTestResult(
                        name, "fail",
                        f"{hex(addr)} slot {slot}: {got} != {v}",
                        time.time() - t0)

        if tier == CIRCUIT:
            from zkevm_tpu.circuits import super_circuit as sup
            from zkevm_tpu.plonk import MockProver

            cd = max((len(t.get("data", b"")) for t in spec["txs"]),
                     default=16) or 16
            # bucket calldata capacity so the (expensive) configure is
            # shared across the whole corpus run
            cd_cap = 16
            while cd_cap < cd:
                cd_cap *= 2
            params = CircuitsParams(
                max_txs=max(2, len(spec["txs"])),
                max_calldata=cd_cap,
                max_rlp=max(160, 2 * cd_cap),
            )
            block = block_convert(ctx, params)
            cs, cfg = _configured_super(params)
            k = sup.choose_k(cfg, block)
            wit = sup.assign(cs, cfg, 1 << k, block)
            ch = mock_challenges or [0x100, 0x107, 0x10E]
            wit.fill_phase1(ch[1], ch[0])
            fails = MockProver(cs, wit.asg, challenges=ch).verify()
            if fails:
                return StateTestResult(name, "fail",
                                       f"circuit: {fails[:2]}",
                                       time.time() - t0)

        return StateTestResult(name, "pass", "", time.time() - t0)
    except NotImplementedError as e:  # out-of-scope opcode etc.
        return StateTestResult(name, "skip", str(e), time.time() - t0)
    except Exception as e:  # noqa: BLE001 — mirror testool: a crash is a fail
        from zkevm_tpu.etypes.trace import TraceError

        if isinstance(e, TraceError):
            return StateTestResult(name, "skip", str(e), time.time() - t0)
        return StateTestResult(name, "fail", f"{type(e).__name__}: {e}",
                               time.time() - t0)


def run_suite(specs: list[dict], tier: str = WITNESS) -> Report:
    rep = Report()
    for spec in specs:
        rep.add(run_state_test(spec, tier))
    return rep
