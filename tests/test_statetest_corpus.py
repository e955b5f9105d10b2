"""Conformance corpus at the WITNESS tier: parse the GeneralStateTest
container (tests/vectors/corpus.json), execute every vector through the
tracer + CircuitInputBuilder, and check RW consistency, the gas audit,
the builder post-state AND the generator's independent yellow-paper
expectations (reference: testool statetest/executor.rs 'witness' mode
over the official corpus)."""

import json
import os

import pytest

from zkevm_tpu.statetest import parse_general_state_tests
from zkevm_tpu.testctx import MOCK_ADDRS
from zkevm_tpu.testool import WITNESS, run_state_test

VEC = os.path.join(os.path.dirname(__file__), "vectors", "corpus.json")


def load_specs():
    doc = json.load(open(VEC))
    doc.pop("_meta", None)
    return parse_general_state_tests(doc, remap_sender=MOCK_ADDRS[0])


SPECS = load_specs()


@pytest.mark.parametrize("spec", SPECS, ids=[s["name"] for s in SPECS])
def test_corpus_vector(spec):
    r = run_state_test(spec, tier=WITNESS)
    assert r.status != "fail", f"{r.name}: {r.detail}"
    if r.status == "skip":
        pytest.skip(r.detail)


def test_corpus_scale():
    """The corpus is the compatibility meter: keep it big enough to mean
    something and track the pass-rate (CONFORMANCE.md is generated from
    this run by scripts/conformance_report.py)."""
    assert len(SPECS) >= 50
    doc = json.load(open(VEC))
    assert doc["_meta"]["cases"] >= 300
