# Developer entry points (reference counterpart: the workspace Makefile's
# test / heavy-test split, Makefile:17-22 in scroll-tech/zkevm-circuits).

.PHONY: test test-heavy bench entry fmt

test:  ## fast suite (CPU, cached compiles)
	python -m pytest tests/ -q

test-heavy:  ## heavy serial tests: real keccak proof, multichip dryrun
	ZKEVM_TPU_HEAVY=1 python -m pytest tests/test_keccak_circuit.py tests/test_multichip.py -q

bench:  ## one-line JSON throughput metric on the available device
	python bench.py

entry:  ## driver entry compile-check + multichip dryrun
	python __graft_entry__.py
