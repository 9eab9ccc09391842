# Developer entry points.  The default pytest run deselects @slow
# (pyproject addopts); `make check` is the fast regression gate,
# `make check-all` the full suite, `make bench` the driver headline,
# `make chip-smoke` the per-round TPU gate (class API + examples,
# assertions not prints; fail-loud log in bench_logs/chip_smoke.log).

PY ?= python

.PHONY: check check-all bench bench-order20 bench-order25 chip-smoke goldens perf-table

check:
	$(PY) -m pytest tests/ -q

check-all:
	$(PY) -m pytest tests/ -q -m ""

bench:
	$(PY) bench.py

# chip bench artifacts go through the fail-loud logger: a dead run can
# never leave a result-less log that looks like evidence
bench-order20:
	BENCH_ORDER=20 BENCH_NLAM=4 $(PY) scripts/benchlog.py \
	  bench_logs/bench_order20_r5.log -- $(PY) bench.py

bench-order25:
	BENCH_ORDER=25 BENCH_NLAM=4 $(PY) scripts/benchlog.py \
	  bench_logs/bench_order25_r5.log -- $(PY) bench.py

chip-smoke:
	$(PY) scripts/benchlog.py --key "CHIP SMOKE PASS" \
	  bench_logs/chip_smoke.log -- $(PY) scripts/chip_smoke.py

goldens:
	$(PY) scripts/make_goldens.py

# regenerate the README headline table from committed bench logs
perf-table:
	$(PY) scripts/perf_table.py
