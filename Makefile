# Developer entry points.  The default pytest run deselects @slow
# (pyproject addopts); `make check` is the fast regression gate,
# `make check-all` the full suite, `make bench` the driver headline.

PY ?= python

.PHONY: check check-all bench goldens

check:
	$(PY) -m pytest tests/ -q

check-all:
	$(PY) -m pytest tests/ -q -m ""

bench:
	$(PY) bench.py

goldens:
	$(PY) scripts/make_goldens.py
