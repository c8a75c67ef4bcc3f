# Dev-loop targets. The full suite runs on a simulated 8-device CPU mesh
# (tests/conftest.py) and takes ~15-20 min; the fast profile skips the
# `slow`-marked integration tests and targets <5 min for the inner loop.

.PHONY: test test-fast

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"
