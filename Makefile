# Developer entry points (the reference's Makefile counterpart).
# The C++ runtime builds itself on demand into ~/.cache/qvz_tpu; `make
# native` forces a rebuild, `make test` runs the suite, `make bench`
# prints the one-line benchmark JSON.

PY ?= python

.PHONY: all native test test-fast bench clean

all: native

native:
	rm -rf $${QVZ_TPU_CACHE:-$$HOME/.cache/qvz_tpu}
	$(PY) -c "import qvz_tpu.native as n; n.load(); print('native runtime built')"

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_reference_live.py

bench:
	$(PY) bench.py

clean:
	rm -rf $${QVZ_TPU_CACHE:-$$HOME/.cache/qvz_tpu}
	find . -name __pycache__ -type d -exec rm -rf {} +
