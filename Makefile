# Convenience targets (the reference's makefile equivalent: all/test/clean,
# makefile:55-170; compilation here is only the native C++ runtime pieces).

PY ?= python

.PHONY: all native test test-fast bench clean doc

all: native

native:
	$(PY) -c "from pinc_tpu import native; p = native.build(force=True); print(p or 'native build unavailable')"

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not simulation and not parallel"

bench:
	$(PY) bench.py

doc:
	@echo "See README.md and docs/"

clean:
	rm -f pinc_tpu/native/libpinc_native.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
