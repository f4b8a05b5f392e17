# Convenience targets (the reference's Makefile equivalent, C14 in
# SURVEY.md S2; the Python package itself needs no build step).

.PHONY: all test test-fast test-monolithic bench native demo clean

all: native

# build the C++ IO core (ctypes-loaded; NGSF_NO_NATIVE=1 to skip at runtime)
native:
	$(MAKE) -C native

# the reference's `make test` runs examples/test.sh; ours runs the
# pytest suite (incl. the golden harness vs the reference binary) as
# crash-isolated per-group processes: one upstream XLA compile segfault
# cannot void the whole ~45-min run (tests/run_suite.sh prints a
# per-group partial report and exits non-zero on any failure)
test:
	bash tests/run_suite.sh

# same, minus the slow 10x10k golden group
test-fast:
	bash tests/run_suite.sh fast

# the old single-process run (stops at the first failure)
test-monolithic:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# end-to-end demo: simulate -> 4 inference configs -> BED -> PDF
demo:
	bash examples/demo.sh

clean:
	$(MAKE) -C native clean
	rm -rf tests/.refbin
