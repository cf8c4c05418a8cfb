# Top-level build/test entrypoints (reference analog: Makefile + `make test`
# building `dw` and running gtest — recalled, SURVEY.md §2 component 12).

PYTHON ?= python

.PHONY: all native test bench test-bench dryrun scale-demo clean

all: native

native:
	$(MAKE) -C native

# full test suite (builds the native host library first; the suite also
# passes without it — every native entry point has a Python fallback)
test: native
	$(PYTHON) -m pytest tests/ -q

# headline single-chip benchmark (one JSON line on stdout)
bench:
	$(PYTHON) bench.py

# end-to-end smoke of bench.py itself (slow: cold XLA CPU compiles)
test-bench:
	SAMPLER_TPU_BENCH_SMOKE=1 $(PYTHON) -m pytest tests/test_bench.py -q

# KBC-scale demonstration: 10.2M-variable grid compiled chunked and run
# graph-sharded (halo exchange) on 8 virtual CPU devices
scale-demo:
	XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
	$(PYTHON) -m sampler_tpu.scale_demo --rows 3200 --cols 3200 --sweeps 6

# multi-chip sharding dry-run on 8 virtual CPU devices
dryrun:
	XLA_FLAGS="--xla_force_host_platform_device_count=8" JAX_PLATFORMS=cpu \
	$(PYTHON) -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
