# Convenience targets.
#
# `make test` runs the suite fully detached from the tunneled TPU: the
# axon plugin claims the (single) device in EVERY python process at
# interpreter startup via sitecustomize, which serializes against — and
# can wedge — real device runs.  PALLAS_AXON_POOL_IPS= disables the
# plugin; JAX_PLATFORMS=cpu selects the CPU backend.

PYTEST_ENV = PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
             XLA_FLAGS="--xla_force_host_platform_device_count=8"

test:
	$(PYTEST_ENV) python -m pytest tests/ -x -q

test-fast:
	$(PYTEST_ENV) python -m pytest tests/ -x -q \
	    --ignore=tests/test_paired.py --ignore=tests/test_native_engine.py

bench:
	python bench.py

.PHONY: test test-fast bench
