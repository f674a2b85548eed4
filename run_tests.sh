#!/bin/sh
# Run the test suite WITHOUT claiming the tunneled TPU.
#
# The axon plugin registers (and claims the remote chip) at interpreter
# startup via a PYTHONPATH sitecustomize that reads PALLAS_AXON_POOL_IPS
# -- in-process env changes (tests/conftest.py) come too late.  The var
# must be emptied in the environment BEFORE python starts, or any pytest
# run starves a concurrent/subsequent real-TPU bench for ~15 min.
#
# The original values are stashed (SMR_SAVED_*) so opt-in hardware
# tests (test_stress_1m) can restore them for a subprocess.
# -n 2: two xdist workers keep the 2-core host busy (tests are
# process-isolated; an explicit -n in "$@" wins since it comes last)
exec env \
    SMR_SAVED_AXON="${PALLAS_AXON_POOL_IPS-}" \
    SMR_SAVED_JAX="${JAX_PLATFORMS-}" \
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest -n 2 "$@"
