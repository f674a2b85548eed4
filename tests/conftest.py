import os

# Force CPU with a virtual 8-device mesh for sharding tests (the ambient
# environment may point JAX at a tunneled TPU); real TPU runs use the
# engine/bench entry points which do not import this conftest.
# CRITICAL: unregister the axon (tunneled TPU) plugin entirely -- it
# ignores JAX_PLATFORMS, and merely initializing it CLAIMS the remote
# chip, wedging the device for any concurrent/subsequent real-TPU
# process (claim release takes ~15 min).
# stash the ambient device env so opt-in hardware tests (e.g.
# test_stress_1m) can restore it for a SUBPROCESS (this process stays
# CPU-only).  run_tests.sh stashes earlier -- before python starts --
# which setdefault respects.
os.environ.setdefault("SMR_SAVED_AXON",
                      os.environ.get("PALLAS_AXON_POOL_IPS", ""))
os.environ.setdefault("SMR_SAVED_JAX",
                      os.environ.get("JAX_PLATFORMS", ""))
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8")

# The axon TPU plugin (tunneled device) registers itself regardless of
# JAX_PLATFORMS; pin the default device to CPU so tests never compile
# through the tunnel.
import jax  # noqa: E402

try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def ref_data():
    return REF_DATA
