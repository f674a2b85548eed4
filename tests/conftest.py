import os

# Force CPU with a virtual 8-device mesh for sharding tests; real TPU runs
# use the engine/bench entry points which do not import this conftest.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def ref_data():
    return REF_DATA
