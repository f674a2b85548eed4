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


@pytest.fixture(autouse=True, scope="session")
def _shared_index_cache():
    """Route FRESH index builds through one persistent cache dir so the
    suite builds each (fasta, params) index once across all tests,
    workers and sessions instead of once per test workdir (the silva DB
    costs ~8s per cold build; save_index is concurrency-safe).

    Only runtime lookups (engine.run.prepare's local import) see the
    patch; tests that imported build_or_load directly at module top
    (e.g. test_errors' artifact-layout assertions) keep the original,
    and an idx_dir that already has content (pre-seeded
    reference-format workdirs, test_refformat) is honored as-is.
    """
    import sortmerna_tpu.index.artifact as art
    orig = art.build_or_load
    shared = os.environ.get("SMR_TEST_IDX_CACHE",
                            "/tmp/smr_test_idx_cache")
    os.makedirs(shared, exist_ok=True)

    def wrapper(fasta_path, idx_dir, *a, **kw):
        if not idx_dir or not os.path.isdir(idx_dir) \
                or not os.listdir(idx_dir):
            idx_dir = shared
        return orig(fasta_path, idx_dir, *a, **kw)

    wrapper.__wrapped__ = orig      # escape hatch for layout tests
    art.build_or_load = wrapper
    yield
    art.build_or_load = orig
