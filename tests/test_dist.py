"""Multi-chip data-parallel coverage on the virtual 8-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8).

dryrun_multichip runs the REAL pipeline three ways (single device,
SW waves batch-sharded over the mesh, reads sharded + psum'd stats) and
asserts byte-identical reports -- see __graft_entry__.dryrun_multichip.
"""

import jax
import pytest


@pytest.mark.parametrize("n", [8, 3])
def test_dryrun_multichip_pipeline(n):
    if len(jax.devices("cpu")) < n:
        pytest.skip("needs %d virtual devices" % n)
    import __graft_entry__ as g
    g.dryrun_multichip(n)
