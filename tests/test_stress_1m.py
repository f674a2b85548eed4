"""Opt-in 1M-read stress run (t41-style, scripts/test.jinja:105-112).

Skipped unless SMR_STRESS_1M=1.  The body lives in tools/stress_1m.py
and runs as a SUBPROCESS with the ambient device environment restored
(the conftest forces this process to CPU; the subprocess claims the
real chip).  ~4 min on hardware plus a possible tunnel claim stall.

  SMR_STRESS_1M=1 python -m pytest tests/test_stress_1m.py -x -q
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("SMR_STRESS_1M") != "1",
                    reason="opt-in stress run (SMR_STRESS_1M=1)")
def test_1m_partition_invariance():
    # restore the ambient device env stashed by run_tests.sh / conftest
    # before they scrubbed it, so the subprocess claims the real chip
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PALLAS_AXON_POOL_IPS"] = env.get("SMR_SAVED_AXON", "")
    if env.get("SMR_SAVED_JAX"):
        env["JAX_PLATFORMS"] = env["SMR_SAVED_JAX"]
    else:
        env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "stress_1m.py")],
        env=env, timeout=1700, capture_output=True, text=True)
    sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
    assert proc.returncode == 0
