"""Gumbel estimator accuracy vs the reference's ALP library (oracle built
at test time from the vendored public sources)."""

import numpy as np
import pytest

from sortmerna_tpu.stats.gumbel import island_gumbel, karlin_altschul_ungapped

from .util import alp_gumbel


@pytest.mark.slow
def test_island_estimator_within_tolerance():
    f = (0.25, 0.25, 0.25, 0.25)
    lam_ref, k_ref = alp_gumbel(2, -3, 5, 2, *f)
    lam, K = island_gumbel(2, -3, 5, 2, np.array(f))
    assert abs(lam - lam_ref) / lam_ref < 0.03, (lam, lam_ref)
    assert abs(np.log(K) - np.log(k_ref)) < 0.5, (K, k_ref)


def test_ungapped_lambda_above_gapped():
    """The exact ungapped lambda upper-bounds the gapped one."""
    f = np.array([0.25, 0.25, 0.25, 0.25])
    lam_u, _ = karlin_altschul_ungapped(2, -3, f)
    lam_ref, _ = alp_gumbel(2, -3, 5, 2, *f)
    assert lam_u > lam_ref
    assert abs(lam_u - 0.6337) < 0.01   # known value for 2/-3 uniform
