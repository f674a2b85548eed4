"""Device SW kernel vs the host reference backend."""

import numpy as np

from sortmerna_tpu.constants import scoring_matrix_5x5
from sortmerna_tpu.engine.candidates import SwJob
from sortmerna_tpu.engine.align import NumpySwBackend
from sortmerna_tpu.ops.sw_jax import JaxSwBackend

from .test_sw import random_pair

MAT = scoring_matrix_5x5(2, -3, 0)


def test_jax_backend_matches_numpy_backend():
    rng = np.random.default_rng(11)
    jobs = []
    for t in range(120):
        q, r = random_pair(rng, with_homology=(t % 4 != 0))
        jobs.append(SwJob(q.astype(np.uint8), r.astype(np.uint8), 20))
    ref_backend = NumpySwBackend(MAT, 5, 2)
    dev_backend = JaxSwBackend(MAT, 5, 2)
    exp = ref_backend.batch(jobs)
    got = dev_backend.batch(jobs)
    for t, (e, g) in enumerate(zip(exp, got)):
        assert g["score1"] == e["score1"], t
        if e["score1"] > 0:
            assert g["ref_end1"] == e["ref_end1"], t
            assert g["read_end1"] == e["read_end1"], t
        if e["score1"] >= 20:
            assert g["ref_begin1"] == e["ref_begin1"], t
            assert g["read_begin1"] == e["read_begin1"], t
            assert list(g["cigar"]) == list(e["cigar"]), t


def test_jax_backend_with_ambiguous_chars():
    rng = np.random.default_rng(12)
    jobs = []
    for t in range(40):
        q, r = random_pair(rng)
        # sprinkle N's
        q[rng.integers(0, len(q), size=3)] = 4
        r[rng.integers(0, len(r), size=3)] = 4
        jobs.append(SwJob(q.astype(np.uint8), r.astype(np.uint8), 15))
    exp = NumpySwBackend(MAT, 5, 2).batch(jobs)
    got = JaxSwBackend(MAT, 5, 2).batch(jobs)
    for t, (e, g) in enumerate(zip(exp, got)):
        assert g["score1"] == e["score1"], t
        if e["score1"] >= 15:
            assert list(g["cigar"]) == list(e["cigar"]), t
