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


def test_calibrated_estimator_accuracy():
    """Calibrated exact estimator vs ALP on the bundled DB compositions:
    lambda within 0.3%, K within 3%."""
    from sortmerna_tpu.stats.gumbel import calibrated_gumbel
    from .util import gumbel_for_db
    import pathlib
    dbs = [
        "/root/reference/data/test_ref.fasta",
        "/root/reference/data/ref_GQ099317_forward_and_rc.fasta",
        "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta",
        "/root/reference/data/rRNA_databases/silva-arc-23s-id98.fasta",
        "/root/reference/data/rRNA_databases/rfam-5.8s-database-id98.fasta",
    ]
    from sortmerna_tpu.index.builder import scan_reference
    for db in dbs:
        _, bg, _, _, _ = scan_reference(db)
        f = bg / bg.sum()
        lam_ref, k_ref = gumbel_for_db(db)
        lam, K = calibrated_gumbel(2, -3, 5, 2, f)
        assert abs(lam - lam_ref) / lam_ref < 0.003, db
        assert abs(K - k_ref) / k_ref < 0.03, db


def test_minimal_score_matches_alp():
    """The integer minimal_score derived from the calibrated estimator
    equals the ALP-derived one for the bundled DBs across read-count
    scales (the quantity that gates acceptance)."""
    import math
    from sortmerna_tpu.stats.gumbel import calibrated_gumbel
    from sortmerna_tpu.index.builder import scan_reference
    from .util import gumbel_for_db

    for db in ("/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta",
               "/root/reference/data/test_ref.fasta"):
        _, bg, full_len, _, _ = scan_reference(db)
        fr = bg / bg.sum()
        ent = float(-(fr * np.log2(fr)).sum())
        lam_a, k_a = gumbel_for_db(db)
        lam_c, k_c = calibrated_gumbel(2, -3, 5, 2, fr)
        for (nreads, readlen) in ((1000, 120), (100000, 150), (2_000_000, 100)):
            all_len = nreads * readlen
            outs = []
            for lam, K in ((lam_a, k_a), (lam_c, k_c)):
                m = full_len
                n = all_len
                import math as M
                expect_l = int(M.log(K * m * n) / ent)
                # numseq approximated as full_len/1000 sequences
                nseq = max(1, full_len // 1000)
                mm = m - expect_l * nseq if m > expect_l * nseq else m
                nn = n - expect_l * nreads
                outs.append(int(M.log(1.0 / (K * mm * nn)) / -lam))
            assert outs[0] == outs[1], (db, nreads, outs)
