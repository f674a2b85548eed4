"""Smith-Waterman backend tests: score/ends vs an independent scalar DP,
and CIGAR validity (path walks the clip window and reproduces score1)."""

import numpy as np

from sortmerna_tpu.constants import scoring_matrix_5x5
from sortmerna_tpu.ops.sw_ref import align_full, sw_score

MAT = scoring_matrix_5x5(2, -3, 0).astype(np.int64)
GO, GE = 5, 2


def scalar_sw(query, ref, mat, go, ge):
    """Independent textbook affine-gap local DP (first gap char costs go)."""
    m, n = len(query), len(ref)
    NEG = -10**9
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)  # gap along ref
    F = np.full((m + 1, n + 1), NEG, dtype=np.int64)  # gap along read
    best, bj, bi = 0, -1, m - 1
    for j in range(1, n + 1):
        col_best, col_arg = 0, None
        for i in range(1, m + 1):
            E[i][j] = max(E[i][j - 1] - ge, H[i][j - 1] - go)
            F[i][j] = max(F[i - 1][j] - ge, H[i - 1][j] - go)
            H[i][j] = max(0, H[i - 1][j - 1] + mat[ref[j - 1], query[i - 1]],
                          E[i][j], F[i][j])
            if H[i][j] > col_best:
                col_best, col_arg = H[i][j], i - 1
        if col_best > best:
            best, bj, bi = col_best, j - 1, col_arg
    return int(best), bj, bi


def random_pair(rng, with_homology=True):
    n = int(rng.integers(30, 200))
    ref = rng.integers(0, 4, size=n)
    if with_homology:
        m = int(rng.integers(20, min(n, 120)))
        s = int(rng.integers(0, n - m + 1))
        q = ref[s:s + m].copy()
        for _ in range(int(rng.integers(0, 6))):
            p = int(rng.integers(0, m))
            q[p] = rng.integers(0, 4)
        # occasional indel
        if rng.random() < 0.5 and m > 4:
            p = int(rng.integers(1, m - 1))
            q = np.delete(q, p)
    else:
        q = rng.integers(0, 4, size=int(rng.integers(20, 120)))
    return q.astype(np.int64), ref.astype(np.int64)


def test_score_matches_scalar_dp():
    rng = np.random.default_rng(1)
    for t in range(200):
        q, r = random_pair(rng, with_homology=(t % 3 != 0))
        s1, er1, eq1 = sw_score(q, r, MAT, GO, GE)
        s2, er2, eq2 = scalar_sw(q, r, MAT, GO, GE)
        assert s1 == s2, (t, s1, s2)
        if s1 > 0:
            assert er1 == er2, (t, er1, er2)
            # end_read: min row with max in that column
            assert eq1 == eq2, (t, eq1, eq2)


def cigar_walk_score(cigar, q, r, qb, rb, mat, go, ge):
    """Recompute the alignment score implied by a packed CIGAR."""
    score = 0
    qi, ri = qb, rb
    for c in cigar:
        op = c & 0xF
        ln = c >> 4
        if op == 0:
            for _ in range(ln):
                score += mat[r[ri], q[qi]]
                qi += 1
                ri += 1
        elif op == 1:
            score -= go + (ln - 1) * ge
            qi += ln
        else:
            score -= go + (ln - 1) * ge
            ri += ln
    return score, qi, ri


def test_full_alignment_cigar_consistency():
    rng = np.random.default_rng(2)
    n_checked = 0
    for t in range(150):
        q, r = random_pair(rng)
        res = align_full(q, r, MAT, GO, GE, minimal_score=10)
        if res["cigar"] is None:
            continue
        n_checked += 1
        score, qi, ri = cigar_walk_score(
            res["cigar"], q, r, res["read_begin1"], res["ref_begin1"],
            MAT, GO, GE)
        # the CIGAR path must span exactly [begin, end] on both sequences
        assert qi == res["read_end1"] + 1
        assert ri == res["ref_end1"] + 1
        # merged-gap CIGAR score can only equal the optimum
        assert score == res["score1"], (t, score, res)
    assert n_checked > 80


def test_begin_pass_consistency():
    """score over the clipped window equals score1 and clipping is minimal
    (start positions reproduce the known score)."""
    rng = np.random.default_rng(3)
    for t in range(80):
        q, r = random_pair(rng)
        res = align_full(q, r, MAT, GO, GE, minimal_score=8)
        if res["cigar"] is None:
            continue
        qw = q[res["read_begin1"]:res["read_end1"] + 1]
        rw = r[res["ref_begin1"]:res["ref_end1"] + 1]
        s, _, _ = sw_score(qw, rw, MAT, GO, GE)
        assert s == res["score1"]
