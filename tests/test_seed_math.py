"""Property tests: closed-form seed acceptance == Levenshtein NFA oracle,
and probe enumeration == brute-force acceptance over an index."""

import numpy as np
import pytest

from sortmerna_tpu.ops.seed_math import accept_tail, pack9
from sortmerna_tpu.ops.seed_nfa import accept_tail_nfa


def _pack(chars):
    v = 0
    for c in chars:
        v = (v << 2) | int(c)
    return v


def test_accept_matches_nfa_random():
    rng = np.random.default_rng(0)
    n = 4000
    P = rng.integers(0, 4, size=(n, 9))
    W = rng.integers(0, 4, size=(n, 10))
    # bias half the cases towards near-matches so acceptance isn't all-false
    for i in range(0, n, 2):
        base = P[i]
        w = list(base) + [rng.integers(0, 4)]
        mode = i % 8
        if mode == 0:
            pass  # exact
        elif mode == 2:   # substitution
            pos = rng.integers(0, 9)
            w[pos] = (w[pos] + 1 + rng.integers(0, 3)) % 4
        elif mode == 4:   # deletion: W = P minus one char + 2 tail chars
            pos = rng.integers(0, 9)
            w = list(base[:pos]) + list(base[pos + 1:]) + \
                [rng.integers(0, 4), rng.integers(0, 4)]
        else:             # insertion: W = P with one char inserted
            pos = rng.integers(0, 10)
            w = list(base[:pos]) + [rng.integers(0, 4)] + list(base[pos:])
        W[i] = w[:10]

    wp = np.array([_pack(w) for w in W], dtype=np.int64)
    pp = np.array([_pack(p) for p in P], dtype=np.int64)
    acc, zero = accept_tail(wp, pp)

    for i in range(n):
        exp_hit, exp_zero = accept_tail_nfa(list(W[i]), list(P[i]))
        assert acc[i] == exp_hit, (i, W[i], P[i])
        assert zero[i] == exp_zero, (i, W[i], P[i])


def test_accept_exhaustive_small_alphabet():
    """Exhaustive over a reduced space: all 2-letter-alphabet words."""
    import itertools
    for P in itertools.product([0, 1], repeat=9):
        pp = np.array([_pack(P)], dtype=np.int64)
        for W in itertools.islice(itertools.product([0, 1], repeat=10), 0, None, 7):
            wp = np.array([_pack(W)], dtype=np.int64)
            acc, zero = accept_tail(wp, pp)
            exp_hit, exp_zero = accept_tail_nfa(list(W), list(P))
            assert acc[0] == exp_hit, (W, P)
            assert zero[0] == exp_zero, (W, P)


def test_probe_enumeration_equals_bruteforce():
    """Probe-based per-window id sets == brute-force automaton over all
    indexed tails, on a small random reference."""
    from sortmerna_tpu.index import builder as B
    from sortmerna_tpu.ops.seed_probe import SeedSearcher

    rng = np.random.default_rng(7)
    # build a random reference with repeats to get dense k-mer space
    core = rng.integers(0, 4, size=600)
    seq = np.concatenate([core, core[:200], rng.integers(0, 4, size=400)])
    chars = "ACGT"
    fasta = ">r1\n" + "".join(chars[c] for c in seq) + "\n"
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".fasta", delete=False) as f:
        f.write(fasta)
        path = f.name
    try:
        idx = B.build_index(path)
        part = idx.parts[0]

        # enumerate all indexed 19-mers for brute force
        k19 = []
        for j in range(len(seq) - 19 + 1):
            k19.append(tuple(seq[j:j + 19]))
        uniq19 = sorted(set(k19))

        searcher = SeedSearcher(part)
        # random read windows, half sampled from the reference with errors
        nw = 60
        w1l, w2l = [], []
        for i in range(nw):
            if i % 2 == 0:
                j = rng.integers(0, len(seq) - 18)
                win = list(seq[j:j + 18])
                nerr = rng.integers(0, 3)
                for _ in range(nerr):
                    pos = rng.integers(0, 18)
                    win[pos] = rng.integers(0, 4)
            else:
                win = list(rng.integers(0, 4, size=18))
            w1l.append(_pack(win[:9]))
            w2l.append(_pack(win[9:]))
        w1 = np.array(w1l, dtype=np.int64)
        w2 = np.array(w2l, dtype=np.int64)
        hw, hid = searcher.search_windows(w1, w2)

        got = {}
        for w, i in zip(hw, hid):
            got.setdefault(int(w), set()).add(int(i))

        # brute force, replicating the reference trie traversal outcome
        kmers18 = part.kmers18
        for i in range(nw):
            P_f = [(w2l[i] >> (2 * (8 - k))) & 3 for k in range(9)]
            P_r = [(w1l[i] >> (2 * k)) & 3 for k in range(9)]  # reversed w1
            zero_a_id = None
            hits = set()
            for t in uniq19:
                kf = _pack(t[:9])
                if kf == w1l[i]:
                    W = list(t[9:19])
                    h, z = accept_tail_nfa(W, P_f)
                    kid = int(np.searchsorted(kmers18, np.uint64(_pack(t[:18]))))
                    if z:
                        zero_a_id = kid
                    if h:
                        hits.add(kid)
            zero_b_id = None
            first_scan = {}
            for t in uniq19:
                kr = _pack(t[10:19])
                if kr == w2l[i]:
                    W = [t[9 - k] for k in range(10)]   # c9..c0
                    h, z = accept_tail_nfa(W, P_r)
                    kid = int(np.searchsorted(kmers18, np.uint64(_pack(t[:18]))))
                    if z and zero_b_id is None:
                        # representative: first-inserted in scan order
                        scan = k19.index(t)
                        if zero_b_id is None or scan < first_scan.get("z", 1 << 60):
                            zero_b_id = kid
                            first_scan["z"] = scan
                    elif z:
                        scan = k19.index(t)
                        if scan < first_scan.get("z", 1 << 60):
                            zero_b_id = kid
                            first_scan["z"] = scan
                    if h:
                        hits.add(kid)
            if zero_a_id is not None:
                expect = {zero_a_id}
            elif zero_b_id is not None:
                expect = {zero_b_id}
            else:
                expect = hits
            assert got.get(i, set()) == expect, f"window {i}"
    finally:
        os.unlink(path)


def test_native_probe_matches_numpy():
    """C++ probe kernel == numpy probe backend on a random reference."""
    from sortmerna_tpu.index import builder as B
    from sortmerna_tpu.ops.seed_probe import SeedSearcher
    from sortmerna_tpu import native
    import tempfile, os
    if not native.have_native():
        import pytest
        pytest.skip("no compiler")

    rng = np.random.default_rng(123)
    core = rng.integers(0, 4, size=800)
    seq = np.concatenate([core, core[:300], rng.integers(0, 4, size=500)])
    chars = "ACGT"
    fasta = ">r1\n" + "".join(chars[c] for c in seq) + "\n"
    with tempfile.NamedTemporaryFile("w", suffix=".fasta", delete=False) as f:
        f.write(fasta)
        path = f.name
    try:
        idx = B.build_index(path)
        part = idx.parts[0]
        nw = 500
        w1l, w2l = [], []
        for i in range(nw):
            if i % 2 == 0:
                j = rng.integers(0, len(seq) - 18)
                win = list(seq[j:j + 18])
                for _ in range(rng.integers(0, 3)):
                    win[rng.integers(0, 18)] = rng.integers(0, 4)
            else:
                win = list(rng.integers(0, 4, size=18))
            w1l.append(_pack(win[:9]))
            w2l.append(_pack(win[9:]))
        w1 = np.array(w1l, dtype=np.int64)
        w2 = np.array(w2l, dtype=np.int64)
        for fs in (False, True):
            nat = SeedSearcher(part, full_search=fs, use_native=True)
            ref = SeedSearcher(part, full_search=fs, use_native=False)
            assert nat._lib is not None
            nw_, ni_ = nat.search_windows(w1, w2)
            rw_, ri_ = ref.search_windows(w1, w2)
            assert np.array_equal(nw_, rw_), fs
            assert np.array_equal(ni_, ri_), fs
    finally:
        os.unlink(path)
