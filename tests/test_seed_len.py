"""Arbitrary seed length -L (options.cpp opt_L: even 8..26).

The reference parameterizes its lookup table by ``1 << lnwin``
(indexdb.cpp:1764) and the trie geometry by partialwin = L/2; here every
table width derives from pw = L/2 (index/builder.py).  These tests build
real indexes at non-default L and check:
* builder invariants (key widths, table sizes);
* numpy vs device prober bit-equality at L=14 and L=22;
* a full align run at -L 14 finds the same read partition with both
  probers and aligns the bundled GQ read.
"""

import numpy as np
import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.index.builder import build_index
from sortmerna_tpu.ops.seed_probe import SeedSearcher
from sortmerna_tpu.ops.seed_search import DeviceSeedSearcher

REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"


@pytest.mark.parametrize("L", [14, 22])
def test_builder_widths(L):
    built = build_index(REF, seed_win_len=L)
    pw = L // 2
    part = built.parts[0]
    assert built.stats.seed_win_len == L
    assert part.seed_win_len == L
    assert len(part.kmer_counts) == 1 << (2 * pw)
    assert int(part.kmers18.max()) < 1 << (2 * L)
    assert int(part.k19_keys[part.k19_keys != (2**64 - 1)].max()) \
        < 1 << (2 * L + 2)


@pytest.mark.parametrize("L", [14, 22])
def test_native_prober_matches_numpy(L):
    """probe.cpp is instantiated per pw (4..13); its output must be
    bit-equal to the numpy prober at every L, not only the default 18."""
    from sortmerna_tpu import native
    if not native.have_native():
        pytest.skip("no native library")
    built = build_index(REF, seed_win_len=L)
    part = built.parts[0]
    pw = L // 2
    rng = np.random.default_rng(5)
    w1 = rng.integers(0, 1 << (2 * pw), size=4000).astype(np.int64)
    w2 = rng.integers(0, 1 << (2 * pw), size=4000).astype(np.int64)
    real = part.kmers18[
        rng.integers(0, len(part.kmers18), size=800)].astype(np.int64)
    w1 = np.concatenate([w1, real >> (2 * pw)])
    w2 = np.concatenate([w2, real & ((1 << (2 * pw)) - 1)])

    host = SeedSearcher(part, use_native=False)
    nat = SeedSearcher(part, use_native=True, threads=2)
    assert nat._lib is not None, "native prober did not engage"
    hw, hid = host.search_windows(w1, w2)
    nw_, nid = nat.search_windows(w1, w2)
    order_h = np.lexsort((hid, hw))
    order_n = np.lexsort((nid, nw_))
    np.testing.assert_array_equal(hw[order_h], nw_[order_n])
    np.testing.assert_array_equal(hid[order_h], nid[order_n])


def test_native_probe_dedup_preserves_order():
    """The native prober dedups repeated (w1, w2) keys per call
    (probe.cpp) and fans results back out; output must be EXACTLY the
    sequential per-window scan -- same window order, same per-window
    id order, duplicates fully replayed.  Heavy duplication (keys
    sampled from a small pool, like amplicon batches) and a batch
    crossing the 64K segment boundary both covered."""
    from sortmerna_tpu import native
    if not native.have_native():
        pytest.skip("no native library")
    built = build_index(REF, seed_win_len=18)
    part = built.parts[0]
    pw = 9
    rng = np.random.default_rng(11)
    # small key pool with many real index keys => dup-heavy + hit-rich
    pool_real = part.kmers18[
        rng.integers(0, len(part.kmers18), size=150)].astype(np.int64)
    pool_rand = rng.integers(0, 1 << 36, size=100).astype(np.int64)
    pool = np.concatenate([pool_real, pool_rand])
    for n in (5000, 70000):      # 70K crosses the 64K dedup segment
        keys = pool[rng.integers(0, len(pool), size=n)]
        w1 = (keys >> (2 * pw)).astype(np.int64)
        w2 = (keys & ((1 << (2 * pw)) - 1)).astype(np.int64)
        host = SeedSearcher(part, use_native=False)
        nat = SeedSearcher(part, use_native=True, threads=2)
        assert nat._lib is not None
        hw, hid = host.search_windows(w1, w2)
        nw_, nid = nat.search_windows(w1, w2)
        # exact sequence equality -- no sorting
        np.testing.assert_array_equal(hw, nw_)
        np.testing.assert_array_equal(hid, nid)
        assert len(hw) > n // 10     # the pool actually produced hits


def test_native_part_driver_engages_at_L14(tmp_path, monkeypatch):
    """-L != 18 must use the all-C++ part driver, not the Python pass
    loop (the round-3 perf cliff)."""
    from sortmerna_tpu import native
    if not native.have_native():
        pytest.skip("no native library")
    from sortmerna_tpu.engine import part_driver as pd
    engaged = []
    orig = pd.NativePartDriver.run

    def spy(self, *a, **k):
        engaged.append(True)
        return orig(self, *a, **k)

    monkeypatch.setattr(pd.NativePartDriver, "run", spy)
    opts = parse_args(
        ["-ref", REF, "-reads", READS, "-fastx", "-blast", "1 cigar",
         "-L", "14", "-workdir", str(tmp_path)])
    ctx = run_all(opts)
    assert engaged, "NativePartDriver did not run at -L 14"
    assert sum(1 for s in ctx.states if s.is_hit) == 1


@pytest.mark.parametrize("L", [14, 22])
def test_device_prober_matches_numpy(L):
    built = build_index(REF, seed_win_len=L)
    part = built.parts[0]
    pw = L // 2
    rng = np.random.default_rng(11)
    # random windows + real windows from the reference itself (hits)
    w1 = rng.integers(0, 1 << (2 * pw), size=3000).astype(np.int64)
    w2 = rng.integers(0, 1 << (2 * pw), size=3000).astype(np.int64)
    real = part.kmers18[
        rng.integers(0, len(part.kmers18), size=500)].astype(np.int64)
    w1 = np.concatenate([w1, real >> (2 * pw)])
    w2 = np.concatenate([w2, real & ((1 << (2 * pw)) - 1)])

    host = SeedSearcher(part, use_native=False)
    assert host.pw == pw
    dev = DeviceSeedSearcher(part)
    hw, hid = host.search_windows(w1, w2)
    dw, did = dev.search_windows(w1, w2)
    assert len(hw) >= 500          # the real windows all hit
    order_h = np.lexsort((hid, hw))
    order_d = np.lexsort((did, dw))
    np.testing.assert_array_equal(hw[order_h], dw[order_d])
    np.testing.assert_array_equal(hid[order_h], did[order_d])


def test_align_with_L14(tmp_path):
    def run(wd, extra=()):
        opts = parse_args(
            ["-ref", REF, "-reads", READS, "-fastx", "-blast", "1 cigar",
             "-L", "14", "-workdir", str(wd)] + list(extra))
        return run_all(opts)

    ctx = run(tmp_path / "host")
    assert sum(1 for s in ctx.states if s.is_hit) == 1
    blast_host = (tmp_path / "host" / "out" / "aligned.blast").read_text()
    assert blast_host.strip(), "no blast rows at L=14"

    ctx2 = run(tmp_path / "dev", extra=["-device_probe"])
    blast_dev = (tmp_path / "dev" / "out" / "aligned.blast").read_text()
    assert blast_dev == blast_host
