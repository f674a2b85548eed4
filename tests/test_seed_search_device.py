"""Device (JAX) seed probe must be bit-exact vs the host probers.

Compares ops/seed_search.DeviceSeedSearcher against both the numpy
reference prober and the native C++ prober on a real index part, over
(a) windows drawn from actual reads (dense hits incl. 0-error
short-circuits) and (b) uniform random windows (sparse hits).
"""

import numpy as np
import pytest

from sortmerna_tpu.engine.read import ReadSeq
from sortmerna_tpu.index.builder import build_index
from sortmerna_tpu.io.fastx import iter_fastx
from sortmerna_tpu.ops.seed_probe import SeedSearcher
from sortmerna_tpu.ops.seed_search import DeviceSeedSearcher

REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"


@pytest.fixture(scope="module")
def part():
    return build_index(REF).parts[0]


def _read_windows(part):
    """All (w1, w2) windows of the bundled read, both strands, plus
    mutated copies for 1-error coverage."""
    recs = list(iter_fastx(READS))
    r = ReadSeq(recs[0].header, recs[0].sequence, None, 0, 0)
    rng = np.random.default_rng(7)
    w1s, w2s = [], []
    for fwd in (True, False):
        enc = np.asarray(r.strand03(fwd), np.int64)
        for variant in range(8):
            e = enc.copy()
            for _ in range(variant):        # up to 7 point edits
                e[rng.integers(0, len(e))] = rng.integers(0, 4)
            for st in range(0, len(e) - 18 + 1, 3):
                w = e[st:st + 18]
                w1s.append(int(w[:9] @ (4 ** np.arange(8, -1, -1))))
                w2s.append(int(w[9:] @ (4 ** np.arange(8, -1, -1))))
    return np.asarray(w1s, np.int64), np.asarray(w2s, np.int64)


def _sorted_pairs(win, ids):
    order = np.lexsort((ids, win))
    return np.stack([win[order], ids[order]], axis=1)


@pytest.mark.parametrize("full_search", [False, True])
def test_device_matches_host_read_windows(part, full_search):
    w1, w2 = _read_windows(part)
    host = SeedSearcher(part, full_search=full_search, use_native=False)
    dev = DeviceSeedSearcher(part, full_search=full_search)
    hw, hid = host.search_windows(w1, w2)
    dw, did = dev.search_windows(w1, w2)
    assert len(hw), "degenerate fixture: no hits at all"
    np.testing.assert_array_equal(_sorted_pairs(dw, did),
                                  _sorted_pairs(hw, hid))


def test_device_matches_native_random(part):
    rng = np.random.default_rng(3)
    w1 = rng.integers(0, 1 << 18, size=5000).astype(np.int64)
    w2 = rng.integers(0, 1 << 18, size=5000).astype(np.int64)
    native = SeedSearcher(part, use_native=True)
    dev = DeviceSeedSearcher(part)
    nw_, nid = native.search_windows(w1, w2)
    dw, did = dev.search_windows(w1, w2)
    np.testing.assert_array_equal(_sorted_pairs(dw, did),
                                  _sorted_pairs(nw_, nid))


def test_device_minoccur_gate(part):
    w1, w2 = _read_windows(part)
    host = SeedSearcher(part, minoccur=2, use_native=False)
    dev = DeviceSeedSearcher(part, minoccur=2)
    hw, hid = host.search_windows(w1, w2)
    dw, did = dev.search_windows(w1, w2)
    np.testing.assert_array_equal(_sorted_pairs(dw, did),
                                  _sorted_pairs(hw, hid))


def test_device_split_batches(part):
    """Oversized batches split recursively with window re-offsetting."""
    w1, w2 = _read_windows(part)
    dev = DeviceSeedSearcher(part)
    full_w, full_i = dev.search_windows(w1, w2)
    saved = DeviceSeedSearcher.NW_LADDER
    try:
        DeviceSeedSearcher.NW_LADDER = (256,)
        small = DeviceSeedSearcher(part)
        sw, si = small.search_windows(w1, w2)
    finally:
        DeviceSeedSearcher.NW_LADDER = saved
    np.testing.assert_array_equal(_sorted_pairs(sw, si),
                                  _sorted_pairs(full_w, full_i))
