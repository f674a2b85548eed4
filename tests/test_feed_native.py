"""Native C++ feed scanners == numpy scanners, byte for byte.

The packed per-file caches (seq/hdr/qual bytes + offsets) must be
identical whichever scanner built them -- every downstream consumer
(align batches, reports, rewinds) reads these arrays directly.
"""

import numpy as np
import pytest

from sortmerna_tpu import native
from sortmerna_tpu.io.feed import PackedReadsFile

FILES = [
    "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz",
    "/root/reference/data/set4_mate_pairs_metatranscriptomics_1.fastq.gz",
    "/root/reference/data/set4_mate_pairs_metatranscriptomics_2.fastq",
    "/root/reference/data/test_read.fasta",
]


@pytest.mark.skipif(not native.have_native(), reason="no native lib")
@pytest.mark.parametrize("src", FILES)
def test_native_scan_matches_numpy(src, tmp_path, monkeypatch):
    pf_c = PackedReadsFile(str(tmp_path / "c"), src, 0)
    pf_c.build()
    pf_c.load()
    monkeypatch.setenv("SMR_FEED_NUMPY", "1")
    pf_np = PackedReadsFile(str(tmp_path / "np"), src, 0)
    pf_np.build()
    pf_np.load()
    assert pf_c.meta["n"] == pf_np.meta["n"] > 0
    for field in ("seq", "seq_off", "hdr", "hdr_off", "qual", "qual_off"):
        a, b = getattr(pf_c, field), getattr(pf_np, field)
        if a is None or b is None:
            assert a is None and b is None
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), field


@pytest.mark.skipif(not native.have_native(), reason="no native lib")
def test_native_scan_small_blocks(tmp_path, monkeypatch):
    """Records spanning block boundaries parse identically (carry-tail
    path) -- force tiny blocks through both scanners."""
    import sortmerna_tpu.io.feed as feedmod
    src = "/root/reference/data/test_ref.fasta"
    monkeypatch.setattr(feedmod, "_BLOCK", 256)
    pf_c = PackedReadsFile(str(tmp_path / "c"), src, 0)
    pf_c.build()
    pf_c.load()
    monkeypatch.setenv("SMR_FEED_NUMPY", "1")
    pf_np = PackedReadsFile(str(tmp_path / "np"), src, 0)
    pf_np.build()
    pf_np.load()
    for field in ("seq", "seq_off", "hdr", "hdr_off"):
        assert np.array_equal(np.asarray(getattr(pf_c, field)),
                              np.asarray(getattr(pf_np, field))), field
