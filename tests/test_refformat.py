"""Reference-format index artifacts: writer -> reader round trip.

write_reference_index serializes the exact on-disk layout the reference
binary produces (.kmer_N/.bursttrie_N/.pos_N/.stats,
indexdb.cpp:1939-2084); read_reference_index consumes it (any valid
trie shape -- index.cpp:145-354 semantics) and must reproduce the dense
IndexPart bit for bit, including the arbitrary-id remap.  An align run
over a "reference workdir" must match a run over a freshly built index.
"""

import os

import numpy as np
import pytest

from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.index.builder import build_index
from sortmerna_tpu.index.refformat import (read_reference_index,
                                           write_reference_index)
from sortmerna_tpu.options import RunOptions

REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"

_ARRAYS = [f.name for f in __import__(
    "dataclasses").fields(__import__(
        "sortmerna_tpu.index.builder", fromlist=["IndexPart"]).IndexPart)
    if f.name not in ("start_part", "seq_part_size", "numseq_part",
                      "first_seq", "seed_win_len")]


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    top = tmp_path_factory.mktemp("reffmt")
    prefix = str(top / "db1234")
    write_reference_index(REF, prefix)
    return top, prefix


def test_artifact_files_exist(roundtrip):
    _, prefix = roundtrip
    for sfx in (".stats", ".kmer_0.dat", ".bursttrie_0.dat",
                ".pos_0.dat"):
        assert os.path.exists(prefix + sfx), sfx


def test_roundtrip_matches_build(roundtrip):
    _, prefix = roundtrip
    built = build_index(REF)
    loaded = read_reference_index(prefix)
    assert loaded.stats.numseq == built.stats.numseq
    assert loaded.stats.full_len == built.stats.full_len
    np.testing.assert_allclose(loaded.stats.background_freq,
                               built.stats.background_freq)
    assert [m.header for m in loaded.stats.sam_sq] == \
        [m.header for m in built.stats.sam_sq]
    assert len(loaded.parts) == len(built.parts)
    for pa, pb in zip(loaded.parts, built.parts):
        for name in _ARRAYS:
            a, b = getattr(pa, name), getattr(pb, name)
            assert np.array_equal(np.asarray(a), np.asarray(b)), name
        assert (pa.start_part, pa.seq_part_size, pa.numseq_part,
                pa.first_seq) == \
               (pb.start_part, pb.seq_part_size, pb.numseq_part,
                pb.first_seq)


def test_align_from_reference_workdir(roundtrip, tmp_path):
    """build_or_load picks the reference-format artifacts up from the
    idx dir and the align results equal a fresh-build run."""
    top, prefix = roundtrip

    def states_of(idx_dir, wd):
        opts = RunOptions(ref_files=[REF], reads_files=[READS],
                          workdir=str(wd), idx_dir=str(idx_dir))
        ctx = prepare(opts)
        run_align(ctx)
        return [(st.is_hit, len(st.alignments),
                 [(a.ref_num, a.score1, a.ref_begin1, list(a.cigar))
                  for a in st.alignments]) for st in ctx.states], ctx

    got, ctx_ref = states_of(top, tmp_path / "a")       # ref-format dir
    want, _ = states_of(tmp_path / "fresh_idx", tmp_path / "b")
    assert sum(1 for s in got if s[0]) > 0
    assert got == want
