"""Reference-format index artifacts: parity with the REAL binary.

tests/golden/refidx holds .kmer/.bursttrie/.pos/.stats files produced
by the reference's own build_index (indexdb.cpp compiled + run via
tools/refindexer -- see build.sh there).  read_reference_index must
reproduce the dense IndexPart bit for bit from them, and
write_reference_index must reproduce their BYTES (ids are the CMPH CHM
values = first-occurrence ranks; trie shapes replay the incremental
burst rule) -- except two .stats padding bytes the reference writes
from uninitialized struct memory (indexdb.cpp:2025-2081 raw struct
write; they differ between reference runs too).  An align run over a
"reference workdir" must match a run over a freshly built index.
"""

import gzip
import os
import pathlib

import numpy as np
import pytest

from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.index.builder import build_index
from sortmerna_tpu.index.refformat import (read_reference_index,
                                           write_reference_index)
from sortmerna_tpu.options import RunOptions

REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"
FIXTURE = pathlib.Path(__file__).parent / "golden" / "refidx"


@pytest.fixture(scope="module")
def real_artifacts(tmp_path_factory):
    """The reference-binary-produced index, decompressed to a tmp dir."""
    top = tmp_path_factory.mktemp("refidx")
    for gz in FIXTURE.glob("*.gz"):
        (top / gz.name[:-3]).write_bytes(gzip.decompress(gz.read_bytes()))
    return str(top / "GQ")


def test_reader_reproduces_dense_index_from_real_artifacts(
        real_artifacts):
    """read_reference_index on the REAL binary's files == fresh build,
    array for array (the strongest load-side parity claim)."""
    loaded = read_reference_index(real_artifacts)
    built = build_index(REF)
    assert loaded.stats.numseq == built.stats.numseq
    assert loaded.stats.full_len == built.stats.full_len
    np.testing.assert_allclose(loaded.stats.background_freq,
                               built.stats.background_freq)
    assert len(loaded.parts) == len(built.parts)
    for pa, pb in zip(loaded.parts, built.parts):
        for name in _ARRAYS:
            a, b = getattr(pa, name), getattr(pb, name)
            assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_writer_matches_real_artifact_bytes(real_artifacts, tmp_path):
    """write_reference_index reproduces the real binary's bytes --
    .kmer/.bursttrie/.pos byte-identical; .stats identical outside the
    4 uninitialized padding bytes per part record."""
    prefix = str(tmp_path / "GQ")
    write_reference_index(REF, prefix)
    for sfx in (".kmer_0.dat", ".bursttrie_0.dat", ".pos_0.dat"):
        ours = open(prefix + sfx, "rb").read()
        real = open(real_artifacts + sfx, "rb").read()
        assert ours == real, sfx
    ours = bytearray(open(prefix + ".stats", "rb").read())
    real = bytearray(open(real_artifacts + ".stats", "rb").read())
    assert len(ours) == len(real)
    # mask the part-record padding (<QQI4x tail, indexdb.cpp struct
    # write): locate via the part count right before the table
    import struct
    o = 8 + 4 + struct.unpack_from(
        "<I", real, 8)[0] + 32 + 8 + 4 + 8
    (n_parts,) = struct.unpack_from("<H", real, o)
    o += 2
    for _ in range(n_parts):
        ours[o + 20:o + 24] = b"\0\0\0\0"
        real[o + 20:o + 24] = b"\0\0\0\0"
        o += 24
    assert bytes(ours) == bytes(real)


def test_nondefault_L_parity(tmp_path):
    """The format generalizes over -L exactly like the reference: the
    checked-in L=14 artifacts (produced by the reference's build_index
    at -L 14) load bit-identical to a fresh L=14 build, and our writer
    reproduces their bytes (modulo the .stats padding)."""
    top = tmp_path / "l14"
    top.mkdir()
    for gz in FIXTURE.glob("GQ14*.gz"):
        (top / gz.name[:-3]).write_bytes(gzip.decompress(gz.read_bytes()))
    loaded = read_reference_index(str(top / "GQ14"))
    assert loaded.stats.seed_win_len == 14
    built = build_index(REF, seed_win_len=14)
    for pa, pb in zip(loaded.parts, built.parts):
        for name in _ARRAYS:
            assert np.array_equal(np.asarray(getattr(pa, name)),
                                  np.asarray(getattr(pb, name))), name
    prefix = str(tmp_path / "w14")
    write_reference_index(REF, prefix, seed_win_len=14)
    for sfx in (".kmer_0.dat", ".bursttrie_0.dat", ".pos_0.dat"):
        assert open(prefix + sfx, "rb").read() == \
            (top / ("GQ14" + sfx)).read_bytes(), sfx


def test_align_from_real_artifacts(real_artifacts, tmp_path):
    """Full align over the reference-binary-produced index == align
    over a fresh build."""
    import shutil
    idx_dir = tmp_path / "idx_real"
    idx_dir.mkdir()
    # artifact discovery matches on the fasta path recorded in .stats,
    # not the file names (find_reference_artifacts)
    for f in pathlib.Path(real_artifacts).parent.iterdir():
        shutil.copy(f, idx_dir / f.name)

    def outcomes(idx, wd):
        opts = RunOptions(ref_files=[REF], reads_files=[READS],
                          workdir=str(wd), idx_dir=str(idx))
        ctx = prepare(opts)
        run_align(ctx)
        return [(st.is_hit, len(st.alignments),
                 [(a.ref_num, a.score1, a.ref_begin1, list(a.cigar))
                  for a in st.alignments]) for st in ctx.states]

    got = outcomes(idx_dir, tmp_path / "wa")
    want = outcomes(tmp_path / "idx_fresh", tmp_path / "wb")
    assert sum(1 for s in got if s[0]) > 0
    assert got == want

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
