"""Overlapped half-batch pipelining == single-driver sweep, bit for bit.

The overlap scheduler (engine/align._run_part_overlapped) splits a batch
into two read-range halves whose host stages and device waves pipeline
against each other; reads never interact within a part, so results must
be byte-identical to the plain sweep regardless of interleaving.
"""

import itertools

import pytest

from sortmerna_tpu.engine.run import prepare, run_align
from sortmerna_tpu.io.fastx import format_record, iter_fastx
from sortmerna_tpu.options import RunOptions

DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
SET2 = "/root/reference/data/set2_environmental_study_550_amplicon.fasta.gz"

N_READS = 3000   # the OVERLAP_MIN_READS gate is lowered below so the
                 # overlap path fully engages on a suite-sized subset


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    p = tmp_path_factory.mktemp("ovl") / "reads.fasta"
    with open(p, "w") as f:
        for rec in itertools.islice(iter_fastx(SET2), N_READS):
            f.write(format_record(rec))
    return str(p)


def _align(subset, tmp_path, tag, overlap, monkeypatch):
    import sortmerna_tpu.engine.align as A
    monkeypatch.setattr(A, "OVERLAP_MIN_READS", 1000)
    monkeypatch.setenv("SMR_OVERLAP", "1" if overlap else "0")
    opts = RunOptions(ref_files=[DB], reads_files=[subset],
                      workdir=str(tmp_path / tag))
    ctx = prepare(opts)
    run_align(ctx)
    return [(st.is_hit, st.is_done, st.hit_seeds, st.max_sw_count,
             [(a.ref_num, a.score1, a.ref_begin1, a.ref_end1,
               a.read_begin1, a.read_end1, list(a.cigar), a.strand)
              for a in st.alignments])
            for st in ctx.states], ctx.readstats


@pytest.fixture(scope="module")
def baseline(subset, tmp_path_factory):
    """The single-driver (non-overlap) result, computed once for every
    variant comparison in this module."""
    mp = pytest.MonkeyPatch()
    try:
        return _align(subset, tmp_path_factory.mktemp("base"), "b",
                      False, mp)
    finally:
        mp.undo()


def test_overlap_matches_single(subset, baseline, tmp_path, monkeypatch):
    single, rs1 = baseline
    dual, rs2 = _align(subset, tmp_path, "dual", True, monkeypatch)
    assert sum(1 for s in single if s[0]) > 100   # non-degenerate
    assert single == dual
    assert rs1.num_aligned == rs2.num_aligned
    assert rs1.reads_matched_per_db == rs2.reads_matched_per_db


@pytest.mark.parametrize("env", [
    {"SMR_OVERLAP_SPLIT": "8", "SMR_WAVE_GROUP": "3"},
    {"SMR_OVERLAP_SPLIT": "8", "SMR_WAVE_GROUP": "1"},
    {"SMR_OVERLAP_SPLIT": "6", "SMR_PUMP_HELPER": "1"},
    {"SMR_OVERLAP_SPLIT": "8", "SMR_GROUP_WORKERS": "2"},
    {"SMR_OVERLAP_SPLIT": "8", "SMR_FLUSH_DEPTH": "1"},
], ids=["grp3", "grp1", "helper", "workers2", "depth1"])
def test_scheduler_variants_match(subset, baseline, tmp_path,
                                  monkeypatch, env):
    """Every grouped-scheduler variant (group size, async pump helper,
    symmetric workers, flush depth) must produce byte-identical
    per-read results -- slices never interact, so the interleaving
    must be unobservable."""
    base, rs1 = baseline
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    got, rs2 = _align(subset, tmp_path, "var", True, monkeypatch)
    assert got == base
    assert rs1.num_aligned == rs2.num_aligned
    assert rs1.reads_matched_per_db == rs2.reads_matched_per_db
