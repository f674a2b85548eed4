"""Multiple reference databases in one run (t8 analogue,
scripts/test.jinja:403-423 test_multiple_databases_search).

The reference searches every read against each `-ref` in sequence
(processor.cpp:219-277 index sweep); a read is aligned if ANY database
accepts it, per-db counters attribute reads to the database of their
current best alignment, and the summary log carries one coverage line
per database.  The reference's t8 (6 set7 reads vs two DBs) expects 4
hits / 2 fails; the bundled arc-16s DB reproduces exactly that split.
"""

import itertools

import numpy as np
import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import prepare, run_align, run_all
from sortmerna_tpu.options import RunOptions

DB16 = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
DB23 = "/root/reference/data/rRNA_databases/silva-arc-23s-id98.fasta"
SET7 = "/root/reference/data/set7_arc_bac_16S_database_match.fasta"


def _hits(refs, reads, tmp_path, tag):
    opts = RunOptions(ref_files=refs, reads_files=[reads],
                      workdir=str(tmp_path / tag))
    ctx = prepare(opts)
    run_align(ctx)
    return [s.is_hit for s in ctx.states], ctx


def test_t8_counts_and_log(tmp_path):
    """6 set7 reads vs two DBs: 4 hits / 2 fails (t8's expectation),
    4 records in aligned.fa, one coverage line per database."""
    opts = parse_args([
        "-ref", DB16, "-ref", DB23, "-reads", SET7, "-fastx", "-other",
        "-workdir", str(tmp_path)])
    ctx = run_all(opts)
    assert len(ctx.states) == 6
    assert sum(1 for s in ctx.states if s.is_hit) == 4
    out = tmp_path / "out"
    aligned = (out / "aligned.fa").read_text()
    other = (out / "other.fa").read_text()
    assert aligned.count(">") == 4
    assert other.count(">") == 2
    log = (out / "aligned.log").read_text()
    assert log.count("Reference file:") == 2
    # per-db coverage lines for both databases
    cov = log.split("Coverage by database:")[1]
    assert DB16 in cov and DB23 in cov
    # per-db attribution: all 4 matched the 16S db, none the 23S db
    assert ctx.readstats.reads_matched_per_db == [4, 0]


def test_union_semantics_and_order_invariance(tmp_path):
    """A read aligns in a multi-DB run iff it aligns against some
    single DB, and the hit partition is independent of -ref order."""
    h16, _ = _hits([DB16], SET7, tmp_path, "a")
    h23, _ = _hits([DB23], SET7, tmp_path, "b")
    h_multi, ctx = _hits([DB16, DB23], SET7, tmp_path, "c")
    h_rev, ctx_rev = _hits([DB23, DB16], SET7, tmp_path, "d")
    assert h_multi == [a or b for a, b in zip(h16, h23)]
    assert h_rev == h_multi
    # attribution swaps with the order, totals agree
    assert ctx_rev.readstats.reads_matched_per_db == \
        list(reversed(ctx.readstats.reads_matched_per_db))
    assert ctx.readstats.num_aligned == ctx_rev.readstats.num_aligned


def test_passes_applies_to_every_db(tmp_path):
    """--passes with multiple -ref: the triple replicates per database
    (the reference's own opt_passes silently no-ops -- PARITY.md #11;
    before the replication fix this crashed on the second index)."""
    opts = parse_args([
        "-ref", DB16, "-ref", DB23, "-reads", SET7,
        "-passes", "18,9,3", "-fastx", "-workdir", str(tmp_path)])
    ctx = run_all(opts)
    assert opts.skiplengths == [[18, 9, 3], [18, 9, 3]]
    assert sum(1 for s in ctx.states if s.is_hit) == 4


def test_cross_db_alignments_report(tmp_path):
    """Reads drawn from BOTH databases: each aligns to its own DB and
    the blast report names reference sequences from the right one."""
    from sortmerna_tpu.io.fastx import iter_fastx

    # one real window from each database as a synthetic read
    reads = tmp_path / "reads.fasta"
    picks = []
    for db in (DB16, DB23):
        rec = next(iter(iter_fastx(db)))
        picks.append((rec.seq_id, rec.sequence[37:187]))
    with open(reads, "w") as f:
        for i, (_, s) in enumerate(picks):
            f.write(f">r{i}\n{s}\n")

    opts = parse_args([
        "-ref", DB16, "-ref", DB23, "-reads", str(reads),
        "-blast", "1 cigar", "-num_alignments", "2",
        "-workdir", str(tmp_path / "wd")])
    ctx = run_all(opts)
    assert all(s.is_hit for s in ctx.states)
    # index attribution: read 0 best in db 0, read 1 best in db 1
    idx_of = [sorted({a.index_num for a in s.alignments})
              for s in ctx.states]
    assert 0 in idx_of[0] and 1 in idx_of[1]
    assert ctx.readstats.reads_matched_per_db[0] >= 1
    assert ctx.readstats.reads_matched_per_db[1] >= 1
    blast = (tmp_path / "wd" / "out" / "aligned.blast").read_text()
    h16 = picks[0][0].lstrip(">")
    h23 = picks[1][0].lstrip(">")
    assert h16 in blast and h23 in blast
