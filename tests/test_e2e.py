"""End-to-end parity tests against the reference's bundled data and golden
outputs (scripts/test.jinja t0/t1 workloads)."""

import numpy as np
import pytest

from sortmerna_tpu.options import RunOptions
from sortmerna_tpu.engine.run import part_ref_context, prepare, run_align
from sortmerna_tpu.reports.blast import blast_for_read



def _run(ref, reads, **kw):
    opts = RunOptions(
        ref_files=[str(ref)], reads_files=[str(reads)], **kw)
    ctx = prepare(opts)
    run_align(ctx)
    return ctx


def test_t0_golden_blast(ref_data):
    """t0: single ref + single read, BLAST regular output golden diff
    (scripts/test.jinja:132-168, run.py:692-709)."""
    ctx = _run(ref_data / "test_ref.fasta", ref_data / "test_read.fasta")
    st = ctx.states[0]
    assert st.is_hit
    assert len(st.alignments) == 1
    aln = st.alignments[0]
    assert aln.score1 == 2430          # t0.validate.blast_score
    lam, K = ctx.refstats.gumbel[0]
    import math
    bitscore = int(np.float32(lam * aln.score1 - math.log(K))
                   / np.float32(math.log(2)))
    assert bitscore == 2069            # t0.validate.blast_bitscore

    ref_seqs, ref_headers = part_ref_context(ctx, 0, 0)
    out = blast_for_read(ctx.reads[0], st.alignments, ref_headers, ref_seqs,
                         ctx.refstats, 0, 0, "regular", [], False)
    golden = (ref_data / "t0_expected_alignment.blast").read_text()
    assert out == golden


def test_t0_1_tabular_columns(ref_data):
    """t0_1: same input, tabular '1 qstrand qcov' -- check format shape."""
    ctx = _run(ref_data / "test_ref.fasta", ref_data / "test_read.fasta")
    st = ctx.states[0]
    ref_seqs, ref_headers = part_ref_context(ctx, 0, 0)
    out = blast_for_read(ctx.reads[0], st.alignments, ref_headers, ref_seqs,
                         ctx.refstats, 0, 0, "tabular",
                         ["cigar", "qcov", "qstrand"], False)
    rows = out.strip().split("\n")
    assert len(rows) == 1
    cols = rows[0].split("\t")
    assert len(cols) == 15
    assert cols[0] == "AB271211"
    assert cols[1] == "Unc49508"
    assert cols[14] == "+"
    # qend-qstart+1 == alignment length column
    assert int(cols[7]) - int(cols[6]) + 1 == int(cols[3])


def test_gq099317_strands(ref_data):
    """The GQ099317 read matches the fwd+rc reference; with --num_alignments
    2 and no-best both strand alignments are reported (strand test
    analogous to t9 family)."""
    ctx = _run(ref_data / "ref_GQ099317_forward_and_rc.fasta",
               ref_data / "illumina_GQ099317.fasta",
               is_best=False, is_num_alignments=True, num_alignments=2)
    st = ctx.states[0]
    assert st.is_hit
    assert len(st.alignments) == 2
    strands = sorted(a.strand for a in st.alignments)
    assert strands == [False, True]
    # both alignments should be perfect-scoring (read is drawn from ref)
    readlen = len(ctx.reads[0])
    for a in st.alignments:
        assert a.score1 == readlen * 2


def test_short_reads_skipped(ref_data, tmp_path):
    """Reads shorter than the seed window are counted and skipped
    (processor.cpp:109-114)."""
    p = tmp_path / "short.fasta"
    p.write_text(">s1\nACGTACGT\n>s2\n" + "ACGT" * 50 + "\n")
    opts = RunOptions(
        ref_files=[str(ref_data / "test_ref.fasta")],
        reads_files=[str(p)])
    ctx = prepare(opts)
    run_align(ctx)
    assert ctx.readstats.num_short == 1
    assert not ctx.states[0].is_hit
