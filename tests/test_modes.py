"""Alignment-mode coverage: strand restriction, full_search,
num_alignments 0 (report all), print_all_reads."""

import itertools

import numpy as np
import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.io.fastx import format_record, iter_fastx


REF = "/root/reference/data/ref_GQ099317_forward_and_rc.fasta"
READS = "/root/reference/data/illumina_GQ099317.fasta"


def _run(tmp_path, extra, name):
    wd = tmp_path / name
    opts = parse_args(["-ref", REF, "-reads", READS,
                       "-workdir", str(wd)] + extra)
    return run_all(opts), wd


def test_forward_only(tmp_path):
    """-F: only the forward strand is searched; the read matches the ref's
    forward copy, so it still hits, with a '+' alignment only."""
    ctx, _ = _run(tmp_path, ["-F", "-num_alignments", "2", "-no-best"],
                  "f")
    st = ctx.states[0]
    assert st.is_hit
    assert all(a.strand for a in st.alignments)


def test_reverse_only(tmp_path):
    ctx, _ = _run(tmp_path, ["-R", "-num_alignments", "2", "-no-best"],
                  "r")
    st = ctx.states[0]
    assert st.is_hit
    assert all(not a.strand for a in st.alignments)


def test_num_alignments_zero_reports_all(tmp_path):
    """--num_alignments 0: every E-value-passing alignment is kept
    (alignment.cpp:420, paralleltraversal.cpp:292-297)."""
    ctx0, _ = _run(tmp_path, ["-num_alignments", "0"], "all0")
    ctx2, _ = _run(tmp_path, ["-num_alignments", "2", "-no-best"], "n2")
    n0 = len(ctx0.states[0].alignments)
    n2 = len(ctx2.states[0].alignments)
    assert n0 >= n2 >= 2


def test_full_search_supersets_hits(tmp_path):
    """--full_search disables the 0-error shortcut, so the seed set (and
    alignment count with num_alignments 0) can only grow."""
    ctx_d, _ = _run(tmp_path, ["-num_alignments", "0"], "dflt")
    ctx_f, _ = _run(tmp_path, ["-num_alignments", "0", "-full_search"],
                    "full")
    assert len(ctx_f.states[0].alignments) >= \
        len(ctx_d.states[0].alignments)
    assert ctx_f.states[0].is_hit


def test_print_all_reads_blast_sam(tmp_path):
    """--print_all_reads: null rows for non-aligned reads
    (report_blast.cpp:258-273, report_sam.cpp:70-76)."""
    reads = tmp_path / "mix.fasta"
    seq = open(READS).read().strip().split("\n", 1)[1].replace("\n", "")
    rng = np.random.default_rng(5)
    junk = "".join("ACGT"[i] for i in rng.integers(0, 4, size=150))
    with open(reads, "w") as f:
        f.write(f">good\n{seq}\n>junk\n{junk}\n")
    wd = tmp_path / "par"
    opts = parse_args(["-ref", REF, "-reads", str(reads),
                       "-blast", "1", "-sam", "-print_all_reads",
                       "-workdir", str(wd)])
    run_all(opts)
    blast = (wd / "out" / "aligned.blast").read_text().splitlines()
    junk_rows = [l for l in blast if l.startswith("junk\t*")]
    assert len(junk_rows) == 1
    sam = (wd / "out" / "aligned.sam").read_text().splitlines()
    assert any(l.startswith("junk\t4\t*") for l in sam)
