"""Task splitting and resume via the state store (kvdb capability):
align (task 0) then summary (1) then reports (2) as separate runs over
the same workdir must equal a single 'all' (task 4) run."""

import filecmp
import os

import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all


REF = "/root/reference/data/test_ref.fasta"
READS = "/root/reference/data/test_read.fasta"


def _argv(wd, task=None, extra=()):
    a = ["-ref", REF, "-reads", READS, "-fastx", "-blast", "1 cigar",
         "-workdir", str(wd)] + list(extra)
    if task is not None:
        a += ["-task", str(task)]
    return a


def _run(wd, task=None, extra=()):
    opts = parse_args(_argv(wd, task, extra))
    return run_all(opts)


def test_task_split_equals_all(tmp_path):
    wd_all = tmp_path / "all"
    _run(wd_all, task=4)

    wd_split = tmp_path / "split"
    _run(wd_split, task=0)      # align only
    _run(wd_split, task=1)      # summary (+restores state)
    _run(wd_split, task=2)      # reports

    for name in ("aligned.blast", "aligned.fa"):
        a = wd_all / "out" / name
        b = wd_split / "out" / name
        assert a.read_text() == b.read_text(), name

    # log written by both paths; compare the results section
    def results(p):
        txt = (p / "out" / "aligned.log").read_text()
        return txt[txt.index(" Results:"):txt.index(" Coverage")]
    assert results(wd_all) == results(wd_split)


def test_zip_output(tmp_path):
    import gzip
    wd = tmp_path / "z"
    _run(wd, task=4, extra=["-zip-out", "1"])
    with gzip.open(wd / "out" / "aligned.fa.gz", "rt") as f:
        content = f.read()
    assert content.startswith(">")
    with gzip.open(wd / "out" / "aligned.blast.gz", "rt") as f:
        assert "AB271211" in f.read()


def test_interleaved_paired_single_file(tmp_path):
    """--paired with ONE file treats consecutive reads as mates."""
    from sortmerna_tpu.io.fastx import iter_fastx
    reads = tmp_path / "pairs.fasta"
    seq = open(READS).read().strip().split("\n", 1)[1].replace("\n", "")
    with open(reads, "w") as f:
        f.write(f">m1/1\n{seq[:400]}\n")
        f.write(f">m1/2\nACGT{'TTAA' * 40}\n")   # junk mate
    wd = tmp_path / "wd"
    opts = parse_args(["-ref", REF, "-reads", str(reads), "-paired",
                       "-paired_in", "-fastx", "-other",
                       "-workdir", str(wd)])
    ctx = run_all(opts)
    assert opts.is_paired
    hits = [s.is_hit for s in ctx.states]
    assert hits[0] and not hits[1]
    # paired_in: both mates land in aligned
    n_aligned = sum(1 for _ in iter_fastx(wd / "out" / "aligned.fa"))
    assert n_aligned == 2
