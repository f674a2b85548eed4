"""Paired-end routing e2e on a subset of set4 (mate pairs)."""

import itertools
import os

import numpy as np
import pytest

from sortmerna_tpu.cli import parse_args
from sortmerna_tpu.engine.run import run_all
from sortmerna_tpu.io.fastx import iter_fastx


DB = "/root/reference/data/rRNA_databases/silva-arc-16s-id95.fasta"
S4_1 = "/root/reference/data/set4_mate_pairs_metatranscriptomics_1.fastq"
S4_2 = "/root/reference/data/set4_mate_pairs_metatranscriptomics_2.fastq"
N = 400


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    d = tmp_path_factory.mktemp("set4")
    outs = []
    for src in (S4_1, S4_2):
        dst = d / os.path.basename(src)
        with open(dst, "w") as f:
            for rec in itertools.islice(iter_fastx(src), N):
                f.write(f"@{rec.header}\n{rec.sequence}\n+\n{rec.quality}\n")
        outs.append(str(dst))
    return outs


def _count_fq(path):
    return sum(1 for _ in iter_fastx(path))


def _run(subset, tmp_path, extra):
    wd = tmp_path / "wd"
    argv = ["-ref", DB, "-reads", subset[0], "-reads", subset[1],
            "-fastx", "-other", "-workdir", str(wd)] + extra
    opts = parse_args(argv)
    ctx = run_all(opts)
    return ctx, wd


def test_paired_in(subset, tmp_path):
    ctx, wd = _run(subset, tmp_path, ["-paired_in"])
    hits = [s.is_hit for s in ctx.states]
    pair_any = sum(1 for i in range(0, 2 * N, 2)
                   if hits[i] or hits[i + 1])
    n_aligned = _count_fq(wd / "out" / "aligned.fq")
    n_other = _count_fq(wd / "out" / "other.fq")
    # paired_in: the whole pair goes to aligned if either mate hit
    assert n_aligned == 2 * pair_any
    assert n_aligned + n_other == 2 * N
    assert ctx.readstats.num_aligned == sum(hits)


def test_paired_out_out2(subset, tmp_path):
    ctx, wd = _run(subset, tmp_path, ["-paired_out", "-out2"])
    hits = [s.is_hit for s in ctx.states]
    pair_both = sum(1 for i in range(0, 2 * N, 2)
                    if hits[i] and hits[i + 1])
    a_f = _count_fq(wd / "out" / "aligned_fwd.fq")
    a_r = _count_fq(wd / "out" / "aligned_rev.fq")
    o_f = _count_fq(wd / "out" / "other_fwd.fq")
    o_r = _count_fq(wd / "out" / "other_rev.fq")
    # paired_out: pair to aligned only when both mates hit
    assert a_f == pair_both and a_r == pair_both
    assert a_f + o_f == N and a_r + o_r == N


def test_sout_singletons(subset, tmp_path):
    ctx, wd = _run(subset, tmp_path, ["-sout"])
    hits = [s.is_hit for s in ctx.states]
    pair_both = sum(1 for i in range(0, 2 * N, 2)
                    if hits[i] and hits[i + 1])
    singles = sum(1 for i in range(0, 2 * N, 2)
                  if hits[i] != hits[i + 1])
    ap = _count_fq(wd / "out" / "aligned_paired.fq")
    asg = _count_fq(wd / "out" / "aligned_singleton.fq")
    assert ap == 2 * pair_both
    assert asg == singles
